#!/bin/sh
# Build the native slice-cache library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 slicecache.cpp -lz \
    -o libslicecache.so
echo "built $(pwd)/libslicecache.so"
