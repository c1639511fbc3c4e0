#!/bin/sh
# Reference run recipe (`/root/reference/run0.sh`): train the full SMSUT
# model on fold 0, then test the numbered run's best checkpoint.
# Usage: SMSUT_DATA_ROOT=/path/to/png_tree sh run0.sh [model_idx]
set -e
IDX=${1:-000}
python trainer/uganConsisTrainer.py -p train -f 0
python trainer/uganConsisTrainer.py -p test -f 0 -i "$IDX" -wh best
