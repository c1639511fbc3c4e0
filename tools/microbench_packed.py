#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Microbenchmark of the packed-conv lowerings at the model's hot shapes.

Timing per the honest protocol (CLAUDE.md): a lax.scan chain of the op in
ONE jit, clocked by fetching a scalar reduction of the result — no
per-dispatch timing through the tunnel.

Usage: python tools/microbench_packed.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from smsut_tpu.models import packed as pk


def timed_scan(fn, args, iters=50):
    """Chain iters applications; returns seconds/appl."""
    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(c, *args[1:])
            # keep the chain honest: feed a value-dependent input back
            return c + 1e-6 * jnp.sum(y) / y.size, jnp.float32(0)
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c)

    x = args[0]
    float(run(x))                       # compile + warm
    tic = time.perf_counter()
    float(run(x))
    t1 = time.perf_counter() - tic
    return t1 / iters


def bench_conv(tag, b, h, c_in_packed, cout, k, impl, segments=None,
               dtype=jnp.bfloat16, iters=50):
    segments = segments or (c_in_packed // 4,)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, h, c_in_packed)).astype(np.float32),
                    dtype=dtype)
    w = jnp.asarray(rng.normal(size=(k, k, sum(segments), cout))
                    .astype(np.float32))
    old = pk.CONV_IMPL
    pk.CONV_IMPL = impl
    try:
        sec = timed_scan(lambda xx: pk.packed_conv_apply(xx, w, segments,
                                                         dtype), (x,),
                         iters)
    finally:
        pk.CONV_IMPL = old
    macs = {
        "v1": (9 if k == 3 else (1 if k == 1 else 9)) * 4,
        "v2": (4 if k == 3 else (1 if k == 1 else 9 * 4)),
        "v2k3": (4 if k == 3 else (4 if k == 1 else 9 * 4)),
    }
    print(f"{tag:34s} impl={impl:5s} {sec*1e6:9.1f} us")
    return sec


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    # level-0 hot conv (BasicBlock conv2 at 256^2 packed): [8,128,128,64]
    for impl in ("v1", "v2"):
        bench_conv("L0 conv3x3 64->4x16 @128^2", 8, 128, 64, 16, 3, impl,
                   iters=iters)
    # level-1 (pack_levels=2): [8,64,64,128] -> 4x32
    for impl in ("v1", "v2"):
        bench_conv("L1 conv3x3 128->4x32 @64^2", 8, 64, 128, 32, 3, impl,
                   iters=iters)
    # 1x1 shortcut at level 0: 64 -> 4x16
    for impl in ("v1", "v2"):
        bench_conv("L0 conv1x1 64->4x16 @128^2", 8, 128, 64, 16, 1, impl,
                   iters=iters)
    # decoder concat input (two segments) level 1
    for impl in ("v1", "v2"):
        bench_conv("L1 conv3x3 (32,32)->4x32 @64^2", 8, 64, 256, 32, 3, impl,
                   segments=(32, 32), iters=iters)


if __name__ == "__main__":
    try:
        from smsut_tpu.train.cli import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    main()
