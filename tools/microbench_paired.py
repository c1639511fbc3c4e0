#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Microbenchmark: pairing the GAN twin towers' level-0 convs.

The uganConsis profile shows ~15 ms/step of C-minor<->W-minor layout copies
around the generators' level-0 packed convs ([16,128,128,64] — 64 lanes puts
the conv emitter on its narrow-channel W-minor path; BASELINE.md round 3).
Hypothesis: concatenating the two towers' activations ([16,128,128,128], full
lanes) and running ONE block-diagonal dense conv per twin-conv pair moves the
emitter onto the standard C-minor path — no flips — at the price of 2x the
executed MACs (the off-diagonal zeros).

This measures a conv+instnorm+lrelu chain (the in-situ producer/consumer
pattern that manifests the flips) three ways:
  twin    — two separate 64-channel convs per iteration (the current program)
  blockdiag — one 128-channel dense conv with a block-diagonal kernel
  grouped — one feature_group_count=2 conv (the zero-free grouped form)

Usage: python tools/microbench_paired.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def instnorm_lrelu(x):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = jnp.square(xf).mean(axis=(1, 2), keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    return jax.nn.leaky_relu(y.astype(x.dtype), negative_slope=1e-2)


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def timed(fn, x, iters):
    @jax.jit
    def run(x0):
        def body(c, _):
            y = fn(c)
            return y, jnp.float32(0)
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.float32(jnp.sum(c.astype(jnp.float32)))

    float(run(x))
    tic = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - tic) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    b, h, c = 16, 128, 64
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(b, h, h, c)), dtype=dt)
    xb = jnp.asarray(rng.normal(size=(b, h, h, c)), dtype=dt)
    wa = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, dtype=dt)
    wb = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, dtype=dt)

    # twin: both towers, separate convs (per-iteration work = one conv pair)
    def twin(xab):
        x1, x2 = xab[..., :c], xab[..., c:]
        y1 = instnorm_lrelu(conv(x1, wa))
        y2 = instnorm_lrelu(conv(x2, wb))
        return jnp.concatenate([y1, y2], axis=-1)

    xab = jnp.concatenate([xa, xb], axis=-1)

    # block-diagonal dense 128x128 kernel
    wbd = jnp.zeros((3, 3, 2 * c, 2 * c), dt)
    wbd = wbd.at[:, :, :c, :c].set(wa).at[:, :, c:, c:].set(wb)

    def blockdiag(xab):
        return instnorm_lrelu(conv(xab, wbd))

    wg = jnp.concatenate([wa, wb], axis=-1)   # [3,3,64,128] grouped

    def grouped(xab):
        return instnorm_lrelu(conv(xab, wg, groups=2))

    print(f"devices: {jax.devices()}  shape=[{b},{h},{h},{c}]x2  iters={iters}")
    pair_macs = 2 * (b * h * h * 9 * c * c)          # real model MACs per pair
    for tag, fn in [("twin", twin), ("blockdiag", blockdiag),
                    ("grouped", grouped)]:
        sec = timed(fn, xab, iters)
        exec_macs = pair_macs * (2 if tag == "blockdiag" else 1)
        print(f"{tag:10s} {sec * 1e3:8.3f} ms/pair   "
              f"model {2 * pair_macs / sec / 1e12:6.1f} TF/s   "
              f"exec {2 * exec_macs / sec / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
