#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Microbenchmark: W-only packing vs the 2x2 space-to-depth packing.

Times a realistic level-0 slice of the UGAN encoder — conv/norm/lrelu x2 +
residual + 2x2/2 pool transition + the first level-1 conv — FORWARD AND
BACKWARD, at the GAN step's hot shape ([16,256,256,16] unpacked).  The 2x2
scheme profiles ~15 ms/step of 6-D transpose copies + narrow-transition
reduce-windows in the full GAN (BASELINE.md round 3); the W-only scheme
makes every transition a free reshape.  Variants:

  hw2  — current models/packed.py 2x2 space-to-depth (pack_levels path)
  w4   — W-pack p=4 (same executed FLOPs as hw2, 64 lanes at C=16)
  w8   — W-pack p=8 at level 0 (2x executed conv FLOPs, full 128 lanes),
         p=4 at level 1 (the pool emits it for free)

Timing per the honest protocol (CLAUDE.md): a lax.scan chain of the whole
fwd+bwd in ONE jit, clocked on a scalar fetch.

Usage: python tools/microbench_wpack.py [iters] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from smsut_tpu.models import packed as pk
from smsut_tpu.models import packed_w as pw

C0, C1 = 16, 32
DT = jnp.bfloat16


def lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=1e-2)


def norm_affine(x, s1, s2, n, scale, bias, tile):
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + 1e-5)
    g = tile(rstd * scale)[:, None, None, :]
    b_ = tile(bias - mean * rstd * scale)[:, None, None, :]
    return (x.astype(jnp.float32) * g + b_).astype(x.dtype)


def make_params(rng):
    return {
        "w1": jnp.asarray(rng.normal(size=(3, 3, C0, C0), scale=0.1), jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(3, 3, C0, C0), scale=0.1), jnp.float32),
        "w3": jnp.asarray(rng.normal(size=(3, 3, C0, C1), scale=0.1), jnp.float32),
        "s1": jnp.ones((C0,)), "b1": jnp.zeros((C0,)),
        "s2": jnp.ones((C0,)), "b2": jnp.zeros((C0,)),
        "s3": jnp.ones((C1,)), "b3": jnp.zeros((C1,)),
    }


# ------------------------------------------------------------- variants
def fwd_hw2(x, pr):
    """x: [B,H/2,W/2,4*C0] (2x2-packed level 0)."""
    def norm(y, c, scale, bias):
        b, h, w, _ = y.shape
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(1, 2)).reshape(b, 4, c).sum(axis=1)
        s2 = jnp.sum(jnp.square(yf), axis=(1, 2)).reshape(b, 4, c).sum(axis=1)
        return norm_affine(y, s1, s2, h * w * 4, scale, bias,
                           lambda v: pk._tile_c(v))

    y = pk.packed_conv_apply(x, pr["w1"], (C0,), DT)
    y = lrelu(norm(y, C0, pr["s1"], pr["b1"]))
    y = pk.packed_conv_apply(y, pr["w2"], (C0,), DT)
    y = lrelu(norm(y, C0, pr["s2"], pr["b2"]) + x.astype(DT))
    y = pk.pool_to_next_level(y, C0, last=False)     # s2d transition
    y = pk.packed_conv_apply(y, pr["w3"], (C0,), DT)
    return lrelu(norm(y, C1, pr["s3"], pr["b3"]))


def make_fwd_w(p0):
    p1 = p0 // 2 if p0 == 8 else p0   # w8: pool emits p=4 free; w4: regroup

    def fwd(x, pr):
        """x: [B,H,W/p0,p0*C0] (W-packed level 0)."""
        def norm(y, p, c, scale, bias):
            s1, s2, n = pw.norm_stats_w(y, p, c)
            return norm_affine(y, s1, s2, n, scale, bias,
                               lambda v: pw.tile_c_w(v, p))

        y = pw.conv_w(x, pr["w1"], p0, (C0,), DT)
        y = lrelu(norm(y, p0, C0, pr["s1"], pr["b1"]))
        y = pw.conv_w(y, pr["w2"], p0, (C0,), DT)
        y = lrelu(norm(y, p0, C0, pr["s2"], pr["b2"]) + x.astype(DT))
        y = pw.pool_w(y, p0, C0, p1)                 # free-reshape transition
        y = pw.conv_w(y, pr["w3"], p1, (C0,), DT)
        return lrelu(norm(y, p1, C1, pr["s3"], pr["b3"]))

    return fwd


def timed_grad_scan(fwd, x, pr, iters):
    def loss(xx, pp):
        y = fwd(xx, pp)
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    @jax.jit
    def run(x, pr):
        def body(c, _):
            xx, pp = c
            l, (gx, gp) = jax.value_and_grad(loss, argnums=(0, 1))(xx, pp)
            # value-dependent feedback keeps the chain honest
            xx = xx + (1e-12 * l).astype(xx.dtype) * gx.astype(xx.dtype)
            return (xx, pp), jnp.float32(0)

        (xx, _), _ = jax.lax.scan(body, (x, pr), None, length=iters)
        return jnp.sum(xx.astype(jnp.float32))

    float(run(x, pr))                  # compile + warm
    tic = time.perf_counter()
    float(run(x, pr))
    return (time.perf_counter() - tic) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    pr = make_params(rng)
    x_unpacked = jnp.asarray(rng.normal(size=(batch, 256, 256, C0), scale=1.0),
                             jnp.float32).astype(DT)

    # correctness cross-check first (packed reps == same function)
    y_ref = None
    rows = []
    for tag, fwd, x in [
        ("hw2", fwd_hw2, pk.space_to_depth(x_unpacked)),
        ("w4", make_fwd_w(4), pw.pack_w(x_unpacked, 4)),
        ("w8", make_fwd_w(8), pw.pack_w(x_unpacked, 8)),
    ]:
        y = jax.jit(fwd)(x, pr)
        if tag == "hw2":
            y_ref = pk.depth_to_space(np.asarray(y.astype(jnp.float32)), C1)
        else:
            p_out = 4
            got = np.asarray(pw.unpack_w(y.astype(jnp.float32), p_out))
            err = np.max(np.abs(got - y_ref))
            assert err < 0.1, (tag, err)   # bf16 tolerance
        sec = timed_grad_scan(fwd, x, pr, iters)
        rows.append((tag, sec))
        print(f"{tag:4s} fwd+bwd {sec*1e3:8.3f} ms/iter")
    base = rows[0][1]
    for tag, sec in rows[1:]:
        print(f"{tag:4s} vs hw2: {base/sec:5.2f}x")


if __name__ == "__main__":
    try:
        from smsut_tpu.train.cli import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    main()
