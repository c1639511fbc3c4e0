#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Microbench: Pallas packed-conv candidates vs the XLA conv at the GAN
step's copy-wall shape — the hw-packed level-0 conv3x3
([B,128,128,64] x [3,3,64,64] -> [B,128,128,64], bf16).

Round-3 profile (tools/xprof_categories.py on the 82ms uganConsis step):
23.2 ms/step of layout copies, dominated by ~74 C-minor<->W-minor flips of
exactly these tensors around the level-0 convs.  XLA's conv emitter demands
W-minor inputs and produces C-minor outputs; a Pallas kernel anchors ONE
layout and controls the matmul shape.

Candidates:
  xla    — jax.lax.conv_general_dilated on the packed kernel (current v1)
  dots   — Pallas: 9 accumulated [H*W,Cin]@[Cin,Cout] tap matmuls
  im2col — Pallas: H-strips, [rows*W, 9*Cin] @ [9*Cin, Cout] single dot

Timing: lax.scan chain of N applications (pure device time, the honest
protocol from BASELINE.md).

Usage: python tools/microbench_pallas_conv.py [batch] [iters]
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------------ kernels
def _interp() -> bool:
    return jax.default_backend() == "cpu"


def _dots_kernel(strip, x_ref, w_ref, y_ref):
    """One image per grid step, static H-strip loop: per strip, 9
    accumulated MXU dots of [strip*W, C] @ [C, Cout] over shifted views of
    one padded VMEM copy (bounded working set; Mosaic has no
    dynamic_slice, so the strip loop is unrolled)."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = w_ref.shape[3]
    xp = jnp.pad(x_ref[0], ((1, 1), (1, 1), (0, 0)))   # [H+2, W+2, C]
    for r0 in range(0, h, strip):
        acc = jnp.zeros((strip * w, cout), jnp.float32)
        for u in range(3):
            for v in range(3):
                xs = xp[r0 + u: r0 + u + strip, v: v + w, :]
                acc = acc + jnp.dot(xs.reshape(strip * w, c), w_ref[u, v],
                                    preferred_element_type=jnp.float32)
        y_ref[0, r0: r0 + strip] = acc.reshape(strip, w, cout).astype(
            y_ref.dtype)


def pallas_conv_dots(x: jax.Array, wp: jax.Array, strip: int = 16) -> jax.Array:
    b, h, w, c = x.shape
    cout = wp.shape[3]
    return pl.pallas_call(
        functools.partial(_dots_kernel, strip),
        interpret=_interp(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
    )(x, wp)


def _im2col_kernel(strip, x_ref, w_ref, y_ref, col_ref):
    """One image, static H-strips: [strip*W, 9C] im2col in VMEM, one dot."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = w_ref.shape[1]
    xp = jnp.pad(x_ref[0], ((1, 1), (1, 1), (0, 0)))   # once per image
    for r0 in range(0, h, strip):
        for u in range(3):
            for v in range(3):
                xs = xp[r0 + u: r0 + u + strip, v: v + w, :]
                col_ref[:, (u * 3 + v) * c:(u * 3 + v + 1) * c] = (
                    xs.reshape(strip * w, c))
        y = jnp.dot(col_ref[:], w_ref[:],
                    preferred_element_type=jnp.float32)
        y_ref[0, r0: r0 + strip] = y.reshape(strip, w, cout).astype(
            y_ref.dtype)


def pallas_conv_im2col(x: jax.Array, wp: jax.Array, strip: int = 16) -> jax.Array:
    b, h, w, c = x.shape
    cout = wp.shape[3]
    wf = wp.reshape(9 * c, cout)
    return pl.pallas_call(
        functools.partial(_im2col_kernel, strip),
        interpret=_interp(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((strip * w, 9 * c), x.dtype)],
    )(x, wf)


def _im2col2_kernel(strip, x_ref, w_ref, y_ref, col0, col1):
    """im2col with TWO alternating col buffers: strip s+1's col build has no
    dependence on strip s's dot, so the VPU copies can overlap the MXU."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = w_ref.shape[1]
    xp = jnp.pad(x_ref[0], ((1, 1), (1, 1), (0, 0)))
    cols = (col0, col1)
    for s, r0 in enumerate(range(0, h, strip)):
        col = cols[s % 2]
        for u in range(3):
            for v in range(3):
                xs = xp[r0 + u: r0 + u + strip, v: v + w, :]
                col[:, (u * 3 + v) * c:(u * 3 + v + 1) * c] = (
                    xs.reshape(strip * w, c))
        y = jnp.dot(col[:], w_ref[:], preferred_element_type=jnp.float32)
        y_ref[0, r0: r0 + strip] = y.reshape(strip, w, cout).astype(
            y_ref.dtype)


def pallas_conv_im2col2(x: jax.Array, wp: jax.Array,
                        strip: int = 16) -> jax.Array:
    b, h, w, c = x.shape
    cout = wp.shape[3]
    wf = wp.reshape(9 * c, cout)
    return pl.pallas_call(
        functools.partial(_im2col2_kernel, strip),
        interpret=_interp(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((strip * w, 9 * c), x.dtype),
                        pltpu.VMEM((strip * w, 9 * c), x.dtype)],
    )(x, wf)


def xla_conv(x: jax.Array, wp: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, wp, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ------------------------------------------------------------------ harness
def time_chain(fn, x, wp, iters):
    @jax.jit
    def chain(x0):
        def step(xx, _):
            y = fn(xx, wp)
            # keep shapes fixed and force dependence
            return y, ()
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.sum(y.astype(jnp.float32))

    r = chain(x)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = chain(x)
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    h = w = 128
    c = cout = 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16) * 0.1
    wp = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, cout),
                           jnp.bfloat16) * 0.05

    ref = np.asarray(xla_conv(x, wp).astype(jnp.float32))
    flops = 2 * b * h * w * 9 * c * cout
    for name, fn in [("xla", xla_conv),
                     ("dots", pallas_conv_dots),
                     ("im2col", pallas_conv_im2col),
                     ("im2col2", pallas_conv_im2col2),
                     ("im2col2_32", lambda a, b: pallas_conv_im2col2(a, b, 32)),
                     ("im2col_32", lambda a, b: pallas_conv_im2col(a, b, 32))]:
        try:
            out = np.asarray(fn(x, wp).astype(jnp.float32))
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            sec = time_chain(fn, x, wp, iters)
            print(f"{name:8s} {sec*1e6:9.1f} us  {flops/sec/1e12:6.1f} TF/s"
                  f"  rel_err={err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
