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
def _dots_kernel(x_ref, w_ref, y_ref, acc_ref):
    """One image per grid step: pad-free shifted views via static slices of
    the [H, W, C] block; 9 accumulated MXU dots of [H*W, C] @ [C, Cout]."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = w_ref.shape[3]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    x = x_ref[0]                                   # [H, W, C]
    for u in range(3):
        for v in range(3):
            # y[i,j] += x[i+u-1, j+v-1] @ w[u,v]; emulate SAME padding by
            # zero-padding the shifted view (static slices, VPU)
            xs = jnp.pad(
                x[max(0, u - 1): h + min(0, u - 1),
                  max(0, v - 1): w + min(0, v - 1), :],
                ((1 - u if u < 1 else 0, u - 1 if u > 1 else 0),
                 (1 - v if v < 1 else 0, v - 1 if v > 1 else 0),
                 (0, 0)))
            acc_ref[:] += jnp.dot(xs.reshape(h * w, c), w_ref[u, v],
                                  preferred_element_type=jnp.float32)
    y_ref[0] = acc_ref[:].reshape(h, w, cout).astype(y_ref.dtype)


def _interp() -> bool:
    return jax.default_backend() == "cpu"


def pallas_conv_dots(x: jax.Array, wp: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    cout = wp.shape[3]
    return pl.pallas_call(
        _dots_kernel,
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
        scratch_shapes=[pltpu.VMEM((h * w, cout), jnp.float32)],
    )(x, wp)


def _im2col_kernel(x_ref, w_ref, y_ref, col_ref):
    """One image, H-strips: build [rows*W, 9C] im2col in VMEM, one dot."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = w_ref.shape[1]
    strip = col_ref.shape[0] // w
    xp = jnp.pad(x_ref[0], ((1, 1), (1, 1), (0, 0)))   # once per image
    n_strips = h // strip

    def body(s, carry):
        r0 = s * strip
        for u in range(3):
            for v in range(3):
                xs = jax.lax.dynamic_slice(
                    xp, (r0 + u, v, 0), (strip, w, c))
                col_ref[:, (u * 3 + v) * c:(u * 3 + v + 1) * c] = (
                    xs.reshape(strip * w, c))
        y = jnp.dot(col_ref[:], w_ref[:],
                    preferred_element_type=jnp.float32)
        y_ref[0, pl.ds(r0, strip)] = y.reshape(strip, w, cout).astype(
            y_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_strips, body, 0)


def pallas_conv_im2col(x: jax.Array, wp: jax.Array, strip: int = 32) -> jax.Array:
    b, h, w, c = x.shape
    cout = wp.shape[3]
    wf = wp.reshape(9 * c, cout)
    return pl.pallas_call(
        _im2col_kernel,
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
                     ("im2col", pallas_conv_im2col)]:
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
