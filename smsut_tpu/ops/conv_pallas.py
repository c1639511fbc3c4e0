# -*- coding: utf-8 -*-
"""Pallas TPU kernel for the hw-packed SAME conv (models/packed.py).

Why this exists: profiling the uganConsis step (BASELINE.md round 3) shows
XLA's conv emitter at the packed level-0 shape ([B,128,128,64] bf16,
kernel [3,3,64,64]) demanding W-minor inputs while producing C-minor
outputs — every conv is bracketed by a layout-flip copy, 23 ms/step of
pure data movement at 82 ms/step total.  A Pallas kernel anchors ONE
layout (the default C-minor) and performs the conv as MXU matmuls over
shifted views staged in VMEM, so the flips around the conv disappear.

Math: identical to ``jax.lax.conv_general_dilated(x, wp, (1,1), SAME)``
term for term — y[b,i,j,co] = sum_{u,v,ci} x[b,i+u-1,j+v-1,ci]*wp[u,v,ci,co]
with zero padding — for odd-k (k<=3 packed window) NHWC convs.  Forward
and both backward passes (dx as the transposed-kernel conv, dw as the
batch-accumulated correlation) are Pallas kernels; custom_vjp wires them
up so the packed models can run the hot convs through this path
unchanged (reference conv semantics: /root/reference/network/blocks.py:53-80).

Validated against the XLA conv in tests/test_conv_pallas.py (forward and
gradients, interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dtype = Any


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ------------------------------------------------------------------ forward
def _fwd_kernel(x_ref, w_ref, y_ref):
    """One image per grid step: 9 accumulated [H*W,Cin]@[Cin,Cout] MXU dots
    over statically shifted (SAME zero-padded) views of the VMEM block."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = w_ref.shape[3]
    k = w_ref.shape[0]
    pad = k // 2
    x = x_ref[0]
    acc = jnp.zeros((h * w, cout), jnp.float32)
    for u in range(k):
        for v in range(k):
            du, dv = u - pad, v - pad
            xs = jnp.pad(
                x[max(0, du): h + min(0, du),
                  max(0, dv): w + min(0, dv), :],
                ((max(0, -du), max(0, du)),
                 (max(0, -dv), max(0, dv)), (0, 0)))
            acc = acc + jnp.dot(xs.reshape(h * w, c), w_ref[u, v],
                                preferred_element_type=jnp.float32)
    y_ref[0] = acc.reshape(h, w, cout).astype(y_ref.dtype)


def _conv_fwd(x: jax.Array, wp: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    k, _, _, cout = wp.shape
    return pl.pallas_call(
        _fwd_kernel,
        interpret=_interpret(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, c, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * k * k * c * cout,
            bytes_accessed=(x.size + cout * b * h * w) * x.dtype.itemsize,
            transcendentals=0),
    )(x, wp)


# ------------------------------------------------------------------ dw
def _dw_kernel(x_ref, g_ref, dw_ref):
    """dw[u,v,ci,co] = sum_{b,i,j} x[b,i+u-1,j+v-1,ci] * g[b,i,j,co];
    grid over batch, accumulating into the (revisited) output block."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = g_ref.shape[3]
    k = dw_ref.shape[0]
    pad = k // 2
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    x = x_ref[0]
    g = g_ref[0].reshape(h * w, cout)
    for u in range(k):
        for v in range(k):
            du, dv = u - pad, v - pad
            xs = jnp.pad(
                x[max(0, du): h + min(0, du),
                  max(0, dv): w + min(0, dv), :],
                ((max(0, -du), max(0, du)),
                 (max(0, -dv), max(0, dv)), (0, 0)))
            dw_ref[u, v] += jax.lax.dot_general(
                xs.reshape(h * w, c), g,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _conv_dw(x: jax.Array, g: jax.Array, k: int) -> jax.Array:
    b, h, w, c = x.shape
    cout = g.shape[3]
    return pl.pallas_call(
        _dw_kernel,
        interpret=_interpret(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, k, c, cout), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, k, c, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * k * k * c * cout,
            bytes_accessed=(x.size + g.size) * x.dtype.itemsize,
            transcendentals=0),
    )(x, g)


# ------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv_same_pallas(x: jax.Array, wp: jax.Array) -> jax.Array:
    """NHWC SAME conv with odd square kernel, Pallas TPU lowering.

    Drop-in for ``lax.conv_general_dilated(x, wp, (1,1), SAME, NHWC/HWIO)``.
    """
    return _conv_fwd(x, wp)


def _vjp_fwd(x, wp):
    return _conv_fwd(x, wp), (x, wp)


def _vjp_bwd(res, g):
    x, wp = res
    # dx: SAME conv of g with the spatially flipped, IO-transposed kernel
    wt = jnp.flip(wp, (0, 1)).transpose(0, 1, 3, 2)
    dx = _conv_fwd(g, wt.astype(g.dtype)).astype(x.dtype)
    dw = _conv_dw(x, g, wp.shape[0]).astype(wp.dtype)
    return dx, dw


conv_same_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------------- trace-time switch
_ENABLED = False
_MIN_LANES = 64


def set_conv_pallas(enabled: bool) -> None:
    """Armed by train/steps/setup_compute from Config.conv_pallas."""
    global _ENABLED
    _ENABLED = bool(enabled)


def enabled_for(x_shape, k: int) -> bool:
    """The Pallas path covers the packed hot shapes: odd k<=3, channel
    counts that tile the MXU reasonably (>=64 in, lanes multiple of 8),
    spatial extents that fit a per-image VMEM block."""
    if not _ENABLED or k % 2 == 0 or k > 3:
        return False
    b, h, w, c = x_shape
    if c < _MIN_LANES or c % 8 or w % 8:
        return False
    # per-image working set: x block + f32 acc + y block (<= ~12 MB)
    bytes_est = h * w * (c * 2 * 2 + c * 4 + c * 2)
    return bytes_est <= 12 * 1024 * 1024
