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
def _pick_strip(h: int, w: int, c: int) -> int:
    """Largest H-strip whose im2col buffer stays ~2.5 MB (VMEM budget:
    2x in + 2x out pipeline blocks + padded copy + col)."""
    for strip in (32, 16, 8, 4, 2, 1):
        if strip <= h and h % strip == 0 and strip * w * 9 * c * 2 <= 2_600_000:
            return strip
    return 1


def _fwd_kernel(strip, x_ref, w_ref, y_ref, col_ref):
    """One image per grid step, static H-strip loop: build a
    [strip*W, 9C] im2col block in VMEM from shifted views of one padded
    copy, then a single [strip*W, 9C] @ [9C, Cout] MXU dot per strip.
    (Mosaic has no dynamic_slice; the strip loop is unrolled.)"""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = w_ref.shape[1]
    xp = jnp.pad(x_ref[0], ((1, 1), (1, 1), (0, 0)))   # [H+2, W+2, C]
    for r0 in range(0, h, strip):
        for u in range(3):
            for v in range(3):
                xs = xp[r0 + u: r0 + u + strip, v: v + w, :]
                col_ref[:, (u * 3 + v) * c:(u * 3 + v + 1) * c] = (
                    xs.reshape(strip * w, c))
        y = jnp.dot(col_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        y_ref[0, r0: r0 + strip] = y.reshape(strip, w, cout).astype(
            y_ref.dtype)


def _conv_fwd(x: jax.Array, wp: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    k, _, _, cout = wp.shape
    assert k == 3, k
    strip = _pick_strip(h, w, c)
    wf = wp.reshape(9 * c, cout)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, strip),
        interpret=_interpret(),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * k * k * c * cout,
            bytes_accessed=(x.size + cout * b * h * w) * x.dtype.itemsize,
            transcendentals=0),
    )(x, wf)


# ------------------------------------------------------------------ dw
def _dw_kernel(strip, x_ref, g_ref, dw_ref, col_ref):
    """dw[(uv)ci, co] = sum_{b,i,j} col[b,(i,j),(uv)ci] * g[b,(i,j),co]:
    the same per-strip im2col block, contracted against the cotangent;
    grid over batch, accumulating into the (revisited) output block."""
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = g_ref.shape[3]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    xp = jnp.pad(x_ref[0], ((1, 1), (1, 1), (0, 0)))
    for r0 in range(0, h, strip):
        for u in range(3):
            for v in range(3):
                xs = xp[r0 + u: r0 + u + strip, v: v + w, :]
                col_ref[:, (u * 3 + v) * c:(u * 3 + v + 1) * c] = (
                    xs.reshape(strip * w, c))
        g = g_ref[0, r0: r0 + strip].reshape(strip * w, cout)
        dw_ref[:] += jax.lax.dot_general(
            col_ref[:], g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _conv_dw(x: jax.Array, g: jax.Array, k: int) -> jax.Array:
    b, h, w, c = x.shape
    cout = g.shape[3]
    assert k == 3, k
    strip = _pick_strip(h, w, c)
    dwf = pl.pallas_call(
        functools.partial(_dw_kernel, strip),
        interpret=_interpret(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((strip * w, 9 * c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * k * k * c * cout,
            bytes_accessed=(x.size + g.size) * x.dtype.itemsize,
            transcendentals=0),
    )(x, g)
    return dwf.reshape(3, 3, c, cout)


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
    """The Pallas path covers the packed hot shapes: k==3 SAME convs with
    channel counts that tile the MXU reasonably (>=64 in, lanes multiple
    of 8) and spatial extents that fit per-image VMEM blocks.  k==1 stays
    with XLA (a plain dot, already layout-flexible)."""
    if not _ENABLED or k != 3:
        return False
    b, h, w, c = x_shape
    if c < _MIN_LANES or c % 8 or w % 8:
        return False
    # pipeline blocks (2x in + 2x out) + padded copy + im2col strip,
    # against the raised 64MB vmem_limit_bytes (v5e VMEM > the 16MB
    # default scoped limit; headroom left for Mosaic stack temporaries)
    bytes_est = h * w * c * 2 * 5 + _pick_strip(h, w, c) * w * 9 * c * 2
    return bytes_est <= 40 * 1024 * 1024
