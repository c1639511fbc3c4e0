# -*- coding: utf-8 -*-
"""Tower-paired level-0 execution for the UGAN twin towers.

Why: the uganConsis profile (BASELINE.md round 3) shows ~15 ms/step of
C-minor<->W-minor layout copies around the generators' level-0 packed convs.
At [B,128,128,64] (4*base_width lanes) the TPU conv emitter takes its
narrow-channel W-minor path, and every producer/consumer boundary pays a
layout flip.  The twin towers (`ugan.py` tsl_encoder / seg_encoder — same
shapes, different parameters) run their level-0 stacks at the same program
points, so each twin-conv pair can execute as ONE dense conv over the
channel-concatenated activations with a block-diagonal kernel:

    [B,128,128,128] x [3,3,128,128]   (full lanes -> standard conv path)

This doubles the executed MACs (the off-diagonal zeros) but removes the
flips; measured on the dev chip the paired form is ~28% faster per twin pair
(tools/microbench_paired.py: 1.415 vs 1.954 ms, 54.6 TF/s executed).  The
math is exact: the extra products are against structural zeros, and the MXU
accumulates bf16 products in f32, so adding them changes nothing
(tests/test_paired.py: paired == unpaired forward AND gradients).

The reference has no analogue (torch CUDA runs each tower's convs natively —
`/root/reference/network/ugan.py:86-123`); this is a TPU-layout optimization
with identical numerics, selected by ``Config.pair_towers``.

Channel layout of a paired tensor: ``concat([tower_A, tower_B], axis=-1)``
where each tower block keeps the packed ``s*C + c`` layout of
models/packed.py.
"""
from __future__ import annotations

import os as _os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from smsut_tpu.models.layers import get_act
from smsut_tpu.models.packed import pack_kernel

Dtype = Any

# Weight-gradient lowering for the paired conv: "dense" (default) is plain
# autodiff through the block-diagonal kernel.  "block" computes the two
# diagonal dw blocks directly via a custom VJP — half the dw MACs, since
# the dense [k,k,2C,2C'] dw's off-diagonal half is discarded by
# blockdiag2's VJP — but it MEASURED SLOWER end-to-end (uganConsis
# 74.5 -> 83.6, ugan 36.5 -> 41.0 ms/step): the per-block dw convs'
# lane-sliced operands reintroduce the layout copies pairing exists to
# avoid, the same verdict as every reduced-zero lowering (BASELINE.md).
# Kept as a tested alternative (tests/test_paired.py
# ::test_blockdw_matches_dense_dw; f64 end-to-end equivalence passes under
# either).
DW_IMPL = _os.environ.get("SMSUT_PAIRED_DW", "dense")


def blockdiag2(wa: jax.Array, wb: jax.Array) -> jax.Array:
    """[k,k,ia,oa] + [k,k,ib,ob] -> [k,k,ia+ib,oa+ob] block-diagonal."""
    k = wa.shape[0]
    assert wb.shape[:2] == (k, k), (wa.shape, wb.shape)
    ia, oa = wa.shape[2], wa.shape[3]
    ib, ob = wb.shape[2], wb.shape[3]
    top = jnp.concatenate([wa, jnp.zeros((k, k, ia, ob), wa.dtype)], axis=3)
    bot = jnp.concatenate([jnp.zeros((k, k, ib, oa), wb.dtype), wb], axis=3)
    return jnp.concatenate([top, bot], axis=2)


def _bd_conv(x: jax.Array, wp: jax.Array) -> jax.Array:
    kp = wp.shape[0]
    pad = [(kp // 2, kp // 2)] * 2 if kp > 1 else [(0, 0)] * 2
    return jax.lax.conv_general_dilated(
        x, wp, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def _paired_conv_blockdw(x: jax.Array, wpa: jax.Array,
                         wpb: jax.Array) -> jax.Array:
    return _bd_conv(x, blockdiag2(wpa, wpb))


def _pcb_fwd(x, wpa, wpb):
    return _paired_conv_blockdw(x, wpa, wpb), (x, wpa, wpb)


def _pcb_bwd(res, dout):
    x, wpa, wpb = res
    ca, oa = wpa.shape[2], wpa.shape[3]
    # dx keeps the dense block-diagonal transposed conv — full lanes, the
    # zero-MAC trade that makes pairing win (same program autodiff emits).
    _, vjp_x = jax.vjp(lambda x_: _bd_conv(x_, blockdiag2(wpa, wpb)), x)
    dx, = vjp_x(dout)
    # dw per diagonal block: conv(x_A, dout_A) / conv(x_B, dout_B) — the
    # exact operands and shapes of the UNPAIRED towers' dw convs (the 128-
    # boundary lane slices are tile-aligned).  Halves dw MACs vs the dense
    # [k,k,2C,2C'] dw whose off-diagonal half blockdiag2's VJP discards.
    _, vjp_wa = jax.vjp(lambda w_: _bd_conv(x[..., :ca], w_), wpa)
    dwa, = vjp_wa(dout[..., :oa])
    _, vjp_wb = jax.vjp(lambda w_: _bd_conv(x[..., ca:], w_), wpb)
    dwb, = vjp_wb(dout[..., oa:])
    return dx, dwa, dwb


_paired_conv_blockdw.defvjp(_pcb_fwd, _pcb_bwd)


def paired_conv(x: jax.Array, wa: jax.Array, wb: jax.Array,
                segs_a: Sequence[int], segs_b: Sequence[int],
                dtype: Dtype, dw: Optional[str] = None) -> jax.Array:
    """One dense conv == tower A's packed conv on x[..., :4*sum(segs_a)]
    stacked with tower B's on the rest.  ``wa``/``wb`` are the ORIGINAL
    [k,k,Cin,Cout] parameters (packed on the fly, like PackedConv).
    ``dw`` selects the weight-gradient lowering (default: SMSUT_PAIRED_DW
    env, "dense")."""
    wpa = pack_kernel(wa, tuple(segs_a)).astype(dtype)
    wpb = pack_kernel(wb, tuple(segs_b)).astype(dtype)
    x = x.astype(dtype)
    if (dw or DW_IMPL) == "block":
        return _paired_conv_blockdw(x, wpa, wpb)
    return _bd_conv(x, blockdiag2(wpa, wpb))


NormP = Tuple[jax.Array, jax.Array]          # (scale, bias), each [C] f32


def paired_norm_act(x: jax.Array, na: NormP, nb: NormP, c: int,
                    act_type: Optional[str], dtype: Dtype) -> jax.Array:
    """PackedNormAct over a paired tensor: per-tower, per-original-channel
    instance statistics (reduce over H', W' and the 4 subpixels), one fused
    normalize over the full 8C lanes."""
    b, h, w, pc = x.shape
    assert pc == 8 * c, (x.shape, c)
    from smsut_tpu.models.layers import spatial_sums, stats_cast

    xf = stats_cast(x)
    t1, t2 = spatial_sums(xf)                                   # [B, 8C]
    s1 = t1.reshape(b, 2, 4, c).sum(axis=2)                     # [B, 2, C]
    s2 = t2.reshape(b, 2, 4, c).sum(axis=2)
    n = h * w * 4
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + 1e-5)
    scale = jnp.stack([na[0], nb[0]])[None]                     # [1, 2, C]
    bias = jnp.stack([na[1], nb[1]])[None]
    g = rstd * scale
    b_ = bias - mean * g
    # [B,2,C] -> [B,8C] matching [tower][s*C+c]
    g8 = jnp.tile(g[:, :, None, :], (1, 1, 4, 1)).reshape(b, 8 * c)
    b8 = jnp.tile(b_[:, :, None, :], (1, 1, 4, 1)).reshape(b, 8 * c)
    y = (xf * g8[:, None, None, :] + b8[:, None, None, :]).astype(dtype)
    return get_act(act_type)(y) if act_type else y


def paired_block(x: jax.Array, pa: dict, pb: dict,
                 in_segments: Sequence[int], features: int,
                 act_type: str, dtype: Dtype) -> jax.Array:
    """PackedBasicBlock on a paired tensor (`models/packed.py
    PackedBasicBlock`, twin parameters ``pa``/``pb`` from
    ``_BlockParams.params()``)."""
    act = get_act(act_type)
    f = features
    identity = x
    y = paired_conv(x, pa["conv1"], pb["conv1"], in_segments, in_segments,
                    dtype)
    y = paired_norm_act(y, pa["bn1"], pb["bn1"], f, act_type, dtype)
    y = paired_conv(y, pa["conv2"], pb["conv2"], (f,), (f,), dtype)
    y = paired_norm_act(y, pa["bn2"], pb["bn2"], f, None, dtype)
    if sum(in_segments) != f:
        identity = paired_conv(identity, pa["shortcut1"], pb["shortcut1"],
                               in_segments, in_segments, dtype)
        identity = paired_norm_act(identity, pa["shortcut2"], pb["shortcut2"],
                                   f, None, dtype)
    return act(y + identity)


def split2(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Undo the tower concat: [..., 8C] -> two [..., 4C] halves."""
    h = x.shape[-1] // 2
    return x[..., :h], x[..., h:]
