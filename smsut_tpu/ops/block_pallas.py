# -*- coding: utf-8 -*-
"""Fused Pallas TPU kernel for a whole packed BasicBlock level.

The round-3 copy-wall analysis (BASELINE.md) rejected a conv-ONLY Pallas
kernel: its C-minor im2col dot [strip*W, 9C] @ [9C, 64] fills only half the
MXU lanes (measured 19.6 TF/s vs XLA's 47 TF/s in-situ).  The round-4
scoping microbench overturns that at 128-lane shapes: the SAME dot with
Cout=128 ([2048,1152]@[1152,128]) runs at ~98 TF/s — double XLA's in-situ
rate.  128 packed channels is exactly the hot regime: every model's packed
level-1 block (4x32 lanes at base_width 16) and the GAN family's
tower-paired level-0 (2x64).

This module fuses the ENTIRE BasicBlock chain
(`/root/reference/network/blocks.py:53-80`, packed form
`models/packed.py:508-536`) into one `pallas_call` per direction:

    y1 = conv3x3(x, wp1); z1 = lrelu(instnorm(y1))
    y2 = conv3x3(z1, wp2); n2 = instnorm(y2)
    idn = x                      (Cin == Cout)
        | instnorm(conv1x1(x))   (channel change)
    out = lrelu(n2 + idn)

with every intermediate VMEM-resident: no layout flips between ops, no HBM
round-trips for y1/y2, and the instance-norm statistics ride along in f32
accumulators during the conv strip loops.  Packed-norm semantics preserved:
statistics per ORIGINAL channel pool the 4 subpixel lane groups (s*C + c).

The backward is a second fused kernel (same im2col machinery: transposed-
kernel convs for dx, strip-accumulated correlations for dw, two-pass
group-norm backward), wired by custom_vjp; the forward saves z1 and the
pre-activation sum as residuals (the lrelu masks need only signs, and
sign(z1) == sign(preact1) since the slope is positive).

Equivalence: tests/test_block_pallas.py (interpret mode, fwd + grads vs the
unfused packed chain).  Armed by ``Config.block_pallas`` via
models/packed.py `PackedBasicBlock`.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dtype = Any

_EPS = 1e-5
_SLOPE = 0.01


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick_strip(h: int, w: int, c9: int, budget: int = 2_600_000) -> int:
    for strip in (32, 16, 8, 4, 2, 1):
        if strip <= h and h % strip == 0 and strip * w * c9 * 2 <= budget:
            return strip
    return 1


def _im2col(xp_ref, col_ref, r0, strip, w, c):
    """Fill col_ref[:strip*w, :9c] from the padded image ref [H+2,W+2,c]."""
    for u in range(3):
        for v in range(3):
            xs = xp_ref[r0 + u: r0 + u + strip, v: v + w, :]
            col_ref[: strip * w, (u * 3 + v) * c:(u * 3 + v + 1) * c] = (
                xs.reshape(strip * w, c))


def _group_affine(s1, s2, scale, bias, n, co):
    """Packed instance-norm affine from accumulated per-lane sums.

    s1/s2: [1, 4C] f32 sums and square-sums.  Statistics pool the 4
    subpixel groups per ORIGINAL channel (lane slices — Mosaic cannot
    reshape lanes to sublanes); returns per-lane (g, b) [1, 4C] with
    g[:, s*C+c] = scale[c]*rstd[c], b = bias - mean*g."""
    c = co // 4
    g1 = (s1[:, 0 * c:1 * c] + s1[:, 1 * c:2 * c]
          + s1[:, 2 * c:3 * c] + s1[:, 3 * c:4 * c])           # [1, C]
    g2 = (s2[:, 0 * c:1 * c] + s2[:, 1 * c:2 * c]
          + s2[:, 2 * c:3 * c] + s2[:, 3 * c:4 * c])
    mean = g1 / n
    var = g2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + _EPS)
    g = scale * rstd                                           # [1, C]
    b = bias - mean * g
    g4 = jnp.concatenate([g] * 4, axis=1)                      # [1, 4C]
    b4 = jnp.concatenate([b] * 4, axis=1)
    return g4, b4


def _lrelu(x):
    return jnp.where(x > 0, x, _SLOPE * x)


# ------------------------------------------------------------------ forward
def _fwd_kernel(H, W, Ci, Co, has_short, strip,
                x_ref, w1_ref, sc1_ref, bi1_ref, w2_ref, sc2_ref, bi2_ref,
                ws_ref, scs_ref, bis_ref,
                out_ref, z1_ref, pre_ref,
                xp_ref, zp_ref, y2_ref, col_ref, s1_ref, s2_ref):
    """One image per grid step.  Scratch: xp/zp padded [H+2,W+2,*], y2
    [H,W,Co], col im2col strip, s1/s2 [1, >=Co] f32 stat accumulators."""
    n = jnp.float32(H * W * 4)
    z32 = jnp.zeros((1, s1_ref.shape[1]), jnp.float32)

    # ---- pad x once (borders zero; scratch W dim is padded to W+8 so
    # every dim-1 slice shape stays 8-aligned for Mosaic)
    xp_ref[:] = jnp.zeros(xp_ref.shape, xp_ref.dtype)
    xp_ref[1:H + 1, 1:W + 1, :] = x_ref[0]

    # ---- conv1 + stats: y1 goes into zp's interior (pre-norm for now)
    s1_ref[:] = z32
    s2_ref[:] = z32
    zp_ref[:] = jnp.zeros(zp_ref.shape, zp_ref.dtype)
    for r0 in range(0, H, strip):
        _im2col(xp_ref, col_ref, r0, strip, W, Ci)
        y = jnp.dot(col_ref[: strip * W, :9 * Ci], w1_ref[:],
                    preferred_element_type=jnp.float32)
        s1_ref[0, :Co] += y.sum(axis=0)
        s2_ref[0, :Co] += jnp.square(y).sum(axis=0)
        zp_ref[1 + r0: 1 + r0 + strip, 1:W + 1, :] = (
            y.reshape(strip, W, Co).astype(zp_ref.dtype))

    g1, b1 = _group_affine(s1_ref[:, :Co], s2_ref[:, :Co],
                           sc1_ref[:], bi1_ref[:], n, Co)

    # ---- normalize + lrelu in place (borders stay zero), save z1
    for r0 in range(0, H, strip):
        z = _lrelu(zp_ref[1 + r0: 1 + r0 + strip, 1:W + 1, :]
                   .astype(jnp.float32) * g1[:, None, :]
                   + b1[:, None, :]).astype(zp_ref.dtype)
        zp_ref[1 + r0: 1 + r0 + strip, 1:W + 1, :] = z
        z1_ref[0, r0: r0 + strip] = z

    # ---- conv2 + stats
    s1_ref[:] = z32
    s2_ref[:] = z32
    for r0 in range(0, H, strip):
        _im2col(zp_ref, col_ref, r0, strip, W, Co)
        y = jnp.dot(col_ref[: strip * W, :9 * Co], w2_ref[:],
                    preferred_element_type=jnp.float32)
        s1_ref[0, :Co] += y.sum(axis=0)
        s2_ref[0, :Co] += jnp.square(y).sum(axis=0)
        y2_ref[r0: r0 + strip] = y.reshape(strip, W, Co).astype(y2_ref.dtype)

    g2, b2 = _group_affine(s1_ref[:, :Co], s2_ref[:, :Co],
                           sc2_ref[:], bi2_ref[:], n, Co)

    # ---- shortcut branch
    if has_short:
        s1_ref[:] = z32
        s2_ref[:] = z32
        for r0 in range(0, H, strip):
            u = jnp.dot(x_ref[0, r0: r0 + strip].reshape(strip * W, Ci),
                        ws_ref[:], preferred_element_type=jnp.float32)
            s1_ref[0, :Co] += u.sum(axis=0)
            s2_ref[0, :Co] += jnp.square(u).sum(axis=0)
            # park the raw shortcut in zp's interior — its z1 content is
            # consumed (conv2 done, z1 saved to z1_ref) and it has Co lanes
            zp_ref[1 + r0: 1 + r0 + strip, 1:W + 1, :] = (
                u.reshape(strip, W, Co).astype(zp_ref.dtype))
        gs, bs = _group_affine(s1_ref[:, :Co], s2_ref[:, :Co],
                               scs_ref[:], bis_ref[:], n, Co)

    # ---- final sum + act, saving the pre-activation
    for r0 in range(0, H, strip):
        y2 = y2_ref[r0: r0 + strip].astype(jnp.float32)
        y2 = y2 * g2[:, None, :] + b2[:, None, :]
        if has_short:
            idn = (zp_ref[1 + r0: 1 + r0 + strip, 1:W + 1, :]
                   .astype(jnp.float32) * gs[:, None, :]
                   + bs[:, None, :])
        else:
            idn = x_ref[0, r0: r0 + strip].astype(jnp.float32)
        pre = y2 + idn
        pre_ref[0, r0: r0 + strip] = pre.astype(pre_ref.dtype)
        out_ref[0, r0: r0 + strip] = _lrelu(pre).astype(out_ref.dtype)


def _fwd_call(x, w1f, sc1, bi1, w2f, sc2, bi2, wsf, scs, bis):
    b, h, w, ci = x.shape
    co = w1f.shape[1]
    has_short = wsf is not None
    if not has_short:
        # dummy (1,1) operands keep the arg list static
        wsf = jnp.zeros((ci, co), x.dtype)
        scs = jnp.zeros((1, co // 4), jnp.float32)
        bis = jnp.zeros((1, co // 4), jnp.float32)
    cmax = max(9 * ci, 9 * co)
    strip = _pick_strip(h, w, cmax)   # one strip serves both convs
    cpad = max(ci, co)
    kernel = functools.partial(_fwd_kernel, h, w, ci, co, has_short, strip)
    flops = 2 * b * h * w * (9 * ci * co + 9 * co * co
                             + (ci * co if has_short else 0))
    out, z1, pre = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * ci, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * co, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co // 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, co), x.dtype),   # out
            jax.ShapeDtypeStruct((b, h, w, co), x.dtype),   # z1 residual
            jax.ShapeDtypeStruct((b, h, w, co), x.dtype),   # preact residual
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 8, ci), x.dtype),         # xp (W 8-pad)
            pltpu.VMEM((h + 2, w + 8, co), x.dtype),         # zp (W 8-pad)
            pltpu.VMEM((h, w, co), x.dtype),                 # y2
            pltpu.VMEM((strip * w, cmax), x.dtype),          # col
            pltpu.VMEM((1, cpad), jnp.float32),              # s1
            pltpu.VMEM((1, cpad), jnp.float32),              # s2
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + 3 * b * h * w * co) * x.dtype.itemsize,
            transcendentals=0),
    )(x, w1f, sc1, bi1, w2f, sc2, bi2, wsf, scs, bis)
    return out, z1, pre



def _lrelu_mask(v):
    """lrelu'(v) without an i1 select: two staged huge multiplies map any
    positive v to >=1 (or inf) and any v <= 0 to <= 0, then clip to
    [slope, 1] — avoids boolean vectors (Mosaic relayout ICE in the fused
    backward on jax 0.9.0).  Matches jnp.where(v > 0, 1, slope) including
    v == 0 -> slope, EXCEPT for positive f32 denormals (v < ~2.5e-41:
    v*1e20*1e20 still rounds below 1, returning slope instead of 1).  TPU
    flushes f32 denormals to zero, so on-device the match is exact; only
    interpret-mode CPU runs with denormal pre-activations can see the
    difference, and tests avoid that range."""
    a = v.astype(jnp.float32) * 1e20
    return jnp.clip(a * 1e20, _SLOPE, 1.0)


# ----------------------------------------------------------------- backward
def _bwd_kernel(H, W, Ci, Co, has_short, strip,
                x_ref, z1_ref, pre_ref, g_ref,
                w1_ref, w1t_ref, w2_ref, w2t_ref, ws_ref, wst_ref,
                sc1_ref, sc2_ref, scs_ref,
                dx_ref, dw1_ref, dw2_ref, dws_ref, dsb_ref,
                xp_ref, zp_ref, gpad_ref, yb_ref, gb_ref, col_ref,
                s1_ref, s2_ref):
    """Fused backward, one image per grid step.

    Inputs: saved residuals (x, z1, pre-activation), upstream grad g, the
    packed kernels in forward form (w1/w2/ws — for the y1/y2/u recomputes)
    and flipped+IO-transposed form (w1t [9Co,Ci], w2t [9Co,Co], wst
    [Co,Ci] — for the transposed convs), and the norm scales [1,C].

    Per-image norm statistics are recomputed here from the SAME f32 dot
    outputs the forward used, so the stats paths agree exactly.  The
    instance-norm vjp per group (N = H*W*4 elements pooled over the 4
    subpixel lane groups):  dv = scale*rstd * (d - S_d/N - xhat*S_dx/N),
    dscale = S_dx, dbias = S_d.

    dw/dscale/dbias outputs accumulate over the batch grid (block revisit).
    ``dsb`` rows: 0=scale1, 1=scale2, 2=scale_s, 4=bias1, 5=bias2,
    6=bias_s (rows 3,7 pad to the sublane tile).
    """
    i = pl.program_id(0)
    n = jnp.float32(H * W * 4)
    z32 = jnp.zeros((1, s1_ref.shape[1]), jnp.float32)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros(dw1_ref.shape, jnp.float32)
        dw2_ref[:] = jnp.zeros(dw2_ref.shape, jnp.float32)
        dws_ref[:] = jnp.zeros(dws_ref.shape, jnp.float32)
        dsb_ref[:] = jnp.zeros(dsb_ref.shape, jnp.float32)

    def group_tile(v):      # [1, C] -> [1, 4C]
        return jnp.concatenate([v] * 4, axis=1)

    def group_sum(v):       # [1, 4C] -> [1, C]
        c = Co // 4
        return (v[:, 0 * c:1 * c] + v[:, 1 * c:2 * c]
                + v[:, 2 * c:3 * c] + v[:, 3 * c:4 * c])

    # ---- pad x and z1 once
    xp_ref[:] = jnp.zeros(xp_ref.shape, xp_ref.dtype)
    xp_ref[1:H + 1, 1:W + 1, :] = x_ref[0]
    zp_ref[:] = jnp.zeros(zp_ref.shape, zp_ref.dtype)
    zp_ref[1:H + 1, 1:W + 1, :] = z1_ref[0]

    # ---- recompute y2 = conv2(z1) + stats
    s1_ref[:] = z32
    s2_ref[:] = z32
    for r0 in range(0, H, strip):
        _im2col(zp_ref, col_ref, r0, strip, W, Co)
        y = jnp.dot(col_ref[: strip * W, :9 * Co], w2_ref[:],
                    preferred_element_type=jnp.float32)
        s1_ref[0, :Co] += y.sum(axis=0)
        s2_ref[0, :Co] += jnp.square(y).sum(axis=0)
        yb_ref[r0: r0 + strip] = y.reshape(strip, W, Co).astype(yb_ref.dtype)
    m2 = group_sum(s1_ref[:, :Co]) / n
    v2 = group_sum(s2_ref[:, :Co]) / n - m2 * m2
    r2 = jax.lax.rsqrt(v2 + _EPS)
    m2t, r2t = group_tile(m2), group_tile(r2)

    # ---- gp = g * mask(pre) into gb; n2-backward group sums
    s1_ref[:] = z32
    s2_ref[:] = z32
    for r0 in range(0, H, strip):
        pre = pre_ref[0, r0: r0 + strip].astype(jnp.float32)
        gp = (g_ref[0, r0: r0 + strip].astype(jnp.float32)
              * _lrelu_mask(pre))
        gb_ref[r0: r0 + strip] = gp.astype(gb_ref.dtype)
        xh = ((yb_ref[r0: r0 + strip].astype(jnp.float32)
               - m2t[:, None, :]) * r2t[:, None, :])
        s1_ref[0, :Co] += gp.reshape(strip * W, Co).sum(axis=0)
        s2_ref[0, :Co] += (gp * xh).reshape(strip * W, Co).sum(axis=0)
    sd2 = group_sum(s1_ref[:, :Co])
    sdx2 = group_sum(s2_ref[:, :Co])
    dsb_ref[1:2, :] += sdx2
    dsb_ref[5:6, :] += sd2
    a2 = group_tile(sc2_ref[:] * r2)
    c2 = group_tile(sd2 / n)
    e2 = group_tile(sdx2 / n)

    # ---- dy2 into gpad (padded) + dw2
    gpad_ref[:] = jnp.zeros(gpad_ref.shape, gpad_ref.dtype)
    for r0 in range(0, H, strip):
        gp = gb_ref[r0: r0 + strip].astype(jnp.float32)
        xh = ((yb_ref[r0: r0 + strip].astype(jnp.float32)
               - m2t[:, None, :]) * r2t[:, None, :])
        dy2 = a2[:, None, :] * (gp - c2[:, None, :] - xh * e2[:, None, :])
        dy2c = dy2.astype(gpad_ref.dtype)
        gpad_ref[1 + r0: 1 + r0 + strip, 1:W + 1, :] = dy2c
        _im2col(zp_ref, col_ref, r0, strip, W, Co)
        dw2_ref[:] += jax.lax.dot_general(
            col_ref[: strip * W, :9 * Co],
            dy2c.reshape(strip * W, Co),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # ---- dz1 = conv2^T(dy2) * lrelu-mask(z1) into gb
    for r0 in range(0, H, strip):
        _im2col(gpad_ref, col_ref, r0, strip, W, Co)
        dz1 = jnp.dot(col_ref[: strip * W, :9 * Co], w2t_ref[:],
                      preferred_element_type=jnp.float32)
        z1v = z1_ref[0, r0: r0 + strip].reshape(strip * W, Co)
        dn1 = dz1 * _lrelu_mask(z1v)
        gb_ref[r0: r0 + strip] = dn1.reshape(strip, W, Co).astype(
            gb_ref.dtype)

    # ---- recompute y1 = conv1(x) + stats
    s1_ref[:] = z32
    s2_ref[:] = z32
    for r0 in range(0, H, strip):
        _im2col(xp_ref, col_ref, r0, strip, W, Ci)
        y = jnp.dot(col_ref[: strip * W, :9 * Ci], w1_ref[:],
                    preferred_element_type=jnp.float32)
        s1_ref[0, :Co] += y.sum(axis=0)
        s2_ref[0, :Co] += jnp.square(y).sum(axis=0)
        yb_ref[r0: r0 + strip] = y.reshape(strip, W, Co).astype(yb_ref.dtype)
    m1 = group_sum(s1_ref[:, :Co]) / n
    v1 = group_sum(s2_ref[:, :Co]) / n - m1 * m1
    r1 = jax.lax.rsqrt(v1 + _EPS)
    m1t, r1t = group_tile(m1), group_tile(r1)

    # ---- n1-backward group sums over dn1 (in gb)
    s1_ref[:] = z32
    s2_ref[:] = z32
    for r0 in range(0, H, strip):
        dn1 = gb_ref[r0: r0 + strip].astype(jnp.float32)
        xh = ((yb_ref[r0: r0 + strip].astype(jnp.float32)
               - m1t[:, None, :]) * r1t[:, None, :])
        s1_ref[0, :Co] += dn1.reshape(strip * W, Co).sum(axis=0)
        s2_ref[0, :Co] += (dn1 * xh).reshape(strip * W, Co).sum(axis=0)
    sd1 = group_sum(s1_ref[:, :Co])
    sdx1 = group_sum(s2_ref[:, :Co])
    dsb_ref[0:1, :] += sdx1
    dsb_ref[4:5, :] += sd1
    a1 = group_tile(sc1_ref[:] * r1)
    c1 = group_tile(sd1 / n)
    e1 = group_tile(sdx1 / n)

    # ---- dy1 into gpad + dw1
    gpad_ref[:] = jnp.zeros(gpad_ref.shape, gpad_ref.dtype)
    for r0 in range(0, H, strip):
        dn1 = gb_ref[r0: r0 + strip].astype(jnp.float32)
        xh = ((yb_ref[r0: r0 + strip].astype(jnp.float32)
               - m1t[:, None, :]) * r1t[:, None, :])
        dy1 = a1[:, None, :] * (dn1 - c1[:, None, :] - xh * e1[:, None, :])
        dy1c = dy1.astype(gpad_ref.dtype)
        gpad_ref[1 + r0: 1 + r0 + strip, 1:W + 1, :] = dy1c
        _im2col(xp_ref, col_ref, r0, strip, W, Ci)
        dw1_ref[:] += jax.lax.dot_general(
            col_ref[: strip * W, :9 * Ci],
            dy1c.reshape(strip * W, Co),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # ---- shortcut stats (recompute u = x @ ws) before dx assembly
    if has_short:
        s1_ref[:] = z32
        s2_ref[:] = z32
        for r0 in range(0, H, strip):
            u = jnp.dot(x_ref[0, r0: r0 + strip].reshape(strip * W, Ci),
                        ws_ref[:], preferred_element_type=jnp.float32)
            s1_ref[0, :Co] += u.sum(axis=0)
            s2_ref[0, :Co] += jnp.square(u).sum(axis=0)
            yb_ref[r0: r0 + strip] = u.reshape(strip, W, Co).astype(
                yb_ref.dtype)
        ms = group_sum(s1_ref[:, :Co]) / n
        vs = group_sum(s2_ref[:, :Co]) / n - ms * ms
        rs = jax.lax.rsqrt(vs + _EPS)
        mst, rst = group_tile(ms), group_tile(rs)

        s1_ref[:] = z32
        s2_ref[:] = z32
        for r0 in range(0, H, strip):
            pre = pre_ref[0, r0: r0 + strip].astype(jnp.float32)
            gp = (g_ref[0, r0: r0 + strip].astype(jnp.float32)
                  * _lrelu_mask(pre))
            xh = ((yb_ref[r0: r0 + strip].astype(jnp.float32)
                   - mst[:, None, :]) * rst[:, None, :])
            s1_ref[0, :Co] += gp.reshape(strip * W, Co).sum(axis=0)
            s2_ref[0, :Co] += (gp * xh).reshape(strip * W, Co).sum(axis=0)
        sds = group_sum(s1_ref[:, :Co])
        sdxs = group_sum(s2_ref[:, :Co])
        dsb_ref[2:3, :] += sdxs
        dsb_ref[6:7, :] += sds
        a_s = group_tile(scs_ref[:] * rs)
        c_s = group_tile(sds / n)
        e_s = group_tile(sdxs / n)

    # ---- dx = conv1^T(dy1) + identity/shortcut path
    for r0 in range(0, H, strip):
        _im2col(gpad_ref, col_ref, r0, strip, W, Co)
        dx = jnp.dot(col_ref[: strip * W, :9 * Co], w1t_ref[:],
                     preferred_element_type=jnp.float32)
        pre = pre_ref[0, r0: r0 + strip].astype(jnp.float32)
        gp = (g_ref[0, r0: r0 + strip].astype(jnp.float32)
              * _lrelu_mask(pre))
        if has_short:
            xh = ((yb_ref[r0: r0 + strip].astype(jnp.float32)
                   - mst[:, None, :]) * rst[:, None, :])
            du = (a_s[:, None, :]
                  * (gp - c_s[:, None, :] - xh * e_s[:, None, :]))
            duf = du.reshape(strip * W, Co).astype(x_ref.dtype)
            dx = dx + jnp.dot(duf, wst_ref[:],
                              preferred_element_type=jnp.float32)
            dws_ref[:] += jax.lax.dot_general(
                x_ref[0, r0: r0 + strip].reshape(strip * W, Ci), duf,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        else:
            dx = dx + gp.reshape(strip * W, Ci)
        dx_ref[0, r0: r0 + strip] = dx.reshape(strip, W, Ci).astype(
            dx_ref.dtype)


def _bwd_call(x, z1, pre, g, w1f, w2f, wsf, sc1, sc2, scs):
    b, h, w, ci = x.shape
    co = w1f.shape[1]
    c = co // 4
    has_short = wsf is not None
    dt = x.dtype
    # transposed-conv kernels: flip spatial taps, swap io
    def transpose9(wf, cin):
        k = wf.reshape(3, 3, cin, co)
        return jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2).reshape(9 * co, cin)

    w1t = transpose9(w1f, ci).astype(dt)
    w2t = transpose9(w2f, co).astype(dt)
    if has_short:
        wst = wsf.T.astype(dt)
    else:
        wsf = jnp.zeros((ci, co), dt)
        wst = jnp.zeros((co, ci), dt)
        scs = jnp.zeros((1, c), jnp.float32)
    cmax = max(9 * ci, 9 * co)
    strip = _pick_strip(h, w, cmax)
    cpad = max(ci, co)
    kernel = functools.partial(_bwd_kernel, h, w, ci, co, has_short, strip)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    img = lambda ch: pl.BlockSpec((1, h, w, ch), lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    dx, dw1, dw2, dws, dsb = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=(b,),
        in_specs=[img(ci), img(co), img(co), img(co),
                  full((9 * ci, co)), full((9 * co, ci)),
                  full((9 * co, co)), full((9 * co, co)),
                  full((ci, co)), full((co, ci)),
                  full((1, c)), full((1, c)), full((1, c))],
        out_specs=[img(ci), full((9 * ci, co)), full((9 * co, co)),
                   full((ci, co)), full((8, c))],
        out_shape=[jax.ShapeDtypeStruct((b, h, w, ci), dt),
                   jax.ShapeDtypeStruct((9 * ci, co), jnp.float32),
                   jax.ShapeDtypeStruct((9 * co, co), jnp.float32),
                   jax.ShapeDtypeStruct((ci, co), jnp.float32),
                   jax.ShapeDtypeStruct((8, c), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 8, ci), dt),              # xp
            pltpu.VMEM((h + 2, w + 8, co), dt),              # zp
            pltpu.VMEM((h + 2, w + 8, co), dt),              # gpad
            pltpu.VMEM((h, w, co), dt),                      # yb
            pltpu.VMEM((h, w, co), dt),                      # gb
            pltpu.VMEM((strip * w, cmax), dt),               # col
            pltpu.VMEM((1, cpad), jnp.float32),              # s1
            pltpu.VMEM((1, cpad), jnp.float32),              # s2
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * w * (9 * ci * co + 9 * co * co
                                   + (ci * co if has_short else 0)),
            bytes_accessed=(2 * x.size + 5 * b * h * w * co)
            * x.dtype.itemsize,
            transcendentals=0),
    )(x, z1, pre, g, w1f, w1t, w2f, w2t, wsf, wst, sc1, sc2, scs)
    return dx, dw1, dw2, dws, dsb


# ------------------------------------------------------- public custom-vjp
def _prep(x, wp1, wp2, wps, scale1, scale2, scales):
    ci, co = wp1.shape[2], wp1.shape[3]
    c = co // 4
    dt = x.dtype
    mk = lambda v: (None if v is None
                    else jnp.asarray(v, jnp.float32).reshape(1, c))
    return (wp1.reshape(9 * ci, co).astype(dt),
            wp2.reshape(9 * co, co).astype(dt),
            None if wps is None else wps.reshape(ci, co).astype(dt),
            mk(scale1), mk(scale2), mk(scales))


@jax.custom_vjp
def fused_block(x, wp1, scale1, bias1, wp2, scale2, bias2):
    """Fused packed BasicBlock, identity shortcut (Cin == Cout)."""
    w1f, w2f, _, s1, s2, _ = _prep(x, wp1, wp2, None, scale1, scale2, None)
    c = wp1.shape[3] // 4
    mb = lambda v: jnp.asarray(v, jnp.float32).reshape(1, c)
    out, _, _ = _fwd_call(x, w1f, s1, mb(bias1), w2f, s2, mb(bias2),
                          None, None, None)
    return out


def _fb_fwd(x, wp1, scale1, bias1, wp2, scale2, bias2):
    w1f, w2f, _, s1, s2, _ = _prep(x, wp1, wp2, None, scale1, scale2, None)
    c = wp1.shape[3] // 4
    mb = lambda v: jnp.asarray(v, jnp.float32).reshape(1, c)
    out, z1, pre = _fwd_call(x, w1f, s1, mb(bias1), w2f, s2, mb(bias2),
                             None, None, None)
    return out, (x, z1, pre, wp1, wp2, scale1, scale2)


def _fb_bwd(res, g):
    x, z1, pre, wp1, wp2, scale1, scale2 = res
    w1f, w2f, _, s1, s2, _ = _prep(x, wp1, wp2, None, scale1, scale2, None)
    dx, dw1, dw2, _, dsb = _bwd_call(x, z1, pre, g.astype(x.dtype),
                                     w1f, w2f, None, s1, s2, None)
    ci, co = wp1.shape[2], wp1.shape[3]
    return (dx,
            dw1.reshape(3, 3, ci, co).astype(wp1.dtype),
            dsb[0].astype(scale1.dtype), dsb[4],
            dw2.reshape(3, 3, co, co).astype(wp2.dtype),
            dsb[1].astype(scale2.dtype), dsb[5])


fused_block.defvjp(_fb_fwd, _fb_bwd)


@jax.custom_vjp
def fused_block_short(x, wp1, scale1, bias1, wp2, scale2, bias2,
                      wps, scales, biass):
    """Fused packed BasicBlock with the 1x1+norm shortcut (channel change)."""
    w1f, w2f, wsf, s1, s2, ss = _prep(x, wp1, wp2, wps, scale1, scale2,
                                      scales)
    c = wp1.shape[3] // 4
    mb = lambda v: jnp.asarray(v, jnp.float32).reshape(1, c)
    out, _, _ = _fwd_call(x, w1f, s1, mb(bias1), w2f, s2, mb(bias2),
                          wsf, ss, mb(biass))
    return out


def _fbs_fwd(x, wp1, scale1, bias1, wp2, scale2, bias2, wps, scales, biass):
    w1f, w2f, wsf, s1, s2, ss = _prep(x, wp1, wp2, wps, scale1, scale2,
                                      scales)
    c = wp1.shape[3] // 4
    mb = lambda v: jnp.asarray(v, jnp.float32).reshape(1, c)
    out, z1, pre = _fwd_call(x, w1f, s1, mb(bias1), w2f, s2, mb(bias2),
                             wsf, ss, mb(biass))
    return out, (x, z1, pre, wp1, wp2, wps, scale1, scale2, scales)


def _fbs_bwd(res, g):
    x, z1, pre, wp1, wp2, wps, scale1, scale2, scales = res
    w1f, w2f, wsf, s1, s2, ss = _prep(x, wp1, wp2, wps, scale1, scale2,
                                      scales)
    dx, dw1, dw2, dws, dsb = _bwd_call(x, z1, pre, g.astype(x.dtype),
                                       w1f, w2f, wsf, s1, s2, ss)
    ci, co = wp1.shape[2], wp1.shape[3]
    return (dx,
            dw1.reshape(3, 3, ci, co).astype(wp1.dtype),
            dsb[0].astype(scale1.dtype), dsb[4],
            dw2.reshape(3, 3, co, co).astype(wp2.dtype),
            dsb[1].astype(scale2.dtype), dsb[5],
            dws.reshape(1, 1, ci, co).astype(wps.dtype),
            dsb[2].astype(scales.dtype), dsb[6])


fused_block_short.defvjp(_fbs_fwd, _fbs_bwd)


def fused_block_fwd(x: jax.Array,
                    wp1: jax.Array, scale1: jax.Array, bias1: jax.Array,
                    wp2: jax.Array, scale2: jax.Array, bias2: jax.Array,
                    wps: Optional[jax.Array],
                    scales: Optional[jax.Array],
                    biass: Optional[jax.Array]):
    """Forward of the fused packed BasicBlock (bench/test entry).

    ``wp1`` [3,3,Ci,Co] / ``wp2`` [3,3,Co,Co] are PACKED conv kernels
    (models/packed.pack_kernel output); ``wps`` [1,1,Ci,Co] the packed
    shortcut or None; scales/biases are the ORIGINAL per-channel [C] norm
    parameters (C = Co // 4).  Returns (out, z1, preact)."""
    ci, co = wp1.shape[2], wp1.shape[3]
    c = co // 4
    dt = x.dtype
    mk = lambda v: jnp.asarray(v, jnp.float32).reshape(1, c)
    return _fwd_call(
        x, wp1.reshape(9 * ci, co).astype(dt), mk(scale1), mk(bias1),
        wp2.reshape(9 * co, co).astype(dt), mk(scale2), mk(bias2),
        None if wps is None else wps.reshape(ci, co).astype(dt),
        None if wps is None else mk(scales),
        None if wps is None else mk(biass))


def apply_fused_block(x, wp1, scale1, bias1, wp2, scale2, bias2,
                      wps=None, scales=None, biass=None):
    """Differentiable fused block (dispatches on the shortcut presence)."""
    if wps is None:
        return fused_block(x, wp1, scale1, bias1, wp2, scale2, bias2)
    return fused_block_short(x, wp1, scale1, bias1, wp2, scale2, bias2,
                             wps, scales, biass)


# ------------------------------------------------------- trace-time switch
_ENABLED = False


def set_block_pallas(enabled: bool) -> None:
    """Armed by train/steps/setup_compute from Config.block_pallas."""
    global _ENABLED
    _ENABLED = bool(enabled)


def enabled_for(x_shape, co: int) -> bool:
    """The fused path wins where the dot fills the MXU lanes: 128 packed
    output channels (the scoping bench: 98 TF/s at Cout=128 vs 27 at 64).
    Eligibility mirrors conv_pallas: per-image VMEM blocks must fit."""
    if not _ENABLED:
        return False
    b, h, w, ci = x_shape
    # ci > 128 (decoder concat blocks) trips a Mosaic relayout ICE on a
    # vector<...xi1> mask in the fused backward with this jax version —
    # keep eligibility to the microbenched envelope
    if co < 128 or co % 128 or ci % 64 or ci > 128 or w % 8 or h % 8:
        return False
    per_img = (h + 2) * (w + 8) * max(ci, co) * 2 * 3 + 2 * h * w * co * 2
    return per_img <= 40 * 1024 * 1024
