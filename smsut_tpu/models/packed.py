# -*- coding: utf-8 -*-
"""Space-to-depth packed execution of the network stem (level 0).

Why: at base_width 16 the level-0 tensors are [B,256,256,8..32] — on TPU the
channel (lane) dimension is padded to 128, so every HBM pass over these
activations moves 4-16x more bytes than the data contains.  Profiling the
supervised step shows level-0 convs, norm statistics, weight gradients and
activation masks dominating the whole iteration.

Fix: run level 0 on the 2x2 space-to-depth grid — [B,128,128,4C] with packed
channel layout ``s*C + c`` (s = subpixel dy*2+dx) — where the lanes are 4x
fuller and the spatial iteration space is 4x smaller.  Every op is the SAME
arithmetic as its unpacked counterpart, term for term:

  * a SAME conv (odd k) becomes a 3-tap packed conv whose [3,3,4Cin,4Cout]
    kernel is built on the fly from the ORIGINAL [k,k,Cin,Cout] parameter
    (structured zeros elsewhere) — parameters keep their reference shapes
    and names, so checkpoints are interchangeable with the unpacked model;
  * InstanceNorm statistics per original channel reduce over (H', W', s);
  * MaxPool 2x2/2 is a max over the 4 subpixels of each packed pixel (and
    lands exactly on the unpacked level-1 grid);
  * ConvTranspose 2x2/2 degenerates to a 1x1 matmul producing all 4
    subpixels of the packed output.

The reference has no analogue (torch CUDA handles small channel counts
natively — `/root/reference/network/blocks.py:53-80` runs level 0 as-is);
this is a TPU-layout optimization with identical numerics, validated by
tests/test_packed.py (packed vs unpacked forward/grad equivalence).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from smsut_tpu.models.layers import get_act, kaiming_normal_fan_out

Dtype = Any


# --------------------------------------------------------------- reshapes
def space_to_depth(x: jax.Array) -> jax.Array:
    """[B, 2H, 2W, C] -> [B, H, W, 4C], packed channel = (dy*2+dx)*C + c."""
    b, h2, w2, c = x.shape
    x = x.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)            # [B, H, W, dy, dx, C]
    return x.reshape(b, h2 // 2, w2 // 2, 4 * c)


def depth_to_space(x: jax.Array, c: int) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)            # [B, H, dy, W, dx, C]
    return x.reshape(b, 2 * h, 2 * w, c)


# ------------------------------------------------------------ packed conv
import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=None)
def _placement(k: int):
    """Constant 0/1 placement tensor P[u,v,ku,kv,s_in,s_out] for the packed
    kernel build: each packed-kernel slot receives at most ONE original tap
    (slots are disjoint), so `einsum(w, P)` equals the elementwise .set()
    loop bitwise — but lowers to ONE fused contraction instead of 9*k*k
    dynamic-update-slices re-executed every step (profiled at ~1-2 ms/step
    of tiny DUS chains on the GAN iteration)."""
    pad = k // 2
    offs = sorted({(d - pad + u) // 2 for d in (0, 1) for u in range(k)})
    kp = offs[-1] - offs[0] + 1
    p = _np.zeros((k, k, kp, kp, 4, 4), _np.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            s_out = dy * 2 + dx
            for u in range(k):
                ty, ay = divmod(dy - pad + u, 2)
                for v in range(k):
                    tx, ax = divmod(dx - pad + v, 2)
                    p[u, v, ty - offs[0], tx - offs[0], ay * 2 + ax, s_out] = 1.0
    return p


def pack_kernel(w: jax.Array, in_segments: Sequence[int]) -> jax.Array:
    """Build the packed conv kernel from an original SAME kernel.

    ``w``: [k, k, Cin, Cout] with odd k.  ``in_segments``: channel counts of
    the (concatenated) packed inputs; each segment is laid out ``s*Cseg + c``
    and segments follow each other (sum(in_segments) == Cin).

    Output-subpixel (dy,dx) of packed pixel (i,j) is original pixel
    (2i+dy, 2j+dx); its tap (u,v) reads original row 2i+dy-k//2+u, which is
    packed row i + (dy-k//2+u)//2, subpixel (dy-k//2+u) % 2 — always within
    a 3-tap packed window for k in {1,3,5}.  Emitted as ONE placement
    einsum per input segment (see :func:`_placement`).
    """
    k, _, cin, cout = w.shape
    assert k % 2 == 1, "packed conv only defined for odd kernels"
    assert sum(in_segments) == cin, (in_segments, cin)
    p = jnp.asarray(_placement(k), w.dtype)
    kp = p.shape[2]
    parts, cbase = [], 0
    for cseg in in_segments:
        # [kp,kp, s_in, Cseg, s_out, Cout] -> [kp, kp, 4*Cseg, 4*Cout]
        seg = jnp.einsum("uvio,uvabst->absito",
                         w[:, :, cbase: cbase + cseg, :], p)
        parts.append(seg.reshape(kp, kp, 4 * cseg, 4 * cout))
        cbase += cseg
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)


# Packed-conv lowering selector ("v1" | "v2" | "v2k3"): "v2" cuts the
# executed structured-zero FLOPs (k=3: [3,3] 25%-dense kernel -> [2,2]
# 56%-dense + shifted output slices, 144 -> 64 MACs/CinCout; k=1:
# block-diagonal matmul -> dense subpixel einsum, 4x cut); "v2k3" applies
# the k=3 rewrite only; "v1" is the original single-SAME-conv packing.
# Identical math in every mode (tests/test_packed.py runs all).
# Measured (round 3, supervised step, tunnel chip): v1 6.9ms @ 363 GF
# executed beats v2 13.5ms @ 209 GF — the zero work rides the MXU at full
# tile speed while v2's unaligned shifted slices and lane-split reshapes
# stall it; see BASELINE.md.
import os as _os

CONV_IMPL = _os.environ.get("SMSUT_PACKED_IMPL", "v1")


def pack_kernel_v2_k3(w: jax.Array, in_segments: Sequence[int]) -> jax.Array:
    """[3,3,Cin,Cout] -> [2,2,4Cin,4Cout] for the padded-VALID formulation.

    Output subpixel dy of packed pixel i covers packed rows {i-1+dy, i+dy};
    running ONE VALID [2,2] conv over the 1-padded packed grid yields every
    such window at output position i+dy, so y[dy] = out[dy : dy+H'].  Slot
    (t, ay) of subpixel dy holds original tap u = 2t + dy + ay - 1 (when
    0 <= u < 3; 9 of 16 slots per (dy,dx) — vs 9 of 36 in the v1 kernel)."""
    k, _, cin, cout = w.shape
    assert k == 3, k
    seg_off, off = [], 0
    for cseg in in_segments:
        seg_off.append(off)
        off += 4 * cseg
    wp = jnp.zeros((2, 2, off, 4 * cout), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            o0 = (dy * 2 + dx) * cout
            for t_r in (0, 1):
                for ay in (0, 1):
                    u = 2 * t_r + dy + ay - 1
                    if not 0 <= u < 3:
                        continue
                    for t_c in (0, 1):
                        for ax in (0, 1):
                            v = 2 * t_c + dx + ax - 1
                            if not 0 <= v < 3:
                                continue
                            s_in = ay * 2 + ax
                            cbase = 0
                            for cseg, soff in zip(in_segments, seg_off):
                                wp = wp.at[
                                    t_r, t_c,
                                    soff + s_in * cseg: soff + (s_in + 1) * cseg,
                                    o0: o0 + cout].set(
                                    w[u, v, cbase: cbase + cseg, :])
                                cbase += cseg
    return wp


def _packed_conv_v2_k3(x: jax.Array, w: jax.Array,
                       in_segments: Sequence[int], dtype: Dtype) -> jax.Array:
    wp = pack_kernel_v2_k3(w, in_segments).astype(dtype)
    cout = w.shape[-1]
    h, wd = x.shape[1], x.shape[2]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    full = jax.lax.conv_general_dilated(
        xp, wp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))      # [B, H'+1, W'+1, 4Co]
    parts = []
    for dy in (0, 1):
        for dx in (0, 1):
            s = dy * 2 + dx
            parts.append(full[:, dy: dy + h, dx: dx + wd,
                              s * cout: (s + 1) * cout])
    return jnp.concatenate(parts, axis=-1)


def _packed_conv_v2_k1(x: jax.Array, w: jax.Array,
                       in_segments: Sequence[int], dtype: Dtype) -> jax.Array:
    """1x1 packed conv: each output subpixel reads only its own input
    subpixel, so with a plane-major channel order it is a dense grouped
    conv (feature_group_count=4) — no structured zeros at all.

    The packed layout is segment-major THEN subpixel-major; regroup the
    kernel's input rows to plane-major to match a channel-permuted input...
    instead we permute nothing: build the grouped kernel over the
    plane-major order and permute the INPUT channels once (a lane shuffle
    XLA folds into the producing op) when there are multiple segments; the
    single-segment case (s*C+c) is already plane-major."""
    cin = sum(in_segments)
    cout = w.shape[-1]
    if len(in_segments) > 1:
        # channel order [seg][s][c] -> [s][seg][c]
        perm = []
        seg_off, off = [], 0
        for cseg in in_segments:
            seg_off.append(off)
            off += 4 * cseg
        for s in range(4):
            for cseg, soff in zip(in_segments, seg_off):
                perm.extend(range(soff + s * cseg, soff + (s + 1) * cseg))
        x = jnp.take(x, jnp.asarray(perm), axis=-1)
    # dense contraction with the subpixel dim as a batch-like axis (an
    # einsum rather than feature_group_count=4: GSPMD cannot partition a
    # grouped conv's output features under channel-wise tensor parallelism)
    b, h, wd, _ = x.shape
    xs = x.astype(dtype).reshape(b, h, wd, 4, cin)
    y = jnp.einsum("bhwsc,co->bhwso", xs, w[0, 0].astype(dtype))
    return y.reshape(b, h, wd, 4 * cout)


def packed_conv_apply(x: jax.Array, w: jax.Array,
                      in_segments: Sequence[int], dtype: Dtype) -> jax.Array:
    """Packed-space equivalent of the original SAME conv with kernel ``w``."""
    k = w.shape[0]
    if CONV_IMPL in ("v2", "v2k3") and k == 3:
        return _packed_conv_v2_k3(x, w, in_segments, dtype)
    if CONV_IMPL == "v2" and k == 1:
        return _packed_conv_v2_k1(x, w, in_segments, dtype)
    from smsut_tpu.models.layout_pin import pin
    wp = pack_kernel(w, in_segments).astype(dtype)
    kp = wp.shape[0]
    from smsut_tpu.ops import conv_pallas as cp
    if cp.enabled_for(x.shape, kp):
        return cp.conv_same_pallas(x.astype(dtype), wp)
    pad = [(kp // 2, kp // 2)] * 2 if kp > 1 else [(0, 0)] * 2
    return pin(jax.lax.conv_general_dilated(
        pin(x.astype(dtype)), wp, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC")))


class PackedConv(nn.Module):
    """Owns the ORIGINAL-shape kernel parameter (name 'kernel', like
    nn.Conv) but runs in packed space."""

    features: int
    kernel: int
    in_segments: Tuple[int, ...]
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, *,
                 only_kernel: bool = False) -> jax.Array:
        cin = sum(self.in_segments)
        w = self.param("kernel", kaiming_normal_fan_out(self.act_type),
                       (self.kernel, self.kernel, cin, self.features),
                       jnp.float32)
        if only_kernel:
            # parameter access for the fused whole-block kernel
            # (PackedBasicBlock + ops/block_pallas) — same path/shape
            return w
        y = packed_conv_apply(x, w, self.in_segments, self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + jnp.tile(b, 4).astype(y.dtype)
        return y


@_functools.lru_cache(maxsize=None)
def _placement_stride2(k: int):
    """P[u,v,ku,kv,s_in] for the stride-2 stem pack (see _placement)."""
    offs = sorted({(u - 1) // 2 for u in range(k)})
    kp = offs[-1] - offs[0] + 1
    p = _np.zeros((k, k, kp, kp, 4), _np.float32)
    for u in range(k):
        ty, ay = divmod(u - 1, 2)
        for v in range(k):
            tx, ax = divmod(v - 1, 2)
            p[u, v, ty - offs[0], tx - offs[0], ay * 2 + ax] = 1.0
    return p


def pack_kernel_stride2(w: jax.Array) -> jax.Array:
    """Stride-2 SAME-ish conv (k=4, pad 1 — the PatchGAN stem) on the packed
    grid: one output per packed pixel, so the packed conv is stride 1 with an
    UNPACKED output.  y[i] taps original row 2i-1+u = packed row i+(u-1)//2,
    subpixel (u-1)%2.  One placement einsum (see :func:`_placement`)."""
    k, _, cin, cout = w.shape
    assert k == 4, k
    p = jnp.asarray(_placement_stride2(k), w.dtype)
    kp = p.shape[2]
    wp = jnp.einsum("uvio,uvabs->absio", w, p)
    return wp.reshape(kp, kp, 4 * cin, cout)


class PackedStride2Conv(nn.Module):
    """4x4 stride-2 conv taking the packed input, emitting the unpacked
    half-resolution output (parameter-compatible with the nn.Conv stem)."""

    features: int
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_packed: jax.Array) -> jax.Array:
        cin = x_packed.shape[-1] // 4
        w = self.param("kernel", kaiming_normal_fan_out(self.act_type),
                       (4, 4, cin, self.features), jnp.float32)
        wp = pack_kernel_stride2(w).astype(self.dtype)
        kp = wp.shape[0]
        y = jax.lax.conv_general_dilated(
            x_packed.astype(self.dtype), wp, (1, 1),
            [(kp // 2, kp // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype)
        return y


def packed_upsample_bilinear2(x: jax.Array) -> jax.Array:
    """2x bilinear upsample (align_corners=False, edge-clamped — identical
    to jax.image.resize 'bilinear') emitted directly in packed layout:
    [B,H,W,C] -> [B,H,W,4C].  Output subpixel dy samples input coordinate
    i + dy/2 - 0.25, i.e. 0.25*x[i-1]+0.75*x[i] (dy=0) and
    0.75*x[i]+0.25*x[i+1] (dy=1); separable in rows/cols."""
    def shift_m(a, axis):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(None, 1)
        first = a[tuple(sl)]
        sl[axis] = slice(None, -1)
        return jnp.concatenate([first, a[tuple(sl)]], axis=axis)

    def shift_p(a, axis):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(-1, None)
        last = a[tuple(sl)]
        sl[axis] = slice(1, None)
        return jnp.concatenate([a[tuple(sl)], last], axis=axis)

    r0 = 0.25 * shift_m(x, 1) + 0.75 * x
    r1 = 0.75 * x + 0.25 * shift_p(x, 1)
    out = []
    for r in (r0, r1):
        out.append(0.25 * shift_m(r, 2) + 0.75 * r)
        out.append(0.75 * r + 0.25 * shift_p(r, 2))
    return jnp.concatenate(out, axis=-1).astype(x.dtype)


class PackedUpBilinearConcat(nn.Module):
    """Bilinear 2x up + 1x1 conv + concat with the packed skip — the
    translation decoder's up path (UpSampleAndConcat transposed=False).
    The 1x1 conv commutes with bilinear interpolation (both linear, conv is
    per-pixel), so it runs at the low resolution first; parameter path
    matches ('<name>/up_conv/kernel')."""

    features: int
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip_packed: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        w = _Kernel((1, 1, cin, self.features),
                    kaiming_normal_fan_out(self.act_type), name="up_conv")()
        y = jnp.einsum("bhwi,io->bhwo", x.astype(self.dtype),
                       w[0, 0].astype(self.dtype))
        y = packed_upsample_bilinear2(y)
        return jnp.concatenate([y, skip_packed.astype(y.dtype)], axis=-1)


# ------------------------------------------------------------ packed norm
def _tile_c(v: jax.Array) -> jax.Array:
    """[...,C] -> [...,4C] matching the s*C+c packed layout."""
    return jnp.tile(v, 4) if v.ndim == 1 else jnp.tile(v, (1, 4))


class PackedNormAct(nn.Module):
    """InstanceNorm(affine) + optional activation over packed activations:
    statistics per original channel reduce over (H', W', subpixel) — the
    same sums as the unpacked norm over (H, W)."""

    norm_type: str = "instance"
    act_type: Optional[str] = None
    channels: int = 0                  # original channel count C
    dtype: Dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, *,
                 only_params: bool = False) -> jax.Array:
        assert self.norm_type == "instance", self.norm_type
        c = self.channels
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if only_params:
            return scale, bias
        assert x.shape[-1] == 4 * c, (x.shape, c)

        b, h, w, _ = x.shape
        from smsut_tpu.models.layers import spatial_sums, stats_cast

        xf = stats_cast(x)

        t1, t2 = spatial_sums(xf)                                       # [B,4C]
        s1 = t1.reshape(b, 4, c).sum(axis=1)                            # [B,C]
        s2 = t2.reshape(b, 4, c).sum(axis=1)
        n = h * w * 4
        mean = s1 / n
        var = s2 / n - jnp.square(mean)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        g = _tile_c(rstd * scale)[:, None, None, :]                     # [B,1,1,4C]
        b_ = _tile_c(bias - mean * rstd * scale)[:, None, None, :]
        y = (xf * g + b_).astype(self.dtype)
        from smsut_tpu.models.layout_pin import pin
        return pin(get_act(self.act_type)(y) if self.act_type else y)


# ------------------------------------------------------------ pool / up
def packed_max_pool_to_unpacked(x: jax.Array, c: int) -> jax.Array:
    """MaxPool 2x2 stride 2 of the unpacked tensor == max over the 4
    subpixels: [B,H,W,4C] -> [B,H,W,C] (exactly the unpacked level-1 grid)."""
    m = x[..., :c]
    for s in range(1, 4):
        m = jnp.maximum(m, x[..., s * c: (s + 1) * c])
    return m


_POOL_FUSED = False


def set_pool_fused(enabled: bool) -> None:
    """Trace-time toggle (Config.pool_pack_fused): route the packed
    level-to-level transition through :func:`packed_max_pool_to_packed`.
    Measured round 3: wins at batch 32 (supervised 36.6->35.4 ms, the
    narrow pooled tensor no longer spills 8x-padded to HBM) but LOSES at
    the GAN's batch 16 (92.9->102.9 ms, the per-slice s2d transposes cost
    more than the VMEM-resident narrow tensor) — hence opt-in, for
    large-batch supervised runs."""
    global _POOL_FUSED
    _POOL_FUSED = enabled


def pool_to_next_level(x: jax.Array, c: int, last: bool) -> jax.Array:
    """The packed encoder's level transition: maxpool 2x2, then s2d for the
    next packed level (``last=False``) or unpack (``last=True``)."""
    from smsut_tpu.models.layout_pin import pin
    if last:
        return pin(packed_max_pool_to_unpacked(x, c))
    if _POOL_FUSED:
        return pin(packed_max_pool_to_packed(x, c))
    return pin(space_to_depth(packed_max_pool_to_unpacked(x, c)))


def packed_max_pool_to_packed(x: jax.Array, c: int) -> jax.Array:
    """MaxPool 2x2 + space_to_depth for the NEXT packed level, fused:
    ``space_to_depth(packed_max_pool_to_unpacked(x, c))`` without ever
    materializing the narrow [B,H,W,C] intermediate.

    Why: with C < 32 that intermediate pads its minor (lane) dim up to
    128 — at batch 32 the level-0 pooled tensor [B,128,128,16] costs 8x its
    bytes in HBM traffic and dominates the step (profiled round 3, the
    batch-scaling regression).  space_to_depth is a pure index permutation,
    so it commutes with the element-wise subpixel max:
    ``s2d(max_s x[..., sC:(s+1)C]) == max_s s2d(x)[..., sC:(s+1)C]``
    slice-wise — every tensor here keeps the lane-dense 4C channel width.
    Identical math to pool-then-pack (tests/test_packed.py)."""
    m = space_to_depth(x[..., :c])
    for s in range(1, 4):
        m = jnp.maximum(m, space_to_depth(x[..., s * c: (s + 1) * c]))
    return m


class _Kernel(nn.Module):
    """Bare kernel parameter holder (used to mirror a nested module's
    parameter path, e.g. up1/up/kernel of nn.ConvTranspose)."""

    shape: Tuple[int, ...]
    init: Callable

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", self.init, self.shape, jnp.float32)


class PackedUpConcat(nn.Module):
    """ConvTranspose(2,2)/2 into packed space + concat with the packed skip.
    y_orig[2i+dy, 2j+dx, co] = sum_ci wT[dy, dx, ci, co] * x[i, j, ci] — a
    1x1 contraction producing all four subpixels at once.  Parameter path
    matches UpSampleAndConcat's nn.ConvTranspose ('<name>/up/kernel')."""

    features: int
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip_packed: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        w = _Kernel((2, 2, cin, self.features),
                    kaiming_normal_fan_out(self.act_type), name="up")()
        # flax ConvTranspose convolves with the spatially *flipped* kernel
        # (lax.conv_transpose transpose_kernel=False); flip to match
        wm = w[::-1, ::-1].transpose(2, 0, 1, 3).reshape(cin, 4 * self.features)
        y = jnp.einsum("bhwi,io->bhwo", x.astype(self.dtype),
                       wm.astype(self.dtype))
        return jnp.concatenate([y, skip_packed.astype(y.dtype)], axis=-1)


class PackedBasicBlock(nn.Module):
    """BasicBlock in packed space — same parameters/structure as BasicBlock
    (`models/blocks.py:32-53`); ``in_segments`` describes the packed layout
    of the (possibly concatenated) input channels."""

    features: int
    in_segments: Tuple[int, ...]
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = get_act(self.act_type)
        f = self.features
        segs = tuple(self.in_segments)
        conv1 = PackedConv(f, 3, segs, self.act_type, self.dtype,
                           name="conv1")
        bn1 = PackedNormAct(self.norm_type, self.act_type, f, self.dtype,
                            name="bn1")
        conv2 = PackedConv(f, 3, (f,), self.act_type, self.dtype,
                           name="conv2")
        bn2 = PackedNormAct(self.norm_type, None, f, self.dtype, name="bn2")
        short = sum(segs) != f
        if short:
            sconv = PackedConv(f, 1, segs, self.act_type, self.dtype,
                               name="shortcut1")
            snorm = PackedNormAct(self.norm_type, None, f, self.dtype,
                                  name="shortcut2")

        from smsut_tpu.ops import block_pallas as bp

        if (bp.enabled_for(x.shape, 4 * f) and self.act_type == "lrelu"
                and self.norm_type == "instance" and CONV_IMPL == "v1"):
            # whole-block fused Pallas path (Config.block_pallas): same
            # parameters, packed kernels built outside the kernel
            w1 = conv1(only_kernel=True)
            s1, b1 = bn1(only_params=True)
            w2 = conv2(only_kernel=True)
            s2, b2 = bn2(only_params=True)
            xd = x.astype(self.dtype)
            wp1 = pack_kernel(w1, segs)
            wp2 = pack_kernel(w2, (f,))
            if short:
                ws = sconv(only_kernel=True)
                ss, bs = snorm(only_params=True)
                return bp.apply_fused_block(xd, wp1, s1, b1, wp2, s2, b2,
                                            pack_kernel(ws, segs), ss, bs)
            return bp.apply_fused_block(xd, wp1, s1, b1, wp2, s2, b2)

        identity = x
        y = bn1(conv1(x))
        y = bn2(conv2(y))
        if short:
            identity = snorm(sconv(identity))
        return act(y + identity)
