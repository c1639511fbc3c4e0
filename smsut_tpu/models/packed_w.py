# -*- coding: utf-8 -*-
"""W-only packed execution — functional core (round 3 experiment).

Like `models/packed.py` (2x2 space-to-depth) this trades structured-zero
conv FLOPs for fuller TPU lanes, but packs ONLY the W dimension:
``[B, H, W, C] -> [B, H, W/p, p*C]`` with packed channel ``dx*C + c``.

Why: in a C-minor NHWC layout the pair (dx, c) of ``w = p*j + dx`` is
already CONTIGUOUS in memory, so

  * pack / unpack / re-pack are pure ``reshape`` bitcasts (the 2x2 scheme
    needs 6-D transposes that profile at ~5 ms/step in the GAN —
    BASELINE.md round-3 layout-copy investigation);
  * the level transition (2x2/2 maxpool) is an H-strided max plus a
    channel-slice max — no transpose, and the result is ALREADY the next
    level's packed form (another reshape);
  * any W-dim stencil (bilinear upsample taps) can flatten to the
    original W axis for free, compute, and re-pack for free;
  * at p=8 a C=16 level-0 tensor fills all 128 lanes (the 2x2 scheme's
    64-lane tensors pay 2x padded HBM bytes on every element-wise pass
    and ping-pong between C-minor and W-minor conv layouts).

Arithmetic is the SAME as the unpacked ops term for term; parameters keep
their reference shapes (`/root/reference/network/blocks.py:53-80` runs
these levels unpacked on CUDA).  Equivalence: tests/test_packed_w.py.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------- reshapes
def pack_w(x: jax.Array, p: int) -> jax.Array:
    """[B, H, W, C] -> [B, H, W/p, p*C]; channel = dx*C + c (free reshape)."""
    b, h, w, c = x.shape
    assert w % p == 0, (w, p)
    return x.reshape(b, h, w // p, p * c)


def unpack_w(x: jax.Array, p: int) -> jax.Array:
    """Inverse of :func:`pack_w` (free reshape)."""
    b, h, j, pc = x.shape
    assert pc % p == 0, (pc, p)
    return x.reshape(b, h, j * p, pc // p)


def repack_w(x: jax.Array, p_from: int, p_to: int) -> jax.Array:
    """Change the W-pack factor (free reshape either direction)."""
    return pack_w(unpack_w(x, p_from), p_to)


# ------------------------------------------------------------ packed conv
import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=None)
def _placement_w(k: int, p: int):
    """Constant 0/1 placement P[v, kv, ax, dx] for the W-packed kernel
    build: slots are disjoint, so `einsum(w, P)` equals the .set() loop
    bitwise while lowering to ONE fused contraction per segment instead of
    per-step dynamic-update-slice chains (see packed._placement)."""
    pad = k // 2
    offs = sorted({(d - pad + v) // p for d in (0, p - 1) for v in range(k)})
    kp = offs[-1] - offs[0] + 1
    pm = _np.zeros((k, kp, p, p), _np.float32)
    for dx in range(p):
        for v in range(k):
            t, ax = divmod(dx - pad + v, p)
            pm[v, t - offs[0], ax, dx] = 1.0
    return pm


@_functools.lru_cache(maxsize=None)
def _placement_w_stride2(k: int, p: int):
    """P[v, kv, ax, dxo] for the W-packed stride-2 stem, plus offs[0]."""
    q = p // 2
    offs = sorted({(2 * d - 1 + v) // p for d in (0, q - 1) for v in range(k)})
    kp = offs[-1] - offs[0] + 1
    pm = _np.zeros((k, kp, p, q), _np.float32)
    for dxo in range(q):
        for v in range(k):
            t, ax = divmod(2 * dxo - 1 + v, p)
            pm[v, t - offs[0], ax, dxo] = 1.0
    return pm, offs[0]


def pack_kernel_w(w: jax.Array, p: int, in_segments: Sequence[int]) -> jax.Array:
    """Build the W-packed conv kernel from an original SAME kernel.

    ``w``: [k, k, Cin, Cout], odd k.  ``in_segments``: channel counts of the
    concatenated packed inputs (each segment laid out ``dx*Cseg + c``).

    Output subpixel dx of packed col j is original col p*j+dx; its W-tap v
    reads original col p*j + dx - k//2 + v = packed col j + (dx-k//2+v)//p,
    subpixel (dx-k//2+v) % p.  H-taps are ordinary (H is unpacked).
    """
    k, _, cin, cout = w.shape
    assert k % 2 == 1, "W-packed conv only defined for odd kernels"
    assert sum(in_segments) == cin, (in_segments, cin)
    pm = jnp.asarray(_placement_w(k, p), w.dtype)
    kp = pm.shape[1]
    assert kp % 2 == 1, kp  # symmetric window for SAME padding
    parts, cbase = [], 0
    for cseg in in_segments:
        # [k, kp, ax, Cseg, dx, Cout] -> [k, kp, p*Cseg, p*Cout]
        seg = jnp.einsum("uvio,vkad->ukaido",
                         w[:, :, cbase: cbase + cseg, :], pm)
        parts.append(seg.reshape(k, kp, p * cseg, p * cout))
        cbase += cseg
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)


def conv_w(x: jax.Array, w: jax.Array, p: int, in_segments: Sequence[int],
           dtype) -> jax.Array:
    """W-packed equivalent of the original SAME conv with kernel ``w``.

    k=1 runs as a dense per-subpixel contraction — in W-packing the
    [..., p, C] split is a free reshape (unlike the 2x2 scheme, where the
    equivalent v2 lowering needed lane shuffles and regressed end-to-end),
    so the 1x1 convs carry ZERO structured waste."""
    k = w.shape[0]
    if k == 1:
        b, h, j, _ = x.shape
        xd = x.astype(dtype)
        wd = w[0, 0].astype(dtype)
        y, cbase, off = None, 0, 0
        for cseg in in_segments:
            xs = xd[..., off: off + p * cseg].reshape(b, h, j, p, cseg)
            t = jnp.einsum("bhjsc,co->bhjso", xs, wd[cbase: cbase + cseg])
            y = t if y is None else y + t
            cbase += cseg
            off += p * cseg
        return y.reshape(b, h, j, p * w.shape[-1])
    wp = pack_kernel_w(w, p, in_segments).astype(dtype)
    kp = wp.shape[1]
    return lax.conv_general_dilated(
        x.astype(dtype), wp, (1, 1), [(k // 2, k // 2), (kp // 2, kp // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def pack_kernel_w_stride2(w: jax.Array, p: int) -> jax.Array:
    """Stride-2 k=4 pad-1 conv (the PatchGAN stem) under W-packing: input
    pack p, output pack p//2 on the half-resolution grid.  Output subpixel
    dx_o reads original cols 2*(p//2)*j + 2*dx_o - 1 + v."""
    k, _, cin, cout = w.shape
    assert k == 4 and p % 2 == 0, (k, p)
    q = p // 2
    pm_np, off0 = _placement_w_stride2(k, p)
    pm = jnp.asarray(pm_np, w.dtype)
    kp = pm.shape[1]
    wp = jnp.einsum("uvio,vkad->ukaido", w, pm)
    return wp.reshape(k, kp, p * cin, q * cout), off0


def stem_conv_w(x: jax.Array, w: jax.Array, p: int, dtype) -> jax.Array:
    """4x4/2 pad-1 stem on W-packed input: [B,H,J,p*Cin] ->
    [B,H/2,J,(p/2)*Cout] (same packed-col grid, half the subpixels)."""
    wp, off0 = pack_kernel_w_stride2(w, p)
    kp = wp.shape[1]
    return lax.conv_general_dilated(
        x.astype(dtype), wp.astype(dtype), (2, 1),
        [(1, 1), (-off0, kp - 1 + off0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ------------------------------------------------------------ norm / pool
def norm_stats_w(x: jax.Array, p: int, c: int):
    """InstanceNorm sums per ORIGINAL channel: reduce over (H, J, dx).
    Returns (s1, s2, n) with s1/s2 [B, C] float32."""
    b, h, j, pc = x.shape
    assert pc == p * c, (pc, p, c)
    from smsut_tpu.models.layers import spatial_sums

    from smsut_tpu.models.layers import stats_cast

    xf = stats_cast(x)
    t1, t2 = spatial_sums(xf)                                  # [B, p*C]
    s1 = t1.reshape(b, p, c).sum(axis=1)
    s2 = t2.reshape(b, p, c).sum(axis=1)
    return s1, s2, h * j * p


def tile_c_w(v: jax.Array, p: int) -> jax.Array:
    """[B, C] (or [C]) -> [B, p*C] matching the dx*C+c layout."""
    reps = (p,) if v.ndim == 1 else (1, p)
    return jnp.tile(v, reps)


def pool_w(x: jax.Array, p: int, c: int, out_pack: int) -> jax.Array:
    """MaxPool 2x2 stride 2 of the unpacked tensor, emitted in W-packed
    form.  ``out_pack`` is p//2 (stay on the same col grid) or p (regroup
    col pairs — a free reshape); both cover every pooled pixel exactly."""
    b, h, j, pc = x.shape
    assert pc == p * c and h % 2 == 0, (x.shape, p, c)
    m = x.reshape(b, h // 2, 2, j, pc).max(axis=2)            # H-pool
    m = m.reshape(b, h // 2, j, p // 2, 2, c).max(axis=4)     # W-pool
    m = m.reshape(b, h // 2, j, (p // 2) * c)
    if out_pack == p // 2:
        return m
    assert out_pack == p and j % 2 == 0, (out_pack, p, j)
    return m.reshape(b, h // 2, j // 2, p * c)


def upsample_bilinear2_w(x: jax.Array, p: int, out_pack: int) -> jax.Array:
    """2x bilinear upsample (align_corners=False, edge-clamped — identical
    to jax.image.resize 'bilinear' and to packed.py's 2x2 variant) on a
    W-packed tensor: [B,H,J,p*C] -> [B,2H,(2*J*p)/out_pack,out_pack*C].
    The W stencil runs on the FREE flattened view."""
    b, h, j, pc = x.shape
    c = pc // p
    xf = x.reshape(b, h, j * p, c)                            # free

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

    r0 = 0.25 * shift_m(xf, 2) + 0.75 * xf
    r1 = 0.75 * xf + 0.25 * shift_p(xf, 2)
    xw = jnp.stack([r0, r1], axis=3).reshape(b, h, 2 * j * p, c)
    s0 = 0.25 * shift_m(xw, 1) + 0.75 * xw
    s1 = 0.75 * xw + 0.25 * shift_p(xw, 1)
    y = jnp.stack([s0, s1], axis=2).reshape(b, 2 * h, 2 * j * p, c)
    return pack_w(y.astype(x.dtype), out_pack)


def up_transposed_w(x: jax.Array, w: jax.Array, p: int, out_pack: int,
                    dtype) -> jax.Array:
    """ConvTranspose(2,2)/2 (flax semantics: spatially flipped kernel) on a
    W-packed input, emitted directly in W-packed form:
    [B,H,J,p*Cin] -> [B,2H,(2*J*p)/out_pack,out_pack*Cout].
    Every reshape below is layout-free; only the einsum computes."""
    b, h, j, pc = x.shape
    cin = pc // p
    cout = w.shape[-1]
    wm = w[::-1, ::-1]                                        # flax flip
    xs = x.astype(dtype).reshape(b, h, j, p, cin)
    # out[b, h, dy, j, dx_in, dx2, co]; 2*dx_in + dx2 enumerates the output
    # subpixels of col j in order
    y = jnp.einsum("bhjdi,yxio->bhyjdxo", xs, wm.astype(dtype))
    y = y.reshape(b, 2 * h, j, 2 * p * cout)
    return repack_w(y, 2 * p, out_pack)


# ------------------------------------------------------------ flax modules
from typing import Any, Callable, Optional, Tuple  # noqa: E402

from flax import linen as nn  # noqa: E402

from smsut_tpu.models.layers import get_act, kaiming_normal_fan_out  # noqa: E402

Dtype = Any


def level_pack(p0: int, channels: int) -> int:
    """Pack factor for a level: fill the 128 TPU lanes when possible but
    never exceed the input pack (levels share the input's col grid after
    halving)."""
    return max(2, min(p0, 128 // max(channels, 1)))


class PackedConvW(nn.Module):
    """Owns the ORIGINAL-shape kernel parameter (name 'kernel', like
    nn.Conv / packed.PackedConv) but runs W-packed."""

    features: int
    kernel: int
    in_segments: Tuple[int, ...]
    p: int
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = sum(self.in_segments)
        w = self.param("kernel", kaiming_normal_fan_out(self.act_type),
                       (self.kernel, self.kernel, cin, self.features),
                       jnp.float32)
        y = conv_w(x, w, self.p, self.in_segments, self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + jnp.tile(b, self.p).astype(y.dtype)
        return y


class PackedNormActW(nn.Module):
    """InstanceNorm(affine) + optional activation over W-packed activations
    (same sums as the unpacked norm — see norm_stats_w)."""

    norm_type: str = "instance"
    act_type: Optional[str] = None
    channels: int = 0
    p: int = 4
    dtype: Dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.norm_type == "instance", self.norm_type
        c, p = self.channels, self.p
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        s1, s2, n = norm_stats_w(x, p, c)
        mean = s1 / n
        var = s2 / n - jnp.square(mean)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        g = tile_c_w(rstd * scale, p)[:, None, None, :]
        b_ = tile_c_w(bias - mean * rstd * scale, p)[:, None, None, :]
        from smsut_tpu.models.layers import stats_cast
        y = (stats_cast(x) * g + b_).astype(self.dtype)
        return get_act(self.act_type)(y) if self.act_type else y


class PackedBasicBlockW(nn.Module):
    """BasicBlock in W-packed space — same parameters/structure as
    BasicBlock (`models/blocks.py:32-53`)."""

    features: int
    in_segments: Tuple[int, ...]
    p: int
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = get_act(self.act_type)
        f, p = self.features, self.p
        identity = x
        y = PackedConvW(f, 3, tuple(self.in_segments), p, self.act_type,
                        name="conv1")(x)
        y = PackedNormActW(self.norm_type, self.act_type, f, p, name="bn1")(y)
        y = PackedConvW(f, 3, (f,), p, self.act_type, name="conv2")(y)
        y = PackedNormActW(self.norm_type, None, f, p, name="bn2")(y)
        if sum(self.in_segments) != f:
            identity = PackedConvW(f, 1, tuple(self.in_segments), p,
                                   self.act_type, name="shortcut1")(identity)
            identity = PackedNormActW(self.norm_type, None, f, p,
                                      name="shortcut2")(identity)
        return act(y + identity)


class _KernelW(nn.Module):
    """Bare kernel parameter holder mirroring a nested module's path."""

    shape: Tuple[int, ...]
    init: Callable

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", self.init, self.shape, jnp.float32)


class PackedUpConcatW(nn.Module):
    """ConvTranspose(2,2)/2 into W-packed space + concat with the W-packed
    skip.  ``p`` is the INPUT pack (1 = unpacked input), ``out_pack`` the
    output/skip pack.  Parameter path matches UpSampleAndConcat
    ('<name>/up/kernel')."""

    features: int
    p: int
    out_pack: int
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip_packed: jax.Array) -> jax.Array:
        cin = x.shape[-1] // self.p
        w = _KernelW((2, 2, cin, self.features),
                     kaiming_normal_fan_out(self.act_type), name="up")()
        y = up_transposed_w(x, w, self.p, self.out_pack, self.dtype)
        return jnp.concatenate([y, skip_packed.astype(y.dtype)], axis=-1)


class PackedUpBilinearConcatW(nn.Module):
    """Bilinear 2x up + 1x1 conv + concat with the W-packed skip (the
    translation decoder's up path).  1x1 conv commutes with bilinear
    interpolation, so it runs at the low resolution first; parameter path
    matches ('<name>/up_conv/kernel')."""

    features: int
    p: int
    out_pack: int
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip_packed: jax.Array) -> jax.Array:
        cin = x.shape[-1] // self.p
        w = _KernelW((1, 1, cin, self.features),
                     kaiming_normal_fan_out(self.act_type), name="up_conv")()
        y = conv_w(x, w, self.p, (cin,), self.dtype)
        y = upsample_bilinear2_w(y, self.p, self.out_pack)
        return jnp.concatenate([y, skip_packed.astype(y.dtype)], axis=-1)


class PackedStride2ConvW(nn.Module):
    """4x4 stride-2 pad-1 stem on a W-packed input, emitting the
    half-resolution output packed by p/2 (parameter-compatible with the
    nn.Conv stem)."""

    features: int
    p: int
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x_packed: jax.Array) -> jax.Array:
        cin = x_packed.shape[-1] // self.p
        w = self.param("kernel", kaiming_normal_fan_out(self.act_type),
                       (4, 4, cin, self.features), jnp.float32)
        y = stem_conv_w(x_packed, w, self.p, self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + jnp.tile(b, self.p // 2).astype(y.dtype)
        return y


# ----------------------------------------------------- trace-time selection
# Like packed.set_pool_fused: the packing REPRESENTATION is a trace-time
# choice (parameters are identical in every mode), armed by
# train/steps/setup_compute from Config.pack_mode / Config.pack_w0.
_PACK_MODE = "hw"
_PACK_W0 = 8


_D_PACK_DEEP = False
_D_PACK_MODE = ""   # ""=inherit pack_mode; "hw"/"w" = discriminator override


def set_pack_mode(mode: str, w0: int = 8, d_deep: bool = False,
                  d_mode: str = "") -> None:
    assert mode in ("hw", "w"), mode
    assert d_mode in ("", "hw", "w"), d_mode
    global _PACK_MODE, _PACK_W0, _D_PACK_DEEP, _D_PACK_MODE
    _PACK_MODE = mode
    _PACK_W0 = int(w0)
    _D_PACK_DEEP = bool(d_deep)
    _D_PACK_MODE = d_mode


def d_pack_deep() -> bool:
    return _D_PACK_DEEP


def pack_mode() -> str:
    return _PACK_MODE


def d_pack_mode() -> str:
    """The DISCRIMINATOR's packing mode: the round-3 A/B measured the
    generator fastest in 'hw' but the discriminator's narrow-channel
    pyramid fastest W-packed-deep, so the two are selectable
    independently (Config.d_pack_mode)."""
    return _D_PACK_MODE or _PACK_MODE


def pack_w0() -> int:
    return _PACK_W0


def w_pack_schedule(p0: int, width: int, n_levels: int):
    """Per-level pack factors.  Level i+1's pack is level i's (pool_w
    regroups col pairs for free) while the lanes still fit, else halved
    (pool_w's natural output)."""
    ps, p = [], p0
    mults = (1, 2, 4, 8)
    for i in range(n_levels):
        ps.append(p)
        c_next = mults[i + 1] * width if i + 1 < 4 else 16 * width
        if p * c_next > 128:
            p = max(p // 2, 2)
    return ps


def avg_pool_w(x: jax.Array, p: int, c: int, out_pack: int) -> jax.Array:
    """AvgPool 2x2 stride 2 under W-packing (BottleBlock's shortcut/stride
    path); same free-reshape structure as :func:`pool_w`."""
    b, h, j, pc = x.shape
    assert pc == p * c and h % 2 == 0, (x.shape, p, c)
    m = x.reshape(b, h // 2, 2, j, pc).mean(axis=2)
    m = m.reshape(b, h // 2, j, p // 2, 2, c).mean(axis=4)
    m = m.reshape(b, h // 2, j, (p // 2) * c)
    if out_pack == p // 2:
        return m
    assert out_pack == p and j % 2 == 0, (out_pack, p, j)
    return m.reshape(b, h // 2, j // 2, p * c)


class BottleBlockW(nn.Module):
    """Stride-2-capable residual block (the PatchGAN discriminator's
    BottleBlock, `models/blocks.py:56-82`) in W-packed space.  ``p`` is the
    input pack; stride 2 emits pack p//2 on the same col grid (free)."""

    features: int
    in_ch: int
    p: int
    norm_type: str = "instance"
    act_type: str = "lrelu"
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.stride in (1, 2)
        act = get_act(self.act_type)
        f, p = self.features, self.p
        p_out = p // 2 if self.stride == 2 else p
        y = PackedConvW(f, 3, (self.in_ch,), p, self.act_type, self.dtype,
                        name="conv1")(x)
        y = PackedNormActW(self.norm_type, self.act_type, f, p, self.dtype,
                           name="bn1")(y)
        if self.stride == 2:
            y = avg_pool_w(y, p, f, p_out)
        y = PackedConvW(f, 3, (f,), p_out, self.act_type, self.dtype,
                        name="conv2")(y)
        y = PackedNormActW(self.norm_type, None, f, p_out, self.dtype,
                           name="bn2")(y)

        identity = (avg_pool_w(x, p, self.in_ch, p_out)
                    if self.stride == 2 else x)
        if self.in_ch != f:
            identity = PackedConvW(f, 1, (self.in_ch,), p_out, self.act_type,
                                   self.dtype, name="short_conv")(identity)
            identity = PackedNormActW(self.norm_type, None, f, p_out,
                                      self.dtype, name="short_norm")(identity)
        return act(y + identity)
