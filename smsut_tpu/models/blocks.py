# -*- coding: utf-8 -*-
"""Residual building blocks and the 5-level encoder/decoder pair.

TPU-native re-design of `/root/reference/network/blocks.py:37-174` in NHWC
flax.linen.  Semantics preserved: pre 5x5 stem, residual BasicBlocks with 1x1
shortcut on channel change, max-pool downsampling, transposed-conv (or
bilinear+1x1) upsampling with skip concat, widths w/2,1w,2w,4w,8w,16w.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from smsut_tpu.models.layers import (
    NormAct,
    avg_pool2,
    conv,
    conv1x1,
    conv3x3,
    get_act,
    kaiming_normal_fan_out,
    max_pool2,
    upsample_bilinear2,
)

Dtype = Any


class BasicBlock(nn.Module):
    """Residual block: 2x(conv3x3+norm), 1x1(+norm) shortcut when channels
    change, activation after the sum (`network/blocks.py:53-80`)."""

    features: int
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = get_act(self.act_type)
        identity = x
        y = conv3x3(self.features, act_type=self.act_type, dtype=self.dtype, name="conv1")(x)
        y = NormAct(self.norm_type, self.act_type, self.dtype, name="bn1")(y)
        y = conv3x3(self.features, act_type=self.act_type, dtype=self.dtype, name="conv2")(y)
        y = NormAct(self.norm_type, None, self.dtype, name="bn2")(y)
        if x.shape[-1] != self.features:
            identity = conv1x1(self.features, act_type=self.act_type, dtype=self.dtype,
                               name="shortcut1")(identity)
            identity = NormAct(self.norm_type, None, self.dtype, name="shortcut2")(identity)
        return act(y + identity)


class BottleBlock(nn.Module):
    """Stride-2-capable residual block with avg-pool shortcut, used by the
    PatchGAN discriminator (`network/blocks.py:83-117`)."""

    features: int
    norm_type: str = "instance"
    act_type: str = "lrelu"
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.stride in (1, 2)
        # discriminator-side block: the WGAN-GP grad-of-grad flows through
        # these activations — reverse-over-reverse through the lrelu
        # custom vjp is exact and regression-tested (layers.get_act)
        act = get_act(self.act_type)
        y = conv3x3(self.features, act_type=self.act_type, dtype=self.dtype, name="conv1")(x)
        y = NormAct(self.norm_type, self.act_type, self.dtype, name="bn1")(y)
        if self.stride == 2:
            y = avg_pool2(y)
        y = conv3x3(self.features, act_type=self.act_type, dtype=self.dtype, name="conv2")(y)
        y = NormAct(self.norm_type, None, self.dtype, name="bn2")(y)

        identity = avg_pool2(x) if self.stride == 2 else x
        if x.shape[-1] != self.features:
            identity = conv1x1(self.features, act_type=self.act_type, dtype=self.dtype,
                               name="short_conv")(identity)
            identity = NormAct(self.norm_type, None, self.dtype, name="short_norm")(identity)
        return act(y + identity)


class UpSampleAndConcat(nn.Module):
    """2x upsample then channel-concat with the skip
    (`network/blocks.py:37-50`).  ``transposed=True`` uses a 2x2 stride-2
    transposed conv; otherwise bilinear + 1x1 conv."""

    features: int
    transposed: bool = True
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        from smsut_tpu.models.layout_pin import pin
        if self.transposed:
            x = nn.ConvTranspose(
                self.features,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                use_bias=False,
                kernel_init=kaiming_normal_fan_out(self.act_type),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="up",
            )(x)
        else:
            x = upsample_bilinear2(x)
            x = conv1x1(self.features, act_type=self.act_type, dtype=self.dtype, name="up_conv")(x)
        return pin(jnp.concatenate([pin(x), skip.astype(x.dtype)], axis=-1))


class Encoder(nn.Module):
    """5-level encoder (`network/blocks.py:120-152`): 5x5 stem to w/2, then
    4x(BasicBlock + maxpool) and a bottleneck block; widths w..16w.

    ``pack_levels``: run the first N levels (N in {0,1,2}) on the 2x2
    space-to-depth grid (identical math, TPU-friendly lane occupancy — see
    models/packed.py).  skips[i] for i < N is then the PACKED activation
    [B,H/2^(i+1),W/2^(i+1),4*mult*w]; Decoder must be built with the same
    value."""

    width: int = 32
    norm_type: str = "batch"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    pack_levels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        w = self.width
        skips = []
        start = 0
        from smsut_tpu.models import packed_w as pwk

        if self.pack_levels > 0 and pwk.pack_mode() == "w":
            p0 = pwk.pack_w0()
            ps = pwk.w_pack_schedule(p0, w, self.pack_levels)
            cin = x.shape[-1]
            x = pwk.pack_w(x, p0)
            x = pwk.PackedConvW(w // 2, 5, (cin,), p0, self.act_type,
                                self.dtype, name="pre_conv")(x)
            x = pwk.PackedNormActW(self.norm_type, self.act_type, w // 2, p0,
                                   self.dtype, name="pre_bn")(x)
            prev = w // 2
            for i, mult in list(enumerate((1, 2, 4, 8)))[:self.pack_levels]:
                p_i = ps[i]
                x = pwk.PackedBasicBlockW(mult * w, (prev,), p_i,
                                          self.norm_type, self.act_type,
                                          self.dtype, name=f"layer{i + 1}")(x)
                skips.append(x)             # W-packed with ps[i]
                if i + 1 >= self.pack_levels:
                    x = pwk.unpack_w(pwk.pool_w(x, p_i, mult * w, p_i // 2),
                                     p_i // 2)
                else:
                    x = pwk.pool_w(x, p_i, mult * w, ps[i + 1])
                prev = mult * w
            start = self.pack_levels
        elif self.pack_levels > 0:
            from smsut_tpu.models import packed as pk

            cin = x.shape[-1]
            x = pk.space_to_depth(x)
            x = pk.PackedConv(w // 2, 5, (cin,), self.act_type, self.dtype,
                              name="pre_conv")(x)
            x = pk.PackedNormAct(self.norm_type, self.act_type, w // 2,
                                 self.dtype, name="pre_bn")(x)
            prev = w // 2
            for i, mult in list(enumerate((1, 2, 4, 8)))[:self.pack_levels]:
                x = pk.PackedBasicBlock(mult * w, (prev,), self.norm_type,
                                        self.act_type, self.dtype,
                                        name=f"layer{i + 1}")(x)
                skips.append(x)             # packed [B,H/2^(i+1),...,4*mult*w]
                x = pk.pool_to_next_level(x, mult * w,
                                          last=(i + 1 >= self.pack_levels))
                prev = mult * w
            start = self.pack_levels
        else:
            x = conv(w // 2, 5, act_type=self.act_type, dtype=self.dtype,
                     name="pre_conv")(x)
            x = NormAct(self.norm_type, self.act_type, self.dtype, name="pre_bn")(x)

        for i, mult in list(enumerate((1, 2, 4, 8)))[start:]:
            x = BasicBlock(mult * w, self.norm_type, self.act_type, self.dtype,
                           name=f"layer{i + 1}")(x)
            skips.append(x)
            x = max_pool2(x)
        x = BasicBlock(16 * w, self.norm_type, self.act_type, self.dtype, name="layer5")(x)
        return x, skips


class EncoderSplit(nn.Module):
    """Encoder with its level-0 stage exposed as raw parameters so two nets
    can run level 0 as ONE tower-paired program (models/paired.py — see
    UGANEncoderSplit for the design).  Parameter paths/shapes/inits are
    identical to Encoder (hw packed mode, instance norm)."""

    width: int
    cin: int
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    pack_levels: int = 1

    def setup(self):
        from smsut_tpu.models import packed as pk
        from smsut_tpu.models.packed import _Kernel
        from smsut_tpu.models.ugan import _BlockParams, _NormParams

        assert self.pack_levels >= 1 and self.norm_type == "instance"
        w = self.width
        init = kaiming_normal_fan_out(self.act_type)
        self.pre_conv = _Kernel((5, 5, self.cin, w // 2), init)
        self.pre_bn = _NormParams(w // 2)
        self.layer1 = _BlockParams(w, (w // 2,), self.act_type)
        for i, mult in list(enumerate((1, 2, 4, 8)))[1:]:
            prev = (1, 2, 4, 8)[i - 1] * w
            if i < self.pack_levels:
                mod = pk.PackedBasicBlock(mult * w, (prev,), self.norm_type,
                                          self.act_type, self.dtype)
            else:
                mod = BasicBlock(mult * w, self.norm_type, self.act_type,
                                 self.dtype)
            setattr(self, f"layer{i + 1}", mod)
        self.layer5 = BasicBlock(16 * w, self.norm_type, self.act_type,
                                 self.dtype)

    def level0(self) -> dict:
        return dict(pre_conv=self.pre_conv(), pre_bn=self.pre_bn(),
                    enc1=self.layer1())

    def tail(self, x: jax.Array):
        """Levels 1..3 + the layer5 bottleneck from the pooled level-0
        output; returns (bottleneck, skips[level 1..3] in forward order)."""
        from smsut_tpu.models import packed as pk

        skips = []
        for i, mult in list(enumerate((1, 2, 4, 8)))[1:]:
            x = getattr(self, f"layer{i + 1}")(x)
            skips.append(x)
            if i < self.pack_levels:
                x = pk.pool_to_next_level(x, mult * self.width,
                                          last=(i + 1 >= self.pack_levels))
            else:
                x = max_pool2(x)
        return self.layer5(x), skips


class DecoderSplit(nn.Module):
    """Decoder with the level-1->0 stage staged out for tower pairing
    (same parameter paths as Decoder, hw packed mode)."""

    out_ch: int
    width: int = 32
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    pack_levels: int = 1

    def setup(self):
        from smsut_tpu.models import packed as pk
        from smsut_tpu.models.ugan import _BlockParams

        assert self.pack_levels >= 1
        w = self.width
        for i, mult in ((4, 8), (3, 4), (2, 2), (1, 1)):
            if i <= self.pack_levels:
                break
            setattr(self, f"up{i}",
                    UpSampleAndConcat(mult * w, transposed=True,
                                      act_type=self.act_type, dtype=self.dtype))
            setattr(self, f"layer{i}",
                    BasicBlock(mult * w, self.norm_type, self.act_type,
                               self.dtype))
        for lvl in range(self.pack_levels, 1, -1):
            mult = (1, 2, 4, 8)[lvl - 1]
            setattr(self, f"up{lvl}",
                    pk.PackedUpConcat(mult * w, self.act_type, self.dtype))
            setattr(self, f"layer{lvl}",
                    pk.PackedBasicBlock(mult * w, (mult * w, mult * w),
                                        self.norm_type, self.act_type,
                                        self.dtype))
        self.up1 = pk.PackedUpConcat(w, self.act_type, self.dtype)
        self.layer1 = _BlockParams(w, (w, w), self.act_type)
        self.fc = pk.PackedConv(self.out_ch, 1, (w,), self.act_type,
                                self.dtype)

    def head(self, x: jax.Array, skips) -> jax.Array:
        from smsut_tpu.models import packed as pk

        for i, mult in ((4, 8), (3, 4), (2, 2), (1, 1)):
            if i <= self.pack_levels:
                break
            x = getattr(self, f"up{i}")(x, skips[i - 1])
            x = getattr(self, f"layer{i}")(x)
        for lvl in range(self.pack_levels, 1, -1):
            mult = (1, 2, 4, 8)[lvl - 1]
            x = getattr(self, f"up{lvl}")(x, skips[lvl - 1])
            x = getattr(self, f"layer{lvl}")(x)
            x = pk.depth_to_space(x, mult * self.width)
        return x

    def up1_apply(self, x: jax.Array, skip_packed: jax.Array) -> jax.Array:
        return self.up1(x, skip_packed)

    def dec1_params(self) -> dict:
        return self.layer1()

    def fc_apply(self, y: jax.Array, packed_out: bool = False) -> jax.Array:
        from smsut_tpu.models import packed as pk

        y = self.fc(y)
        return y if packed_out else pk.depth_to_space(y, self.out_ch)


class Decoder(nn.Module):
    """4-level decoder with transposed-conv up+concat and a 1x1 head
    (`network/blocks.py:155-174`).

    ``pack_levels``: the last N levels run in packed space against the
    packed skips from a pack_levels Encoder; the head conv emits packed
    logits that are depth-to-space'd back to the full grid (identical
    math)."""

    out_ch: int
    width: int = 32
    norm_type: str = "batch"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    pack_levels: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, skips: Sequence[jax.Array],
                 packed_out: bool = False) -> jax.Array:
        w = self.width
        for i, mult in ((4, 8), (3, 4), (2, 2), (1, 1)):
            if i <= self.pack_levels:
                break
            x = UpSampleAndConcat(mult * w, transposed=True, act_type=self.act_type,
                                  dtype=self.dtype, name=f"up{i}")(x, skips[i - 1])
            x = BasicBlock(mult * w, self.norm_type, self.act_type, self.dtype,
                           name=f"layer{i}")(x)
        from smsut_tpu.models import packed_w as pwk

        if self.pack_levels and pwk.pack_mode() == "w":
            ps = pwk.w_pack_schedule(pwk.pack_w0(), w, self.pack_levels)
            p_cur = 1                     # bottleneck enters unpacked
            for lvl in range(self.pack_levels, 0, -1):
                mult = (1, 2, 4, 8)[lvl - 1]
                x = pwk.PackedUpConcatW(mult * w, p_cur, ps[lvl - 1],
                                        self.act_type, self.dtype,
                                        name=f"up{lvl}")(x, skips[lvl - 1])
                x = pwk.PackedBasicBlockW(mult * w, (mult * w, mult * w),
                                          ps[lvl - 1], self.norm_type,
                                          self.act_type, self.dtype,
                                          name=f"layer{lvl}")(x)
                p_cur = ps[lvl - 1]
            x = pwk.PackedConvW(self.out_ch, 1, (w,), ps[0], self.act_type,
                                self.dtype, name="fc")(x)
            return pwk.unpack_w(x, ps[0])
        if self.pack_levels:
            from smsut_tpu.models import packed as pk

            for lvl in range(self.pack_levels, 0, -1):
                mult = (1, 2, 4, 8)[lvl - 1]
                x = pk.PackedUpConcat(mult * w, self.act_type, self.dtype,
                                      name=f"up{lvl}")(x, skips[lvl - 1])
                x = pk.PackedBasicBlock(mult * w, (mult * w, mult * w),
                                        self.norm_type, self.act_type,
                                        self.dtype, name=f"layer{lvl}")(x)
                if lvl > 1:   # next level expects the unpacked finer grid
                    x = pk.depth_to_space(x, mult * w)
            x = pk.PackedConv(self.out_ch, 1, (w,), self.act_type, self.dtype,
                              name="fc")(x)
            if packed_out:
                # train-loss path: per-pixel losses are invariant to the
                # spatial repacking, so the [B,H',W',4*out_ch] packed
                # logits feed ops/losses.py's packed variants directly and
                # the full-grid unpack never materializes (profiled ~3
                # ms/step of unpacked [.,256,256,5] f32 loss fusions on
                # meanTeacher — BASELINE.md round 4)
                return x
            return pk.depth_to_space(x, self.out_ch)
        x = conv1x1(self.out_ch, act_type=self.act_type, dtype=self.dtype, name="fc")(x)
        return x
