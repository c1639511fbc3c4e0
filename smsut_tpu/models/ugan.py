# -*- coding: utf-8 -*-
"""UGAN model family — unified StarGAN-style translator + segmenter.

TPU-native re-design of `/root/reference/network/ugan.py`:
  * ``UGANEncoder``/``UGANDecoder`` — 4-level variants (`ugan.py:22-83`)
  * ``UGAN``     — translation+segmentation twin towers with a shared
                   bottleneck block (`ugan.py:86-123`)
  * ``UGANnce``  — UGAN + PatchSampleF MLP projector returning an
                   L2-normalized 64-patch feature pool (`ugan.py:126-195`);
                   patch ids are passed explicitly (a PRNG-split permutation)
                   instead of being stateful, which keeps the module pure and
                   jit-friendly.
  * ``Discriminator`` — PatchGAN + modality classifier (`ugan.py:198-229`).

Layout is NHWC; modality vectors are concatenated as extra input channels.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from smsut_tpu.models.blocks import BasicBlock, BottleBlock, UpSampleAndConcat
from smsut_tpu.models.layers import (
    NormAct,
    conv,
    conv1x1,
    conv3x3,
    kaiming_normal_fan_out,
    max_pool2,
    normal_init,
)

Dtype = Any


class UGANEncoder(nn.Module):
    """4-level encoder returning the pooled bottleneck input and skips in
    reversed order [e4, e3, e2, e1] (`ugan.py:22-55`)."""

    width: int = 32
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    pack_levels: int = 0   # first N levels space-to-depth (models/packed.py)

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
                x = pwk.PackedBasicBlockW(mult * w, (prev,), ps[i],
                                          self.norm_type, self.act_type,
                                          self.dtype, name=f"enc{i + 1}")(x)
                skips.append(x)          # W-packed with ps[i]
                if i + 1 >= self.pack_levels:
                    x = pwk.unpack_w(
                        pwk.pool_w(x, ps[i], mult * w, ps[i] // 2),
                        ps[i] // 2)
                else:
                    x = pwk.pool_w(x, ps[i], mult * w, ps[i + 1])
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
                                        name=f"enc{i + 1}")(x)
                skips.append(x)          # packed
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
                           name=f"enc{i + 1}")(x)
            skips.append(x)
            x = max_pool2(x)
        skips.reverse()
        return x, skips


class UGANDecoder(nn.Module):
    """4-level decoder; translation head uses bilinear upsampling + tanh,
    segmentation head uses transposed convs (`ugan.py:58-83`)."""

    out_ch: int
    width: int = 32
    norm_type: str = "instance"
    act_type: str = "lrelu"
    transposed: bool = True
    use_tanh: bool = False
    dtype: Dtype = jnp.float32
    pack_levels: int = 0   # last N levels in packed space (models/packed.py)

    @nn.compact
    def __call__(self, x: jax.Array, skips: Sequence[jax.Array],
                 packed_out: bool = False) -> jax.Array:
        w = self.width
        for i, mult in ((4, 8), (3, 4), (2, 2), (1, 1)):
            if i <= self.pack_levels:
                break
            x = UpSampleAndConcat(mult * w, transposed=self.transposed,
                                  act_type=self.act_type, dtype=self.dtype,
                                  name=f"up{i}")(x, skips[4 - i])
            x = BasicBlock(mult * w, self.norm_type, self.act_type, self.dtype,
                           name=f"dec{i}")(x)
        from smsut_tpu.models import packed_w as pwk

        if self.pack_levels and pwk.pack_mode() == "w":
            ps = pwk.w_pack_schedule(pwk.pack_w0(), w, self.pack_levels)
            up_cls = (pwk.PackedUpConcatW if self.transposed
                      else pwk.PackedUpBilinearConcatW)
            p_cur = 1                    # bottleneck enters unpacked
            for lvl in range(self.pack_levels, 0, -1):
                mult = (1, 2, 4, 8)[lvl - 1]
                x = up_cls(mult * w, p_cur, ps[lvl - 1], self.act_type,
                           self.dtype, name=f"up{lvl}")(x, skips[4 - lvl])
                x = pwk.PackedBasicBlockW(mult * w, (mult * w, mult * w),
                                          ps[lvl - 1], self.norm_type,
                                          self.act_type, self.dtype,
                                          name=f"dec{lvl}")(x)
                p_cur = ps[lvl - 1]
            x = pwk.PackedConvW(self.out_ch, 1, (w,), ps[0], self.act_type,
                                self.dtype, use_bias=True, name="fc")(x)
            if self.use_tanh:
                x = jnp.tanh(x)
            return pwk.unpack_w(x, ps[0])
        if self.pack_levels:
            from smsut_tpu.models import packed as pk

            up_cls = (pk.PackedUpConcat if self.transposed
                      else pk.PackedUpBilinearConcat)
            for lvl in range(self.pack_levels, 0, -1):
                mult = (1, 2, 4, 8)[lvl - 1]
                x = up_cls(mult * w, self.act_type, self.dtype,
                           name=f"up{lvl}")(x, skips[4 - lvl])
                x = pk.PackedBasicBlock(mult * w, (mult * w, mult * w),
                                        self.norm_type, self.act_type,
                                        self.dtype, name=f"dec{lvl}")(x)
                if lvl > 1:
                    x = pk.depth_to_space(x, mult * w)
            x = pk.PackedConv(self.out_ch, 1, (w,), self.act_type, self.dtype,
                              use_bias=True, name="fc")(x)
            if self.use_tanh:
                x = jnp.tanh(x)
            if packed_out:   # packed-loss path (ops/losses.py)
                return x
            return pk.depth_to_space(x, self.out_ch)
        x = conv1x1(self.out_ch, act_type=self.act_type, dtype=self.dtype,
                    use_bias=True, name="fc")(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return x


class _NormParams(nn.Module):
    """Bare InstanceNorm affine parameters (scale/bias) — mirrors
    PackedNormAct's parameter paths for the tower-paired forward."""

    channels: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.channels,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        return scale, bias


class _BlockParams(nn.Module):
    """Parameters of a PackedBasicBlock (same child names/shapes/inits, so
    checkpoints are interchangeable); compute happens in
    models/paired.py:paired_block."""

    features: int
    in_segments: Tuple[int, ...]
    act_type: str = "lrelu"

    @nn.compact
    def __call__(self) -> dict:
        from smsut_tpu.models.packed import _Kernel

        cin = sum(self.in_segments)
        f = self.features
        init = kaiming_normal_fan_out(self.act_type)
        p = dict(
            conv1=_Kernel((3, 3, cin, f), init, name="conv1")(),
            bn1=_NormParams(f, name="bn1")(),
            conv2=_Kernel((3, 3, f, f), init, name="conv2")(),
            bn2=_NormParams(f, name="bn2")(),
        )
        if cin != f:
            p["shortcut1"] = _Kernel((1, 1, cin, f), init, name="shortcut1")()
            p["shortcut2"] = _NormParams(f, name="shortcut2")()
        return p


class UGANEncoderSplit(nn.Module):
    """UGANEncoder with its level-0 stage exposed as raw parameters so
    _UGANCore can run BOTH towers' level 0 as one paired program
    (models/paired.py).  Parameter paths/shapes/inits are identical to
    UGANEncoder (hw packed mode), so checkpoints are interchangeable —
    tests/test_paired.py asserts init equality."""

    width: int
    cin: int
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    pack_levels: int = 1

    def setup(self):
        from smsut_tpu.models import packed as pk
        from smsut_tpu.models.packed import _Kernel

        assert self.pack_levels >= 1 and self.norm_type == "instance"
        w = self.width
        init = kaiming_normal_fan_out(self.act_type)
        self.pre_conv = _Kernel((5, 5, self.cin, w // 2), init)
        self.pre_bn = _NormParams(w // 2)
        self.enc1 = _BlockParams(w, (w // 2,), self.act_type)
        for i, mult in list(enumerate((1, 2, 4, 8)))[1:]:
            prev = (1, 2, 4, 8)[i - 1] * w
            if i < self.pack_levels:
                mod = pk.PackedBasicBlock(mult * w, (prev,), self.norm_type,
                                          self.act_type, self.dtype)
            else:
                mod = BasicBlock(mult * w, self.norm_type, self.act_type,
                                 self.dtype)
            setattr(self, f"enc{i + 1}", mod)

    def level0(self) -> dict:
        return dict(pre_conv=self.pre_conv(), pre_bn=self.pre_bn(),
                    enc1=self.enc1())

    def tail(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        """Levels 1..3 from the (pooled) level-0 output; returns the
        bottleneck input and the level-1..3 skips in forward order."""
        from smsut_tpu.models import packed as pk

        skips = []
        for i, mult in list(enumerate((1, 2, 4, 8)))[1:]:
            x = getattr(self, f"enc{i + 1}")(x)
            skips.append(x)
            if i < self.pack_levels:
                x = pk.pool_to_next_level(x, mult * self.width,
                                          last=(i + 1 >= self.pack_levels))
            else:
                x = max_pool2(x)
        return x, skips


class UGANDecoderSplit(nn.Module):
    """UGANDecoder with the level-1->0 stage staged out for tower pairing
    (same parameter paths as UGANDecoder, hw packed mode)."""

    out_ch: int
    width: int = 32
    norm_type: str = "instance"
    act_type: str = "lrelu"
    transposed: bool = True
    use_tanh: bool = False
    dtype: Dtype = jnp.float32
    pack_levels: int = 1

    def setup(self):
        from smsut_tpu.models import packed as pk

        assert self.pack_levels >= 1
        w = self.width
        for i, mult in ((4, 8), (3, 4), (2, 2), (1, 1)):
            if i <= self.pack_levels:
                break
            setattr(self, f"up{i}",
                    UpSampleAndConcat(mult * w, transposed=self.transposed,
                                      act_type=self.act_type, dtype=self.dtype))
            setattr(self, f"dec{i}",
                    BasicBlock(mult * w, self.norm_type, self.act_type,
                               self.dtype))
        up_cls = (pk.PackedUpConcat if self.transposed
                  else pk.PackedUpBilinearConcat)
        for lvl in range(self.pack_levels, 1, -1):
            mult = (1, 2, 4, 8)[lvl - 1]
            setattr(self, f"up{lvl}", up_cls(mult * w, self.act_type,
                                             self.dtype))
            setattr(self, f"dec{lvl}",
                    pk.PackedBasicBlock(mult * w, (mult * w, mult * w),
                                        self.norm_type, self.act_type,
                                        self.dtype))
        self.up1 = up_cls(w, self.act_type, self.dtype)
        self.dec1 = _BlockParams(w, (w, w), self.act_type)
        self.fc = pk.PackedConv(self.out_ch, 1, (w,), self.act_type,
                                self.dtype, use_bias=True)

    def head(self, x: jax.Array, skips: Sequence[jax.Array]) -> jax.Array:
        """Upper decoder levels down to the level-1 grid ([B,H/2,W/2,w])."""
        from smsut_tpu.models import packed as pk

        for i, mult in ((4, 8), (3, 4), (2, 2), (1, 1)):
            if i <= self.pack_levels:
                break
            x = getattr(self, f"up{i}")(x, skips[4 - i])
            x = getattr(self, f"dec{i}")(x)
        for lvl in range(self.pack_levels, 1, -1):
            mult = (1, 2, 4, 8)[lvl - 1]
            x = getattr(self, f"up{lvl}")(x, skips[4 - lvl])
            x = getattr(self, f"dec{lvl}")(x)
            x = pk.depth_to_space(x, mult * self.width)
        return x

    def up1_apply(self, x: jax.Array, skip_packed: jax.Array) -> jax.Array:
        return self.up1(x, skip_packed)

    def dec1_params(self) -> dict:
        return self.dec1()

    def fc_apply(self, y: jax.Array, packed_out: bool = False) -> jax.Array:
        from smsut_tpu.models import packed as pk

        y = self.fc(y)
        if self.use_tanh:
            y = jnp.tanh(y)
        if packed_out:   # packed-loss path (ops/losses.py)
            return y
        return pk.depth_to_space(y, self.out_ch)


def tile_modality_vec(x: jax.Array, m: Optional[jax.Array], n_modal: int) -> jax.Array:
    """Concatenate the per-sample modality vector as constant spatial channels
    (`ugan.py:108-114`)."""
    b, h, w, _ = x.shape
    if m is None:
        m = jnp.zeros((b, n_modal), x.dtype)
    m_map = jnp.broadcast_to(m.astype(x.dtype)[:, None, None, :], (b, h, w, n_modal))
    return jnp.concatenate([x, m_map], axis=-1)


class _UGANCore(nn.Module):
    """Shared twin-tower body of UGAN / UGANnce (`ugan.py:86-123`).

    ``pair_towers``: run both towers' level-0 stages as ONE paired program
    (block-diagonal full-lane convs, models/paired.py) — identical math,
    measured ~28% faster per twin-conv pair on TPU (hw packed mode only)."""

    out_ch: int
    n_modal: int
    width: int = 32
    dtype: Dtype = jnp.float32
    pack_levels: int = 0
    pair_towers: bool = False

    @nn.compact
    def __call__(self, x, m, packed_seg: bool = False):
        kw = dict(norm_type="instance", act_type="lrelu", dtype=self.dtype,
                  pack_levels=self.pack_levels)
        x = x.astype(self.dtype)
        tsl_in = tile_modality_vec(x, m, self.n_modal)

        enc5 = BasicBlock(16 * self.width, "instance", "lrelu", self.dtype, name="enc5")

        from smsut_tpu.models import packed_w as pwk

        pair = (self.pair_towers and self.pack_levels >= 1
                and pwk.pack_mode() == "hw")
        if pair:
            from smsut_tpu.models import packed as pk
            from smsut_tpu.models import paired as pr

            w = self.width
            tslE = UGANEncoderSplit(w, tsl_in.shape[-1], name="tsl_encoder", **kw)
            segE = UGANEncoderSplit(w, x.shape[-1], name="seg_encoder", **kw)
            pa, pb = tslE.level0(), segE.level0()
            X = jnp.concatenate([pk.space_to_depth(tsl_in),
                                 pk.space_to_depth(x)], axis=-1)
            y = pr.paired_conv(X, pa["pre_conv"], pb["pre_conv"],
                               (tsl_in.shape[-1],), (x.shape[-1],), self.dtype)
            y = pr.paired_norm_act(y, pa["pre_bn"], pb["pre_bn"], w // 2,
                                   "lrelu", self.dtype)
            y = pr.paired_block(y, pa["enc1"], pb["enc1"], (w // 2,), w,
                                "lrelu", self.dtype)
            skipA, skipB = pr.split2(y)
            last = self.pack_levels == 1
            tsl_h, restA = tslE.tail(pk.pool_to_next_level(skipA, w, last=last))
            seg_h, restB = segE.tail(pk.pool_to_next_level(skipB, w, last=last))
            tsl_skips = list(reversed([skipA] + restA))
            seg_skips = list(reversed([skipB] + restB))
        else:
            tsl_h, tsl_skips = UGANEncoder(self.width, name="tsl_encoder", **kw)(tsl_in)
            seg_h, seg_skips = UGANEncoder(self.width, name="seg_encoder", **kw)(x)
        # ONE batched apply of the shared bottleneck for both towers
        # (`ugan.py:115-118` applies enc5 twice with the same weights);
        # instance norm is per-sample, so this is mathematically identical.
        b = x.shape[0]
        both = enc5(jnp.concatenate([tsl_h, seg_h], axis=0))
        tsl_bottleneck, seg_bottleneck = both[:b], both[b:]
        if pair:
            tslD = UGANDecoderSplit(1, self.width, transposed=False,
                                    use_tanh=True, name="tsl_decoder", **kw)
            segD = UGANDecoderSplit(self.out_ch, self.width, transposed=True,
                                    use_tanh=False, name="seg_decoder", **kw)
            da = tslD.head(tsl_bottleneck, tsl_skips)
            db = segD.head(seg_bottleneck, seg_skips)
            ua = tslD.up1_apply(da, tsl_skips[3])
            ub = segD.up1_apply(db, seg_skips[3])
            yd = pr.paired_block(jnp.concatenate([ua, ub], axis=-1),
                                 tslD.dec1_params(), segD.dec1_params(),
                                 (self.width, self.width), self.width,
                                 "lrelu", self.dtype)
            ya, yb = pr.split2(yd)
            tsl = tslD.fc_apply(ya)
            seg = segD.fc_apply(yb, packed_seg)
        else:
            tsl = UGANDecoder(1, self.width, transposed=False, use_tanh=True,
                              name="tsl_decoder", **kw)(tsl_bottleneck, tsl_skips)
            seg = UGANDecoder(self.out_ch, self.width, transposed=True, use_tanh=False,
                              name="seg_decoder", **kw)(
                seg_bottleneck, seg_skips,
                packed_seg and self.pack_levels > 0)
        return seg.astype(jnp.float32), tsl.astype(jnp.float32), tsl_bottleneck


class UGAN(nn.Module):
    """Translator + segmenter; forward returns (seg_logits, translated)."""

    out_ch: int
    n_modal: int
    width: int = 32
    dtype: Dtype = jnp.float32
    pack_levels: int = 0
    pair_towers: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, m: Optional[jax.Array] = None,
                 packed_seg: bool = False):
        seg, tsl, _ = _UGANCore(self.out_ch, self.n_modal, self.width, self.dtype,
                                pack_levels=self.pack_levels,
                                pair_towers=self.pair_towers,
                                name="core")(x, m, packed_seg)
        return seg, tsl


class PatchSampleF(nn.Module):
    """MLP patch projector (`ugan.py:270-339`): gather ``patch_ids`` spatial
    positions (shared across the batch, like the reference's single randperm),
    project with Linear-ReLU-Linear, L2-normalize."""

    nc: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, patch_ids: jax.Array) -> jax.Array:
        b, h, w, c = feat.shape
        flat = feat.reshape(b, h * w, c)
        sample = jnp.take(flat, patch_ids, axis=1)          # [B, P, C]
        sample = sample.reshape(b * patch_ids.shape[0], c).astype(self.dtype)
        y = nn.Dense(self.nc, kernel_init=normal_init(0.02), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_0_fc1")(sample)
        y = jax.nn.relu(y)
        y = nn.Dense(self.nc, kernel_init=normal_init(0.02), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_0_fc2")(y)
        y = y.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(y), axis=1, keepdims=True)) + 1e-7
        return y / norm


class UGANnce(nn.Module):
    """UGAN + PatchNCE feature pool (`ugan.py:126-195`).

    ``patch_ids`` replaces the reference's ``sample_ids`` plumbing: sample a
    permutation of the bottleneck's H*W positions once per step and feed the
    same ids to the translate and reconstruct passes.  ``val_phase=True``
    skips the projector entirely.
    """

    out_ch: int
    n_modal: int
    width: int = 32
    netF_nc: int = 256
    dtype: Dtype = jnp.float32
    pack_levels: int = 0
    pair_towers: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, m: Optional[jax.Array] = None,
                 patch_ids: Optional[jax.Array] = None, val_phase: bool = False,
                 packed_seg: bool = False):
        seg, tsl, tsl_bottleneck = _UGANCore(self.out_ch, self.n_modal, self.width,
                                             self.dtype, pack_levels=self.pack_levels,
                                             pair_towers=self.pair_towers,
                                             name="core")(x, m, packed_seg)
        if val_phase:
            return seg, tsl
        assert patch_ids is not None, "patch_ids required outside val_phase"
        feat_pool = PatchSampleF(self.netF_nc, self.dtype, name="netF")(
            tsl_bottleneck, patch_ids)
        return seg, tsl, feat_pool


def sample_patch_ids(rng: jax.Array, hw: int, num_patches: int) -> jax.Array:
    """Reference behaviour: one randperm of the H*W positions, truncated to
    ``num_patches``, shared across the batch (`ugan.py:318-323`)."""
    return jax.random.permutation(rng, hw)[:num_patches]


class Discriminator(nn.Module):
    """PatchGAN + modality classifier (`ugan.py:198-229`): 4x4 stride-2 stem,
    log2(input)-2-1 stride-2 BottleBlocks, then a 1-channel patch head and an
    n_modal full-kernel class head."""

    input_size: int
    n_modal: int
    width: int = 32
    max_width: int = 512
    dtype: Dtype = jnp.float32
    pack_levels: int = 0   # >0: stride-2 stem on the space-to-depth grid

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        import numpy as np

        x = x.astype(self.dtype)
        from smsut_tpu.models import packed_w as pwk

        repeat_num = int(np.log2(self.input_size)) - 2
        width = self.width
        i0 = 1
        if self.pack_levels and pwk.d_pack_mode() == "w":
            p0 = pwk.pack_w0()
            y = pwk.PackedStride2ConvW(self.width, p0, "lrelu", self.dtype,
                                       use_bias=True, name="stem")(
                pwk.pack_w(x, p0))
            y = jax.nn.leaky_relu(y, negative_slope=1e-2)
            p = p0 // 2
            if pwk.d_pack_deep():
                # keep the narrow-channel pyramid W-packed: each stride-2
                # block halves the subpixels for free until p == 1
                in_ch = self.width
                while p >= 2 and i0 < repeat_num:
                    width = min(width * 2, self.max_width)
                    y = pwk.BottleBlockW(width, in_ch, p, "instance",
                                         "lrelu", stride=2, dtype=self.dtype,
                                         name=f"block{i0}")(y)
                    in_ch = width
                    p //= 2
                    i0 += 1
            x = pwk.unpack_w(y, p)
        elif self.pack_levels:
            from smsut_tpu.models import packed as pk

            x = pk.PackedStride2Conv(self.width, "lrelu", self.dtype,
                                     use_bias=True, name="stem")(
                pk.space_to_depth(x))
            x = jax.nn.leaky_relu(x, negative_slope=1e-2)
        else:
            x = nn.Conv(self.width, kernel_size=(4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=True,
                        kernel_init=kaiming_normal_fan_out("lrelu"),
                        dtype=self.dtype, param_dtype=jnp.float32, name="stem")(x)
            x = jax.nn.leaky_relu(x, negative_slope=1e-2)

        for i in range(i0, repeat_num):
            width = min(width * 2, self.max_width)
            x = BottleBlock(width, "instance", "lrelu", stride=2, dtype=self.dtype,
                            name=f"block{i}")(x)

        out_src = conv3x3(1, dtype=self.dtype, name="conv_src")(x)
        k = int(self.input_size // 2 ** repeat_num)
        # class head: the reference's full-kernel VALID conv producing
        # [B,1,1,n_modal] + reshape (`ugan.py:227-228`) IS a single global
        # contraction; emitting it as one dot (identical math, same
        # conv_cls/kernel param path/init) avoids the [B,1,1,n_modal]
        # intermediate whose backward reshape GSPMD could only re-shard by
        # involuntary full rematerialization on dp x tp meshes
        # (MULTICHIP_r04 tail; round-5 fix)
        from smsut_tpu.models.packed import _Kernel

        ck = _Kernel((k, k, x.shape[-1], self.n_modal),
                     kaiming_normal_fan_out("lrelu"), name="conv_cls")()
        out_cls = jnp.einsum("bhwc,hwcm->bm", x.astype(self.dtype),
                             ck.astype(self.dtype))
        return out_src.astype(jnp.float32), out_cls.astype(jnp.float32)
