# -*- coding: utf-8 -*-
"""Segmentation U-Net (`/root/reference/network/unet.py:13-32`).

Instantiated everywhere as UNet(out_ch=5, width=16, instance, lrelu)
(`trainer/unetTrainer.py:42`).  Logits are returned in float32 so losses and
argmax stay full-precision even under bfloat16 compute.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from smsut_tpu.models.blocks import Decoder, Encoder

Dtype = Any


class UNet(nn.Module):
    out_ch: int
    width: int = 64
    norm_type: str = "batch"
    act_type: str = "relu"
    dtype: Dtype = jnp.float32
    # run the first N levels space-to-depth packed (identical math, TPU
    # lane-friendly; models/packed.py).  Requires H/W divisible by 2^N and
    # instance norm.
    pack_levels: int = 0
    # rematerialize encoder/decoder in the backward pass (jax.checkpoint):
    # identical math, trades recompute FLOPs for activation HBM traffic —
    # aimed at the batch>=32 VMEM-spilled regime (BASELINE.md batch
    # scaling).  Param tree unchanged (nn.remat is a lifted transform).
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, packed_out: bool = False) -> jax.Array:
        """``packed_out=True`` (train-loss path, packed levels only)
        returns the packed [B,H/2,W/2,4*out_ch] logits for the packed loss
        variants in ops/losses.py instead of the depth-to-space'd full
        grid — identical per-pixel values, no unpack materialization."""
        x = x.astype(self.dtype)
        pack = self.pack_levels if self.norm_type == "instance" else 0
        # packed_out is Python control flow inside Decoder (blocks.py) — it
        # must stay static under the checkpoint trace (static_argnums counts
        # __call__'s args with the module as arg 0, so packed_out is 3).
        Enc, Dec = ((nn.remat(Encoder), nn.remat(Decoder, static_argnums=(3,)))
                    if self.remat else (Encoder, Decoder))
        h, skips = Enc(self.width, self.norm_type, self.act_type, self.dtype,
                       pack_levels=pack, name="encoder")(x)
        y = Dec(self.out_ch, self.width, self.norm_type, self.act_type, self.dtype,
                pack_levels=pack, name="decoder")(h, skips,
                                                  packed_out and pack > 0)
        return y.astype(jnp.float32)


class _UNetSplit(nn.Module):
    """One tower of UNetPair: the UNet's encoder/decoder as Split modules
    (level 0 staged out; identical parameter tree to UNet)."""

    out_ch: int
    width: int
    cin: int
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    pack_levels: int = 1

    def setup(self):
        from smsut_tpu.models.blocks import DecoderSplit, EncoderSplit

        self.encoder = EncoderSplit(self.width, self.cin, self.norm_type,
                                    self.act_type, self.dtype,
                                    self.pack_levels)
        self.decoder = DecoderSplit(self.out_ch, self.width, self.norm_type,
                                    self.act_type, self.dtype,
                                    self.pack_levels)


class UNetPair(nn.Module):
    """TWO UNets (independent parameter trees n1/n2, each identical to
    UNet's) applied to the SAME input as one tower-paired program: both
    nets' level-0 stages execute as block-diagonal full-lane convs
    (models/paired.py — the cross-pseudo-supervision hot path runs two
    U-Nets per iteration, `/root/reference/trainer/crossPseTrainer.py:108-135`).
    Identical math to two separate UNet applies
    (tests/test_paired_unet.py)."""

    out_ch: int
    width: int = 16
    norm_type: str = "instance"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32
    pack_levels: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, packed_out: bool = False):
        from smsut_tpu.models import packed as pk
        from smsut_tpu.models import paired as pr

        x = x.astype(self.dtype)
        w = self.width
        kw = dict(norm_type=self.norm_type, act_type=self.act_type,
                  dtype=self.dtype, pack_levels=self.pack_levels)
        n1 = _UNetSplit(self.out_ch, w, x.shape[-1], name="n1", **kw)
        n2 = _UNetSplit(self.out_ch, w, x.shape[-1], name="n2", **kw)
        pa, pb = n1.encoder.level0(), n2.encoder.level0()
        Xp = pk.space_to_depth(x)
        X = jnp.concatenate([Xp, Xp], axis=-1)
        y = pr.paired_conv(X, pa["pre_conv"], pb["pre_conv"],
                           (x.shape[-1],), (x.shape[-1],), self.dtype)
        y = pr.paired_norm_act(y, pa["pre_bn"], pb["pre_bn"], w // 2,
                               self.act_type, self.dtype)
        y = pr.paired_block(y, pa["enc1"], pb["enc1"], (w // 2,), w,
                            self.act_type, self.dtype)
        skipA, skipB = pr.split2(y)
        last = self.pack_levels == 1
        h1, rest1 = n1.encoder.tail(pk.pool_to_next_level(skipA, w, last=last))
        h2, rest2 = n2.encoder.tail(pk.pool_to_next_level(skipB, w, last=last))
        sk1 = [skipA] + rest1
        sk2 = [skipB] + rest2
        d1 = n1.decoder.head(h1, sk1)
        d2 = n2.decoder.head(h2, sk2)
        u1 = n1.decoder.up1_apply(d1, sk1[0])
        u2 = n2.decoder.up1_apply(d2, sk2[0])
        yd = pr.paired_block(jnp.concatenate([u1, u2], axis=-1),
                             n1.decoder.dec1_params(), n2.decoder.dec1_params(),
                             (w, w), w, self.act_type, self.dtype)
        ya, yb = pr.split2(yd)
        out1 = n1.decoder.fc_apply(ya, packed_out)
        out2 = n2.decoder.fc_apply(yb, packed_out)
        return out1.astype(jnp.float32), out2.astype(jnp.float32)
