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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        pack = self.pack_levels if self.norm_type == "instance" else 0
        h, skips = Encoder(self.width, self.norm_type, self.act_type, self.dtype,
                           pack_levels=pack, name="encoder")(x)
        y = Decoder(self.out_ch, self.width, self.norm_type, self.act_type, self.dtype,
                    pack_levels=pack, name="decoder")(h, skips)
        return y.astype(jnp.float32)
