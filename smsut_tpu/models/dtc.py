# -*- coding: utf-8 -*-
"""Dual-task U-Net (`/root/reference/network/dtc.py:13-59`): shared 5-level
encoder + one decoder with two heads — tanh regression (signed distance) and
plain logits.  Exposed as a model variant for the DTC capability referenced by
the paper (the reference ships the network unused)."""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from smsut_tpu.models.blocks import BasicBlock, Encoder, UpSampleAndConcat
from smsut_tpu.models.layers import conv1x1

Dtype = Any


class DualTaskDecoder(nn.Module):
    out_ch: int
    width: int = 32
    norm_type: str = "batch"
    act_type: str = "lrelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skips) -> Tuple[jax.Array, jax.Array]:
        w = self.width
        for i, mult in zip((4, 3, 2, 1), (8, 4, 2, 1)):
            x = UpSampleAndConcat(mult * w, transposed=True, act_type=self.act_type,
                                  dtype=self.dtype, name=f"up{i}")(x, skips[i - 1])
            x = BasicBlock(mult * w, self.norm_type, self.act_type, self.dtype,
                           name=f"layer{i}")(x)
        out1 = jnp.tanh(conv1x1(self.out_ch, dtype=self.dtype, name="fc1")(x))
        out2 = conv1x1(self.out_ch, dtype=self.dtype, name="fc2")(x)
        return out1.astype(jnp.float32), out2.astype(jnp.float32)


class DTCUNet(nn.Module):
    out_ch: int
    width: int = 64
    norm_type: str = "batch"
    act_type: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        h, skips = Encoder(self.width, self.norm_type, self.act_type, self.dtype,
                           name="encoder")(x)
        return DualTaskDecoder(self.out_ch, self.width, self.norm_type, self.act_type,
                               self.dtype, name="decoder")(h, skips)
