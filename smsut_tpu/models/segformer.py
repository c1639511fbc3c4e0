# -*- coding: utf-8 -*-
"""SegFormer-lite backbone + linear-fuse head with input-patch masking.

The reference's M3L trainer imports
`network.linearfusemaskedconsmixbatch.segformer` which is absent from the
repo (`/root/reference/trainer/M3LTrainer.py:37`, SURVEY appendix) — the
capability is re-created here from the published SegFormer (MiT) design: 4
stages of overlapping patch embeddings + efficient self-attention with
spatial-reduction + MixFFN, and an all-MLP decoder that linear-projects every
stage to a common width, upsamples to 1/4 scale and fuses with a 1x1 conv.

``LinearFusionMaskedConsistencyMixBatch`` matches the call surface used by
the trainer (`M3LTrainer.py:124-137`): ``(x, mask=bool,
range_batches_to_mask=[lo, hi])`` with random input-patch masking applied
only to the samples in that batch range (the M3L masked-consistency recipe).
Masked patches are replaced by a learned mask token at the stem embedding.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class EfficientAttention(nn.Module):
    """Self-attention with spatial-reduction of K/V (SegFormer §3.1)."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        b, n, c = x.shape
        heads = self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            xr = x.reshape(b, h, w, c)
            xr = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         dtype=self.dtype, name="sr")(xr)
            xr = xr.reshape(b, -1, self.dim)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="sr_norm")(xr)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_in)

        def split(t):
            return t.reshape(b, -1, heads, self.dim // heads).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(self.dim // heads)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    """FC -> 3x3 depthwise conv -> GELU -> FC (SegFormer Mix-FFN)."""

    dim: int
    expand: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        b, n, c = x.shape
        hidden = self.dim * self.expand
        y = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        y = y.reshape(b, h, w, hidden)
        y = nn.Conv(hidden, (3, 3), padding="SAME", feature_group_count=hidden,
                    dtype=self.dtype, name="dwconv")(y)
        y = y.reshape(b, n, hidden)
        y = jax.nn.gelu(y)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: int, w: int) -> jax.Array:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                                   self.dtype, name="attn")(y, h, w)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + MixFFN(self.dim, dtype=self.dtype, name="ffn")(y, h, w)
        return x


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, int, int]:
        pad = self.patch // 2
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    dtype=self.dtype, name="proj")(x)
        b, h, w, c = x.shape
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x.reshape(b, h * w, c))
        return x, h, w


class MixVisionTransformer(nn.Module):
    """MiT-b0-style encoder: widths (32,64,160,256), depths (2,2,2,2)."""

    dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask_token_map: Optional[jax.Array] = None) -> List[jax.Array]:
        feats = []
        for stage in range(4):
            patch = 7 if stage == 0 else 3
            stride = 4 if stage == 0 else 2
            x, h, w = OverlapPatchEmbed(self.dims[stage], patch, stride,
                                        self.dtype, name=f"embed{stage + 1}")(x)
            if stage == 0:
                # learned mask token, applied only when a mask map is given
                token = self.param("mask_token", nn.initializers.normal(0.02),
                                   (self.dims[0],), jnp.float32)
                if mask_token_map is not None:
                    m = mask_token_map.reshape(x.shape[0], -1, 1).astype(x.dtype)
                    x = x * (1.0 - m) + token.astype(x.dtype) * m
            for blk in range(self.depths[stage]):
                x = TransformerBlock(self.dims[stage], self.heads[stage],
                                     self.sr_ratios[stage], self.dtype,
                                     name=f"stage{stage + 1}_block{blk}")(x, h, w)
            x = nn.LayerNorm(dtype=self.dtype, name=f"norm{stage + 1}")(x)
            x = x.reshape(x.shape[0], h, w, self.dims[stage])
            feats.append(x)
        return feats


class LinearFusionMaskedConsistencyMixBatch(nn.Module):
    """SegFormer + all-MLP decoder with batch-range input masking
    (call surface of `M3LTrainer.py:124-137`)."""

    num_classes: int
    embed_dim: int = 256
    mask_patch: int = 16
    mask_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: bool = False,
                 range_batches_to_mask: Optional[Sequence[int]] = None,
                 mask_rng: Optional[jax.Array] = None) -> jax.Array:
        b, h, w, _ = x.shape
        x = x.astype(self.dtype)

        mask_token_map = None
        if mask and mask_rng is not None and range_batches_to_mask is not None:
            # random patch mask at stem resolution (1/4), only for samples in
            # [lo, hi)
            hs, ws = h // 4, w // 4
            ph, pw = self.mask_patch // 4, self.mask_patch // 4
            grid = jax.random.bernoulli(
                mask_rng, self.mask_ratio,
                (b, max(1, hs // max(ph, 1)), max(1, ws // max(pw, 1))))
            grid = jnp.repeat(jnp.repeat(grid, max(ph, 1), 1), max(pw, 1), 2)
            grid = grid[:, :hs, :ws].astype(jnp.float32)
            lo, hi = range_batches_to_mask
            in_range = (jnp.arange(b) >= lo) & (jnp.arange(b) < hi)
            mask_token_map = grid * in_range[:, None, None].astype(jnp.float32)

        feats = MixVisionTransformer(dtype=self.dtype, name="backbone")(
            x, mask_token_map)

        fused = []
        for i, f in enumerate(feats):
            y = nn.Dense(self.embed_dim, dtype=self.dtype, name=f"linear_c{i + 1}")(f)
            if f.shape[1] != feats[0].shape[1]:
                y = jax.image.resize(y, (b, feats[0].shape[1], feats[0].shape[2],
                                         self.embed_dim), method="bilinear")
            fused.append(y)
        y = jnp.concatenate(fused[::-1], axis=-1)
        y = nn.Conv(self.embed_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="linear_fuse")(y)
        # batch norm (training mode) + relu like the SegFormer head
        mean = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=(0, 1, 2),
                       keepdims=True) - jnp.square(mean)
        scale = self.param("fuse_scale", nn.initializers.ones,
                           (self.embed_dim,), jnp.float32)
        bias = self.param("fuse_bias", nn.initializers.zeros,
                          (self.embed_dim,), jnp.float32)
        y = ((y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
             * scale + bias).astype(self.dtype)
        y = jax.nn.relu(y)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="linear_pred")(y)
        y = jax.image.resize(y.astype(jnp.float32), (b, h, w, self.num_classes),
                             method="bilinear")
        return y
