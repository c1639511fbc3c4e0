# -*- coding: utf-8 -*-
"""Fused InstanceNorm(affine) + LeakyReLU as a Pallas TPU kernel.

The UNet/UGAN hot path is conv -> instance-norm -> leaky-relu at every block
(`/root/reference/network/blocks.py:53-80`).  The norm is memory-bound: XLA
materializes the statistics pass and the normalize pass as separate HBM
traversals.  This kernel keeps one sample's [H, W, C] activation resident in
VMEM and does stats + normalize + affine + activation in a single HBM
read/write — and the custom VJP does the same for the backward pass.

Grid: one program per batch sample.  Channels ride the 128-wide lane
dimension; H*W rides sublanes.  Statistics accumulate in float32 regardless
of the activation dtype.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 1e-2
EPS = 1e-5

# VMEM budget guard: the backward kernel holds x + g + dx blocks plus f32
# intermediates (~3x the f32 block size in scoped VMEM).  Blocks whose f32
# footprint exceeds this limit fall back to the plain-JAX path.
_F32_BLOCK_LIMIT = 8 * 1024 * 1024
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024  # v5e has 128MiB VMEM/core


def fits_vmem(shape: Tuple[int, ...], dtype) -> bool:
    del dtype  # intermediates are f32 regardless of activation dtype
    b, h, w, c = shape
    lanes = -(-c // 128) * 128
    return h * w * lanes * 4 <= _F32_BLOCK_LIMIT


def _make_fwd_kernel(slope: float):
    def _fwd_kernel(x_ref, scale_ref, bias_ref, out_ref, mean_ref, rstd_ref):
        x = x_ref[0].astype(jnp.float32)              # [H, W, C]
        h, w, c = x.shape
        xr = x.reshape(h * w, c)
        mean = jnp.mean(xr, axis=0, keepdims=True)                    # [1, C]
        var = jnp.mean(jnp.square(xr), axis=0, keepdims=True) - jnp.square(mean)
        rstd = jax.lax.rsqrt(var + EPS)
        xhat = (xr - mean) * rstd
        y = xhat * scale_ref[0] + bias_ref[0]
        z = y if slope == 1.0 else jnp.where(y >= 0, y, slope * y)
        out_ref[0] = z.reshape(h, w, c).astype(out_ref.dtype)
        mean_ref[0, 0] = mean[0]
        rstd_ref[0, 0] = rstd[0]

    return _fwd_kernel


def _make_bwd_kernel(slope: float):
    def _bwd_kernel(x_ref, scale_ref, bias_ref, mean_ref, rstd_ref, g_ref,
                    dx_ref, dscale_ref, dbias_ref):
        x = x_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        h, w, c = x.shape
        xr = x.reshape(h * w, c)
        gr = g.reshape(h * w, c)
        mean = mean_ref[0, 0][None, :]
        rstd = rstd_ref[0, 0][None, :]
        scale = scale_ref[0][None, :]
        xhat = (xr - mean) * rstd
        if slope == 1.0:
            dy = gr
        else:
            y = xhat * scale + bias_ref[0][None, :]
            dy = jnp.where(y >= 0, gr, slope * gr)

        dscale_ref[0, 0] = jnp.sum(dy * xhat, axis=0)
        dbias_ref[0, 0] = jnp.sum(dy, axis=0)

        # dx = scale*rstd * (dy - mean(dy) - xhat * mean(dy*xhat))
        m_dy = jnp.mean(dy, axis=0, keepdims=True)
        m_dyx = jnp.mean(dy * xhat, axis=0, keepdims=True)
        dx = scale * rstd * (dy - m_dy - xhat * m_dyx)
        dx_ref[0] = dx.reshape(h, w, c).astype(dx_ref.dtype)

    return _bwd_kernel


def _fwd_call(x, scale, bias, slope=NEG_SLOPE):
    b, h, w, c = x.shape
    out, mean, rstd = pl.pallas_call(
        _make_fwd_kernel(slope),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(x, scale.reshape(1, c), bias.reshape(1, c))
    return out, mean, rstd


def _make_fused(slope: float):
    @jax.custom_vjp
    def fused(x, scale, bias):
        out, _, _ = _fwd_call(x, scale, bias, slope)
        return out

    def _vjp_fwd(x, scale, bias):
        out, mean, rstd = _fwd_call(x, scale, bias, slope)
        return out, (x, scale, bias, mean, rstd)

    def _vjp_bwd(res, g):
        return _bwd_call(res, g, slope)

    fused.defvjp(_vjp_fwd, _vjp_bwd)
    return fused


def _bwd_call(res, g, slope):
    x, scale, bias, mean, rstd = res
    b, h, w, c = x.shape
    dx, dscale, dbias = pl.pallas_call(
        _make_bwd_kernel(slope),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(x, scale.reshape(1, c), bias.reshape(1, c), mean, rstd, g)
    return dx, jnp.sum(dscale, axis=(0, 1)), jnp.sum(dbias, axis=(0, 1))


# Fused InstanceNorm2d(affine=True, eps=1e-5) + LeakyReLU(0.01), NHWC.
instance_norm_lrelu = _make_fused(NEG_SLOPE)
# Fused InstanceNorm2d(affine=True) without activation (bn2/shortcut sites).
instance_norm_affine = _make_fused(1.0)


def instance_norm_lrelu_reference(x, scale, bias):
    """Plain-JAX reference used for tests and as the non-Pallas fallback."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    return jax.nn.leaky_relu(y, NEG_SLOPE).astype(x.dtype)
