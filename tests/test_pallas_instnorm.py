# -*- coding: utf-8 -*-
"""Fused Pallas InstanceNorm+LeakyReLU: forward/backward parity vs plain JAX
(interpret-compatible on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smsut_tpu.ops.instnorm_pallas import (
    instance_norm_lrelu,
    instance_norm_lrelu_reference,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    # Pallas TPU kernels run in interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _inputs(rng, b=2, h=8, w=8, c=16):
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32)) * 2 + 0.3
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.2 + 1.0)
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    return x, scale, bias


def test_forward_matches_reference(rng):
    x, scale, bias = _inputs(rng)
    got = instance_norm_lrelu(x, scale, bias)
    want = instance_norm_lrelu_reference(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference(rng):
    x, scale, bias = _inputs(rng, b=2, h=4, w=4, c=8)

    def loss_pallas(x, s, b):
        return jnp.sum(jnp.sin(instance_norm_lrelu(x, s, b)))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.sin(instance_norm_lrelu_reference(x, s, b)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_bfloat16_activations(rng):
    x, scale, bias = _inputs(rng)
    got = instance_norm_lrelu(x.astype(jnp.bfloat16), scale, bias)
    assert got.dtype == jnp.bfloat16
    want = instance_norm_lrelu_reference(x.astype(jnp.bfloat16), scale, bias)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=0.05, atol=0.05)
