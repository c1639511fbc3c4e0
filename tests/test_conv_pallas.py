# -*- coding: utf-8 -*-
"""Pallas SAME-conv kernel (ops/conv_pallas.py) == the XLA conv, forward
and gradients (interpret mode on the CPU test backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smsut_tpu.ops import conv_pallas as cp


def _xla_conv(x, wp):
    k = wp.shape[0]
    pad = [(k // 2, k // 2)] * 2
    return jax.lax.conv_general_dilated(
        x, wp, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k", [3])
@pytest.mark.parametrize("shape", [(2, 16, 16, 64), (1, 8, 8, 128),
                                   (2, 24, 16, 64)])
def test_forward_matches_xla(rng, k, shape):
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    wp = jnp.asarray(
        rng.normal(size=(k, k, shape[-1], 64)).astype(np.float32)) * 0.1
    np.testing.assert_allclose(
        np.asarray(cp.conv_same_pallas(x, wp)),
        np.asarray(_xla_conv(x, wp)), rtol=2e-4, atol=2e-4)


def test_gradients_match_xla(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))
    wp = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32)) * 0.1
    t = jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))

    def loss(fn):
        return lambda xx, ww: jnp.sum(jnp.square(fn(xx, ww) - t))

    g_ref = jax.grad(loss(_xla_conv), argnums=(0, 1))(x, wp)
    g_pl = jax.grad(loss(cp.conv_same_pallas), argnums=(0, 1))(x, wp)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_packed_conv_apply_routes_through_pallas(rng, monkeypatch):
    """With the switch armed, packed_conv_apply's output (and gradient wrt
    the ORIGINAL kernel parameter) is unchanged."""
    from smsut_tpu.models import packed as pk

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 16)).astype(np.float32))

    def f(ww, xx):
        return jnp.sum(jnp.square(
            pk.packed_conv_apply(xx, ww, (16,), jnp.float32)))

    y0, g0 = jax.value_and_grad(f)(w, x)
    cp.set_conv_pallas(True)
    try:
        assert cp.enabled_for(x.shape, 3)
        y1, g1 = jax.value_and_grad(f)(w, x)
    finally:
        cp.set_conv_pallas(False)
    np.testing.assert_allclose(float(y1), float(y0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-3, atol=2e-3)


def test_enabled_for_guards():
    cp.set_conv_pallas(True)
    try:
        assert cp.enabled_for((2, 16, 16, 64), 3)
        assert not cp.enabled_for((2, 16, 16, 32), 3)      # narrow lanes
        assert not cp.enabled_for((2, 16, 16, 64), 4)      # even k (stem)
        assert not cp.enabled_for((2, 16, 16, 64), 1)      # 1x1 stays XLA
        assert not cp.enabled_for((2, 512, 512, 128), 3)   # VMEM blowout
    finally:
        cp.set_conv_pallas(False)
    assert not cp.enabled_for((2, 16, 16, 64), 3)          # disarmed
