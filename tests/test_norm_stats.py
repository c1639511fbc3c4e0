# -*- coding: utf-8 -*-
"""norm_stats='dot' (MXU-contraction statistics) == the reduce-based
statistics, through every norm path that consumes spatial_sums."""
import jax
import jax.numpy as jnp
import numpy as np

from smsut_tpu.models import layers


def _with_dot(fn):
    layers.set_stats_dot(True)
    try:
        return fn()
    finally:
        layers.set_stats_dot(False)


def test_spatial_sums_match(rng):
    x = jnp.asarray(rng.normal(size=(3, 12, 10, 7)).astype(np.float32))
    a1, a2 = layers.spatial_sums(x)
    b1, b2 = _with_dot(lambda: layers.spatial_sums(x))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(a1),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(a2),
                               rtol=1e-5, atol=1e-4)


def test_norm_act_matches(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)).astype(np.float32))
    mod = layers.NormAct("instance", "lrelu", jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    y0 = mod.apply(params, x)
    y1 = _with_dot(lambda: mod.apply(params, x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)


def test_packed_norm_matches(rng):
    from smsut_tpu.models.packed import PackedNormAct

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4 * 6)).astype(np.float32))
    mod = PackedNormAct("instance", "lrelu", 6, jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    y0 = mod.apply(params, x)
    y1 = _with_dot(lambda: mod.apply(params, x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)


def test_norm_stats_w_matches(rng):
    from smsut_tpu.models import packed_w as pw

    x = jnp.asarray(rng.normal(size=(2, 8, 4, 4 * 3)).astype(np.float32))
    a = pw.norm_stats_w(x, 4, 3)
    b = _with_dot(lambda: pw.norm_stats_w(x, 4, 3))
    assert a[2] == b[2]
    for u, v in zip(a[:2], b[:2]):
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   rtol=1e-5, atol=1e-4)


def _with_bf16(fn):
    layers.set_norm_stats("bf16")
    try:
        return fn()
    finally:
        layers.set_norm_stats("reduce")


def test_bf16_stats_drift_bounded(rng):
    """norm_stats='bf16' is NOT identical math — bound the normalized-output
    drift at the model's hot shape so the knob stays a safe experiment
    (unit-scale activations, 128^2 spatial: the worst accumulator load)."""
    x = jnp.asarray(
        rng.normal(size=(2, 128, 128, 8)).astype(np.float32), jnp.bfloat16)
    mod = layers.NormAct("instance", "lrelu", jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    y0 = np.asarray(mod.apply(params, x), np.float32)
    y1 = np.asarray(_with_bf16(lambda: mod.apply(params, x)), np.float32)
    # one bf16 ulp of a unit-variance normalized output is ~2^-8; allow a
    # few ulps of statistics drift on top.
    assert np.max(np.abs(y1 - y0)) < 0.05, np.max(np.abs(y1 - y0))
    assert np.sqrt(np.mean(np.square(y1 - y0))) < 0.01


def test_stack_stats_equal_bf16_stats(rng):
    """norm_stats='stack' (one reduce over [x | x^2] lanes) produces
    EXACTLY the 'bf16' mode's sums — each lane reduces independently over
    the same (H, W) order, so the stacked kernel changes only the kernel
    count, not any value."""
    x = jnp.asarray(
        rng.normal(size=(2, 32, 32, 12)).astype(np.float32), jnp.bfloat16)

    def sums(mode):
        layers.set_norm_stats(mode)
        try:
            return [np.asarray(s) for s in layers.spatial_sums(
                x.astype(jnp.float32))]
        finally:
            layers.set_norm_stats("reduce")

    a1, a2 = sums("bf16")
    b1, b2 = sums("stack")
    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)

    # and through a norm end-to-end, gradients included
    mod = layers.NormAct("instance", "lrelu", jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)

    def run(mode):
        layers.set_norm_stats(mode)
        try:
            y = mod.apply(params, x)
            g = jax.grad(lambda xx: jnp.sum(
                jnp.square(mod.apply(params, xx).astype(jnp.float32))))(x)
            return np.asarray(y, np.float32), np.asarray(g, np.float32)
        finally:
            layers.set_norm_stats("reduce")

    y_b, g_b = run("bf16")
    y_s, g_s = run("stack")
    np.testing.assert_array_equal(y_s, y_b)
    np.testing.assert_allclose(g_s, g_b, rtol=1e-5, atol=1e-6)


def test_gradients_match(rng):
    """The dot-based stats produce the same gradients (the norm backward
    flows through the statistics)."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
    mod = layers.NormAct("instance", "lrelu", jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)

    def loss(xx):
        return jnp.sum(jnp.square(mod.apply(params, xx)))

    g0 = jax.grad(loss)(x)
    g1 = _with_dot(lambda: jax.grad(loss)(x))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-4)
