# -*- coding: utf-8 -*-
"""UNetPair (tower-paired level-0, models/paired.py) == two separate UNet
applies: identical parameter-tree structure per net and identical outputs;
bitwise-equal in f64 with native-dtype norm statistics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smsut_tpu.models import packed_w as pwk
from smsut_tpu.models.unet import UNet, UNetPair


@pytest.fixture(autouse=True)
def _hw_mode():
    pwk.set_pack_mode("hw", 8, False, "")
    yield


def _nets(pack_levels):
    kw = dict(out_ch=5, width=8, norm_type="instance", act_type="lrelu",
              dtype=jnp.float32, pack_levels=pack_levels)
    return UNet(**kw), UNetPair(**kw)


@pytest.mark.parametrize("pack_levels", [1, 2])
def test_structure_and_forward(rng, pack_levels):
    net, pair = _nets(pack_levels)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    p1 = net.init(jax.random.PRNGKey(0), x)["params"]
    p2 = net.init(jax.random.PRNGKey(1), x)["params"]
    # the pair consumes two ordinary UNet trees under n1/n2
    o1, o2 = pair.apply({"params": {"n1": p1, "n2": p2}}, x)
    y1 = net.apply({"params": p1}, x)
    y2 = net.apply({"params": p2}, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(y2),
                               rtol=1e-4, atol=1e-4)
    # structure identity: init'ing the pair yields exactly two UNet trees
    pp = pair.init(jax.random.PRNGKey(2), x)["params"]
    s0 = jax.tree_util.tree_structure(
        jax.tree.map(lambda a: a.shape, {"n1": p1, "n2": p2}))
    s1 = jax.tree_util.tree_structure(jax.tree.map(lambda a: a.shape, pp))
    assert s0 == s1
    for (k0, v0), (k1, v1) in zip(
            jax.tree_util.tree_flatten_with_path({"n1": p1, "n2": p2})[0],
            jax.tree_util.tree_flatten_with_path(pp)[0]):
        assert k0 == k1 and v0.shape == v1.shape, (k0, k1)


def test_exact_equivalence_f64(rng):
    from smsut_tpu.models import layers

    layers.set_norm_stats("native")
    try:
        with jax.enable_x64():
            kw = dict(out_ch=5, width=8, norm_type="instance",
                      act_type="lrelu", dtype=jnp.float64, pack_levels=2)
            net, pair = UNet(**kw), UNetPair(**kw)
            x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)))
            p1 = jax.tree.map(lambda a: a.astype(jnp.float64),
                              net.init(jax.random.PRNGKey(0), x)["params"])
            p2 = jax.tree.map(lambda a: a.astype(jnp.float64),
                              net.init(jax.random.PRNGKey(1), x)["params"])
            o1, o2 = pair.apply({"params": {"n1": p1, "n2": p2}}, x)
            y1 = net.apply({"params": p1}, x)
            y2 = net.apply({"params": p2}, x)
            assert bool(jnp.all(o1 == y1)) and bool(jnp.all(o2 == y2)), (
                float(jnp.abs(o1 - y1).max()), float(jnp.abs(o2 - y2).max()))

            def loss_pair(ps):
                a, b = pair.apply({"params": ps}, x)
                return jnp.mean(jnp.square(a)) + jnp.mean(jnp.abs(b))

            def loss_sep(ps):
                a = net.apply({"params": ps["n1"]}, x)
                b = net.apply({"params": ps["n2"]}, x)
                return jnp.mean(jnp.square(a)) + jnp.mean(jnp.abs(b))

            ps = {"n1": p1, "n2": p2}
            g0 = jax.grad(loss_sep)(ps)
            g1 = jax.grad(loss_pair)(ps)
            for (k, v), (k2, v2) in zip(
                    jax.tree_util.tree_flatten_with_path(g0)[0],
                    jax.tree_util.tree_flatten_with_path(g1)[0]):
                assert k == k2
                d = float(np.abs(np.asarray(v) - np.asarray(v2)).max())
                assert d <= 1e-10, (k, d)
    finally:
        layers.set_norm_stats("reduce")
