# -*- coding: utf-8 -*-
"""Tower-paired level-0 execution (Config.pair_towers) == the unpaired twin
towers: identical parameter trees (paths, shapes, init values — checkpoints
interchangeable) and identical forward/gradients.  The paired lowering only
adds products against structural zeros, which f32 accumulation ignores."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smsut_tpu.models import packed_w as pwk
from smsut_tpu.models.ugan import UGAN, UGANnce


@pytest.fixture(autouse=True)
def _hw_mode():
    pwk.set_pack_mode("hw", 8, False, "")
    yield


def _models(pack_levels, nce=False):
    kw = dict(out_ch=5, n_modal=4, width=8, dtype=jnp.float32,
              pack_levels=pack_levels)
    cls = UGANnce if nce else UGAN
    return cls(**kw, pair_towers=False), cls(**kw, pair_towers=True)


@pytest.mark.parametrize("pack_levels", [1, 2])
def test_params_identical(rng, pack_levels):
    base, paired = _models(pack_levels)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    m = jnp.eye(4)[jnp.asarray([0, 2])].astype(jnp.float32)
    p0 = base.init(jax.random.PRNGKey(7), x, m)
    p1 = paired.init(jax.random.PRNGKey(7), x, m)
    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(p1)[0])
    assert set(flat1) == {k for k, _ in flat0}
    for k, v in flat0:
        np.testing.assert_array_equal(np.asarray(flat1[k]), np.asarray(v),
                                      err_msg=str(k))


@pytest.mark.parametrize("pack_levels", [1, 2])
def test_forward_identical(rng, pack_levels):
    base, paired = _models(pack_levels)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    m = jnp.eye(4)[jnp.asarray([1, 3])].astype(jnp.float32)
    params = base.init(jax.random.PRNGKey(0), x, m)
    seg0, tsl0 = base.apply(params, x, m)
    seg1, tsl1 = paired.apply(params, x, m)
    np.testing.assert_allclose(np.asarray(seg1), np.asarray(seg0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tsl1), np.asarray(tsl0),
                               rtol=1e-4, atol=1e-4)


def test_exact_equivalence_f64():
    """The DEFINITIVE equivalence proof: in float64 with norm statistics in
    the activations' own dtype (norm_stats='native'), the paired lowering is
    BITWISE equal forward and grads agree to f64 noise — the extra products
    are against structural zeros, which exact accumulation ignores.  (In the
    default f32 mode the stat quantization makes reduction-order noise
    visible; the forward tests above bound it.)"""
    from smsut_tpu.models import layers

    rng = np.random.default_rng(11)
    layers.set_norm_stats("native")
    try:
        with jax.enable_x64():
            kw = dict(out_ch=5, n_modal=4, width=8, dtype=jnp.float64,
                      pack_levels=2)
            base = UGAN(**kw, pair_towers=False)
            paired = UGAN(**kw, pair_towers=True)
            x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)))
            m = jnp.eye(4, dtype=jnp.float64)[jnp.asarray([0, 1])]
            params = jax.tree.map(
                lambda a: a.astype(jnp.float64),
                base.init(jax.random.PRNGKey(1), x, m))
            s0, t0 = base.apply(params, x, m)
            s1, t1 = paired.apply(params, x, m)
            assert bool(jnp.all(s0 == s1)) and bool(jnp.all(t0 == t1)), (
                float(jnp.abs(s0 - s1).max()), float(jnp.abs(t0 - t1).max()))

            def loss(mod):
                def f(p):
                    seg, tsl = mod.apply(p, x, m)
                    return jnp.mean(jnp.square(seg)) + jnp.mean(jnp.abs(tsl))
                return f

            g0 = jax.grad(loss(base))(params)
            g1 = jax.grad(loss(paired))(params)
            for (k, v), (k2, v2) in zip(
                    jax.tree_util.tree_flatten_with_path(g0)[0],
                    jax.tree_util.tree_flatten_with_path(g1)[0]):
                assert k == k2
                d = float(np.abs(np.asarray(v) - np.asarray(v2)).max())
                assert d <= 1e-10, (k, d)
    finally:
        layers.set_norm_stats("reduce")


@pytest.mark.parametrize("k,segs", [(3, (4,)), (1, (4,)), (3, (4, 8))])
def test_blockdw_matches_dense_dw(rng, k, segs):
    """paired_conv's custom VJP (dw='block': per-diagonal-block weight
    grads) == plain autodiff through the block-diagonal kernel
    (dw='dense'), for both kernel sizes and segmented inputs."""
    from smsut_tpu.models.paired import paired_conv

    cin, cout = sum(segs), 8
    wa = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    wb = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8 * cin)).astype(np.float32))

    def loss(impl):
        def f(args):
            xx, a, b = args
            y = paired_conv(xx, a, b, segs, segs, jnp.float32, dw=impl)
            return jnp.sum(y * y)
        return f

    y0 = paired_conv(x, wa, wb, segs, segs, jnp.float32, dw="dense")
    y1 = paired_conv(x, wa, wb, segs, segs, jnp.float32, dw="block")
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
    g0 = jax.grad(loss("dense"))((x, wa, wb))
    g1 = jax.grad(loss("block"))((x, wa, wb))
    for v0, v1 in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   rtol=1e-4, atol=1e-4)


def test_nce_bottleneck_identical(rng):
    base, paired = _models(2, nce=True)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    m = jnp.eye(4)[jnp.asarray([2, 0])].astype(jnp.float32)
    ids = jnp.asarray([0, 3, 7, 9], jnp.int32)
    params = base.init(jax.random.PRNGKey(2), x, m, patch_ids=ids)
    o0 = base.apply(params, x, m, patch_ids=ids)
    o1 = paired.apply(params, x, m, patch_ids=ids)
    for a, b in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
