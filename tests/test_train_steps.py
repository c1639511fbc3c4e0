# -*- coding: utf-8 -*-
"""Single-step smoke + semantics tests for each algorithm's jitted step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.train.steps.cross_pseudo import CrossPseudo
from smsut_tpu.train.steps.gan import UGANConsisAlgo, UGANShp0Algo, UGANTrainerAlgo
from smsut_tpu.train.steps.mean_teacher import MeanTeacher
from smsut_tpu.train.steps.supervised import SupervisedUNet

CFG = Config(input_size=32, base_width=4, batch_size=2, num_iter_per_epoch=2,
             max_epoch=2, compute_dtype="float32")


def _batch(rng, bs=2, size=32, with_ul=False):
    b = {
        "img": jnp.asarray(rng.normal(size=(bs, size, size, 1)).astype(np.float32)),
        "msk": jnp.asarray(rng.integers(0, 5, size=(bs, size, size)).astype(np.int32)),
        "mdl": jnp.asarray(rng.integers(0, 4, size=(bs,)).astype(np.int32)),
    }
    if with_ul:
        b["ul_img"] = jnp.asarray(rng.normal(size=(bs, size, size, 1)).astype(np.float32))
        b["ul_mdl"] = jnp.asarray(rng.integers(0, 4, size=(bs,)).astype(np.int32))
    return b


def _finite(tree):
    return all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(tree)
               if jnp.issubdtype(x.dtype, jnp.floating))


def test_supervised_step_decreases_loss(rng):
    algo = SupervisedUNet(CFG)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = _batch(rng)
    losses = []
    for _ in range(5):
        state, m = algo.train_step(state, batch, {})
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    assert _finite(state.params)


def test_mean_teacher_ema_gate(rng):
    algo = MeanTeacher(CFG)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = _batch(rng, with_ul=True)
    scalars = dict(algo.epoch_scalars(0), rng=jax.random.PRNGKey(1))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, m = algo.train_step(state, batch, scalars)
    # iter 0: alpha == 0 -> teacher snaps to student
    assert float(m["alpha"]) == 0.0
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]), rtol=1e-6)
    # consistency gated off before iter 100
    assert float(m["semi_loss"]) == 0.0
    assert _finite(state.params)


def test_mean_teacher_alpha_after_gate():
    from smsut_tpu.ops.schedules import mean_teacher_alpha

    assert mean_teacher_alpha(50) == 0.0
    # after the 100-iter gate, 1 - 1/(t+1) >= 0.99 already, so the min always
    # resolves to the 0.99 decay cap
    assert mean_teacher_alpha(100) == 0.99
    assert mean_teacher_alpha(10 ** 6) == 0.99
    assert mean_teacher_alpha(99, ema_decay=0.999) == 0.0
    assert mean_teacher_alpha(199, ema_decay=0.999) == pytest.approx(1 - 1 / 200)


def test_cross_pseudo_two_nets_update(rng):
    algo = CrossPseudo(CFG)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = _batch(rng, with_ul=True)
    scalars = algo.epoch_scalars(1)
    l1 = jax.tree_util.tree_leaves(state.params)[0].copy()
    l2 = jax.tree_util.tree_leaves(state.params2)[0].copy()
    state, m = algo.train_step(state, batch, scalars)
    assert not np.allclose(l1, np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    assert not np.allclose(l2, np.asarray(jax.tree_util.tree_leaves(state.params2)[0]))
    for k in ("loss", "loss2", "crossPse1_loss", "crossPse2_loss"):
        assert np.isfinite(float(m[k]))


@pytest.mark.parametrize("algo_cls,with_ul", [
    (UGANTrainerAlgo, False),
    (UGANShp0Algo, False),
    (UGANConsisAlgo, True),
])
def test_gan_steps(rng, algo_cls, with_ul):
    algo = algo_cls(CFG)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = _batch(rng, with_ul=with_ul)
    scalars = dict(algo.epoch_scalars(1), rng=jax.random.PRNGKey(3))
    g0 = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    d0 = jax.tree_util.tree_leaves(state.d_params)[0].copy()
    state, m = algo.train_step(state, batch, scalars)
    assert not np.allclose(g0, np.asarray(jax.tree_util.tree_leaves(state.g_params)[0]))
    assert not np.allclose(d0, np.asarray(jax.tree_util.tree_leaves(state.d_params)[0]))
    for k in ("D_real", "D_fake", "D_cls", "D_gp", "G_fake", "G_rec", "G_cls",
              "G_seg", "loss"):
        assert np.isfinite(float(m[k])), k
    if algo_cls is UGANTrainerAlgo:
        assert "G_shp" in m
    if algo_cls is UGANShp0Algo:
        assert "G_nce" in m and "G_shp" not in m and "G_semi" not in m
    if algo_cls is UGANConsisAlgo:
        assert "G_nce" in m and "G_semi" in m
        # consistency gated off before iter 1000
        assert float(m["G_semi"]) == 0.0
    assert int(state.step) == 1


def test_d_concat_hat_matches_default(rng):
    """`d_concat_hat=True` (one 3n-image D apply for real+fake+x_hat, GP
    gradient recovered by slicing the batched input grad) is identical math
    to the default two-apply D step: per-sample instance norm keeps batch
    slices independent.  Metrics and post-step parameters must agree to
    f32 reduction-order tolerance."""
    cfg32 = CFG.replace(compute_dtype="float32")
    batch = _batch(rng, with_ul=False)
    results = []
    for flag in (False, True):
        algo = UGANTrainerAlgo(cfg32.replace(d_concat_hat=flag))
        state = algo.init_state(jax.random.PRNGKey(0))
        scalars = dict(algo.epoch_scalars(1), rng=jax.random.PRNGKey(3))
        state, m = algo.train_step(state, batch, scalars)
        results.append((state, {k: float(v) for k, v in m.items()}))
    (s0, m0), (s1, m1) = results
    for k in ("D_real", "D_fake", "D_cls", "D_gp", "G_fake", "G_rec",
              "G_cls", "G_seg"):
        np.testing.assert_allclose(m1[k], m0[k], rtol=5e-4, atol=5e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s0.g_params),
                    jax.tree_util.tree_leaves(s1.g_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=2e-4)


def test_gan_eval_fn_matches_val_phase(rng):
    algo = UGANConsisAlgo(CFG)
    state = algo.init_state(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    seg = algo.eval_fn(algo.eval_params(state), img)
    assert seg.shape == (2, 32, 32, 5)


def test_ugan_shape_warmup_schedule():
    algo = UGANTrainerAlgo(CFG)
    assert float(algo.epoch_scalars(0)["lambda_shp"]) == 0.0
    assert float(algo.epoch_scalars(10)["lambda_shp"]) == 5.0
    assert float(algo.epoch_scalars(40)["lambda_shp"]) == 10.0  # capped
