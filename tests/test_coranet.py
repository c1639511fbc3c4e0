# -*- coding: utf-8 -*-
"""CoraNet step/head-split/pseudo-label tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.train.steps.coranet import CoraNet, coranet_weights, split_heads

CFG = Config(input_size=32, base_width=4, batch_size=2, num_iter_per_epoch=2,
             pre_epoch=1, cora_epoch=2, pred_step=1, compute_dtype="float32")


def test_head_split_shapes(rng):
    out = jnp.asarray(rng.normal(size=(2, 8, 8, 13)).astype(np.float32))
    h0, h1, h2 = split_heads(out, 4)
    assert h0.shape == h1.shape == h2.shape == (2, 8, 8, 5)
    # shared background channel
    np.testing.assert_array_equal(np.asarray(h0[..., 0]), np.asarray(out[..., 0]))
    np.testing.assert_array_equal(np.asarray(h1[..., 0]), np.asarray(out[..., 0]))
    np.testing.assert_array_equal(np.asarray(h0[..., 1:]), np.asarray(out[..., 1:5]))
    np.testing.assert_array_equal(np.asarray(h2[..., 1:]), np.asarray(out[..., 9:13]))


def test_fused_tail_matches_reference(rng):
    """The channel-first fused 3-head tail == the naive split_heads + generic
    losses evaluation (stage A losses and every stage-B piece)."""
    from smsut_tpu.ops.losses import (cross_entropy_loss, dice_and_ce_loss,
                                      soft_dice_loss)
    from smsut_tpu.train.steps.coranet import (_dice_from_stats, _head_stats,
                                               _onehot_cf, _per_head_nll,
                                               three_head_losses)

    n = 4
    out = jnp.asarray(rng.normal(size=(2, 16, 16, 13)).astype(np.float32) * 3)
    msk = jnp.asarray(rng.integers(0, 5, size=(2, 16, 16)).astype(np.int32))
    w_con, w_rad = coranet_weights(n)
    h0, h1, h2 = split_heads(out, n)

    # stage A
    cedc, con, rad = three_head_losses(out, msk, w_con, w_rad, n, 0.5, 0.5)
    np.testing.assert_allclose(
        float(cedc), float(dice_and_ce_loss(h0, msk, 0.5, 0.5, True)),
        rtol=2e-5)
    np.testing.assert_allclose(
        float(con), float(cross_entropy_loss(h1, msk, class_weights=w_con)),
        rtol=2e-5)
    np.testing.assert_allclose(
        float(rad), float(cross_entropy_loss(h2, msk, class_weights=w_rad)),
        rtol=2e-5)

    # stage B pieces
    t, e, z, m = _head_stats(out, n)
    y = _onehot_cf(msk, n)
    nll = _per_head_nll(t, e, z, m, y, n)
    np.testing.assert_allclose(
        np.asarray(nll[:, 0, :]).reshape(2, 16, 16),
        np.asarray(cross_entropy_loss(h0, msk, reduce=False)), rtol=2e-5,
        atol=1e-6)
    np.testing.assert_allclose(
        float(_dice_from_stats(e, z, y, batch_dice=False, n_label=n)),
        float(soft_dice_loss(h0, msk, batch_dice=False)), rtol=2e-5)

    # per-head softmax probs (uncertain-consistency substrate)
    algo = CoraNet(CFG, stage="cora")
    snon, sbg = algo._head_probs(e, z)
    for k, hk in enumerate((h0, h1, h2)):
        want = np.asarray(jax.nn.softmax(hk, -1)).reshape(2, 256, 5)
        np.testing.assert_allclose(np.asarray(sbg[:, k, :]), want[..., 0],
                                   rtol=2e-5, atol=1e-7)
        got = np.asarray(snon[:, k * n: (k + 1) * n, :]).transpose(0, 2, 1)
        np.testing.assert_allclose(got, want[..., 1:], rtol=2e-5, atol=1e-7)


def test_coranet_weights():
    w_con, w_rad = coranet_weights(4)
    np.testing.assert_array_equal(np.asarray(w_con), [1, 5, 5, 5, 5])
    np.testing.assert_array_equal(np.asarray(w_rad), [5, 1, 1, 1, 1])


def test_pre_step(rng):
    algo = CoraNet(CFG, stage="pre")
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = {
        "img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
        "msk": jnp.asarray(rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)),
    }
    state, m = algo.train_step(state, batch, algo.epoch_scalars(0))
    for k in ("loss", "cedc_loss", "loss_con", "loss_rad"):
        assert np.isfinite(float(m[k])), k
    assert int(state.step) == 1
    # EMA snapped to params at iter 0 (alpha == 0)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]), rtol=1e-6)


def test_cora_step_gating(rng):
    algo = CoraNet(CFG, stage="cora")
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = {
        "img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
        "msk": jnp.asarray(rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)),
        "pse_img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
        "pse_lab": jnp.asarray(rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)),
        "pse_mask": jnp.asarray(rng.integers(0, 2, size=(2, 32, 32)).astype(np.int32)),
    }
    state, m = algo.train_step(state, batch, algo.epoch_scalars(0))
    # before iter 1000: certain/uncertain contributions gated to zero
    assert float(m["certain_loss"]) == 0.0
    assert float(m["uncertain_loss"]) == 0.0
    assert np.isfinite(float(m["loss"]))


def test_stage_b_batched_apply_matches_separate(rng):
    """Batch-independence invariant: one concat apply equals two separate
    applies (per-sample instance norm).  The stage-B step deliberately
    keeps the two separate applies — the batched form measured SLOWER
    (24.9 vs 20.2 ms/step, VMEM spill; see steps/coranet.py loss_fn and
    BASELINE.md) — but the equivalence is what makes that a pure
    performance choice."""
    algo = CoraNet(CFG, stage="cora")
    state = algo.init_state(jax.random.PRNGKey(3))
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    pse = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    out1 = algo.net.apply({"params": state.params}, img)
    out2 = algo.net.apply({"params": state.params}, pse)
    cat = algo.net.apply({"params": state.params},
                         jnp.concatenate([img, pse], axis=0))
    np.testing.assert_allclose(np.asarray(cat[:2]), np.asarray(out1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cat[2:]), np.asarray(out2),
                               rtol=2e-5, atol=2e-5)


def test_pred_unlabel_batching(rng):
    algo = CoraNet(CFG, stage="cora")
    state = algo.init_state(jax.random.PRNGKey(0))

    def stream():
        for i in range(5):  # odd count -> exercises padding path
            img = rng.normal(size=(32, 32, 1)).astype(np.float32)
            lab = rng.integers(0, 5, size=(32, 32)).astype(np.int32)
            yield img, lab, i % 4

    data, plab_dice = algo.pred_unlabel(state, stream())
    assert data["img"].shape == (5, 32, 32, 1)
    assert data["plab"].shape == (5, 32, 32)
    assert set(np.unique(data["mask"])) <= {0, 1}
    assert np.isfinite(plab_dice)


def test_make_extra_batch_drop_last(rng):
    algo = CoraNet(CFG, stage="cora")
    algo._pseudo = {
        "img": rng.normal(size=(5, 32, 32, 1)).astype(np.float32),
        "plab": rng.integers(0, 5, size=(5, 32, 32)).astype(np.int32),
        "mask": rng.integers(0, 2, size=(5, 32, 32)).astype(np.int32),
        "lab": rng.integers(0, 5, size=(5, 32, 32)).astype(np.int32),
        "mdl": np.zeros(5, np.int32),
    }
    algo._pseudo_order = []
    seen = set()
    for _ in range(4):
        b = algo.make_extra_batch()
        assert b["pse_img"].shape[0] == CFG.batch_size
    # cycling reshuffles without crashing on the partial remainder


def test_unlabeled_stream_is_global_under_multiprocess(tmp_path, monkeypatch):
    """The pseudo-label stream must NOT be sharded across hosts: every
    process walks the identical full bs=1 pass so self._pseudo is the same
    array everywhere — the premise of make_extra_batch's per-host slicing.
    Regression: get_loader auto-shards 'val' loaders, which (a) fired the
    non-divisible assert at bs=1 and (b) gave each host a different pseudo
    set."""
    from smsut_tpu.data.synthetic import make_synthetic_dataset
    from smsut_tpu.parallel import distributed

    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=32)
    cfg = CFG.replace(base_root=data_root, device_augment=False,
                      data_aug=dict(Config().data_aug, resizeCrop_size=32))

    class _T:
        fold = 0
        import random as _r
        _data_rng = _r.Random(2020)

    algo = CoraNet(cfg, stage="cora")
    n_single = sum(1 for _ in algo._unlabeled_stream(_T()))
    assert n_single > 0

    # fake a 2-process layout: the stream must stay global and identical
    monkeypatch.setattr(distributed, "process_count", lambda: 2)
    monkeypatch.setattr(distributed, "process_index", lambda: 1)
    _T._data_rng = _T._r.Random(2020)
    n_multi = sum(1 for _ in algo._unlabeled_stream(_T()))
    assert n_multi == n_single


def test_lr_schedules_survive_past_total_iters():
    """Past-end steps must clamp to 0, not go NaN (device) or complex
    (host log).  Regression: CoraNet stage A runs pre_epoch epochs while
    the generic display poly was built over max_epoch*num_iter_per_epoch —
    when pre_epoch > max_epoch the display crashed on a complex float and
    the device schedule would have NaN'd the weights."""
    from smsut_tpu.ops.schedules import poly_lr_host, poly_lr_schedule

    sched = poly_lr_schedule(0.01, 12)
    in_range = float(sched(12))      # eff=11 < 12: normal poly value
    assert 0 < in_range < 0.01
    assert float(sched(13)) == 0.0   # eff=12: exactly consumed
    assert float(sched(50)) == 0.0   # far past the end: clamped, not NaN
    assert poly_lr_host(0.01, 50, 12) == 0.0
    assert abs(poly_lr_host(0.01, 12, 12) - in_range) < 1e-9

    pre = CoraNet(CFG, stage="pre")
    assert pre.lr_at(10_000) == CFG.lr  # stage A: constant, never decays
    cora = CoraNet(CFG, stage="cora")
    total = CFG.cora_epoch * CFG.num_iter_per_epoch
    assert cora.lr_at(1) == CFG.lr
    assert cora.lr_at(total + 99) == 0.0
