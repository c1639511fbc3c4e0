# -*- coding: utf-8 -*-
"""Checkpoint round-trips: full state save/load, raw partial restore
(CoraNet cross-stage), and resume continuity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.train import checkpoints
from smsut_tpu.train.steps.supervised import SupervisedUNet

CFG = Config(input_size=32, base_width=4, batch_size=2, compute_dtype="float32")


def _tree_equal(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_full_state_roundtrip(tmp_path, rng):
    algo = SupervisedUNet(CFG)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = {
        "img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
        "msk": jnp.asarray(rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)),
    }
    for _ in range(3):
        state, _ = algo.train_step(state, batch, {})

    checkpoints.save_state(state, str(tmp_path), "best")
    template = algo.init_state(jax.random.PRNGKey(1))
    restored = checkpoints.load_state(template, str(tmp_path), "best")
    assert int(restored.step) == 3
    assert _tree_equal(restored.params, state.params)
    assert _tree_equal(restored.opt_state, state.opt_state)

    # resume continues identically from the restored optimizer state
    s1, m1 = algo.train_step(state, batch, {})
    s2, m2 = algo.train_step(restored, batch, {})
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    assert _tree_equal(s1.params, s2.params)


def test_tp_sharded_roundtrip_and_mesh_change(tmp_path, rng):
    """Save under channel-wise TP sharding, restore (a) replicated and (b)
    back onto a TP mesh, and keep training identically (VERDICT r3 #5)."""
    from smsut_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh_2d,
        shard_params_channelwise,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    # width 8 so layer1's 8-channel kernels still shard at tp=2 under the
    # >=4-channels-per-shard rule (parallel/mesh.py round 5)
    algo = SupervisedUNet(CFG.replace(batch_size=4, base_width=8))
    mesh = make_mesh_2d(dp=2, tp=2)
    state = algo.init_state(jax.random.PRNGKey(0))
    host0 = jax.tree_util.tree_map(np.asarray, state)
    state = state.replace(
        params=shard_params_channelwise(mesh, state.params),
        opt_state=shard_params_channelwise(mesh, state.opt_state))
    bsh = batch_sharding(mesh)
    batch = {
        "img": jax.device_put(rng.normal(size=(4, 32, 32, 1))
                              .astype(np.float32), bsh),
        "msk": jax.device_put(rng.integers(0, 5, size=(4, 32, 32))
                              .astype(np.int32), bsh),
    }
    for _ in range(2):
        state, _ = algo.train_step(state, batch, {})
    # at least one kernel is actually sharded over 'model' when saved
    k = state.params["encoder"]["layer1"]["conv1"]["kernel"]
    assert "model" in str(k.sharding.spec)
    checkpoints.save_state(state, str(tmp_path), "tp")
    trained = jax.tree_util.tree_map(np.asarray, state)

    # (a) restore into a plain replicated/host template — mesh-independent
    template = algo.init_state(jax.random.PRNGKey(1))
    restored = checkpoints.load_state(template, str(tmp_path), "tp")
    assert int(restored.step) == 2
    assert _tree_equal(restored.params, trained.params)
    assert _tree_equal(restored.opt_state, trained.opt_state)

    # (b) restore into a TP-sharded template and continue training: the
    # restored run must track the original bit-for-bit (same program)
    from jax.sharding import NamedSharding, PartitionSpec as P

    tmpl2 = algo.init_state(jax.random.PRNGKey(2))
    tmpl2 = tmpl2.replace(
        params=shard_params_channelwise(mesh, tmpl2.params),
        opt_state=shard_params_channelwise(mesh, tmpl2.opt_state),
        # restored leaves come back committed to their template placement,
        # so the step counter must live on the mesh too
        step=jax.device_put(tmpl2.step, NamedSharding(mesh, P())))
    rest2 = checkpoints.load_state(tmpl2, str(tmp_path), "tp")
    k2 = rest2.params["encoder"]["layer1"]["conv1"]["kernel"]
    assert "model" in str(k2.sharding.spec)  # sharding preserved on restore
    s_a, m_a = algo.train_step(state, batch, {})
    s_b, m_b = algo.train_step(rest2, batch, {})
    assert float(m_a["loss"]) == float(m_b["loss"])
    assert _tree_equal(s_a.params, s_b.params)


def test_load_raw_partial_restore(tmp_path):
    from smsut_tpu.train.steps.coranet import CoraNet

    cfg = CFG.replace(pre_epoch=1, cora_epoch=2)
    pre = CoraNet(cfg, stage="pre")
    state_a = pre.init_state(jax.random.PRNGKey(0))
    checkpoints.save_state(state_a, str(tmp_path), "pre_best")

    raw = checkpoints.load_raw(str(tmp_path), "pre_best")
    assert "params" in raw and "ema_params" in raw
    cora = CoraNet(cfg, stage="cora")
    state_b = cora.init_state(jax.random.PRNGKey(9))
    state_b = state_b.replace(
        params=jax.tree_util.tree_map(jnp.asarray, raw["params"]),
        ema_params=jax.tree_util.tree_map(jnp.asarray, raw["ema_params"]))
    assert _tree_equal(state_b.params, state_a.params)
    # optimizer trees differ between stages (const-LR vs poly) — partial
    # restore must leave stage B's fresh optimizer untouched
    assert int(state_b.step) == 0
