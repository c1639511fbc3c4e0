# -*- coding: utf-8 -*-
"""Multi-device data-parallel sharding tests on the virtual 8-CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from smsut_tpu.config import Config
from smsut_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from smsut_tpu.train.steps.supervised import SupervisedUNet


def test_make_mesh_clamps_to_batch():
    mesh = make_mesh(batch_size=8)
    assert mesh.devices.size == 8
    mesh = make_mesh(batch_size=4)
    assert mesh.devices.size == 4
    mesh = make_mesh(batch_size=3)
    assert mesh.devices.size in (1, 3)


def test_sharded_supervised_step_matches_single_device(rng):
    cfg = Config(input_size=32, base_width=4, batch_size=8,
                 compute_dtype="float32")
    algo = SupervisedUNet(cfg)
    img = jnp.asarray(rng.normal(size=(8, 32, 32, 1)).astype(np.float32))
    msk = jnp.asarray(rng.integers(0, 5, size=(8, 32, 32)).astype(np.int32))

    # single device
    s1 = algo.init_state(jax.random.PRNGKey(0))
    s1, m1 = algo.train_step(s1, {"img": img, "msk": msk}, {})

    # 8-device mesh: batch sharded, state replicated
    mesh = make_mesh(batch_size=8)
    s2 = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))
    batch = shard_batch(mesh, {"img": img, "msk": msk})
    assert batch["img"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=4)
    s2, m2 = algo.train_step(s2, batch, {})

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gan_step_on_mesh(rng):
    from smsut_tpu.train.steps.gan import UGANConsisAlgo

    cfg = Config(input_size=32, base_width=4, batch_size=8,
                 compute_dtype="float32")
    algo = UGANConsisAlgo(cfg)
    mesh = make_mesh(batch_size=8)
    state = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))
    batch = shard_batch(mesh, {
        "img": jnp.asarray(rng.normal(size=(8, 32, 32, 1)).astype(np.float32)),
        "msk": jnp.asarray(rng.integers(0, 5, size=(8, 32, 32)).astype(np.int32)),
        "mdl": jnp.zeros((8,), jnp.int32),
        "ul_img": jnp.asarray(rng.normal(size=(8, 32, 32, 1)).astype(np.float32)),
        "ul_mdl": jnp.zeros((8,), jnp.int32),
    })
    scalars = dict(algo.epoch_scalars(1), rng=jax.random.PRNGKey(2))
    state, m = algo.train_step(state, batch, scalars)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["D_gp"]))
