# -*- coding: utf-8 -*-
"""Channel-wise tensor parallelism over a ('data','model') mesh: the
supervised step with TP-sharded kernels matches the single-device step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh_2d,
    shard_params_channelwise,
)
from smsut_tpu.train.steps.supervised import SupervisedUNet


def test_dp_tp_step_matches_single_device(rng):
    cfg = Config(input_size=32, base_width=8, batch_size=4,
                 compute_dtype="float32")
    algo = SupervisedUNet(cfg)
    img = jnp.asarray(rng.normal(size=(4, 32, 32, 1)).astype(np.float32))
    msk = jnp.asarray(rng.integers(0, 5, size=(4, 32, 32)).astype(np.int32))

    s1 = algo.init_state(jax.random.PRNGKey(0))
    s1, m1 = algo.train_step(s1, {"img": img, "msk": msk}, {})

    mesh = make_mesh_2d(dp=2, tp=2)
    s2 = algo.init_state(jax.random.PRNGKey(0))
    s2 = s2.replace(
        params=shard_params_channelwise(mesh, s2.params),
        opt_state=shard_params_channelwise(mesh, s2.opt_state),
        step=jax.device_put(s2.step),
    )
    # at least one kernel actually sharded over 'model'
    k = s2.params["encoder"]["layer1"]["conv1"]["kernel"]
    assert "model" in str(k.sharding.spec)
    bsh = batch_sharding(mesh)
    batch = {"img": jax.device_put(img, bsh), "msk": jax.device_put(msk, bsh)}
    s2, m2 = algo.train_step(s2, batch, {})

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
