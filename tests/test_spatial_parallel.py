# -*- coding: utf-8 -*-
"""Spatial parallelism (parallel/mesh.py 'space' axis): activations shard
their H dimension across devices; GSPMD inserts the conv halo exchanges and
the norm/loss cross-shard reductions.  Beyond the single-GPU reference
(SURVEY §2.7) — this is how the framework scales past the batch dim.

Comparison methodology: per-op the sharded programs are EXACT (conv fwd/
wgrad/xgrad, maxpool, instance norm, conv-transpose, bilinear — verified
while building this file), but a full net under f32 differs from the
single-device run by reduction reassociation (~1e-5 forward), and leaky-
ReLU kinks turn that wobble into O(1) differences on a FEW gradient
elements (the same f32-chaos phenomenon tests/test_gan_training_parity.py
measures for torch-vs-jax).  So the train-step assertions here are
loss-level and parameter-level at sizes inside the measured-exact
envelope: GSPMD spatially-partitioned gradients are EXACT (rel-L2 ~1e-6)
while the coarsest feature map keeps >= max(4, sp) rows (64^2 sp<=4,
128^2 sp<=4 measured), and CORRUPT (rel-L2 ~1) below it (32^2 any sp,
64^2 sp=8) — the Trainer refuses configs outside the envelope."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from smsut_tpu.config import Config
from smsut_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from smsut_tpu.train.steps.supervised import SupervisedUNet


def test_make_mesh_spatial_axes():
    mesh = make_mesh(batch_size=8, spatial=4)
    assert mesh.axis_names == ("data", "space")
    assert mesh.shape["data"] == 2 and mesh.shape["space"] == 4
    # batch clamping still applies to the data axis
    mesh = make_mesh(batch_size=3, spatial=4)
    assert mesh.shape["data"] == 1 and mesh.shape["space"] == 4


def test_shard_batch_spatial_specs(rng):
    mesh = make_mesh(batch_size=4, spatial=2)
    batch = shard_batch(mesh, {
        "img": np.zeros((4, 32, 32), np.uint8),
        "mdl": np.zeros((4,), np.int32),
        "m_vec": np.zeros((4, 4), np.float32),
    })
    assert batch["img"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data", "space")), ndim=3)
    assert batch["mdl"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=1)
    assert batch["m_vec"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=2)


def test_spatial_unet_forward_matches(rng):
    """Forward under dp x sp == single device up to f32 reassociation."""
    from smsut_tpu.models.unet import UNet

    net = UNet(out_ch=5, width=4, norm_type="instance", act_type="lrelu",
               dtype=jnp.float32, pack_levels=2)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 1)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    apply = jax.jit(lambda p, xx: net.apply({"params": p}, xx))
    y1 = apply(params, x)
    mesh = make_mesh(batch_size=8, spatial=4)
    y2 = apply(replicate(mesh, params), shard_batch(mesh, x))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dp,sp", [(2, 4), (1, 4)])
def test_spatial_supervised_step_matches_single_device(rng, dp, sp):
    cfg = Config(input_size=64, base_width=4, batch_size=4,
                 compute_dtype="float32")
    algo = SupervisedUNet(cfg)
    img = jnp.asarray(rng.normal(size=(4, 64, 64, 1)).astype(np.float32))
    msk = jnp.asarray(rng.integers(0, 5, size=(4, 64, 64)).astype(np.int32))

    s1 = algo.init_state(jax.random.PRNGKey(0))
    s1, m1 = algo.train_step(s1, {"img": img, "msk": msk}, {})

    mesh = make_mesh(n_devices=dp * sp, batch_size=4, spatial=sp)
    assert mesh.shape["data"] == dp and mesh.shape["space"] == sp
    s2 = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))
    batch = shard_batch(mesh, {"img": img, "msk": msk})
    assert batch["img"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data", "space")), ndim=4)
    s2, m2 = algo.train_step(s2, batch, {})

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_spatial_guard_refuses_degenerate_sizes(tmp_path):
    """The Trainer refuses spatial configs outside the measured-exact
    envelope instead of training with corrupted gradients."""
    from smsut_tpu.train.loop import Trainer

    cfg = Config(base_root=str(tmp_path), expr_root=str(tmp_path / "e"),
                 input_size=32, base_width=4, batch_size=8,
                 spatial_parallel=4, compute_dtype="float32")
    algo = SupervisedUNet(cfg)
    with pytest.raises(AssertionError, match="spatial_parallel"):
        Trainer(algo, cfg, "train")


def test_spatial_gan_step_runs(rng):
    """The full uganConsis D+GP+G step executes under dp x sp sharding and
    reproduces the single-device step-0 losses (pre-update quantities)."""
    from smsut_tpu.train.steps.gan import UGANConsisAlgo

    cfg = Config(input_size=64, base_width=4, batch_size=4,
                 compute_dtype="float32")
    algo = UGANConsisAlgo(cfg)
    batch_h = {
        "img": jnp.asarray(rng.normal(size=(4, 64, 64, 1)).astype(np.float32)),
        "msk": jnp.asarray(rng.integers(0, 5, size=(4, 64, 64)).astype(np.int32)),
        "mdl": jnp.asarray([0, 1, 2, 3], jnp.int32),
        "ul_img": jnp.asarray(rng.normal(size=(4, 64, 64, 1)).astype(np.float32)),
        "ul_mdl": jnp.asarray([3, 2, 1, 0], jnp.int32),
    }
    scalars = dict(algo.epoch_scalars(1), rng=jax.random.PRNGKey(2))

    s1 = algo.init_state(jax.random.PRNGKey(0))
    s1, m1 = algo.train_step(s1, dict(batch_h), dict(scalars))

    mesh = make_mesh(batch_size=4, spatial=2)
    s2 = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))
    batch = shard_batch(mesh, dict(batch_h))
    s2, m2 = algo.train_step(s2, batch, replicate(mesh, dict(scalars)))
    for k in m1:
        if k == "rng":
            continue
        # rtol 2e-3: the WGAN-GP term is a grad-of-grad norm — reduction
        # retiling reassociates twice (measured 6.5e-4 at this size)
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=2e-3, atol=5e-5, err_msg=k)
