# -*- coding: utf-8 -*-
"""Model shape/semantics tests, incl. InstanceNorm parity with torch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from smsut_tpu.models import (
    Discriminator,
    DTCUNet,
    UGAN,
    UGANnce,
    UNet,
    sample_patch_ids,
)
from smsut_tpu.models.layers import InstanceNorm, upsample_bilinear2


def test_instance_norm_matches_torch(rng):
    x = rng.normal(size=(2, 8, 8, 6)).astype(np.float32)
    mod = InstanceNorm()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    tnorm = torch.nn.InstanceNorm2d(6, affine=True)
    want = tnorm(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilinear_upsample_matches_torch(rng):
    x = rng.normal(size=(1, 5, 7, 3)).astype(np.float32)
    got = np.asarray(upsample_bilinear2(jnp.asarray(x)))
    want = torch.nn.functional.interpolate(
        torch.tensor(x.transpose(0, 3, 1, 2)), scale_factor=2, mode="bilinear",
        align_corners=False).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unet_shapes():
    net = UNet(out_ch=5, width=8, norm_type="instance", act_type="lrelu")
    x = jnp.zeros((2, 64, 64, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 64, 64, 5)
    assert y.dtype == jnp.float32


def test_ugan_shapes():
    net = UGAN(out_ch=5, n_modal=4, width=8)
    x = jnp.zeros((2, 64, 64, 1))
    m = jnp.zeros((2, 4))
    params = net.init(jax.random.PRNGKey(0), x, m)
    seg, tsl = net.apply(params, x, m)
    assert seg.shape == (2, 64, 64, 5)
    assert tsl.shape == (2, 64, 64, 1)
    # tanh bound
    assert float(jnp.max(jnp.abs(tsl))) <= 1.0


def test_ugan_shared_bottleneck():
    """The enc5 block must be shared between tsl and seg towers
    (`ugan.py:93,116-122`)."""
    net = UGAN(out_ch=5, n_modal=4, width=8)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 4)))
    core = params["params"]["core"]
    assert "enc5" in core
    # exactly one bottleneck block parameterization
    assert sum(1 for k in core if k.startswith("enc5")) == 1


def test_ugannce_patch_pool():
    net = UGANnce(out_ch=5, n_modal=4, width=8, netF_nc=64)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 1))
    m = jnp.zeros((2, 4))
    ids = sample_patch_ids(jax.random.PRNGKey(1), (64 // 16) ** 2, 8)
    params = net.init(jax.random.PRNGKey(0), x, m, ids)
    seg, tsl, pool = net.apply(params, x, m, ids)
    assert pool.shape == (2 * 8, 64)
    # L2 normalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pool), axis=1),
                               np.ones(16), rtol=1e-3)
    # val_phase short-circuit
    seg2, tsl2 = net.apply(params, x, m, val_phase=True)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(seg2), atol=1e-6)


def test_patch_ids_shared_between_passes():
    ids1 = sample_patch_ids(jax.random.PRNGKey(3), 256, 64)
    ids2 = sample_patch_ids(jax.random.PRNGKey(3), 256, 64)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
    assert ids1.shape == (64,)
    assert len(np.unique(np.asarray(ids1))) == 64


def test_discriminator_shapes():
    d = Discriminator(input_size=256, n_modal=4, width=16, max_width=256)
    x = jnp.zeros((2, 256, 256, 1))
    params = d.init(jax.random.PRNGKey(0), x)
    src, cls = d.apply(params, x)
    assert src.shape == (2, 4, 4, 1)     # patch map (ugan.py:213-215)
    assert cls.shape == (2, 4)
    # widths capped at max_width=256 for base_width 16 (uganShp0Trainer.py:61-62)
    p = params["params"]
    assert p["block5"]["conv1"]["kernel"].shape[-1] == 256


def test_dtc_dual_heads():
    net = DTCUNet(out_ch=5, width=8, norm_type="instance", act_type="lrelu")
    x = jnp.zeros((1, 64, 64, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out1, out2 = net.apply(params, x)
    assert out1.shape == out2.shape == (1, 64, 64, 5)
    assert float(jnp.max(jnp.abs(out1))) <= 1.0


def test_unet_remat_identical(rng):
    """remat=True is a pure scheduling change: same param tree, same
    forward, same gradients (nn.remat recomputes in backward)."""
    from smsut_tpu.models.unet import UNet

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    a = UNet(out_ch=5, width=4, norm_type="instance", act_type="lrelu",
             pack_levels=1, remat=False)
    b = UNet(out_ch=5, width=4, norm_type="instance", act_type="lrelu",
             pack_levels=1, remat=True)
    va = a.init(jax.random.PRNGKey(0), x)
    vb = b.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)

    def loss(m, v):
        return jnp.sum(m.apply(v, x) ** 2)

    la, ga = jax.value_and_grad(lambda v: loss(a, v))(va)
    lb, gb = jax.value_and_grad(lambda v: loss(b, v))(vb)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)
