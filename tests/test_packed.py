# -*- coding: utf-8 -*-
"""Space-to-depth packed stem (models/packed.py): the packed model must be
the SAME function as the unpacked one — same parameter tree, same outputs,
same gradients — since packing only reorders the summation lattice."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smsut_tpu.models.packed import depth_to_space, pack_kernel, space_to_depth
from smsut_tpu.models.unet import UNet


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    assert jnp.allclose(depth_to_space(space_to_depth(x), 3), x)


def test_packed_pool_fused_matches_pool_then_pack(rng):
    """packed_max_pool_to_packed == s2d(packed_max_pool_to_unpacked): the
    lane-dense fused transition is an index-permutation of the same max."""
    from smsut_tpu.models.packed import (
        packed_max_pool_to_packed,
        packed_max_pool_to_unpacked,
    )

    c = 5
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4 * c)).astype(np.float32))
    ref = space_to_depth(packed_max_pool_to_unpacked(x, c))
    out = packed_max_pool_to_packed(x, c)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pool_pack_fused_toggle_same_forward(rng):
    """Config.pool_pack_fused routes the packed transition through the
    fused op; the model function must be bit-identical either way."""
    from smsut_tpu.models import packed as pk

    net = UNet(out_ch=4, width=8, norm_type="instance", pack_levels=2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    try:
        pk.set_pool_fused(False)
        y0 = net.apply({"params": params}, x)
        pk.set_pool_fused(True)
        y1 = net.apply({"params": params}, x)
    finally:
        pk.set_pool_fused(False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)


def test_pack_kernel_conv_equivalence(rng):
    """Packed conv == original SAME conv, for k in {1,3,5}."""
    for k in (1, 3, 5):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 6)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, 6, 10)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wp = pack_kernel(w, (6,))
        kp = wp.shape[0]
        got = jax.lax.conv_general_dilated(
            space_to_depth(x), wp, (1, 1),
            [(kp // 2, kp // 2)] * 2 if kp > 1 else [(0, 0)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(depth_to_space(got, 10)),
                                   np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pack_kernel_concat_segments(rng):
    """Segmented packing == packing the concatenated input."""
    x1 = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 7, 5)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        jnp.concatenate([x1, x2], -1), w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xp = jnp.concatenate([space_to_depth(x1), space_to_depth(x2)], -1)
    got = jax.lax.conv_general_dilated(
        xp, pack_kernel(w, (4, 3)), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(depth_to_space(got, 5)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_packed_conv_apply_impls_match_same_conv(rng):
    """Both conv lowerings (v1 single SAME conv, v2 reduced-zero forms) ==
    the original SAME conv, incl. segmented inputs."""
    from smsut_tpu.models import packed as pk

    for impl in ("v1", "v2"):
        old = pk.CONV_IMPL
        pk.CONV_IMPL = impl
        try:
            for k in (1, 3, 5):
                x = jnp.asarray(rng.normal(size=(2, 16, 16, 6)).astype(np.float32))
                w = jnp.asarray(rng.normal(size=(k, k, 6, 10)).astype(np.float32))
                ref = jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(k // 2, k // 2)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                got = pk.packed_conv_apply(space_to_depth(x), w, (6,),
                                           jnp.float32)
                np.testing.assert_allclose(
                    np.asarray(depth_to_space(got, 10)), np.asarray(ref),
                    rtol=2e-5, atol=2e-5, err_msg=f"{impl} k={k}")
            # segmented (concat) input, k = 1 and 3
            x1 = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
            x2 = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
            xp = jnp.concatenate([space_to_depth(x1), space_to_depth(x2)], -1)
            for k in (1, 3):
                w = jnp.asarray(rng.normal(size=(k, k, 7, 5)).astype(np.float32))
                ref = jax.lax.conv_general_dilated(
                    jnp.concatenate([x1, x2], -1), w, (1, 1),
                    [(k // 2, k // 2)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                got = pk.packed_conv_apply(xp, w, (4, 3), jnp.float32)
                np.testing.assert_allclose(
                    np.asarray(depth_to_space(got, 5)), np.asarray(ref),
                    rtol=2e-5, atol=2e-5, err_msg=f"{impl} seg k={k}")
        finally:
            pk.CONV_IMPL = old


@pytest.fixture(params=[1, 2])
def unet_pair(request):
    kw = dict(out_ch=5, width=8, norm_type="instance", act_type="lrelu",
              dtype=jnp.float32)
    return (UNet(pack_levels=0, **kw),
            UNet(pack_levels=request.param, **kw))


def test_unet_packed_same_params_and_forward(unet_pair, rng):
    plain, packed = unet_pair
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    shapes = jax.tree_util.tree_map(jnp.shape, params)
    params_p = packed.init(jax.random.PRNGKey(0), x)["params"]
    assert shapes == jax.tree_util.tree_map(jnp.shape, params_p)

    y0 = plain.apply({"params": params}, x)
    y1 = packed.apply({"params": params}, x)   # SAME params
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)


def test_ugan_packed_equivalence(rng):
    from smsut_tpu.models.ugan import UGANnce

    kw = dict(out_ch=5, n_modal=4, width=8, netF_nc=32, dtype=jnp.float32)
    plain, packed = UGANnce(pack_levels=0, **kw), UGANnce(pack_levels=2, **kw)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    m = jax.nn.one_hot(jnp.asarray([1, 2]), 4)
    ids = jnp.asarray([0, 3, 1])
    params = plain.init(jax.random.PRNGKey(0), x, m, ids)["params"]
    assert (jax.tree_util.tree_map(jnp.shape, params)
            == jax.tree_util.tree_map(
                jnp.shape, packed.init(jax.random.PRNGKey(0), x, m, ids)["params"]))

    out0 = plain.apply({"params": params}, x, m, ids)
    out1 = packed.apply({"params": params}, x, m, ids)
    for a, b in zip(out1, out0):   # seg, tsl (bilinear+tanh), feat_pool
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_discriminator_packed_equivalence(rng):
    from smsut_tpu.models.ugan import Discriminator

    kw = dict(input_size=32, n_modal=4, width=8, max_width=64,
              dtype=jnp.float32)
    plain = Discriminator(pack_levels=0, **kw)
    packed = Discriminator(pack_levels=1, **kw)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    src0, cls0 = plain.apply({"params": params}, x)
    src1, cls1 = packed.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(src1), np.asarray(src0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls0),
                               rtol=1e-4, atol=1e-4)


def test_unet_packed_same_gradients(unet_pair, rng):
    plain, packed = unet_pair
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    def loss(net, p):
        return jnp.mean(jnp.square(net.apply({"params": p}, x)))

    g0 = jax.grad(lambda p: loss(plain, p))(params)
    g1 = jax.grad(lambda p: loss(packed, p))(params)
    for (k0, l0), (k1, l1) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert k0 == k1
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=2e-3, atol=1e-5, err_msg=str(k0))
