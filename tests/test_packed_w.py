# -*- coding: utf-8 -*-
"""W-only packed ops (models/packed_w.py): every op must be the SAME
function as its unpacked counterpart — packing only regroups the W axis
into channels (PARITY-free by construction; see module docstring)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smsut_tpu.models import packed_w as pw


def test_pack_roundtrip_and_layout(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    for p in (2, 4, 8):
        xp = pw.pack_w(x, p)
        assert xp.shape == (2, 8, 16 // p, p * 3)
        # channel dx*C+c holds original column p*j+dx
        np.testing.assert_array_equal(
            np.asarray(xp[:, :, 1, 1 * 3 + 2]), np.asarray(x[:, :, p + 1, 2]))
        np.testing.assert_array_equal(np.asarray(pw.unpack_w(xp, p)),
                                      np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(pw.repack_w(pw.pack_w(x, 8), 8, 4)),
        np.asarray(pw.pack_w(x, 4)))


@pytest.mark.parametrize("p", [4, 8])
@pytest.mark.parametrize("k", [1, 3, 5])
def test_conv_w_matches_same_conv(rng, p, k):
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 6)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 6, 10)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = pw.conv_w(pw.pack_w(x, p), w, p, (6,), jnp.float32)
    np.testing.assert_allclose(np.asarray(pw.unpack_w(out, p)),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k", [1, 3])
def test_conv_w_concat_segments(rng, k):
    """Concatenated packed inputs (decoder skips) via in_segments; k=1
    exercises the dense per-subpixel einsum path."""
    p = 4
    a = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 8, 16, 5)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 8, 7)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        jnp.concatenate([a, b], -1), w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xp = jnp.concatenate([pw.pack_w(a, p), pw.pack_w(b, p)], -1)
    out = pw.conv_w(xp, w, p, (3, 5), jnp.float32)
    np.testing.assert_allclose(np.asarray(pw.unpack_w(out, p)),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("p,out_pack", [(4, 2), (4, 4), (8, 4), (8, 8)])
def test_pool_w_matches_maxpool(rng, p, out_pack):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    ref = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    out = pw.pool_w(pw.pack_w(x, p), p, 3, out_pack)
    np.testing.assert_array_equal(np.asarray(pw.unpack_w(out, out_pack)),
                                  np.asarray(ref))


def test_norm_stats_w(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    s1, s2, n = pw.norm_stats_w(pw.pack_w(x, 4), 4, 3)
    assert n == 8 * 16
    np.testing.assert_allclose(np.asarray(s1), np.asarray(x.sum((1, 2))),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.square(x).sum((1, 2))),
                               rtol=1e-5)
    v = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    t = pw.tile_c_w(v, 4)
    assert t.shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(t[:, 3:6]), np.asarray(v))


@pytest.mark.parametrize("p,out_pack", [(4, 4), (4, 8), (8, 8)])
def test_upsample_bilinear2_w(rng, p, out_pack):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    ref = jax.image.resize(x, (2, 16, 32, 3), method="bilinear")
    out = pw.upsample_bilinear2_w(pw.pack_w(x, p), p, out_pack)
    np.testing.assert_allclose(np.asarray(pw.unpack_w(out, out_pack)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("p,out_pack", [(4, 4), (4, 8), (8, 8)])
def test_up_transposed_w_matches_flax(rng, p, out_pack):
    from flax import linen as nn

    x = jnp.asarray(rng.normal(size=(2, 8, 16, 6)).astype(np.float32))
    mod = nn.ConvTranspose(5, kernel_size=(2, 2), strides=(2, 2))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = mod.apply({"params": params}, x)
    out = pw.up_transposed_w(pw.pack_w(x, p), params["kernel"], p, out_pack,
                             jnp.float32)
    np.testing.assert_allclose(np.asarray(pw.unpack_w(out, out_pack)),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("p", [4, 8])
def test_stem_conv_w_matches_stride2(rng, p):
    x = jnp.asarray(rng.normal(size=(2, 16, 32, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 2, 5)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = pw.stem_conv_w(pw.pack_w(x, p), w, p, jnp.float32)
    np.testing.assert_allclose(np.asarray(pw.unpack_w(out, p // 2)),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_conv_w_gradients_match(rng):
    """Same gradients wrt input AND the original kernel parameter."""
    p, k = 4, 3
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, 3, 5)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 8, 16, 5)).astype(np.float32))

    def loss_ref(xx, ww):
        y = jax.lax.conv_general_dilated(
            xx, ww, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.square(y - t))

    def loss_w(xx, ww):
        y = pw.conv_w(pw.pack_w(xx, p), ww, p, (3,), jnp.float32)
        return jnp.sum(jnp.square(pw.unpack_w(y, p) - t))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    g_w = jax.grad(loss_w, argnums=(0, 1))(x, w)
    for a, b in zip(g_w, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


# ---------------------------------------------------- model-level (mode "w")
class _wmode:
    """Arm pack_mode='w' for the scope (trace-time global, like
    Config.pack_mode via setup_compute)."""

    def __init__(self, w0, d_deep=False, mode="w", d_mode=""):
        self.w0, self.d_deep, self.mode, self.d_mode = w0, d_deep, mode, d_mode

    def __enter__(self):
        pw.set_pack_mode(self.mode, self.w0, self.d_deep, self.d_mode)

    def __exit__(self, *a):
        pw.set_pack_mode("hw")


@pytest.mark.parametrize("levels,w0", [(1, 8), (2, 8), (2, 4)])
def test_unet_wmode_same_params_forward_grads(rng, levels, w0):
    from smsut_tpu.models.unet import UNet

    kw = dict(out_ch=5, width=8, norm_type="instance", act_type="lrelu",
              dtype=jnp.float32)
    plain = UNet(pack_levels=0, **kw)
    packed = UNet(pack_levels=levels, **kw)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    with _wmode(w0):
        assert (jax.tree_util.tree_map(jnp.shape, params)
                == jax.tree_util.tree_map(
                    jnp.shape,
                    packed.init(jax.random.PRNGKey(0), x)["params"]))
        y1 = packed.apply({"params": params}, x)
        g1 = jax.grad(lambda p: jnp.mean(jnp.square(
            packed.apply({"params": p}, x))))(params)
    y0 = plain.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)
    g0 = jax.grad(lambda p: jnp.mean(jnp.square(
        plain.apply({"params": p}, x))))(params)
    for (k0, l0), (k1, l1) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert k0 == k1
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=2e-3, atol=1e-5, err_msg=str(k0))


def test_ugan_wmode_equivalence(rng):
    from smsut_tpu.models.ugan import UGANnce

    kw = dict(out_ch=5, n_modal=4, width=8, netF_nc=32, dtype=jnp.float32)
    plain, packed = UGANnce(pack_levels=0, **kw), UGANnce(pack_levels=2, **kw)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    m = jax.nn.one_hot(jnp.asarray([1, 2]), 4)
    ids = jnp.asarray([0, 3, 1])
    params = plain.init(jax.random.PRNGKey(0), x, m, ids)["params"]
    out0 = plain.apply({"params": params}, x, m, ids)
    with _wmode(8):
        assert (jax.tree_util.tree_map(jnp.shape, params)
                == jax.tree_util.tree_map(
                    jnp.shape,
                    packed.init(jax.random.PRNGKey(0), x, m, ids)["params"]))
        out1 = packed.apply({"params": params}, x, m, ids)
    for a, b in zip(out1, out0):   # seg, tsl (bilinear+tanh), feat_pool
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_discriminator_wmode_equivalence(rng):
    from smsut_tpu.models.ugan import Discriminator

    kw = dict(input_size=32, n_modal=4, width=8, max_width=64,
              dtype=jnp.float32)
    plain = Discriminator(pack_levels=0, **kw)
    packed = Discriminator(pack_levels=1, **kw)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    src0, cls0 = plain.apply({"params": params}, x)
    with _wmode(8):
        src1, cls1 = packed.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(src1), np.asarray(src0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls0),
                               rtol=1e-4, atol=1e-4)


def test_gan_train_step_runs_in_wmode(rng):
    """The full uganConsis jitted step traces and runs under
    Config.pack_mode='w' (what bench.py --set pack_mode=w compiles)."""
    from smsut_tpu.config import Config
    from smsut_tpu.train.steps.gan import UGANConsisAlgo

    cfg = Config(input_size=32, base_width=4, batch_size=2,
                 compute_dtype="float32", pack_mode="w", pack_w0=8)
    algo = UGANConsisAlgo(cfg)
    try:
        state = algo.init_state(jax.random.PRNGKey(0))
        batch = {
            "img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
            "msk": jnp.asarray(rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)),
            "mdl": jnp.asarray([0, 1], jnp.int32),
            "ul_img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
            "ul_mdl": jnp.asarray([1, 0], jnp.int32),
        }
        scalars = dict(algo.epoch_scalars(1), rng=jax.random.PRNGKey(2))
        state, m = algo.train_step(state, batch, scalars)
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["D_gp"]))
    finally:
        pw.set_pack_mode("hw")


def test_discriminator_wmode_deep_equivalence(rng):
    """d_pack_deep: the W-packed BottleBlock pyramid == the unpacked one
    (same params, same outputs) until the subpixels run out."""
    from smsut_tpu.models.ugan import Discriminator

    kw = dict(input_size=64, n_modal=4, width=8, max_width=64,
              dtype=jnp.float32)
    plain = Discriminator(pack_levels=0, **kw)
    packed = Discriminator(pack_levels=1, **kw)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    src0, cls0 = plain.apply({"params": params}, x)
    with _wmode(8, d_deep=True):
        assert (jax.tree_util.tree_map(jnp.shape, params)
                == jax.tree_util.tree_map(
                    jnp.shape,
                    packed.init(jax.random.PRNGKey(0), x)["params"]))
        src1, cls1 = packed.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(src1), np.asarray(src0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls0),
                               rtol=2e-4, atol=2e-4)


def test_discriminator_mixed_override_equivalence(rng):
    """Config.d_pack_mode='w' + d_pack_deep under GLOBAL pack_mode='hw'
    (the measured-fastest round-3 mixed configuration): the discriminator
    runs W-packed-deep while the generator family stays on the 2x2
    space-to-depth path — both must equal their unpacked twins."""
    from smsut_tpu.models.ugan import Discriminator, UGANnce

    kw = dict(input_size=64, n_modal=4, width=8, max_width=64,
              dtype=jnp.float32)
    plain = Discriminator(pack_levels=0, **kw)
    packed = Discriminator(pack_levels=1, **kw)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    src0, cls0 = plain.apply({"params": params}, x)
    gkw = dict(out_ch=5, n_modal=4, width=8, netF_nc=32, dtype=jnp.float32)
    g_packed = UGANnce(pack_levels=2, **gkw)
    xg = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    m = jax.nn.one_hot(jnp.asarray([1, 2]), 4)
    ids = jnp.asarray([0, 3, 1])
    g_params = g_packed.init(jax.random.PRNGKey(0), xg, m, ids)["params"]
    g_out0 = g_packed.apply({"params": g_params}, xg, m, ids)  # plain "hw"
    with _wmode(8, d_deep=True, mode="hw", d_mode="w"):
        assert (jax.tree_util.tree_map(jnp.shape, params)
                == jax.tree_util.tree_map(
                    jnp.shape,
                    packed.init(jax.random.PRNGKey(0), x)["params"]))
        src1, cls1 = packed.apply({"params": params}, x)
        g_out1 = g_packed.apply({"params": g_params}, xg, m, ids)
    np.testing.assert_allclose(np.asarray(src1), np.asarray(src0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls0),
                               rtol=2e-4, atol=2e-4)
    # the discriminator-only override must leave the generator program
    # untouched: same hw-packed lowering => bitwise-identical outputs
    for a, b in zip(g_out1, g_out0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gan_train_step_runs_mixed_override(rng):
    """The full uganConsis jitted step traces and runs under the new
    default discriminator override (pack_mode='hw', d_pack_mode='w',
    d_pack_deep=True)."""
    from smsut_tpu.config import Config
    from smsut_tpu.train.steps.gan import UGANConsisAlgo

    cfg = Config(input_size=32, base_width=4, batch_size=2,
                 compute_dtype="float32", pack_mode="hw",
                 d_pack_mode="w", d_pack_deep=True)
    algo = UGANConsisAlgo(cfg)
    try:
        state = algo.init_state(jax.random.PRNGKey(0))
        batch = {
            "img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
            "msk": jnp.asarray(rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)),
            "mdl": jnp.asarray([0, 1], jnp.int32),
            "ul_img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
            "ul_mdl": jnp.asarray([1, 0], jnp.int32),
        }
        scalars = dict(algo.epoch_scalars(1), rng=jax.random.PRNGKey(2))
        state, m = algo.train_step(state, batch, scalars)
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["D_gp"]))
    finally:
        pw.set_pack_mode("hw")


def test_avg_pool_w_matches(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    ref = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    out = pw.avg_pool_w(pw.pack_w(x, 4), 4, 3, 2)
    np.testing.assert_allclose(np.asarray(pw.unpack_w(out, 2)),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)
