# -*- coding: utf-8 -*-
"""On-device fused augmentation tests."""
import random

import numpy as np
import pytest

import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.data.device_augment import DeviceAugment


def _cfg(size=32, **aug_over):
    cfg = Config(input_size=size)
    aug = dict(cfg.data_aug, resizeCrop_size=size, **aug_over)
    return cfg.replace(data_aug=aug)


def test_shapes_and_range(rng):
    cfg = _cfg()
    da = DeviceAugment(cfg, random.Random(0))
    img = (rng.random((4, 32, 32)) * 255).astype(np.uint8)
    msk = rng.integers(0, 5, (4, 32, 32)).astype(np.uint8)
    di, dm = da(img, msk)
    assert di.shape == (4, 32, 32, 1) and dm.shape == (4, 32, 32)
    assert di.dtype == jnp.float32 and dm.dtype == jnp.int32
    assert float(di.min()) >= -1.0 and float(di.max()) <= 1.0
    assert set(np.unique(np.asarray(dm))) <= set(range(5))


def test_identity_when_all_disabled(rng):
    cfg = _cfg(rotate=False, elasticDeform=False, resizeCrop=False)
    da = DeviceAugment(cfg, random.Random(0))
    img = (rng.random((2, 32, 32)) * 255).astype(np.uint8)
    msk = rng.integers(0, 5, (2, 32, 32)).astype(np.uint8)
    di, dm = da(img, msk)
    want = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(di[..., 0]), want, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dm), msk)


def test_rotation_only_matches_host_rotate(rng):
    """Pure rotation through the device warp vs the cv2 host rotation."""
    from smsut_tpu.data.augment import rotate_pair

    cfg = _cfg(rotate=True, elasticDeform=False, resizeCrop=False)
    da = DeviceAugment(cfg, random.Random(3))
    img = (rng.random((1, 32, 32)) * 255).astype(np.uint8)
    msk = rng.integers(0, 5, (1, 32, 32)).astype(np.uint8)
    params = da.sample_params(1, 32, 32)
    angle = float(params["angle"][0])
    di, dm = da._apply(jnp.asarray(img), jnp.asarray(msk), params)

    h_img, h_msk = rotate_pair(img[0], msk[0], angle)
    got = (np.asarray(di[0, ..., 0]) * 0.5 + 0.5) * 255.0
    want = h_img.astype(np.float32)
    # interiors match to interpolation/rounding tolerance
    diff = np.abs(got[4:-4, 4:-4] - want[4:-4, 4:-4])
    assert np.median(diff) < 4.0
    agree = (np.asarray(dm[0]) == h_msk).mean()
    assert agree > 0.9


def test_border_matches_tapwise_gather(rng):
    """Packed single-gather warp vs the tap-wise reference gathers on the
    FULL image incl. the boundary band.

    Regression for the round-2 off-by-one: when floor(sy) or floor(sx) was
    -1 the packed row's +1 taps read row/col 1 instead of the clipped
    row/col 0 (ADVICE.md r2, medium)."""
    import math

    import jax

    from smsut_tpu.data.device_augment import (_bilinear_gather,
                                               _nearest_gather)

    h = w = 32
    cfg = _cfg(rotate=True, elasticDeform=False, resizeCrop=False)
    da = DeviceAugment(cfg, random.Random(0))
    img = (rng.random((h, w)) * 255).astype(np.uint8)
    msk = rng.integers(0, 5, (h, w)).astype(np.uint8)

    for angle in (27.3, -63.0, 118.5):
        out_i, out_m = jax.jit(da._warp_one)(
            jnp.asarray(img), jnp.asarray(msk),
            jnp.float32(angle), jnp.float32(0.0),
            jnp.zeros((2, 3, 3), jnp.float32),
            jnp.asarray([0.0, 0.0, float(h), float(w)], jnp.float32),
            jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))

        # recompute the source coords exactly as _warp_one does (identity
        # crop, no elastic -> cy/cx are the integer output grid)
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        theta = -angle * math.pi / 180.0
        cth, sth = math.cos(theta), math.sin(theta)
        oy, ox = h / 2.0, w / 2.0
        ry, rx = yy - oy, xx - ox
        sy = oy + (-sth * rx + cth * ry)
        sx = ox + (cth * rx + sth * ry)

        want_i = np.asarray(_bilinear_gather(
            jnp.asarray(img, jnp.float32), jnp.asarray(sy), jnp.asarray(sx)))
        want_m = np.asarray(_nearest_gather(
            jnp.asarray(msk), jnp.asarray(sy), jnp.asarray(sx)))

        got_i = (np.asarray(out_i) * 0.5 + 0.5) * 255.0
        np.testing.assert_allclose(got_i, want_i, atol=2e-3)
        np.testing.assert_array_equal(np.asarray(out_m), want_m)


def test_elastic_applied_with_p_half():
    cfg = _cfg(rotate=False, resizeCrop=False)
    da = DeviceAugment(cfg, random.Random(1))
    flags = [da.sample_params(1, 32, 32)["do_elastic"][0] for _ in range(60)]
    assert 10 < sum(flags) < 50  # roughly half on


def test_deterministic_given_seed(rng):
    img = (rng.random((2, 32, 32)) * 255).astype(np.uint8)
    msk = rng.integers(0, 5, (2, 32, 32)).astype(np.uint8)
    a = DeviceAugment(_cfg(), random.Random(7))(img, msk)
    b = DeviceAugment(_cfg(), random.Random(7))(img, msk)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_color_jitter_order_commutes(rng):
    """Brightness (x -> b*x) and contrast (x -> c*x + (1-c)*mean(x)) commute
    exactly on grayscale (mean(b*x) = b*mean(x)), so the device warp's fixed
    brightness->contrast order equals the reference's shuffled order up to
    PIL's per-op uint8 rounding (PARITY.md)."""
    x = rng.random((64, 64)).astype(np.float64) * 255.0
    for b, c in [(0.6, 1.4), (1.4, 0.6), (0.87, 1.13)]:
        bc = (x * b - (x * b).mean()) * c + (x * b).mean()
        cb = ((x - x.mean()) * c + x.mean()) * b
        np.testing.assert_allclose(bc, cb, rtol=1e-12)
