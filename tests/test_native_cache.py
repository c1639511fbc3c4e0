# -*- coding: utf-8 -*-
"""Native C++ slice cache: decode parity with cv2, batch gather, dataset
integration."""
import os

import cv2
import numpy as np
import pytest

from smsut_tpu.data.native_cache import available

pytestmark = pytest.mark.skipif(not available(),
                                reason="native slicecache not built")


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory, ):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    ref = []
    for i in range(12):
        img = (rng.random((32, 48)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"s{i:02d}.png"), img)
        ref.append(img)
    return d, ref


def test_decode_parity(png_dir):
    from smsut_tpu.data.native_cache import SliceCache

    d, ref = png_dir
    paths = [str(d / f"s{i:02d}.png") for i in range(12)]
    c = SliceCache(paths)
    assert (c.count, c.height, c.width) == (12, 32, 48)
    got = c.gather_u8(list(range(12)))
    for i in range(12):
        np.testing.assert_array_equal(got[i], ref[i])


def test_gather_f32_normalization(png_dir):
    from smsut_tpu.data.native_cache import SliceCache

    d, ref = png_dir
    c = SliceCache([str(d / "s03.png")])
    f = c.gather_f32([0])
    np.testing.assert_allclose(f[0], (ref[3] / 255.0 - 0.5) / 0.5, atol=1e-6)


def test_bad_path_raises(tmp_path):
    from smsut_tpu.data.native_cache import SliceCache

    with pytest.raises(RuntimeError):
        SliceCache([str(tmp_path / "missing.png")])


def test_dataset_uses_native_cache(tmp_path):
    from smsut_tpu.data.dataset import SliceDataset
    from smsut_tpu.data.synthetic import make_synthetic_dataset

    root = make_synthetic_dataset(str(tmp_path / "synth"),
                                  n_patients_per_modality=3, n_slice=4, size=32)
    ds = SliceDataset(root, "train", 0, load_in_ram=True)
    assert ds._img_cache is not None
    img, msk, mdl, name = ds.get_raw(0)
    assert img.shape == (32, 32) and msk.shape == (32, 32)
    fast = ds.gather_batch_u8([0, 1, 2])
    assert fast[0].shape == (3, 32, 32)
    # parity with direct decode
    direct = cv2.imread(ds.samples[1][0], cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(fast[0][1], direct)
