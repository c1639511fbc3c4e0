# -*- coding: utf-8 -*-
"""Preprocessing tests: NIfTI round trip, DICOM-lite parsing, resample
semantics, full nii->png->split pipeline on synthetic volumes."""
import gzip
import os
import struct
from os.path import join as pjoin

import numpy as np
import pytest

from smsut_tpu.config import Config
from smsut_tpu.preprocess.atlas import AtlasPreparation, remap_labels
from smsut_tpu.preprocess.chaos import decode_label_png
from smsut_tpu.preprocess.dicom_lite import read_dicom, read_dicom_series
from smsut_tpu.preprocess.niftio import Volume, read_nifti, write_nifti
from smsut_tpu.preprocess.resample import resample_and_crop
from smsut_tpu.preprocess.to_png_and_split import split_train_val_test, to_png


def test_nifti_roundtrip(tmp_path, rng):
    for dtype in (np.float32, np.uint8, np.int16):
        data = (rng.random((5, 12, 10)) * 100).astype(dtype)
        vol = Volume(data, (1.5, 2.0, 5.0))
        for name in ("a.nii", "a.nii.gz"):
            path = str(tmp_path / name)
            write_nifti(vol, path)
            back = read_nifti(path)
            np.testing.assert_array_equal(back.data, data)
            assert back.spacing == pytest.approx((1.5, 2.0, 5.0))
            assert back.size == (10, 12, 5)


def _write_fake_dicom(path, pixels, ipp_z, instance, spacing=(1.2, 0.8),
                      explicit=True, slope=1.0, inter=0.0):
    """Minimal part-10 Explicit/Implicit VR LE writer for tests."""
    def el(group, elem, vr, value):
        tag = struct.pack("<HH", group, elem)
        if not explicit and group != 0x0002:
            return tag + struct.pack("<I", len(value)) + value
        if vr in (b"OB", b"OW", b"UN", b"SQ", b"UT"):
            return tag + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return tag + vr + struct.pack("<H", len(value)) + value

    def pad(s):
        b = s.encode()
        return b + b" " if len(b) % 2 else b

    ts = "1.2.840.10008.1.2.1" if explicit else "1.2.840.10008.1.2"
    ts_val = ts.encode() + (b"\x00" if len(ts) % 2 else b"")
    meta = el(0x0002, 0x0010, b"UI", ts_val)
    rows, cols = pixels.shape
    body = b"".join([
        el(0x0018, 0x0050, b"DS", pad("5.0")),
        el(0x0020, 0x0013, b"IS", pad(str(instance))),
        el(0x0020, 0x0032, b"DS", pad(f"0\\0\\{ipp_z}")),
        el(0x0028, 0x0010, b"US", struct.pack("<H", rows)),
        el(0x0028, 0x0011, b"US", struct.pack("<H", cols)),
        el(0x0028, 0x0030, b"DS", pad(f"{spacing[0]}\\{spacing[1]}")),
        el(0x0028, 0x0100, b"US", struct.pack("<H", 16)),
        el(0x0028, 0x0103, b"US", struct.pack("<H", 1)),
        el(0x0028, 0x1052, b"DS", pad(str(inter))),
        el(0x0028, 0x1053, b"DS", pad(str(slope))),
        el(0x7FE0, 0x0010, b"OW", pixels.astype("<i2").tobytes()),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


@pytest.mark.parametrize("explicit", [True, False])
def test_dicom_series(tmp_path, rng, explicit):
    d = tmp_path / ("exp" if explicit else "imp")
    d.mkdir()
    vols = []
    for z in range(3):
        px = (rng.random((6, 8)) * 1000).astype(np.int16)
        vols.append(px)
        _write_fake_dicom(str(d / f"s{2 - z}.dcm"), px, ipp_z=z * 5.0,
                          instance=z + 1, explicit=explicit, slope=2.0,
                          inter=-10.0)
    vol = read_dicom_series(str(d))
    assert vol.data.shape == (3, 6, 8)
    # sorted by z position despite reversed filenames
    np.testing.assert_allclose(vol.data[0], vols[0] * 2.0 - 10.0)
    np.testing.assert_allclose(vol.data[2], vols[2] * 2.0 - 10.0)
    # spacing (x=col, y=row, z=gap)
    assert vol.spacing == pytest.approx((0.8, 1.2, 5.0))


def test_resample_and_crop_semantics(rng):
    data = rng.random((4, 40, 30)).astype(np.float32)
    vol = Volume(data, (2.0, 2.0, 5.0))
    out = resample_and_crop(vol, (1.0, 1.0, 5.0), 32, is_label=False)
    # x: 30*2 = 60 -> crop 32, y: 40*2=80 -> crop 32, z kept
    assert out.data.shape == (4, 32, 32)
    lbl = resample_and_crop(Volume((data > 0.5).astype(np.uint8), vol.spacing),
                            (1.0, 1.0, 5.0), 32, is_label=True)
    assert set(np.unique(lbl.data)) <= {0, 1}


def test_resample_min_size_clamp():
    vol = Volume(np.zeros((2, 20, 20), np.float32), (1.0, 1.0, 5.0))
    out = resample_and_crop(vol, (1.5, 1.5, 5.0), 32, is_label=False)
    # 20/1.5 = 13 -> clamped to crop_size 32
    assert out.data.shape == (2, 32, 32)


def test_decode_label_png():
    lbl = np.array([[0, 60, 120, 180, 250]], np.uint8)
    np.testing.assert_array_equal(decode_label_png(lbl), [[0, 1, 2, 3, 4]])


def test_remap_labels():
    lbl = np.array([[0, 6, 2, 3, 1, 5]], np.uint8)
    np.testing.assert_array_equal(remap_labels(lbl), [[0, 1, 2, 3, 4, 0]])


def test_to_png_and_split_pipeline(tmp_path, rng):
    # build a tiny nii tree: 2 modalities x 4 patients
    src = tmp_path / "bimod"
    for modality, lo, hi in (("ct", -1200, 600), ("t2", 0, 900)):
        img_root = src / modality / "images"
        lbl_root = src / modality / "labels"
        img_root.mkdir(parents=True)
        lbl_root.mkdir(parents=True)
        for p in range(4):
            pid = str(p + 1).rjust(3, "0")
            img = (rng.random((3, 16, 16)) * (hi - lo) + lo).astype(np.float32)
            lbl = rng.integers(0, 5, (3, 16, 16)).astype(np.uint8)
            write_nifti(Volume(img, (1.5, 1.5, 5.0)),
                        str(img_root / f"{modality}_{pid}.nii.gz"))
            write_nifti(Volume(lbl, (1.5, 1.5, 5.0)),
                        str(lbl_root / f"{modality}_{pid}.nii.gz"))

    dst = tmp_path / "png"
    to_png(str(src), str(dst))
    # tree layout + npy volume
    assert os.path.isfile(str(dst / "ct" / "001" / "images" / "ct_001_000.png"))
    assert os.path.isfile(str(dst / "ct" / "001" / "ct_001.npy"))
    import cv2

    png = cv2.imread(str(dst / "ct" / "001" / "images" / "ct_001_002.png"),
                     cv2.IMREAD_GRAYSCALE)
    assert png.shape == (16, 16) and png.max() <= 255

    split = split_train_val_test(str(dst), str(dst), Config())
    assert set(split.keys()) == {"ct", "t2"}
    for m in split:
        assert len(split[m]["train"]) == 5  # fold lists
        all_pids = set(split[m]["test"]) | set(split[m]["train"][0]) | \
            set(split[m]["val"][0])
        assert len(all_pids) == 4
