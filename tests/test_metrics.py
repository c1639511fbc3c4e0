# -*- coding: utf-8 -*-
"""Host-side metric tests: dice, ASSD (medpy-equivalent), connected-component
filtering, modality-organ matrices, CSV format."""
import numpy as np
import pytest

from smsut_tpu.config import Config
from smsut_tpu.ops.metrics import (
    assd_metric,
    connected_components,
    dice_coefficient,
    get_all_matrix,
    get_mo_matrix,
    matrix_to_csv,
)

CFG = Config()


def test_dice_coefficient():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    a[:2] = True
    b[1:3] = True
    # |a|=8 |b|=8 inter=4 -> 2*4/16
    assert dice_coefficient(a, b) == pytest.approx(0.5)
    assert dice_coefficient(a, a) == 1.0
    assert dice_coefficient(np.zeros((2, 2)), np.zeros((2, 2))) == 0.0


def test_assd_identical_is_zero():
    a = np.zeros((8, 8), bool)
    a[2:6, 2:6] = True
    assert assd_metric(a, a) == 0.0


def test_assd_translated_square():
    a = np.zeros((16, 16), bool)
    b = np.zeros((16, 16), bool)
    a[4:8, 4:8] = True
    b[4:8, 6:10] = True  # shifted 2 in x
    d = assd_metric(a, b)
    assert 0.5 < d < 2.0  # mean symmetric surface distance of a 2px shift


def test_connected_components_drops_small():
    pred = np.zeros((16, 16), np.uint8)
    pred[0:8, 0:8] = 1          # 64 px component
    pred[14, 14] = 1            # 1 px << 10% of 65
    out = connected_components(pred, n_label=4)
    assert out[2, 2] == 1
    assert out[14, 14] == 0


def test_connected_components_keeps_multiple_classes():
    pred = np.zeros((8, 8), np.uint8)
    pred[:4, :4] = 1
    pred[4:, 4:] = 3
    out = connected_components(pred, n_label=4)
    np.testing.assert_array_equal(out, pred)


def test_mo_matrix_means():
    gt = {f"{m}_001": np.zeros((2, 8, 8), np.uint8)
          for m in ("ct", "t1in", "t1out", "t2")}
    prd = {}
    for k in gt:
        gt[k][0, :4, :4] = 1
        prd[k] = gt[k].copy()  # perfect prediction for organ 1
    mat = get_mo_matrix(prd, gt, CFG)
    assert mat.shape == (5, 5)
    np.testing.assert_allclose(mat[:4, 0], 1.0)  # organ 1 dice = 1
    np.testing.assert_allclose(mat[:4, 1:4], 0.0)  # absent organs -> dc 0
    assert mat[-1, -1] == pytest.approx(0.25)   # mean of (1,0,0,0)


def test_get_all_matrix_hd_quirk_and_assd():
    gt = {f"{m}_001": np.zeros((2, 16, 16), np.uint8)
          for m in ("ct", "t1in", "t1out", "t2")}
    prd = {}
    for k in gt:
        gt[k][:, 4:8, 4:8] = 1
        prd[k] = gt[k].copy()
    dc_m, hd_m, assd_m = get_all_matrix(prd, gt, CFG)
    np.testing.assert_allclose(dc_m, hd_m)  # reference quirk: HD slot == dice
    np.testing.assert_allclose(assd_m[:4, 0], 0.0)  # perfect -> assd 0


def test_get_all_matrix_real_hd_option():
    """Config.real_hd swaps the dice placeholder for the genuine Hausdorff
    distance (VERDICT r2 #10)."""
    from smsut_tpu.ops.metrics import hd_metric

    gt = {f"{m}_001": np.zeros((2, 16, 16), np.uint8)
          for m in ("ct", "t1in", "t1out", "t2")}
    prd = {}
    for k in gt:
        gt[k][:, 4:8, 4:8] = 1
        prd[k] = np.zeros_like(gt[k])
        prd[k][:, 5:9, 4:8] = 1   # shifted by one row -> HD == 1
    dc_m, hd_m, assd_m = get_all_matrix(prd, gt, CFG.replace(real_hd=True))
    assert hd_m[0, 0] == pytest.approx(1.0)
    assert not np.allclose(dc_m, hd_m)
    # direct metric check: identical shapes -> 0
    a = np.zeros((8, 8), bool)
    a[2:5, 2:5] = True
    assert hd_metric(a, a) == 0.0


class TestGoldenFixtureParity:
    """dc/assd/hd parity against committed golden fixtures on nontrivial
    volumes (VERDICT r3 #4).  The goldens are produced by an INDEPENDENT
    brute-force implementation of medpy's documented algorithm (explicit
    neighbour loops + pairwise distances — no scipy morphology; see
    tools/make_metric_fixtures.py), covering touching borders, edge-clipped
    shapes, multiple components, anisotropic arrays, single voxels, 2-D
    slices and empty classes.  Agreement to 1e-9 validates the production
    scipy re-derivation's border semantics (`misc/utils.py:206-283`)."""

    @pytest.fixture(scope="class")
    def golden(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "metric_golden.npz")
        return np.load(path)

    def _cases(self, golden):
        return sorted({k.rsplit("__", 1)[0] for k in golden.files})

    def test_dc_matches_golden(self, golden):
        for name in self._cases(golden):
            p, g = golden[f"{name}__pred"], golden[f"{name}__gt"]
            assert dice_coefficient(p, g) == pytest.approx(
                float(golden[f"{name}__dc"]), abs=1e-9), name

    def test_assd_matches_golden(self, golden):
        for name in self._cases(golden):
            if f"{name}__assd" not in golden.files:
                continue
            p, g = golden[f"{name}__pred"], golden[f"{name}__gt"]
            assert assd_metric(p, g) == pytest.approx(
                float(golden[f"{name}__assd"]), abs=1e-9), name

    def test_hd_matches_golden(self, golden):
        from smsut_tpu.ops.metrics import hd_metric

        for name in self._cases(golden):
            if f"{name}__hd" not in golden.files:
                continue
            p, g = golden[f"{name}__pred"], golden[f"{name}__gt"]
            assert hd_metric(p, g) == pytest.approx(
                float(golden[f"{name}__hd"]), abs=1e-9), name

    def test_empty_structures_raise(self, golden):
        p, g = golden["pred_empty__pred"], golden["pred_empty__gt"]
        with pytest.raises(RuntimeError):
            assd_metric(p, g)


def test_matrix_to_csv_format():
    m = np.arange(25, dtype=float).reshape(5, 5) / 10
    csv = matrix_to_csv(m, m)
    blocks = csv.strip().split("\n\n")
    assert len(blocks) == 2
    rows = blocks[0].split("\n")
    assert len(rows) == 5
    assert rows[0] == "0.0000,0.1000,0.2000,0.3000,0.4000"
