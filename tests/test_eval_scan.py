# -*- coding: utf-8 -*-
"""Whole-sweep eval scan (Config.eval_scan) vs the per-batch eval path:
identical predictions and matching losses/metrics on the synthetic set."""
import numpy as np
import pytest

from smsut_tpu.config import Config
from smsut_tpu.data.dataset import get_label_npys, get_loader
from smsut_tpu.data.synthetic import make_synthetic_dataset
from smsut_tpu.train.loop import Trainer
from smsut_tpu.train.steps.supervised import SupervisedUNet
from smsut_tpu.utils.meter import Meter


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data_root = str(tmp_path_factory.mktemp("synth"))
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=5,
                           size=32)
    # batch 4 with 5-slice volumes -> partial (padded) tail batches
    cfg = Config(base_root=data_root,
                 expr_root=str(tmp_path_factory.mktemp("expr")),
                 input_size=32, base_width=4,
                 batch_size=4, compute_dtype="float32")
    return cfg


def _run(cfg, eval_scan: bool):
    cfg = cfg.replace(eval_scan=eval_scan)
    algo = SupervisedUNet(cfg)
    trainer = Trainer(algo, cfg, "test", experiment=None)
    loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    n_gt, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)
    meter = Meter([f"loss_{i}" for i in range(4)] + ["loss"], [], alpha=1.0)
    meter.reset_cur()
    n_prd, prd = trainer.validate_epoch(loader, gt_npys, meter)
    meter.update_cur()
    assert n_prd == n_gt
    return prd, dict(meter.cur_values)


def test_scan_matches_per_batch(env):
    prd_a, met_a = _run(env, eval_scan=False)
    prd_b, met_b = _run(env, eval_scan=True)
    assert set(prd_a) == set(prd_b)
    for k in prd_a:
        np.testing.assert_array_equal(prd_a[k], prd_b[k])
    for k in met_a:
        assert met_a[k] == pytest.approx(met_b[k], rel=1e-5, abs=1e-6), k
