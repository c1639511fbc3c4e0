# -*- coding: utf-8 -*-
"""End-to-end smoke: supervised U-Net fit -> checkpoint -> test CSV on the
synthetic dataset, CPU, tiny dims (SURVEY §4 test plan)."""
import os
from os.path import join as pjoin

import numpy as np
import pytest

from smsut_tpu.config import Config
from smsut_tpu.data.synthetic import make_synthetic_dataset
from smsut_tpu.train.loop import Trainer
from smsut_tpu.train.steps.supervised import SupervisedUNet


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    data_root = str(tmp_path_factory.mktemp("synth"))
    expr_root = str(tmp_path_factory.mktemp("expr"))
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4, size=32)
    cfg = Config(
        base_root=data_root, expr_root=expr_root, input_size=32, base_width=4,
        batch_size=4, num_iter_per_epoch=4, max_epoch=2, num_workers=2,
        compute_dtype="float32",
        data_aug=dict(Config().data_aug, resizeCrop_size=32),
    )
    return cfg


def test_fit_and_test(tiny_env):
    cfg = tiny_env
    algo = SupervisedUNet(cfg)
    trainer = Trainer(algo, cfg, "train")
    trainer.fit("inTurn")

    ckpt_root = trainer.exp.ckpt_root
    assert os.path.isdir(pjoin(ckpt_root, "best.ckpt"))
    assert os.path.isdir(pjoin(ckpt_root, "last.ckpt"))
    assert int(trainer.state.step) == cfg.max_epoch * cfg.num_iter_per_epoch

    # reload + test phase
    trainer2 = Trainer(SupervisedUNet(cfg), cfg, "test")
    trainer2.exp.expr_root = trainer.exp.expr_root
    trainer2.load_model(trainer.exp.model_idx, "best")
    csv_path = trainer2.test("inTurn", trainer.exp.model_root)
    assert os.path.isfile(csv_path)
    content = open(csv_path).read()
    rows = [r for r in content.strip().split("\n") if r]
    assert len(rows) == 2 * (cfg.n_modal + 1)  # dice matrix + assd matrix


def test_lr_matches_reference_poly_decay(tiny_env):
    # schedule(step k) == cfg.lr * (1 - max(k-1,0)/total)^0.9
    from smsut_tpu.ops.schedules import poly_lr_schedule

    cfg = tiny_env
    sched = poly_lr_schedule(cfg.lr, cfg.total_iters)
    assert float(sched(0)) == pytest.approx(cfg.lr)
    assert float(sched(1)) == pytest.approx(cfg.lr)
    assert float(sched(2)) == pytest.approx(cfg.lr * (1 - 1 / cfg.total_iters) ** 0.9)
