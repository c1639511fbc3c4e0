# -*- coding: utf-8 -*-
"""End-to-end CoraNet two-stage flow through the generic Trainer on CPU:
stage A prefit -> pre_best/pre_last; stage B loads pre_best, regenerates
pseudo-labels every pred_step epochs, trains, saves best/last."""
import os
from os.path import join as pjoin

import pytest

from smsut_tpu.config import Config
from smsut_tpu.data.synthetic import make_synthetic_dataset
from smsut_tpu.train.loop import Trainer
from smsut_tpu.train.steps.coranet import CoraNet


def test_two_stage_fit(tmp_path):
    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=32)
    cfg = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=32,
        base_width=4, batch_size=2, num_iter_per_epoch=2, num_workers=2,
        pre_epoch=1, cora_epoch=1, pred_step=1, compute_dtype="float32",
        data_aug=dict(Config().data_aug, resizeCrop_size=32),
    )

    # stage A
    pre = CoraNet(cfg, stage="pre")
    t_a = Trainer(pre, cfg, "train")
    t_a.fit("inTurn")
    assert os.path.isdir(pjoin(t_a.exp.ckpt_root, "pre_best.ckpt"))
    assert os.path.isdir(pjoin(t_a.exp.ckpt_root, "pre_last.ckpt"))

    # stage B bootstrapped from stage A
    cora = CoraNet(cfg, stage="cora")
    t_b = Trainer(cora, cfg, "train")
    cora.load_pretrained(t_b, t_a.exp.model_idx)
    t_b.fit("inTurn")
    assert os.path.isdir(pjoin(t_b.exp.ckpt_root, "best.ckpt"))
    assert os.path.isdir(pjoin(t_b.exp.ckpt_root, "last.ckpt"))
    assert cora._pseudo is not None
    assert cora._pseudo["img"].ndim == 4  # [N,H,W,1] augmented pseudo set
