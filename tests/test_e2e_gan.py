# -*- coding: utf-8 -*-
"""End-to-end smoke for the full SMSUT trainer (fit -> sample grids ->
checkpoints) on CPU with tiny dims, exercising the fused device-augment
path."""
import os
from os.path import join as pjoin

import pytest

from smsut_tpu.config import Config
from smsut_tpu.data.synthetic import make_synthetic_dataset
from smsut_tpu.train.loop import Trainer
from smsut_tpu.train.steps.gan import UGANConsisAlgo


def test_ugan_consis_fit(tmp_path):
    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=64)
    cfg = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=64,
        base_width=4, batch_size=2, num_iter_per_epoch=2, max_epoch=1,
        num_workers=2, compute_dtype="float32",
        data_aug=dict(Config().data_aug, resizeCrop_size=64),
    )
    algo = UGANConsisAlgo(cfg)
    trainer = Trainer(algo, cfg, "train")
    trainer.fit("inTurn")

    assert os.path.isdir(pjoin(trainer.exp.ckpt_root, "last.ckpt"))
    assert int(trainer.state.step) == 2
    # per-epoch translation grid saved
    samples = os.listdir(trainer.exp.sample_root)
    assert any(s.startswith("train-1") for s in samples)


def test_ugan_pseudo_dumps(tmp_path):
    """Pseudo phase: per-slice pse/gt/ori/fk dumps for every test slice plus
    whole-volume translation grids for the selected volumes
    (`uganConsisTrainer.py:248-303`)."""
    from smsut_tpu.train.cli import saving_pseudo

    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=64)
    cfg = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=64,
        base_width=4, batch_size=2, num_workers=2, compute_dtype="float32",
        pseudo_volumes=("ct_003", "t2_003"),
    )
    algo = UGANConsisAlgo(cfg)
    trainer = Trainer(algo, cfg, "pseudo")
    expr_root = str(tmp_path / "expr" / "out")
    saving_pseudo(trainer, expr_root)

    pred_root = pjoin(expr_root, "pseudo")
    files = os.listdir(pred_root)
    # 4 modalities x 1 test patient x 4 slices, 4 jpgs each + 2 grids
    assert sum(f.endswith("pse.jpg") for f in files) == 16
    assert sum(f.endswith("fk.jpg") for f in files) == 16
    assert "ct_003_grid.jpg" in files and "t2_003_grid.jpg" in files
    from PIL import Image

    grid = Image.open(pjoin(pred_root, "ct_003_grid.jpg"))
    # 4 slices stacked vertically; original + 4 translations along width
    assert grid.size == (5 * 64, 4 * 64)
