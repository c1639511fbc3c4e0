# -*- coding: utf-8 -*-
"""Learning check for the flagship SMSUT recipe (uganConsis): on the
synthetic dataset the full D + WGAN-GP + G + NCE + supervised step must
materially improve mean test Dice over the untrained network — evidence the
recipe *trains*, not just runs (VERDICT r1 #7; reference training loop
`/root/reference/trainer/uganConsisTrainer.py:96-180`)."""
import numpy as np
import pytest

from smsut_tpu.config import Config
from smsut_tpu.data.dataset import get_label_npys, get_loader
from smsut_tpu.data.synthetic import make_synthetic_dataset
from smsut_tpu.train.loop import Trainer
from smsut_tpu.train.steps.gan import UGANConsisAlgo


@pytest.mark.slow
def test_ugan_consis_learns_on_synthetic(tmp_path):
    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=64)
    cfg = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=64,
        base_width=4, batch_size=4, num_iter_per_epoch=8, max_epoch=15,
        num_workers=2, compute_dtype="float32", eval_every=15,
        data_aug=dict(Config().data_aug, resizeCrop_size=64),
    )
    algo = UGANConsisAlgo(cfg)
    trainer = Trainer(algo, cfg, "train")

    test_loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    _, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)

    _, prd0 = trainer.validate_epoch(test_loader, gt_npys, None)
    dice0 = trainer.validate_dice(prd0, gt_npys)["dice"]

    trainer.fit("inTurn")

    _, prd1 = trainer.validate_epoch(test_loader, gt_npys, None)
    dice1 = trainer.validate_dice(prd1, gt_npys)["dice"]

    # untrained ~0; 120 full SMSUT iterations must lift mean Dice materially
    assert dice1 > dice0 + 0.2, (dice0, dice1)
    assert dice1 > 0.3, (dice0, dice1)
