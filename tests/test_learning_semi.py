# -*- coding: utf-8 -*-
"""Learning checks for the semi-supervised family (VERDICT r2 #7), patterned
on tests/test_learning_gan.py: on the synthetic dataset each recipe must
materially lift mean test Dice over the untrained network.

  * meanTeacher — student/EMA-teacher with MSE-softmax consistency
    (`/root/reference/trainer/meanTeacherTrainer.py:75-135`);
  * coraNet stage A -> stage B — the two-stage conservative-radical flow
    incl. the pseudo-label regeneration loop
    (`/root/reference/trainer/coraNetTrainer.py:604-690`).
"""
import numpy as np
import pytest

from smsut_tpu.config import Config
from smsut_tpu.data.dataset import get_label_npys, get_loader
from smsut_tpu.data.synthetic import make_synthetic_dataset
from smsut_tpu.train.loop import Trainer


def _dice(trainer, cfg, gt_npys, test_loader):
    _, prd = trainer.validate_epoch(test_loader, gt_npys, None)
    return trainer.validate_dice(prd, gt_npys)["dice"]


@pytest.mark.slow
def test_mean_teacher_learns_on_synthetic(tmp_path):
    from smsut_tpu.train.steps.mean_teacher import MeanTeacher

    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=64)
    cfg = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=64,
        base_width=4, batch_size=4, num_iter_per_epoch=10, max_epoch=12,
        num_workers=2, compute_dtype="float32", eval_every=12,
        data_aug=dict(Config().data_aug, resizeCrop_size=64),
    )
    algo = MeanTeacher(cfg)
    trainer = Trainer(algo, cfg, "train")
    test_loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    _, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)

    dice0 = _dice(trainer, cfg, gt_npys, test_loader)
    trainer.fit("inTurn")
    dice1 = _dice(trainer, cfg, gt_npys, test_loader)

    # Calibration is host-codegen-sensitive at this 120-iter horizon: the
    # same seeds measured 0.024 -> 0.164 (HEAD) and -> 0.175 (the commit
    # that added this test) after the compile-cache re-key forced fresh
    # native XLA:CPU codegen — f32 reduction-order drift moves the small-
    # scale trajectory, like the GAN chaos envelope
    # (tests/test_gan_training_parity.py).  Material learning = several
    # times the untrained dice, the crossPse/M3L convention below.
    assert dice1 > 2.5 * dice0, (dice0, dice1)
    assert dice1 > 0.10, (dice0, dice1)


@pytest.mark.slow
def test_coranet_two_stage_learns_on_synthetic(tmp_path):
    from smsut_tpu.train.steps.coranet import CoraNet

    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=64)
    cfg = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=64,
        base_width=4, batch_size=4, num_iter_per_epoch=10, num_workers=2,
        pre_epoch=8, cora_epoch=4, pred_step=2, compute_dtype="float32",
        eval_every=20,
        data_aug=dict(Config().data_aug, resizeCrop_size=64),
    )

    test_loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    _, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)

    pre = CoraNet(cfg, stage="pre")
    t_a = Trainer(pre, cfg, "train")
    dice0 = _dice(t_a, cfg, gt_npys, test_loader)
    t_a.fit("inTurn")
    dice_a = _dice(t_a, cfg, gt_npys, test_loader)
    # stage A alone must already learn from the labeled half (measured on
    # this host's codegen: 0.075 -> 0.155 in 80 iters; see the meanTeacher
    # note above for why the bars are ratio-based)
    assert dice_a > 1.5 * dice0, (dice0, dice_a)
    assert dice_a > 0.11, (dice0, dice_a)

    cora = CoraNet(cfg, stage="cora")
    t_b = Trainer(cora, cfg, "train")
    cora.load_pretrained(t_b, t_a.exp.model_idx)
    t_b.fit("inTurn")
    dice_b = _dice(t_b, cfg, gt_npys, test_loader)
    # the pseudo-label loop must not destroy (and should consolidate) the
    # stage-A dice; require a material gain over the untrained net
    print(f"\ncoranet learning: dice0={dice0:.4f} A={dice_a:.4f} "
          f"B={dice_b:.4f}")
    assert cora._pseudo is not None  # pseudo loop actually ran
    assert dice_b > 1.5 * dice0, (dice0, dice_a, dice_b)
    assert dice_b > 0.11, (dice0, dice_a, dice_b)


@pytest.mark.slow
def test_cross_pseudo_learns_on_synthetic(tmp_path):
    from smsut_tpu.train.steps.cross_pseudo import CrossPseudo

    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=64)
    cfg = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=64,
        base_width=4, batch_size=4, num_iter_per_epoch=10, max_epoch=12,
        num_workers=2, compute_dtype="float32", eval_every=12,
        data_aug=dict(Config().data_aug, resizeCrop_size=64),
    )
    algo = CrossPseudo(cfg)
    trainer = Trainer(algo, cfg, "train")
    test_loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    _, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)

    dice0 = _dice(trainer, cfg, gt_npys, test_loader)
    trainer.fit("inTurn")
    dice1 = _dice(trainer, cfg, gt_npys, test_loader)

    # CPS converges slower than meanTeacher at this scale: each net also
    # trains against the cold twin's argmax noise until both warm up
    # (measured on this recipe: 0.031 -> 0.125 @120 iters, 0.155 @200).
    # Material learning = several times the untrained dice.
    assert dice1 > 2.5 * dice0, (dice0, dice1)
    assert dice1 > 0.10, (dice0, dice1)


@pytest.mark.slow
def test_m3l_learns_on_synthetic(tmp_path):
    """M3L's SegFormer has no width knob (MiT-b0 scale), so this runs fewer
    iterations than the U-Net recipes; the CE-only supervised loss must
    still materially lift dice (`M3LTrainer.py:42-160`)."""
    from smsut_tpu.train.steps.m3l import M3L

    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=64)
    cfg = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=64,
        batch_size=4, num_iter_per_epoch=10, max_epoch=8, num_workers=2,
        compute_dtype="float32", eval_every=8,
        data_aug=dict(Config().data_aug, resizeCrop_size=64),
    )
    algo = M3L(cfg)
    trainer = Trainer(algo, cfg, "train")
    test_loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    _, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)

    dice0 = _dice(trainer, cfg, gt_npys, test_loader)
    trainer.fit("inTurn")
    dice1 = _dice(trainer, cfg, gt_npys, test_loader)

    # the reference's Adam(lr=1e-2) recipe on the MiT-b0-scale backbone
    # moves slowly in 80 tiny-scale iterations (measured: 0.042 -> 0.122,
    # losses still dropping); material learning = several times untrained.
    assert dice1 > 2.0 * dice0, (dice0, dice1)
    assert dice1 > dice0 + 0.06, (dice0, dice1)
