# -*- coding: utf-8 -*-
"""Long-horizon training-equivalence rehearsal (VERDICT r3 #1).

The north-star Dice-parity claim needs the real CHAOS/Atlas data, which this
environment lacks.  This rehearsal is the strongest available proxy: it runs
the REAL ``Trainer.fit`` loop (`smsut_tpu/train/loop.py`, mirroring
`/root/reference/trainer/baseTrainer.py:125-201` driven like `run0.sh`) for
several epochs on a reference-shaped synthetic dataset (structured
multi-organ volumes, 4 modalities, real split yaml) in strict-parity mode
(`compute_dtype=float32`, `device_augment=False`, `steps_per_dispatch=1`),
RECORDING every training batch the loop consumes — then replays the
identical stream through an independent torch re-derivation of the
reference trainer (the tests' TUNet mirror + SGD momentum 0.9 / coupled wd /
per-iteration poly LR with the reference's one-step lag), through the same
epoch structure: train epoch -> validate_epoch (slice->volume scatter) ->
mean-dice model selection -> final test-phase trois CSV from the selected
checkpoint.

Compared, epoch by epoch: [TRN] mean loss, [TST] mean dice (per modality and
overall), the best-epoch selection, and the final mo/assd matrices.  Run as
a script for the JSON report; tests/test_rehearsal.py asserts the envelope.
"""
from __future__ import annotations

import json
import os
import sys
from collections import defaultdict
from os.path import join as pjoin

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


class _RecordingLoader:
    """Transparent BatchLoader proxy that logs every batch the training loop
    actually consumes (whatever the producer-thread interleaving did to the
    shared data RNG — record-and-replay sidesteps loader nondeterminism)."""

    def __init__(self, loader, log):
        self._loader = loader
        self._log = log

    def iter_cycle(self):
        for b in self._loader.iter_cycle():
            self._log.append((b.img.copy(), b.msk.copy(), b.mdl.copy()))
            yield b

    def __iter__(self):
        for b in self._loader:
            self._log.append((b.img.copy(), b.msk.copy(), b.mdl.copy()))
            yield b

    def __getattr__(self, name):
        return getattr(self._loader, name)

    def __len__(self):
        return len(self._loader)


def _strict_cfg(data_root: str, expr_root: str, epochs: int, iters: int,
                size: int, width: int, batch: int):
    from smsut_tpu.config import Config

    return Config(
        base_root=data_root, expr_root=expr_root, input_size=size,
        base_width=width, batch_size=batch, num_iter_per_epoch=iters,
        max_epoch=epochs, num_workers=1, prefetch_depth=1,
        device_augment=False, compute_dtype="float32", steps_per_dispatch=1,
        data_aug=dict(Config().data_aug, resizeCrop_size=size))


def run_jax(cfg):
    """The real fit loop + test phase; returns (init_params, recorded train
    stream, scalar trajectories, csv path)."""
    import jax

    from smsut_tpu.train import loop as loop_mod
    from smsut_tpu.train.loop import Trainer
    from smsut_tpu.train.steps.supervised import SupervisedUNet

    recorded = {"train": [], "val": []}
    real_get_loader = loop_mod.get_loader

    def recording_get_loader(root, phase, fold, bs, *a, **kw):
        loader = real_get_loader(root, phase, fold, bs, *a, **kw)
        if phase in ("train", "val"):
            return _RecordingLoader(loader, recorded[phase])
        return loader

    algo = SupervisedUNet(cfg)
    trainer = Trainer(algo, cfg, "train")
    init_params = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    scalars = defaultdict(dict)
    orig_scalar = trainer.exp.scalar

    def capture(tag, value, step):
        scalars[tag][step] = float(value)
        return orig_scalar(tag, value, step)

    trainer.exp.scalar = capture
    loop_mod.get_loader = recording_get_loader
    try:
        trainer.fit("inTurn")
    finally:
        loop_mod.get_loader = real_get_loader
    # test phase against the selected (best) checkpoint, like `-p test
    # -wh best`
    trainer.load_model(trainer.exp.model_idx, "best")
    csv_path = trainer.test("inTurn", trainer.exp.model_root)
    return init_params, recorded["train"], dict(scalars), csv_path


# ----------------------------------------------------------------- torch side

def _build_torch_unet(init_params, width):
    """Torch mirror of the reference UNet with the jax init transplanted
    (tests/test_full_model_parity.py)."""
    from tests.test_full_model_parity import (TUNet, _conv_w, _convT_w,
                                              _load_block, _load_norm)

    t = TUNet(w=width)
    enc = init_params["encoder"]
    t.pre_conv.weight.data = _conv_w(enc["pre_conv"]["kernel"])
    _load_norm(t.pre_bn, enc["pre_bn"])
    for i in range(4):
        _load_block(t.enc[i], enc[f"layer{i + 1}"])
    _load_block(t.bott, enc["layer5"])
    dec = init_params["decoder"]
    for n, i in enumerate((4, 3, 2, 1)):
        t.ups[n].weight.data = _convT_w(dec[f"up{i}"]["up"]["kernel"])
        _load_block(t.dec[n], dec[f"layer{i}"])
    t.fc.weight.data = _conv_w(dec["fc"]["kernel"])
    return t


def _torch_validate(t, cfg, batch_size):
    """Reference validate_epoch semantics on the torch mirror: iterate the
    deterministic test sampler, zero-pad partial batches, argmax->uint8,
    scatter slices into per-volume arrays (`baseTrainer.py:203-242`)."""
    import torch

    from smsut_tpu.data.dataset import SliceDataset, get_label_npys
    from smsut_tpu.data.samplers import InTurnTestBatchSampler

    ds = SliceDataset(cfg.base_root, "test", 0, True, cfg.split_yaml)
    sampler = InTurnTestBatchSampler(ds.modal_sample_ids, batch_size)
    _, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)
    prd = {k: np.zeros(v.shape, v.dtype) for k, v in gt_npys.items()}
    with torch.no_grad():
        for idxs in sampler:
            raws = [ds.get_raw(i) for i in idxs]
            img = np.stack([r[0] for r in raws]).astype(np.float32)
            img = (img / 255.0 - 0.5) / 0.5
            b = len(idxs)
            if b < batch_size:
                img = np.concatenate(
                    [img, np.zeros((batch_size - b,) + img.shape[1:],
                                   img.dtype)])
            logits = t(torch.tensor(img[:, None, :, :]))
            pred = logits.argmax(1).numpy().astype(np.uint8)[:b]
            for i in range(b):
                m, pid, z = raws[i][3].split("_")
                prd[f"{m}_{pid}"][int(z)] = pred[i]
    return prd, gt_npys


def run_torch(cfg, init_params, stream):
    """The reference trainer loop re-derived in torch, fed the recorded
    stream: per-iteration SGD + poly-LR one-step lag (`unetTrainer.py:48,
    82-84`), per-epoch validate + mean-dice >= selection, final test-phase
    matrices from the selected weights (`baseTrainer.py:244-316`)."""
    import copy

    import torch

    from tests.test_training_parity import _torch_dice_ce
    from smsut_tpu.ops.metrics import get_all_matrix, get_mo_matrix
    from smsut_tpu.utils.meter import Meter

    t = _build_torch_unet(init_params, cfg.base_width)
    opt = torch.optim.SGD(t.parameters(), lr=cfg.lr, momentum=0.9,
                          weight_decay=cfg.weight_decay)
    min_keys = [f"loss_{i}" for i in range(cfg.n_modal)] + ["loss"]
    max_keys = [f"dice_{i}" for i in range(cfg.n_modal)] + ["dice"]
    out = {"train/loss": {}, "test/dice": {}}
    for i in range(cfg.n_modal):
        out[f"test/dice_{i}"] = {}
    best_state, best_dice, best_epoch = None, -1.0, -1
    it = 0
    for epoch in range(cfg.max_epoch):
        meter = Meter(min_keys, [], alpha=cfg.exp_alpha)
        meter.reset_cur()
        for _ in range(cfg.num_iter_per_epoch):
            img, msk, mdl = stream[it]
            opt.zero_grad()
            loss = _torch_dice_ce(
                t(torch.tensor(img.transpose(0, 3, 1, 2))),
                torch.tensor(msk.astype(np.int64)))
            loss.backward()
            opt.step()
            # the reference mutates LR *after* the step -> one-step lag
            lr = cfg.lr * (1.0 - it / cfg.total_iters) ** 0.9
            for g in opt.param_groups:
                g["lr"] = lr
            it += 1
            v, n = Meter.collect_loss_by(loss.item(), int(mdl[0]),
                                         img.shape[0])
            meter.accumulate(v, n)
        meter.update_cur()
        out["train/loss"][epoch] = float(meter.cur_values["loss"])

        prd, gt = _torch_validate(t, cfg, cfg.batch_size)
        mo = get_mo_matrix(prd, gt, cfg)
        dice = float(mo[-1, -1])
        out["test/dice"][epoch] = dice
        for i in range(cfg.n_modal):
            out[f"test/dice_{i}"][epoch] = float(mo[i, -1])
        if dice >= best_dice:           # reference >= keeps the later epoch
            best_dice, best_epoch = dice, epoch
            best_state = copy.deepcopy(t.state_dict())
    t.load_state_dict(best_state)
    prd, gt = _torch_validate(t, cfg, cfg.batch_size)
    mo = get_mo_matrix(prd, gt, cfg)
    _, _, assd = get_all_matrix(prd, gt, cfg)
    return out, best_epoch, mo, assd


# ------------------------------------------------------------------- compare

def _best_epoch_from(dices):
    best, be = -1.0, -1
    for e in sorted(dices):
        if dices[e] >= best:
            best, be = dices[e], e
    return be


def rehearse(workdir: str, epochs: int = 3, iters: int = 6, size: int = 64,
             width: int = 8, batch: int = 4) -> dict:
    from smsut_tpu.config import Modality
    from smsut_tpu.data.synthetic import make_synthetic_dataset

    data_root = pjoin(workdir, "data")
    if not os.path.isdir(data_root):
        make_synthetic_dataset(data_root, n_patients_per_modality=3,
                               n_slice=4, size=size)
    cfg = _strict_cfg(data_root, pjoin(workdir, "out"), epochs, iters,
                      size, width, batch)
    init_params, stream, jx, csv_path = run_jax(cfg)
    assert len(stream) >= epochs * iters, (len(stream), epochs * iters)
    tx, t_best, t_mo, t_assd = run_torch(cfg, init_params,
                                         stream[:epochs * iters])

    j_mats = [np.loadtxt(b.strip().splitlines(), delimiter=",")
              for b in open(csv_path).read().split("\n\n") if b.strip()]
    report = {
        "epochs": epochs,
        "train_loss_dev": max(abs(jx["train/loss"][e] - tx["train/loss"][e])
                              for e in range(epochs)),
        "test_dice_dev": max(abs(jx["test/dice"][e] - tx["test/dice"][e])
                             for e in range(epochs)),
        "per_modality_dice_dev": max(
            abs(jx[f"test/dice_{Modality(i).name}"][e]
                - tx[f"test/dice_{i}"][e])
            for i in range(cfg.n_modal) for e in range(epochs)),
        "best_epoch_jax": _best_epoch_from(jx["test/dice"]),
        "best_epoch_torch": t_best,
        # the selected-model quality is the meaningful selection comparison:
        # when the dice curve plateaus inside the float-drift envelope the
        # argmax EPOCH may differ while the selected models are equivalent
        "best_dice_jax": max(jx["test/dice"].values()),
        "best_dice_torch": max(tx["test/dice"].values()),
        "mo_matrix_dev": float(np.max(np.abs(j_mats[0] - t_mo))),
        # reported, not tightly bounded: ASSD of near-random segmentations
        # is chaotic — marginal connected components flip under 1-pixel
        # prediction differences and cascade through the max_assd fallback
        "assd_matrix_dev": float(np.max(np.abs(j_mats[1] - t_assd))),
        "jax_dice_trajectory": [jx["test/dice"][e] for e in range(epochs)],
        "torch_dice_trajectory": [tx["test/dice"][e] for e in range(epochs)],
    }
    report["best_dice_dev"] = abs(report["best_dice_jax"]
                                  - report["best_dice_torch"])
    with open(pjoin(workdir, "rehearsal_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    import tempfile

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="smsut-rehearse-")
    rep = rehearse(workdir)
    print(json.dumps(rep, indent=2))
