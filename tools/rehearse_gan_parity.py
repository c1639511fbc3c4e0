# -*- coding: utf-8 -*-
"""Long-horizon uganConsis training-equivalence rehearsal (VERDICT r4 #3).

Extends the supervised rehearsal (tools/rehearse_parity.py) to the FLAGSHIP
recipe — the full SMSUT uganConsis trainer
(`/root/reference/trainer/uganConsisTrainer.py:66-214`, `run0.sh:5-7`):
labeled+unlabeled concat batches, D Adam + WGAN-GP grad-of-grad, G SGD with
PatchNCE, the consistency gate crossing, lambda_semi's sigmoid rampup across
epochs, per-epoch validate -> mean-dice model selection.

Protocol (record-and-replay with a measured chaos envelope):

1. The REAL ``Trainer.fit`` loop runs UGANConsisAlgo for several epochs in
   strict-parity mode (f32 compute, host augmentation), with ``train_step``
   wrapped to RECORD every (batch, rng key, metrics) it consumes — whatever
   the loader threading did.  The consistency gate is set inside the run
   (``consis_gate_step``) so the gate crossing is exercised.
2. The recorded stream replays through an independent torch re-derivation
   of the reference iteration (the tests' TUGAN/TDisc mirrors + a netF MLP
   mirror), TWICE: float32 and float64.  The f64 twin is the near-exact
   trajectory; |torch_f32 - torch_f64| measures the INTRINSIC f32 chaos of
   this GAN recipe per epoch (Adam sign-steps amplify rounding — see
   tests/test_gan_training_parity.py).  jax must track the exact (f64)
   trajectory within a small multiple of torch's own f32 self-drift.
3. Exact structural checks, no envelope: the G_semi gate (zero before the
   gate step, generally nonzero after — same crossing index), lambda_semi's
   per-epoch rampup values, and the mean-dice >= selection rule applied to
   each side's own dice curve.

Run as a script for the JSON report; tests/test_rehearsal.py asserts the
envelope (slow marker).
"""
from __future__ import annotations

import json
import os
import sys
from os.path import join as pjoin

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.rehearse_parity import _strict_cfg  # noqa: E402


def _gan_cfg(data_root, expr_root, epochs, iters, size, width, batch,
             gate_step):
    cfg = _strict_cfg(data_root, expr_root, epochs, iters, size, width, batch)
    # small lr keeps the Adam-D conditioning floor workable for comparison
    # (same reasoning as __graft_entry__.dryrun_multichip's GAN check)
    return cfg.replace(lr=1e-3, consis_gate_step=gate_step)


def run_jax(cfg):
    """The real uganConsis fit loop + test phase, with train_step wrapped to
    record every consumed (batch, rng, metrics)."""
    import jax

    from smsut_tpu.train.loop import Trainer
    from smsut_tpu.train.steps.gan import UGANConsisAlgo

    algo = UGANConsisAlgo(cfg)
    trainer = Trainer(algo, cfg, "train")
    init_g = jax.tree_util.tree_map(np.asarray, trainer.state.g_params)
    init_d = jax.tree_util.tree_map(np.asarray, trainer.state.d_params)

    stream, metric_log = [], []
    real_step = algo.train_step

    def recording_step(state, batch, scalars):
        stream.append((
            {k: np.asarray(v) for k, v in batch.items()},
            np.asarray(scalars["rng"]),
            {k: float(v) for k, v in scalars.items() if k != "rng"},
        ))
        state, metrics = real_step(state, batch, scalars)
        metric_log.append(metrics)   # device scalars; fetched at the end
        return state, metrics

    algo.train_step = recording_step

    scalars = {}
    orig_scalar = trainer.exp.scalar

    def capture(tag, value, step):
        scalars.setdefault(tag, {})[step] = float(value)
        return orig_scalar(tag, value, step)

    trainer.exp.scalar = capture
    trainer.fit("inTurn")
    algo.train_step = real_step
    trainer.load_model(trainer.exp.model_idx, "best")
    csv_path = trainer.test("inTurn", trainer.exp.model_root)
    metric_log = [{k: float(v) for k, v in m.items()} for m in metric_log]
    return init_g, init_d, stream, metric_log, scalars, csv_path


# ----------------------------------------------------------------- torch side

def _build_torch_gan(init_g, init_d, cfg):
    import torch
    import torch.nn as nn

    from tests.test_discriminator_parity import TDisc
    from tests.test_gan_training_parity import _load_tdisc, _load_tugan
    from tests.test_ugan_parity import TUGAN

    w = cfg.base_width

    class TNetF(nn.Module):
        """PatchSampleF mirror (`network/ugan.py:270-339`): gather shared
        patch ids, Linear-ReLU-Linear, L2-normalize."""

        def __init__(self, cin, nc):
            super().__init__()
            self.fc1 = nn.Linear(cin, nc)
            self.fc2 = nn.Linear(nc, nc)

        def forward(self, feat, ids):
            b, c = feat.size(0), feat.size(1)
            flat = feat.reshape(b, c, -1).permute(0, 2, 1)      # [B,HW,C]
            sample = flat[:, ids, :].reshape(-1, c)             # [B*P,C]
            y = self.fc2(torch.relu(self.fc1(sample)))
            return y / (y.pow(2).sum(1, keepdim=True).sqrt() + 1e-7)

    class TUGANnce(nn.Module):
        def __init__(self):
            super().__init__()
            self.core = TUGAN(w=w, out_ch=cfg.n_class, n_modal=cfg.n_modal)
            self.netF = TNetF(16 * w, cfg.netF_nc)

        def forward(self, x, m, ids=None):
            c = self.core
            mmap = m.view(m.size(0), m.size(1), 1, 1).repeat(
                1, 1, x.size(2), x.size(3))
            th, ts = c.tsl_encoder(torch.cat([x, mmap], 1))
            tsl_bott = c.enc5(th)
            tsl = c.tsl_decoder(tsl_bott, ts)
            sh, ss = c.seg_encoder(x)
            seg = c.seg_decoder(c.enc5(sh), ss)
            if ids is None:
                return seg, tsl
            return seg, tsl, self.netF(tsl_bott, ids)

    t_g = TUGANnce()
    _load_tugan(t_g.core, init_g)
    netf = init_g["netF"]
    t_g.netF.fc1.weight.data = torch.tensor(
        np.asarray(netf["mlp_0_fc1"]["kernel"]).T.copy())
    t_g.netF.fc1.bias.data = torch.tensor(
        np.asarray(netf["mlp_0_fc1"]["bias"]))
    t_g.netF.fc2.weight.data = torch.tensor(
        np.asarray(netf["mlp_0_fc2"]["kernel"]).T.copy())
    t_g.netF.fc2.bias.data = torch.tensor(
        np.asarray(netf["mlp_0_fc2"]["bias"]))
    t_d = TDisc(size=cfg.input_size, n_modal=cfg.n_modal, w=w,
                max_w=256 if w == 16 else 512)
    _load_tdisc(t_d, init_d)
    return t_g, t_d


def _torch_consis_step(t_g, t_d, opt_g, opt_d, cfg, x, y, mdl, mj, alpha,
                       ids, lam_semi, step, it):
    """One reference uganConsis iteration (`uganConsisTrainer.py:66-214`)
    with the in-step randomness supplied: concat batch D step (real+fake +
    cls + WGAN-GP), G step vs the UPDATED D with seg (labeled slice), L1
    rec, PatchNCE(q=recon feats, k=translate feats), and the gated
    consistency Dice+CE(y_rec vs argmax y_fake) over the full batch."""
    import torch
    import torch.nn.functional as F

    from tests.test_training_parity import _torch_dice_ce

    n, bs = x.size(0), cfg.batch_size
    modal_trg = torch.full_like(mdl, mj)
    vec_org = F.one_hot(mdl, cfg.n_modal).to(x.dtype)
    vec_trg = F.one_hot(modal_trg, cfg.n_modal).to(x.dtype)
    vec_ot, vec_to = vec_trg - vec_org, vec_org - vec_trg

    # ---- D step
    src_r, cls_r = t_d(x)
    d_real = -src_r.mean()
    d_cls = F.cross_entropy(cls_r, mdl)
    _, x_fake, _ = t_g(x, vec_ot, ids)
    src_f, _ = t_d(x_fake.detach())
    d_fake = src_f.mean()
    x_hat = (alpha * x.data + (1 - alpha) * x_fake.data).requires_grad_(True)
    src_h, _ = t_d(x_hat)
    dydx = torch.autograd.grad(src_h, x_hat, torch.ones_like(src_h),
                               retain_graph=True, create_graph=True,
                               only_inputs=True)[0]
    d_gp = ((dydx.reshape(n, -1).pow(2).sum(1).sqrt() - 1.0) ** 2).mean()
    d_loss = d_real + d_fake + 1.0 * d_cls + 10.0 * d_gp
    opt_d.zero_grad()
    opt_g.zero_grad()
    d_loss.backward()
    opt_d.step()

    # ---- G step against the UPDATED discriminator
    y_fake, x_fake, feat_x = t_g(x, vec_ot, ids)
    src, cls = t_d(x_fake)
    g_fake = -src.mean()
    g_cls = F.cross_entropy(cls, modal_trg)
    g_seg = _torch_dice_ce(y_fake[:bs], y)
    y_rec, x_rec, feat_f = t_g(x_fake, vec_to, ids)
    g_rec = (x - x_rec).abs().mean()

    # PatchNCE: query = reconstruction-pass pool, key = translate-pass pool,
    # group size stays cfg.batch_size (reference quirk)
    from tests.test_losses import _torch_patch_nce

    g_nce = _torch_patch_nce(feat_f, feat_x.detach(), cfg.batch_size,
                             t=cfg.nce_temperature).mean()

    gate = 1.0 if step >= cfg.consis_gate_step else 0.0
    g_semi = _torch_dice_ce(y_rec, y_fake.argmax(1).detach()) * gate

    g_loss = (g_fake + 10.0 * g_rec + 1.0 * g_cls + 10.0 * g_seg
              + 1.0 * g_nce + lam_semi * g_semi)
    opt_d.zero_grad()
    opt_g.zero_grad()
    g_loss.backward()
    opt_g.step()

    lr_ = cfg.lr * (1.0 - it / cfg.total_iters) ** 0.9
    for opt in (opt_g, opt_d):
        for pg in opt.param_groups:
            pg["lr"] = lr_

    return dict(D_real=d_real.item(), D_fake=d_fake.item(),
                D_cls=d_cls.item(), D_gp=d_gp.item(), G_fake=g_fake.item(),
                G_rec=g_rec.item(), G_cls=g_cls.item(), G_seg=g_seg.item(),
                G_nce=g_nce.item(), G_semi=g_semi.item(),
                loss=g_seg.item())


def _torch_validate_gan(t_g, cfg):
    """validate_epoch semantics on the torch mirror: eval seg head with a
    ZERO modality vector (eval_fn passes m=None -> zeros), deterministic
    test sampler, slice->volume scatter (tools/rehearse_parity.py)."""
    import torch

    from smsut_tpu.data.dataset import SliceDataset, get_label_npys
    from smsut_tpu.data.samplers import InTurnTestBatchSampler

    dt = next(t_g.parameters()).dtype
    ds = SliceDataset(cfg.base_root, "test", 0, True, cfg.split_yaml)
    sampler = InTurnTestBatchSampler(ds.modal_sample_ids, cfg.batch_size)
    _, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)
    prd = {k: np.zeros(v.shape, v.dtype) for k, v in gt_npys.items()}
    with torch.no_grad():
        for idxs in sampler:
            raws = [ds.get_raw(i) for i in idxs]
            img = np.stack([r[0] for r in raws]).astype(np.float32)
            img = (img / 255.0 - 0.5) / 0.5
            b = len(idxs)
            if b < cfg.batch_size:
                img = np.concatenate(
                    [img, np.zeros((cfg.batch_size - b,) + img.shape[1:],
                                   img.dtype)])
            x = torch.tensor(img[:, None, :, :], dtype=dt)
            m = torch.zeros((x.size(0), cfg.n_modal), dtype=dt)
            seg, _ = t_g(x, m)
            pred = seg.argmax(1).numpy().astype(np.uint8)[:b]
            for i in range(b):
                mn, pid, z = raws[i][3].split("_")
                prd[f"{mn}_{pid}"][int(z)] = pred[i]
    return prd, gt_npys


def run_torch(cfg, init_g, init_d, stream, precision="f32"):
    """Replay the recorded stream through the torch re-derivation at the
    given precision; returns per-step metrics, per-epoch train loss / test
    dice, and the best epoch by the reference's >= mean-dice rule."""
    import copy

    import jax
    import torch

    from smsut_tpu.ops.metrics import get_mo_matrix
    from smsut_tpu.utils.meter import Meter

    t_g, t_d = _build_torch_gan(init_g, init_d, cfg)
    if precision == "f64":
        t_g, t_d = t_g.double(), t_d.double()
    dt = next(t_g.parameters()).dtype
    opt_g = torch.optim.SGD(t_g.parameters(), lr=cfg.lr, momentum=0.9,
                            weight_decay=cfg.weight_decay)
    opt_d = torch.optim.Adam(t_d.parameters(), lr=cfg.lr, betas=(0.9, 0.999),
                             weight_decay=cfg.weight_decay)

    from smsut_tpu.models.ugan import sample_patch_ids

    bottleneck_hw = (cfg.input_size // 16) ** 2
    step_metrics = []
    out = {"train/loss": {}, "test/dice": {}}
    best_state, best_dice, best_epoch = None, -1.0, -1
    min_keys = [f"loss_{i}" for i in range(cfg.n_modal)] + ["loss"]
    it = 0
    for epoch in range(cfg.max_epoch):
        meter = Meter(min_keys, [], alpha=cfg.exp_alpha)
        meter.reset_cur()
        for _ in range(cfg.num_iter_per_epoch):
            batch, key, sc = stream[it]
            x = np.concatenate([batch["img"], batch["ul_img"]])
            mdl = np.concatenate([batch["mdl"], batch["ul_mdl"]])
            n = x.shape[0]
            # replay the step's in-graph randomness host-side — the same
            # key splits as gan.py _train_step_impl
            r_mj, r_alpha, r_patch = jax.random.split(
                jax.numpy.asarray(key, dtype=jax.numpy.uint32), 3)
            mj = int(jax.random.randint(r_mj, (), 0, cfg.n_modal))
            alpha = torch.tensor(
                np.asarray(jax.random.normal(r_alpha, (n, 1, 1, 1)),
                           np.float64), dtype=dt)
            ids = torch.tensor(np.asarray(
                sample_patch_ids(r_patch, bottleneck_hw, cfg.nce_patches)),
                dtype=torch.long)
            m = _torch_consis_step(
                t_g, t_d, opt_g, opt_d, cfg,
                torch.tensor(x.transpose(0, 3, 1, 2), dtype=dt),
                torch.tensor(batch["msk"].astype(np.int64)),
                torch.tensor(mdl, dtype=torch.long),
                mj, alpha, ids, sc["lambda_semi"], step=it, it=it)
            step_metrics.append(m)
            v, cnt = Meter.collect_loss_by(m["loss"], int(batch["mdl"][0]),
                                           batch["img"].shape[0])
            meter.accumulate(v, cnt)
            it += 1
        meter.update_cur()
        out["train/loss"][epoch] = float(meter.cur_values["loss"])

        prd, gt = _torch_validate_gan(t_g, cfg)
        mo = get_mo_matrix(prd, gt, cfg)
        dice = float(mo[-1, -1])
        out["test/dice"][epoch] = dice
        if dice >= best_dice:
            best_dice, best_epoch = dice, epoch
            best_state = copy.deepcopy(t_g.state_dict())
    t_g.load_state_dict(best_state)
    prd, gt = _torch_validate_gan(t_g, cfg)
    mo = get_mo_matrix(prd, gt, cfg)
    return step_metrics, out, best_epoch, mo


# ------------------------------------------------------------------- compare

GAN_METRICS = ("D_real", "D_fake", "D_cls", "D_gp", "G_fake", "G_rec",
               "G_cls", "G_seg", "G_nce", "G_semi")


def rehearse_gan(workdir: str, epochs: int = 3, iters: int = 4,
                 size: int = 64, width: int = 8, batch: int = 2,
                 gate_step: int = 6) -> dict:
    from smsut_tpu.data.synthetic import make_synthetic_dataset
    from smsut_tpu.ops.schedules import sigmoid_rampup

    data_root = pjoin(workdir, "data")
    if not os.path.isdir(data_root):
        make_synthetic_dataset(data_root, n_patients_per_modality=3,
                               n_slice=4, size=size)
    cfg = _gan_cfg(data_root, pjoin(workdir, "out"), epochs, iters,
                   size, width, batch, gate_step)
    init_g, init_d, stream, jax_steps, jx, csv_path = run_jax(cfg)
    n_steps = epochs * iters
    assert len(stream) == len(jax_steps) == n_steps

    t32_steps, t32, t32_best, _ = run_torch(cfg, init_g, init_d, stream,
                                            "f32")
    t64_steps, t64, t64_best, t64_mo = run_torch(cfg, init_g, init_d, stream,
                                                 "f64")

    # per-epoch-mean per-metric trajectories + calibrated envelopes
    def epoch_means(steps):
        return {k: [float(np.mean([m[k] for m in steps[e * iters:(e + 1) * iters]]))
                    for e in range(epochs)] for k in GAN_METRICS}

    em_j, em_32, em_64 = (epoch_means(s) for s in (jax_steps, t32_steps,
                                                   t64_steps))
    envelopes = {}
    for k in GAN_METRICS:
        rows = []
        for e in range(epochs):
            exact = em_64[k][e]
            scale = max(abs(exact), 1.0)
            self_div = abs(em_32[k][e] - exact) / scale
            jax_div = abs(em_j[k][e] - exact) / scale
            rows.append({"exact": exact, "torch_f32_self_drift": self_div,
                         "jax_drift": jax_div})
        envelopes[k] = rows

    # exact structural checks
    gate_ok_jax = all(
        (m["G_semi"] == 0.0) == (s < gate_step)
        or (s >= gate_step and m["G_semi"] >= 0.0)
        for s, m in enumerate(jax_steps))
    pre_gate_zero_jax = all(jax_steps[s]["G_semi"] == 0.0
                            for s in range(min(gate_step, n_steps)))
    pre_gate_zero_torch = all(t64_steps[s]["G_semi"] == 0.0
                              for s in range(min(gate_step, n_steps)))
    post_gate_nonzero_jax = any(jax_steps[s]["G_semi"] != 0.0
                                for s in range(gate_step, n_steps))
    post_gate_nonzero_torch = any(t64_steps[s]["G_semi"] != 0.0
                                  for s in range(gate_step, n_steps))
    lam_ok = all(
        abs(stream[e * iters][2]["lambda_semi"]
            - 10.0 * float(sigmoid_rampup(e, cfg.max_epoch))) < 1e-6
        for e in range(epochs))

    def best_from(d):
        best, be = -1.0, -1
        for e in sorted(d):
            if d[e] >= best:
                best, be = d[e], e
        return be

    report = {
        "epochs": epochs, "iters_per_epoch": iters, "gate_step": gate_step,
        "envelopes": envelopes,
        "max_epoch_mean_jax_drift": max(
            r["jax_drift"] for k in GAN_METRICS for r in envelopes[k]),
        "max_torch_f32_self_drift": max(
            r["torch_f32_self_drift"] for k in GAN_METRICS
            for r in envelopes[k]),
        "gate_pre_zero": {"jax": pre_gate_zero_jax,
                          "torch": pre_gate_zero_torch},
        "gate_post_nonzero": {"jax": post_gate_nonzero_jax,
                              "torch": post_gate_nonzero_torch},
        "gate_semantics_ok": bool(gate_ok_jax),
        "lambda_semi_rampup_exact": bool(lam_ok),
        "jax_dice_trajectory": [jx["test/dice"][e] for e in range(epochs)],
        "torch_f32_dice_trajectory": [t32["test/dice"][e]
                                      for e in range(epochs)],
        "torch_f64_dice_trajectory": [t64["test/dice"][e]
                                      for e in range(epochs)],
        "jax_train_loss": [jx["train/loss"][e] for e in range(epochs)],
        "torch_f64_train_loss": [t64["train/loss"][e]
                                 for e in range(epochs)],
        "best_epoch_jax": best_from(jx["test/dice"]),
        "best_epoch_torch_f32": t32_best,
        "best_epoch_torch_f64": t64_best,
        "best_dice_jax": max(jx["test/dice"].values()),
        "best_dice_torch_f64": max(t64["test/dice"].values()),
    }
    report["best_dice_dev_vs_f64"] = abs(report["best_dice_jax"]
                                         - report["best_dice_torch_f64"])
    with open(pjoin(workdir, "rehearsal_gan_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    import tempfile

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="smsut-rehearse-gan-")
    rep = rehearse_gan(workdir)
    print(json.dumps(rep, indent=2))
