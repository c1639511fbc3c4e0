# -*- coding: utf-8 -*-
"""CoraNet: conservative-radical 3-head semi-supervision
(`/root/reference/trainer/coraNetTrainer.py`).

Model: a U-Net with ``n_label*3 + 1`` output channels — one shared background
logit + three 4-channel head groups (normal / conservative / radical,
`coraNetTrainer.py:151-152,289-295`).  Per-class CE weights follow the
chaos-variant comments in the reference config (`config.py:83-90`): the
committed 2-element SAML tensors cannot run against 5-class labels, so the
intended [1,5,5,5,5] / [5,1,1,1,1] vectors are used.

Two stages:
  * ``prefit`` (stage A, `coraNetTrainer.py:426-602`): supervised
    (cedc + con + rad)/4 on the labeled half for pre_epoch epochs, EMA
    tracked, constant LR (the reference's pre_epoch never applies poly
    decay), saves ``pre_best``/``pre_ema_best``.
  * ``fit`` (stage B, `:604-690`): loads stage A by `-i model_id`; every
    ``pred_step`` epochs regenerates pseudo-labels over the augmented
    unlabeled stream (head-0 argmax; certainty mask = heads 1&2 agree,
    `:176-226`); per-iteration loss = supervised + certain(masked CE +
    dice on pseudo-labels)/2 + 0.1 * uncertain(masked MSE-softmax vs EMA
    teacher x rampup), certain/uncertain zeroed for the first 1000 iters
    (`:298-347`); poly LR over cora_epoch.

TPU-first deviations (mathematically identical, documented):
  * the prefit forward skips the concatenated unlabeled half — with
    per-sample instance norm it contributes nothing to the loss
    (`:451-473` forwards it anyway);
  * pseudo-label regeneration runs in batch_size chunks rather than a bs=1
    sweep (identical outputs, fixed XLA shapes);
  * the reference's dead computations (unused masked con/rad losses at
    `:316-317`, the unused noise at `:284-285`) are not reproduced.
"""
from __future__ import annotations

import random as pyrandom
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smsut_tpu.config import Config
from smsut_tpu.train.steps import setup_compute
from smsut_tpu.models import UNet
from smsut_tpu.ops.schedules import sigmoid_rampup
from smsut_tpu.train.state import TrainState, make_sgd
from smsut_tpu.ops.schedules import poly_lr_schedule
import optax


def coranet_weights(n_label: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intended chaos-style weights: conservative over-penalizes foreground,
    radical over-penalizes background (`config.py:85-90` comments)."""
    w_con = jnp.asarray([1.0] + [5.0] * n_label, jnp.float32)
    w_rad = jnp.asarray([5.0] + [1.0] * n_label, jnp.float32)
    return w_con, w_rad


def split_heads(out: jax.Array, n_label: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """bg + 3 head groups -> three (1+n_label)-channel logit stacks
    (`coraNetTrainer.py:289-295`), NHWC."""
    back = out[..., :1]
    h0 = jnp.concatenate([back, out[..., 1: n_label + 1]], axis=-1)
    h1 = jnp.concatenate([back, out[..., n_label + 1: 2 * n_label + 1]], axis=-1)
    h2 = jnp.concatenate([back, out[..., 2 * n_label + 1: 3 * n_label + 1]], axis=-1)
    return h0, h1, h2


# --------------------------------------------------------------------------
# Channel-first fused 3-head loss tail.
#
# Why: the straightforward tail (split_heads + one generic loss per head)
# materializes many [B,256,256,{13,5,4}] NHWC tensors.  On TPU the minor
# (lane) dimension is padded to 128, so each of those costs a ~10x-padded
# HBM pass; profiling stage A showed the tail at ~20 of 30 ms.  The fused
# tail transposes ONCE to channel-first [B,13,H*W] (lane = pixels, fully
# dense) and expresses every per-head quantity as a tiny [13,k] contraction:
#   Z_k   = G^T e            (per-head softmax normalizers, shared exp basis)
#   ll_k  = G^T (t * multihot)  (per-head label logits; multihot = U^T onehot)
#   CE_k  = mean/weighted-mean of (logZ_k - ll_k)
#   dice0 = tp/fp/fn sums of e[:5]/Z_0 against the one-hot — marginal-sum
#           form as ops/losses.get_tp_fp_fn.
# Identical math to split_heads + soft_dice/cross_entropy (the shared
# max-stabilizer subtracts the max over all 13 channels instead of each
# head's 5 — exact in real arithmetic, float-tolerance in f32); equality is
# asserted by tests/test_coranet.py::test_fused_tail_matches_reference.
# --------------------------------------------------------------------------
def _head_matrices(n_label: int) -> Tuple[np.ndarray, np.ndarray]:
    """G [13,3]: channel -> head membership (bg in every head).
    U [5,13]: label class -> the three channels holding its logit."""
    c13 = 3 * n_label + 1
    g = np.zeros((c13, 3), np.float32)
    u = np.zeros((n_label + 1, c13), np.float32)
    g[0, :] = 1.0
    u[0, 0] = 1.0
    for k in range(3):
        for c in range(1, n_label + 1):
            g[k * n_label + c, k] = 1.0
            u[c, k * n_label + c] = 1.0
    return g, u


def _head_stats(out: jax.Array, n_label: int):
    """[B,H,W,13] -> channel-first stats (t, e, Z, m) with one transpose."""
    b = out.shape[0]
    c13 = 3 * n_label + 1
    g, _ = _head_matrices(n_label)
    t = out.astype(jnp.float32).reshape(b, -1, c13).transpose(0, 2, 1)
    m = jnp.max(t, axis=1)                                  # [B,P]
    e = jnp.exp(t - m[:, None, :])                          # [B,13,P]
    z = jnp.einsum("jk,bjp->bkp", jnp.asarray(g), e)        # [B,3,P]
    return t, e, z, m


def _onehot_cf(msk: jax.Array, n_label: int) -> jax.Array:
    """[B,H,W] int -> channel-first one-hot [B,5,P]."""
    b = msk.shape[0]
    lab = msk.reshape(b, -1)
    return (lab[:, None, :] ==
            jnp.arange(n_label + 1, dtype=lab.dtype)[None, :, None]
            ).astype(jnp.float32)


def _dice_from_stats(e, z, y, batch_dice: bool, n_label: int,
                     smooth: float = 1e-5) -> jax.Array:
    """soft_dice_loss of head 0 from the shared stats (same formula as
    ops/losses.soft_dice_loss; head-0 channels are out[..., :5])."""
    p0 = e[:, : n_label + 1, :] / z[:, 0:1, :]              # [B,5,P]
    if batch_dice:
        tp = jnp.einsum("bcp,bcp->c", p0, y)
        sp = jnp.sum(p0, axis=(0, 2))
        sg = jnp.sum(y, axis=(0, 2))
    else:
        tp = jnp.einsum("bcp,bcp->bc", p0, y)
        sp = jnp.sum(p0, axis=2)
        sg = jnp.sum(y, axis=2)
    fp, fn = sp - tp, sg - tp
    dc = (2.0 * tp + smooth) / (2.0 * tp + fp + fn + smooth + 1e-8)
    dc = dc[1:] if batch_dice else dc[:, 1:]
    return 1.0 - jnp.mean(dc)


def _per_head_nll(t, e, z, m, y, n_label: int) -> jax.Array:
    """[B,3,P] per-pixel NLL of each head (== -log_softmax at the label)."""
    g, u = _head_matrices(n_label)
    logz = jnp.log(z) + m[:, None, :]
    yt = jnp.einsum("cj,bcp->bjp", jnp.asarray(u), y)       # [B,13,P] multihot
    ll = jnp.einsum("jk,bjp->bkp", jnp.asarray(g), t * yt)  # [B,3,P]
    return logz - ll


def three_head_losses(out: jax.Array, msk: jax.Array, w_con: jax.Array,
                      w_rad: jax.Array, n_label: int, weight_dc: float,
                      weight_ce: float) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(cedc, con, rad) of the stage-A supervised loss
    (`coraNetTrainer.py:287-301`) — fused channel-first evaluation."""
    t, e, z, m = _head_stats(out, n_label)
    y = _onehot_cf(msk, n_label)
    nll = _per_head_nll(t, e, z, m, y, n_label)
    ce0 = jnp.mean(nll[:, 0, :])
    dice0 = _dice_from_stats(e, z, y, batch_dice=True, n_label=n_label)
    cedc = weight_dc * dice0 + weight_ce * ce0

    def wce(k, wvec):
        w = jnp.einsum("c,bcp->bp", jnp.asarray(wvec, jnp.float32), y)
        return jnp.sum(nll[:, k, :] * w) / jnp.maximum(jnp.sum(w), 1e-8)

    return cedc, wce(1, w_con), wce(2, w_rad)


class CoraNet:
    name = "coraNet"
    uses_unlabeled = True
    lambda_semi = 1.0
    ema_decay = 0.99
    epoch_rampup = 30
    log_step = 50

    def __init__(self, cfg: Config, stage: str = "pre"):
        self.cfg = cfg
        self.stage = stage
        # pseudo-label cache (stage B) — per-instance so two CoraNet algos in
        # one process don't share a shuffle RNG stream (VERDICT r2 #9)
        self._pseudo: Optional[Dict[str, np.ndarray]] = None
        self._pseudo_order: List[int] = []
        self._pseudo_rng = pyrandom.Random(2020)
        dtype = setup_compute(cfg)
        self.net = UNet(out_ch=cfg.n_label * 3 + 1, width=cfg.base_width,
                        norm_type="instance", act_type="lrelu", dtype=dtype,
                        pack_levels=cfg.pack_levels)
        self.w_con, self.w_rad = coranet_weights(cfg.n_label)
        # stage B uses poly decay over cora_epoch; stage A constant LR
        self._pre_step = jax.jit(self._pre_step_impl, donate_argnums=(0,))
        self._cora_step = jax.jit(self._cora_step_impl, donate_argnums=(0,))
        self._infer = jax.jit(self._infer_impl)

    @property
    def max_epoch(self) -> int:
        return self.cfg.pre_epoch if self.stage == "pre" else self.cfg.cora_epoch

    def lr_at(self, step: int) -> float:
        """Logged LR matching make_tx's actual schedule (the generic poly
        over cfg.total_iters neither stage uses — and it crashes/NaNs past
        max_epoch*num_iter_per_epoch, which pre_epoch > max_epoch exceeds)."""
        cfg = self.cfg
        if self.stage == "pre":
            return cfg.lr
        from smsut_tpu.ops.schedules import poly_lr_host

        return poly_lr_host(cfg.lr, step,
                            cfg.cora_epoch * cfg.num_iter_per_epoch)

    def make_tx(self):
        cfg = self.cfg
        if self.stage == "pre":
            # reference pre_epoch never updates LR -> constant cfg.lr SGD
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.trace(decay=0.9),
                optax.scale(-cfg.lr),
            )
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.trace(decay=0.9),
            optax.scale_by_learning_rate(
                poly_lr_schedule(cfg.lr, cfg.cora_epoch * cfg.num_iter_per_epoch)),
        )

    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.cfg
        x = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.img_channels))
        params = self.net.init(rng, x)["params"]
        ema = jax.tree_util.tree_map(jnp.copy, params)
        return TrainState.create(params, self.make_tx(), ema_params=ema)

    # ------------------------------------------------------------- stage A
    def _supervised_3head(self, params, img, msk):
        cfg = self.cfg
        out = self.net.apply({"params": params}, img)
        return three_head_losses(out, msk, self.w_con, self.w_rad,
                                 cfg.n_label, cfg.weight_dc, cfg.weight_ce)

    def _ema_update(self, state: TrainState) -> TrainState:
        it = (state.step - 1).astype(jnp.float32)
        alpha = jnp.where(it < 100, 0.0,
                          jnp.minimum(1.0 - 1.0 / (it + 1.0), self.ema_decay))
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * alpha + p * (1.0 - alpha),
            state.ema_params, state.params)
        return state.replace(ema_params=new_ema)

    def _pre_step_impl(self, state, batch, scalars):
        def loss_fn(params):
            cedc, con, rad = self._supervised_3head(params, batch["img"],
                                                    batch["msk"])
            total = (cedc + con + rad) / 4.0
            return total, (cedc, con, rad)

        (total, (cedc, con, rad)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = self._ema_update(state)
        return state, {"loss": total, "cedc_loss": cedc, "loss_con": con,
                       "loss_rad": rad}

    # ------------------------------------------------------------- stage B
    def _head_probs(self, e, z):
        """All three heads' softmax probs from the shared stats: non-bg rows
        [B,12,P] (each channel normalized by its own head's Z) and the bg
        row per head [B,3,P]."""
        g, _ = _head_matrices(self.cfg.n_label)
        zrep = jnp.einsum("jk,bkp->bjp", jnp.asarray(g[1:]), z)
        return e[:, 1:, :] / zrep, e[:, 0:1, :] / z

    def _cora_step_impl(self, state, batch, scalars):
        cfg = self.cfg
        gate = (state.step >= 1000).astype(jnp.float32)
        lam = scalars["lambda_semi"]
        b = batch["pse_mask"].shape[0]
        mask = batch["pse_mask"].astype(jnp.float32).reshape(b, -1)  # [B,P]
        msum = jnp.sum(mask) + 1e-16
        umask = 1.0 - mask                                           # [B,P]
        usum = jnp.sum(umask) + 1e-16

        ema_out = self.net.apply({"params": state.ema_params}, batch["pse_img"])
        _, e_t, z_t, _ = _head_stats(jax.lax.stop_gradient(ema_out), cfg.n_label)
        tnon, tbg = self._head_probs(e_t, z_t)               # teacher probs

        def loss_fn(params):
            # Kept as TWO bs-sized student applies on purpose: batching
            # labeled+pseudo into one 2bs apply is mathematically identical
            # (per-sample instance norm; tests/test_coranet.py
            # ::test_stage_b_batched_apply_matches_separate) but MEASURED
            # SLOWER — 24.9 vs 20.2 ms/step same-day — the 16-image apply
            # spills the VMEM working set that two 8-image applies each fit
            # (BASELINE.md round-3 batch-scaling root cause).
            cedc, con, rad = self._supervised_3head(params, batch["img"],
                                                    batch["msk"])
            supervised = (cedc + con + rad) / 4.0

            out_p = self.net.apply({"params": params}, batch["pse_img"])
            t, e, z, m = _head_stats(out_p, cfg.n_label)
            y2 = _onehot_cf(batch["pse_lab"], cfg.n_label)
            nll = _per_head_nll(t, e, z, m, y2, cfg.n_label)
            dice2 = _dice_from_stats(e, z, y2, batch_dice=False,
                                     n_label=cfg.n_label)
            ce2 = jnp.sum(nll[:, 0, :] * mask) / msum
            certain = (ce2 + dice2) / 2.0

            # masked MSE-softmax vs the EMA teacher, summed over the three
            # heads' 5-channel softmaxes then /3 (`coraNetTrainer.py:321-341`)
            snon, sbg = self._head_probs(e, z)
            dist = (jnp.einsum("bjp,bp->", jnp.square(snon - tnon), umask)
                    + jnp.einsum("bjp,bp->", jnp.square(sbg - tbg), umask))
            uncert = lam * dist / usum / 3.0

            total = supervised + gate * certain + gate * uncert * 0.1
            return total, (supervised, certain, uncert)

        (total, (sup, cert, unc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = self._ema_update(state)
        return state, {"loss": total, "supervised_loss": sup,
                       "certain_loss": gate * cert, "uncertain_loss": gate * unc}

    # ------------------------------------------------------ pseudo labels
    def _infer_impl(self, params, img):
        out = self.net.apply({"params": params}, img)
        h0, h1, h2 = split_heads(out, self.cfg.n_label)
        plab = jnp.argmax(h0, axis=-1).astype(jnp.int32)
        agree = (jnp.argmax(h1, axis=-1) == jnp.argmax(h2, axis=-1))
        return plab, agree.astype(jnp.int32)

    def pred_unlabel(self, state, sample_stream) -> Tuple[Dict[str, np.ndarray], float]:
        """Sweep the augmented unlabeled stream, batched to fixed shapes.
        Returns the in-memory pseudo dataset arrays + mean pseudo-label dice
        (`coraNetTrainer.py:176-226`)."""
        from smsut_tpu.ops.metrics import dice_coefficient

        cfg = self.cfg
        imgs, plabs, masks, labs, mdls = [], [], [], [], []
        buf_img, buf_lab, buf_mdl = [], [], []

        def flush():
            if not buf_img:
                return
            n = len(buf_img)
            pad = cfg.batch_size - n
            arr = np.stack(buf_img + [buf_img[-1]] * pad)
            plab, agree = self._infer(state.params, jnp.asarray(arr))
            plab = np.asarray(plab)[:n]
            agree = np.asarray(agree)[:n]
            imgs.extend(arr[:n])
            plabs.extend(plab)
            masks.extend(agree)
            labs.extend(buf_lab)
            mdls.extend(buf_mdl)
            buf_img.clear(); buf_lab.clear(); buf_mdl.clear()

        for img, lab, mdl in sample_stream:
            buf_img.append(img)
            buf_lab.append(lab)
            buf_mdl.append(mdl)
            if len(buf_img) == cfg.batch_size:
                flush()
        flush()

        plab_dice = float(np.mean([dice_coefficient(p > 0, l > 0) if (p > 0).any()
                                   or (l > 0).any() else 0.0
                                   for p, l in zip(plabs, labs)])) if plabs else 0.0
        data = {
            "img": np.stack(imgs).astype(np.float32),
            "plab": np.stack(plabs).astype(np.int32),
            "mask": np.stack(masks).astype(np.int32),
            "lab": np.stack(labs).astype(np.int32),
            "mdl": np.asarray(mdls, np.int32),
        }
        return data, plab_dice

    # -------------------------------------------------------------- public
    def train_step(self, state, batch, scalars):
        if self.stage == "pre":
            return self._pre_step(state, batch, scalars)
        return self._cora_step(state, batch, scalars)

    def _train_step_impl(self, state, batch, scalars):
        """Unjitted step body (used by the Trainer's fused augment+step)."""
        if self.stage == "pre":
            return self._pre_step_impl(state, batch, scalars)
        return self._cora_step_impl(state, batch, scalars)

    def eval_fn(self, params, img):
        out = self.net.apply({"params": params}, img)
        h0, _, _ = split_heads(out, self.cfg.n_label)
        return h0

    def eval_params(self, state):
        return state.params

    def epoch_scalars(self, epoch: int) -> Dict[str, jax.Array]:
        lam = self.lambda_semi * sigmoid_rampup(epoch, self.epoch_rampup)
        return {"lambda_semi": np.float32(lam)}

    # ------------------------------------------------- stage-B host plumbing
    @property
    def best_prefix(self) -> str:
        return "pre_best" if self.stage == "pre" else "best"

    @property
    def last_prefix(self) -> str:
        return "pre_last" if self.stage == "pre" else "last"

    def load_pretrained(self, trainer, model_idx: str) -> None:
        """Stage B bootstrap: restore params+EMA from stage A's ``pre_best``
        (`coraNetTrainer.py:633-635`) without touching the fresh optimizer."""
        import os

        from smsut_tpu.train import checkpoints

        ckpt_root = os.path.join(trainer.exp.expr_root, model_idx, "ckpt")
        raw = checkpoints.load_raw(ckpt_root, "pre_best")
        to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        trainer.state = trainer.state.replace(
            params=to_jnp(raw["params"]), ema_params=to_jnp(raw["ema_params"]))
        trainer.info(f"Load pre_best params+EMA from {ckpt_root}.")

    def on_epoch_start(self, trainer, epoch: int) -> None:
        if self.stage != "cora":
            return
        if epoch % self.cfg.pred_step == 0 or self._pseudo is None:
            stream = self._unlabeled_stream(trainer)
            self._pseudo, plab_dice = self.pred_unlabel(trainer.state, stream)
            self._pseudo_order = []
            trainer.info(f"Pseudo label dice : {plab_dice}")
            trainer.exp.scalar("acc/plab_dice", plab_dice, epoch)

    def _unlabeled_stream(self, trainer):
        """Augmented unlabeled sample stream, one full inTurn bs=1 pass
        (`coraNetTrainer.py:609` uses batch_size=1 with data_aug).  With
        device_augment the warp runs on-device (the host chain costs
        ~7ms/slice on this 1-CPU box).

        Multi-host: the stream is GLOBAL (num_shards=1) — every host walks
        the identical bs=1 pass so ``self._pseudo`` is the same array on
        every process, which is the premise of ``make_extra_batch``'s
        per-host slicing of the shared shuffled index list."""
        from smsut_tpu.data.dataset import get_loader

        cfg = self.cfg
        if cfg.device_augment:
            from smsut_tpu.data.device_augment import DeviceAugment

            da = DeviceAugment(cfg, trainer._data_rng)
            loader = get_loader(cfg.base_root, "val", trainer.fold, 1,
                                cfg.data_aug, cfg=cfg, rng=trainer._data_rng,
                                raw=True, num_shards=1, shard_id=0)
            for batch in loader:
                img, msk = da(batch.img, batch.msk)
                yield (np.asarray(img[0]), np.asarray(msk[0]),
                       int(batch.mdl[0]))
        else:
            loader = get_loader(cfg.base_root, "val", trainer.fold, 1,
                                cfg.data_aug, cfg=cfg, rng=trainer._data_rng,
                                num_shards=1, shard_id=0)
            for batch in loader:
                yield batch.img[0], batch.msk[0], int(batch.mdl[0])

    def make_extra_batch(self) -> Dict[str, np.ndarray]:
        """Next shuffled pseudo mini-batch (the reference's in-memory
        DataLoader with shuffle + drop_last, `coraNetTrainer.py:224-225`)."""
        if self.stage != "cora":
            return {}
        bs = self.cfg.batch_size
        n = self._pseudo["img"].shape[0]
        if not self._pseudo_order or len(self._pseudo_order) < bs:
            self._pseudo_order = list(range(n))
            self._pseudo_rng.shuffle(self._pseudo_order)
        idx = [self._pseudo_order.pop() for _ in range(bs)]
        if jax.process_count() > 1:
            # every host draws the same global index list (same seeded RNG);
            # keep only this host's contiguous slice so shard_batch's global
            # assembly yields the intended bs unique rows, not P copies
            nproc = jax.process_count()
            assert bs % nproc == 0, (bs, nproc)
            per = bs // nproc
            lo = jax.process_index() * per
            idx = idx[lo: lo + per]
        return {"pse_img": self._pseudo["img"][idx],
                "pse_lab": self._pseudo["plab"][idx],
                "pse_mask": self._pseudo["mask"][idx]}
