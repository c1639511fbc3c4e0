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
from smsut_tpu.ops.losses import (
    cross_entropy_loss,
    dice_and_ce_loss,
    soft_dice_loss,
)
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
        h0, h1, h2 = split_heads(out, cfg.n_label)
        cedc = dice_and_ce_loss(h0, msk, cfg.weight_dc, cfg.weight_ce,
                                batch_dice=True)
        con = cross_entropy_loss(h1, msk, class_weights=self.w_con)
        rad = cross_entropy_loss(h2, msk, class_weights=self.w_rad)
        return cedc, con, rad

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
    def _cora_step_impl(self, state, batch, scalars):
        cfg = self.cfg
        gate = (state.step >= 1000).astype(jnp.float32)
        lam = scalars["lambda_semi"]
        mask = batch["pse_mask"].astype(jnp.float32)          # [B,H,W] certain
        msum = jnp.sum(mask) + 1e-16
        umask = (1.0 - mask)[..., None]                        # [B,H,W,1]
        usum = jnp.sum(umask) + 1e-16

        ema_out = self.net.apply({"params": state.ema_params}, batch["pse_img"])
        ema_heads = split_heads(jax.lax.stop_gradient(ema_out), cfg.n_label)

        def loss_fn(params):
            cedc, con, rad = self._supervised_3head(params, batch["img"],
                                                    batch["msk"])
            supervised = (cedc + con + rad) / 4.0

            out_p = self.net.apply({"params": params}, batch["pse_img"])
            p0, p1, p2 = split_heads(out_p, cfg.n_label)
            dice2 = soft_dice_loss(p0, batch["pse_lab"], batch_dice=False)
            ce2_px = cross_entropy_loss(p0, batch["pse_lab"], reduce=False)
            ce2 = jnp.sum(ce2_px * mask) / msum
            certain = (ce2 + dice2) / 2.0

            uncert = 0.0
            for ph, eh in zip((p0, p1, p2), ema_heads):
                dist = jnp.square(jax.nn.softmax(ph, -1) - jax.nn.softmax(eh, -1))
                uncert = uncert + lam * jnp.sum(dist * umask) / usum
            uncert = uncert / 3.0

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
        ~7ms/slice on this 1-CPU box)."""
        from smsut_tpu.data.dataset import get_loader

        cfg = self.cfg
        if cfg.device_augment:
            from smsut_tpu.data.device_augment import DeviceAugment

            da = DeviceAugment(cfg, trainer._data_rng)
            loader = get_loader(cfg.base_root, "val", trainer.fold, 1,
                                cfg.data_aug, cfg=cfg, rng=trainer._data_rng,
                                raw=True)
            for batch in loader:
                img, msk = da(batch.img, batch.msk)
                yield (np.asarray(img[0]), np.asarray(msk[0]),
                       int(batch.mdl[0]))
        else:
            loader = get_loader(cfg.base_root, "val", trainer.fold, 1,
                                cfg.data_aug, cfg=cfg, rng=trainer._data_rng)
            for batch in loader:
                yield batch.img[0], batch.msk[0], int(batch.mdl[0])

    _pseudo: Optional[Dict[str, np.ndarray]] = None
    _pseudo_order: List[int] = None
    _pseudo_rng = pyrandom.Random(2020)

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
        return {"pse_img": self._pseudo["img"][idx],
                "pse_lab": self._pseudo["plab"][idx],
                "pse_mask": self._pseudo["mask"][idx]}
