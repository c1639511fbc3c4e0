# -*- coding: utf-8 -*-
"""Mean-Teacher semi-supervised algorithm
(`/root/reference/trainer/meanTeacherTrainer.py`).

Semantics preserved inside one jitted step:
  * teacher = EMA tree in the train state, never receives gradients;
  * EMA decay alpha = 0 for the first 100 iters, then min(1-1/(t+1), 0.99)
    (`meanTeacherTrainer.py:63-69`) — computed from the step counter in-graph;
  * teacher input = unlabeled + clamp(0.01*randn, ±0.02) noise (`:106-107`);
  * consistency = MSE of softmaxes, zeroed for the first 100 iters (`:124-130`);
  * lambda_semi = 1.0 with a 30-epoch sigmoid rampup (`:41-43,77`) passed as a
    per-epoch host scalar.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.train.steps import setup_compute
from smsut_tpu.models import UNet
from smsut_tpu.ops.losses import (
    dice_and_ce_loss,
    dice_and_ce_loss_packed,
    softmax_mse_consistency,
    softmax_mse_consistency_packed,
)
from smsut_tpu.ops.schedules import sigmoid_rampup
from smsut_tpu.train.state import TrainState, make_sgd


class MeanTeacher:
    name = "meanTeacher"
    uses_unlabeled = True
    lambda_semi = 1.0
    ema_decay = 0.99
    epoch_rampup = 30
    log_step = 50

    def __init__(self, cfg: Config):
        self.cfg = cfg
        dtype = setup_compute(cfg)
        self.net = UNet(out_ch=cfg.n_class, width=cfg.base_width,
                        norm_type="instance", act_type="lrelu", dtype=dtype,
                        pack_levels=cfg.pack_levels)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.cfg
        x = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.img_channels))
        params = self.net.init(rng, x)["params"]
        ema = jax.tree_util.tree_map(jnp.copy, params)
        return TrainState.create(params, make_sgd(cfg), ema_params=ema)

    def _train_step_impl(self, state: TrainState, batch: Dict[str, jax.Array],
                         scalars: Dict[str, jax.Array]
                         ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        cfg = self.cfg
        bs = cfg.batch_size
        img = jnp.concatenate([batch["img"], batch["ul_img"]], axis=0)
        noise = jnp.clip(0.01 * jax.random.normal(scalars["rng"],
                                                  batch["ul_img"].shape),
                         -0.02, 0.02)
        ema_inputs = batch["ul_img"] + noise
        gate = (state.step >= 100).astype(jnp.float32)  # iteration gate

        # packed logits end-to-end for the train losses (per-pixel losses
        # are repacking-invariant; ops/losses.py packed variants)
        # auto default ON here: measured 18.0 (packed) vs 24.3 ms
        # (BASELINE.md round-5 tails grid)
        po = getattr(cfg, "packed_loss_tails", None)
        po = bool(po) if po is not None else True
        ema_logits = self.net.apply({"params": state.ema_params}, ema_inputs,
                                    packed_out=po)
        ema_logits = jax.lax.stop_gradient(ema_logits)
        packed = ema_logits.shape[-1] != cfg.n_class

        def loss_fn(params):
            logits = self.net.apply({"params": params}, img, packed_out=po)
            if packed:
                sup = dice_and_ce_loss_packed(logits[:bs], batch["msk"],
                                              cfg.weight_dc, cfg.weight_ce)
                semi = softmax_mse_consistency_packed(logits[bs:],
                                                      ema_logits) * gate
            else:
                sup = dice_and_ce_loss(logits[:bs], batch["msk"],
                                       cfg.weight_dc, cfg.weight_ce,
                                       batch_dice=True)
                semi = softmax_mse_consistency(logits[bs:],
                                               ema_logits) * gate
            total = sup + scalars["lambda_semi"] * semi
            return total, (sup, semi)

        (_, (sup, semi)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)

        # EMA update AFTER the optimizer step, like `update_ema_variable`
        # being called post-step; alpha uses the post-increment iter counter
        # semantics of the reference (self.iter is pre-increment there, and
        # state.step here has already been incremented by apply_gradients —
        # so use step-1).
        it = (state.step - 1).astype(jnp.float32)
        alpha = jnp.where(it < 100, 0.0,
                          jnp.minimum(1.0 - 1.0 / (it + 1.0), self.ema_decay))
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * alpha + p * (1.0 - alpha),
            state.ema_params, state.params)
        state = state.replace(ema_params=new_ema)
        return state, {"loss": sup, "semi_loss": semi, "alpha": alpha}

    def train_step(self, state, batch, scalars):
        return self._train_step(state, batch, scalars)

    def eval_fn(self, params, img):
        return self.net.apply({"params": params}, img)

    def eval_params(self, state):
        return state.params

    def epoch_scalars(self, epoch: int) -> Dict[str, jax.Array]:
        lam = self.lambda_semi * sigmoid_rampup(epoch, self.epoch_rampup)
        return {"lambda_semi": np.float32(lam)}
