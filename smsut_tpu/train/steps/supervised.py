# -*- coding: utf-8 -*-
"""Supervised U-Net algorithm (`/root/reference/trainer/unetTrainer.py`).

The whole iteration — forward, Dice+CE loss, backward, SGD+poly-LR update —
is one jitted, buffer-donated function sharded over the data axis of the
mesh.  LR mutation and loss gating are functions of the step counter inside
the step (SURVEY §7 'hard parts')."""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.train.steps import setup_compute
from smsut_tpu.models import UNet
from smsut_tpu.ops.losses import dice_and_ce_loss, dice_and_ce_loss_packed
from smsut_tpu.train.state import TrainState, make_sgd


class SupervisedUNet:
    """Algorithm object: init_state / train_step / eval_logits."""

    name = "unet"
    uses_unlabeled = False

    def __init__(self, cfg: Config):
        self.cfg = cfg
        dtype = setup_compute(cfg)
        self.net = UNet(out_ch=cfg.n_class, width=cfg.base_width,
                        norm_type="instance", act_type="lrelu", dtype=dtype,
                        pack_levels=cfg.pack_levels,
                        remat=getattr(cfg, "remat_unet", False))
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_logits = jax.jit(self._eval_logits_impl)

    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.cfg
        x = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.img_channels))
        params = self.net.init(rng, x)["params"]
        return TrainState.create(params, make_sgd(cfg))

    # --- jitted bodies -----------------------------------------------------
    def _train_step_impl(self, state: TrainState, batch: Dict[str, jax.Array],
                         scalars: Dict[str, jax.Array]
                         ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        cfg = self.cfg

        def loss_fn(params):
            # packed logits for the loss when the packed levels are active:
            # identical values per pixel, no depth_to_space materialization
            # (ops/losses.py packed variants)
            # auto default OFF here: measured 6.97 (unpacked) vs 7.14 ms
            # (BASELINE.md round-5 tails grid)
            po = getattr(cfg, "packed_loss_tails", None)
            logits = self.net.apply({"params": params}, batch["img"],
                                    packed_out=bool(po) if po is not None
                                    else False)
            if logits.shape[-1] == cfg.n_class:   # unpacked fallback
                return dice_and_ce_loss(logits, batch["msk"], cfg.weight_dc,
                                        cfg.weight_ce, batch_dice=True)
            return dice_and_ce_loss_packed(logits, batch["msk"],
                                           cfg.weight_dc, cfg.weight_ce)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss}

    def _eval_logits_impl(self, params, img: jax.Array) -> jax.Array:
        return self.net.apply({"params": params}, img)

    # --- public API ---------------------------------------------------------
    def train_step(self, state, batch, scalars):
        return self._train_step(state, batch, scalars)

    def eval_fn(self, params, img):
        """Unjitted eval forward for the Trainer's fused eval step."""
        return self._eval_logits_impl(params, img)

    def eval_logits(self, state, img):
        return self._eval_logits(state.params, img)

    def eval_params(self, state):
        return state.params

    def epoch_scalars(self, epoch: int) -> Dict[str, float]:
        return {}
