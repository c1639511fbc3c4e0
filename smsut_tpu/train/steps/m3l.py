# -*- coding: utf-8 -*-
"""M3L: masked-consistency mean teacher over a SegFormer
(`/root/reference/trainer/M3LTrainer.py:42-160`).

Semantics from the trainer (the backbone itself is re-created — see
models/segformer.py): grayscale triplicated to RGB (`:107`); the student sees
masked inputs over the unlabeled batch range (`:124-125`), the EMA teacher
sees unmasked inputs (`:133-137`); supervised loss = CE-only Dice+CE
(weight_ce=1, weight_dc=0, `:52`); consistency = CE of student's unlabeled
logits against the teacher's softmax *probabilities* (`:140` — torch CE with
soft targets); lambda_semi = 1.0 x 30-epoch rampup; Adam(0.9, 0.999) with
poly LR; EMA gate at 100 iters."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.models.segformer import LinearFusionMaskedConsistencyMixBatch
from smsut_tpu.ops.losses import cross_entropy_loss
from smsut_tpu.ops.schedules import sigmoid_rampup
from smsut_tpu.train.state import TrainState, make_adam
from smsut_tpu.train.steps import setup_compute


def soft_cross_entropy(logits: jax.Array, target_probs: jax.Array) -> jax.Array:
    """torch nn.CrossEntropyLoss with probability targets."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(target_probs * logp, axis=-1))


class M3L:
    name = "M3L"
    uses_unlabeled = True
    lambda_semi = 1.0
    ema_decay = 0.99
    epoch_rampup = 30
    log_step = 50

    def __init__(self, cfg: Config):
        self.cfg = cfg
        dtype = setup_compute(cfg)
        self.net = LinearFusionMaskedConsistencyMixBatch(
            num_classes=cfg.n_class, dtype=dtype)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.cfg
        x = jnp.zeros((1, cfg.input_size, cfg.input_size, 3))
        params = self.net.init(rng, x)["params"]
        ema = jax.tree_util.tree_map(jnp.copy, params)
        return TrainState.create(params, make_adam(cfg), ema_params=ema)

    def _rgb(self, img: jax.Array) -> jax.Array:
        return jnp.concatenate([img, img, img], axis=-1)  # `M3LTrainer.py:107`

    def _train_step_impl(self, state: TrainState, batch: Dict[str, jax.Array],
                         scalars: Dict[str, jax.Array]
                         ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        cfg = self.cfg
        bs = cfg.batch_size
        img = self._rgb(jnp.concatenate([batch["img"], batch["ul_img"]], axis=0))

        ema_logits = self.net.apply({"params": state.ema_params}, img, mask=False)
        ema_probs = jax.lax.stop_gradient(
            jax.nn.softmax(ema_logits.astype(jnp.float32), axis=-1))

        def loss_fn(params):
            logits = self.net.apply({"params": params}, img, mask=True,
                                    range_batches_to_mask=(bs, 2 * bs),
                                    mask_rng=scalars["rng"])
            sup = cross_entropy_loss(logits[:bs], batch["msk"])  # CE-only
            semi = soft_cross_entropy(logits[bs:], ema_probs[bs:])
            return sup + scalars["lambda_semi"] * semi, (sup, semi)

        (_, (sup, semi)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)

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
        return self.net.apply({"params": params}, self._rgb(img), mask=False)

    def eval_params(self, state):
        return state.params

    def epoch_scalars(self, epoch: int) -> Dict[str, jax.Array]:
        lam = self.lambda_semi * sigmoid_rampup(epoch, self.epoch_rampup)
        return {"lambda_semi": np.float32(lam)}
