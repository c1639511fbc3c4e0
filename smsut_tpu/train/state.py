# -*- coding: utf-8 -*-
"""Train states and reference-matching optimizers.

torch-semantics optimizers (`/root/reference/trainer/unetTrainer.py:48`,
`uganShp0Trainer.py:72-74`):
  * SGD(momentum=0.9, weight_decay=1e-3) with coupled L2 — weight decay is
    added to the gradient *before* the momentum trace;
  * Adam(betas, weight_decay) with coupled L2;
both under the per-iteration poly LR decay (`unetTrainer.py:82-84`).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from smsut_tpu.config import Config
from smsut_tpu.ops.schedules import poly_lr_schedule

PyTree = Any


def make_sgd(cfg: Config, momentum: float = 0.9) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(poly_lr_schedule(cfg.lr, cfg.total_iters)),
    )


def make_adam(cfg: Config, b1: float = 0.9, b2: float = 0.999) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
        optax.scale_by_learning_rate(poly_lr_schedule(cfg.lr, cfg.total_iters)),
    )


class TrainState(struct.PyTreeNode):
    """Single-network state: params + optimizer + step counter; optional EMA
    tree (mean teacher / CoraNet) and a second network (cross-pseudo)."""

    step: jax.Array
    params: PyTree
    opt_state: PyTree
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Optional[PyTree] = None
    params2: Optional[PyTree] = None
    opt_state2: Optional[PyTree] = None

    @classmethod
    def create(cls, params: PyTree, tx: optax.GradientTransformation, **kw):
        extra = {}
        if "params2" in kw and kw["params2"] is not None:
            extra["opt_state2"] = tx.init(kw["params2"])
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx, **kw, **extra)

    def apply_gradients(self, grads: PyTree) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


class GANTrainState(struct.PyTreeNode):
    """Generator (SGD) + discriminator (Adam) twin state
    (`uganShp0Trainer.py:70-74`).  One ``step`` counter drives both poly
    schedules like the reference's shared ``self.iter``."""

    step: jax.Array
    g_params: PyTree
    g_opt_state: PyTree
    d_params: PyTree
    d_opt_state: PyTree
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, g_params: PyTree, d_params: PyTree, cfg: Config,
               beta1: float = 0.9, beta2: float = 0.999):
        g_tx = make_sgd(cfg)
        d_tx = make_adam(cfg, beta1, beta2)
        return cls(step=jnp.zeros((), jnp.int32),
                   g_params=g_params, g_opt_state=g_tx.init(g_params),
                   d_params=d_params, d_opt_state=d_tx.init(d_params),
                   g_tx=g_tx, d_tx=d_tx)

    def apply_d_gradients(self, grads: PyTree) -> "GANTrainState":
        updates, new_opt = self.d_tx.update(grads, self.d_opt_state, self.d_params)
        return self.replace(d_params=optax.apply_updates(self.d_params, updates),
                            d_opt_state=new_opt)

    def apply_g_gradients(self, grads: PyTree) -> "GANTrainState":
        updates, new_opt = self.g_tx.update(grads, self.g_opt_state, self.g_params)
        return self.replace(g_params=optax.apply_updates(self.g_params, updates),
                            g_opt_state=new_opt)
