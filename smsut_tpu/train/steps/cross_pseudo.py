# -*- coding: utf-8 -*-
"""Cross-Pseudo Supervision (CPS) algorithm
(`/root/reference/trainer/crossPseTrainer.py:38-148`).

Two U-Nets live in one train state (params / params2) with independent SGD
optimizer states; each is supervised on the labeled half and trained against
the other's detached argmax pseudo-labels on the unlabeled half via Dice+CE,
weighted by lambda_semi = 0.1 * sigmoid_rampup(epoch, max_epoch)
(`crossPseTrainer.py:42,82,108-135`).  Both nets update in one jitted step.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
import jax.numpy as jnp
import optax

from smsut_tpu.config import Config
from smsut_tpu.train.steps import setup_compute
from smsut_tpu.models import UNet
from smsut_tpu.ops.losses import (
    argmax_packed,
    dice_and_ce_loss,
    dice_and_ce_loss_packed,
    dice_and_ce_loss_packed4,
)
from smsut_tpu.ops.schedules import sigmoid_rampup
from smsut_tpu.train.state import TrainState, make_sgd


class CrossPseudo:
    name = "crossPse"
    uses_unlabeled = True
    lambda_semi = 0.1
    log_step = 50

    def __init__(self, cfg: Config):
        self.cfg = cfg
        dtype = setup_compute(cfg)
        self.net = UNet(out_ch=cfg.n_class, width=cfg.base_width,
                        norm_type="instance", act_type="lrelu", dtype=dtype,
                        pack_levels=cfg.pack_levels)
        # both nets see the SAME image stack every iteration -> run their
        # level-0 stages tower-paired (models/paired.py; equivalence in
        # tests/test_paired_unet.py).  Auto default follows the measured A/B
        # in BASELINE.md.
        pair = getattr(cfg, "pair_towers", None)
        if pair is None:
            pair = cfg.pack_levels >= 1 and cfg.pack_mode == "hw"
        self._pair = bool(pair) and cfg.pack_levels >= 1 and cfg.pack_mode == "hw"
        if self._pair:
            from smsut_tpu.models.unet import UNetPair

            self.net_pair = UNetPair(out_ch=cfg.n_class, width=cfg.base_width,
                                     norm_type="instance", act_type="lrelu",
                                     dtype=dtype, pack_levels=cfg.pack_levels)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.cfg
        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.img_channels))
        p1 = self.net.init(r1, x)["params"]
        p2 = self.net.init(r2, x)["params"]
        return TrainState.create(p1, make_sgd(cfg), params2=p2)

    def _train_step_impl(self, state: TrainState, batch: Dict[str, jax.Array],
                         scalars: Dict[str, jax.Array]
                         ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        cfg = self.cfg
        bs = cfg.batch_size
        img = jnp.concatenate([batch["img"], batch["ul_img"]], axis=0)
        lam = scalars["lambda_semi"]

        def joint_loss(p1, p2):
            # packed logits end-to-end for all four losses (repacking-
            # invariant; ops/losses.py packed variants)
            # auto default ON here: measured 37.4 (packed) vs 40.6 ms
            # (BASELINE.md round-5 tails grid)
            po = getattr(cfg, "packed_loss_tails", None)
            po = bool(po) if po is not None else True
            if self._pair:
                out1, out2 = self.net_pair.apply(
                    {"params": {"n1": p1, "n2": p2}}, img, packed_out=po)
            else:
                out1 = self.net.apply({"params": p1}, img, packed_out=po)
                out2 = self.net.apply({"params": p2}, img, packed_out=po)
            if out1.shape[-1] == cfg.n_class:   # unpacked fallback
                sup1 = dice_and_ce_loss(out1[:bs], batch["msk"],
                                        cfg.weight_dc, cfg.weight_ce, True)
                sup2 = dice_and_ce_loss(out2[:bs], batch["msk"],
                                        cfg.weight_dc, cfg.weight_ce, True)
                pred1 = jax.lax.stop_gradient(jnp.argmax(out1[bs:], axis=-1))
                pred2 = jax.lax.stop_gradient(jnp.argmax(out2[bs:], axis=-1))
                semi1 = dice_and_ce_loss(out1[bs:], pred2, cfg.weight_dc,
                                         cfg.weight_ce, True)
                semi2 = dice_and_ce_loss(out2[bs:], pred1, cfg.weight_dc,
                                         cfg.weight_ce, True)
            else:
                sup1 = dice_and_ce_loss_packed(out1[:bs], batch["msk"],
                                               cfg.weight_dc, cfg.weight_ce)
                sup2 = dice_and_ce_loss_packed(out2[:bs], batch["msk"],
                                               cfg.weight_dc, cfg.weight_ce)
                pred1 = jax.lax.stop_gradient(argmax_packed(out1[bs:]))
                pred2 = jax.lax.stop_gradient(argmax_packed(out2[bs:]))
                semi1 = dice_and_ce_loss_packed4(out1[bs:], pred2,
                                                 cfg.weight_dc, cfg.weight_ce)
                semi2 = dice_and_ce_loss_packed4(out2[bs:], pred1,
                                                 cfg.weight_dc, cfg.weight_ce)
            total = sup1 + sup2 + lam * semi1 + lam * semi2
            return total, (sup1, sup2, semi1, semi2)

        (_, aux), (g1, g2) = jax.value_and_grad(joint_loss, argnums=(0, 1),
                                                has_aux=True)(state.params,
                                                              state.params2)
        sup1, sup2, semi1, semi2 = aux
        # net1 update (shared step counter like the reference's self.iter)
        u1, opt1 = state.tx.update(g1, state.opt_state, state.params)
        u2, opt2 = state.tx.update(g2, state.opt_state2, state.params2)
        state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, u1), opt_state=opt1,
            params2=optax.apply_updates(state.params2, u2), opt_state2=opt2)
        return state, {"loss": sup1, "loss2": sup2,
                       "crossPse1_loss": semi1, "crossPse2_loss": semi2}

    def train_step(self, state, batch, scalars):
        return self._train_step(state, batch, scalars)

    def eval_fn(self, params, img):
        return self.net.apply({"params": params}, img)

    def eval_params(self, state):
        return state.params

    def epoch_scalars(self, epoch: int) -> Dict[str, jax.Array]:
        lam = self.lambda_semi * sigmoid_rampup(epoch, self.cfg.max_epoch)
        return {"lambda_semi": np.float32(lam)}
