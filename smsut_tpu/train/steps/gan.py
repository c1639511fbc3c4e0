# -*- coding: utf-8 -*-
"""UGAN family: StarGAN-style translation GAN + supervised segmentation.

TPU-native re-design of `/root/reference/trainer/uganTrainer.py:115-229`,
`uganShp0Trainer.py:136-248` and `uganConsisTrainer.py:66-214`: the entire
iteration — D forward/backward (incl. WGAN-GP grad-of-grad), D Adam update,
G triple forward/backward, G SGD update, both poly-LR schedules — is ONE
jitted, donated function.  Python-side randomness (target modality, GP
interpolation, patch ids) enters as explicit PRNG keys / scalars.

Variant map:
  * ``ugan``       — UGAN, labeled-only, + shape loss (Dice+CE of the
                     reconstruction's seg vs labels) with the
                     epoch*(10/20)-capped warmup (`uganTrainer.py:40-41,122-123,191-194`);
  * ``uganShp0``   — UGANnce + PatchNCE, labeled-only, no shape loss.  (The
                     reference's own shp0 ``train_epoch`` is unrunnable as
                     committed — it unpacks UGANnce's 4 outputs into 2
                     (`uganShp0Trainer.py:183,201`); this implements the
                     evident intent: consis minus consistency, labeled-only.)
  * ``uganConsis`` — FULL SMSUT (`run0.sh:5-7`): labeled+unlabeled concat
                     batches, consistency(y_rec vs argmax y_fake) gated at
                     iter>=1000, PatchNCE, lambda_semi=10*rampup(max_epoch).

Reference quirks preserved deliberately: GP interpolation draws alpha from a
*normal* distribution (`uganShp0Trainer.py:138`, flagged in SURVEY appendix),
and the PatchNCE group size stays cfg.batch_size even for 2x concat batches.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smsut_tpu.config import Config
from smsut_tpu.train.steps import setup_compute
from smsut_tpu.models import Discriminator, UGAN, UGANnce, sample_patch_ids
from smsut_tpu.ops.losses import (
    argmax_consistency_loss,
    argmax_packed,
    dice_and_ce_loss,
    dice_and_ce_loss_packed,
    dice_and_ce_loss_packed4,
    l1_loss,
    nce_loss_over_layers,
    softmax_ce_with_logits,
)
from smsut_tpu.ops.schedules import sigmoid_rampup
from smsut_tpu.train.state import GANTrainState


def label2onehot(mdl: jax.Array, n_modal: int) -> jax.Array:
    return jax.nn.one_hot(mdl, n_modal, dtype=jnp.float32)


class UGANBase:
    """Shared machinery for the three GAN variants."""

    variant = "ugan"
    uses_unlabeled = False
    lambda_cls = 1.0
    lambda_rec = 10.0
    lambda_gp = 10.0
    lambda_seg = 10.0
    lambda_shp = 10.0
    lambda_shp_lazy = 20.0
    lambda_semi = 10.0
    n_critic = 1
    log_step = 50
    beta1 = 0.9
    beta2 = 0.999

    def __init__(self, cfg: Config):
        self.cfg = cfg
        # fixed sample batch for the per-epoch translation grid — instance
        # state, not class state (VERDICT r2 #9)
        self._fixed: Optional[Tuple] = None
        dtype = setup_compute(cfg)
        self.dtype = dtype
        self.with_nce = self.variant in ("uganShp0", "uganConsis")
        pair = getattr(cfg, "pair_towers", None)
        if pair is None:
            # auto: on where the paired lowering applies AND measured faster
            # (same-day A/B, BASELINE.md round 3: ugan 38.5->36.7 ms,
            # uganConsis 78.5->76.3; uganShp0 REGRESSES 30.0->32.0 — its
            # NCE-heavy G step fuses differently)
            pair = (cfg.pack_levels >= 1 and cfg.pack_mode == "hw"
                    and self.variant != "uganShp0")
        if self.with_nce:
            self.net = UGANnce(out_ch=cfg.n_class, n_modal=cfg.n_modal,
                               width=cfg.base_width, netF_nc=cfg.netF_nc,
                               dtype=dtype, pack_levels=cfg.pack_levels,
                               pair_towers=bool(pair))
        else:
            self.net = UGAN(out_ch=cfg.n_class, n_modal=cfg.n_modal,
                            width=cfg.base_width, dtype=dtype,
                            pack_levels=cfg.pack_levels,
                            pair_towers=bool(pair))
        self.D = Discriminator(input_size=cfg.input_size, n_modal=cfg.n_modal,
                               width=cfg.base_width,
                               max_width=256 if cfg.base_width == 16 else 512,
                               dtype=dtype, pack_levels=cfg.pack_levels)
        # bottleneck spatial positions for patch sampling (input/2^4)^2
        self.bottleneck_hw = (cfg.input_size // 16) ** 2
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._translate = jax.jit(self._translate_impl)

    # ---------------------------------------------------------------- state
    def init_state(self, rng: jax.Array) -> GANTrainState:
        cfg = self.cfg
        rg, rd = jax.random.split(rng)
        n = self.total_batch
        x = jnp.zeros((n, cfg.input_size, cfg.input_size, cfg.img_channels))
        m = jnp.zeros((n, cfg.n_modal))
        if self.with_nce:
            ids = jnp.zeros((cfg.nce_patches,), jnp.int32)
            g_params = self.net.init(rg, x, m, ids)["params"]
        else:
            g_params = self.net.init(rg, x, m)["params"]
        d_params = self.D.init(rd, x)["params"]
        return GANTrainState.create(g_params, d_params, cfg, self.beta1, self.beta2)

    @property
    def total_batch(self) -> int:
        return self.cfg.batch_size * (2 if self.uses_unlabeled else 1)

    # ------------------------------------------------------------- forwards
    def _g_forward(self, params, x, m, patch_ids, packed_seg: bool = False):
        def fwd(params, x, m):
            if self.with_nce:
                return self.net.apply({"params": params}, x, m, patch_ids,
                                      packed_seg=packed_seg)
            seg, tsl = self.net.apply({"params": params}, x, m,
                                      packed_seg=packed_seg)
            return seg, tsl, None

        if getattr(self.cfg, "remat", False):
            # rematerialize the generator towers: trades FLOPs for HBM so
            # larger batches fit (jax.checkpoint; off by default)
            fwd = jax.checkpoint(fwd)
        return fwd(params, x, m)

    # ------------------------------------------------------------ the step
    def _train_step_impl(self, state: GANTrainState, batch: Dict[str, jax.Array],
                         scalars: Dict[str, jax.Array]
                         ) -> Tuple[GANTrainState, Dict[str, jax.Array]]:
        cfg = self.cfg
        bs = cfg.batch_size
        x_real = batch["img"]            # [bs,H,W,1]
        y_real = batch["msk"]            # [bs,H,W]
        mdl = batch["mdl"]               # [bs]
        if self.uses_unlabeled:          # labeled+unlabeled concat (consis)
            x_real = jnp.concatenate([x_real, batch["ul_img"]], axis=0)
            mdl = jnp.concatenate([mdl, batch["ul_mdl"]], axis=0)
        n = x_real.shape[0]

        r_mj, r_alpha, r_patch = jax.random.split(scalars["rng"], 3)
        # random target modality per iteration (`uganTrainer.py:145-146`),
        # drawn in-graph to keep the step a single host dispatch
        mj = jax.random.randint(r_mj, (), 0, cfg.n_modal, jnp.int32)
        modal_trg = jnp.full((n,), mj, jnp.int32)
        vec_org = label2onehot(mdl, cfg.n_modal)
        vec_trg = label2onehot(modal_trg, cfg.n_modal)
        vec_ot = vec_trg - vec_org
        vec_to = vec_org - vec_trg
        patch_ids = sample_patch_ids(r_patch, self.bottleneck_hw, cfg.nce_patches)

        # ---- x_fake for the D step (G params fixed; same values the G step
        # recomputes under grad — reference does 3 G-scale forwards too)
        _, x_fake0, _ = self._g_forward(state.g_params, x_real, vec_ot, patch_ids)
        x_fake0 = jax.lax.stop_gradient(x_fake0)

        alpha = jax.random.normal(r_alpha, (n, 1, 1, 1))  # quirk: randn not U(0,1)
        x_hat = alpha * x_real + (1.0 - alpha) * x_fake0

        def d_loss_fn(d_params):
            if getattr(cfg, "d_concat_hat", False):
                # ONE 3n-image D apply for real+fake+x_hat: the GP input
                # gradient is the x_hat slice of the batched input grad
                # (per-sample instance norm keeps slices independent, so
                # this is mathematically identical to separate applies)
                Xc = jnp.concatenate([x_real, x_fake0, x_hat], axis=0)

                def critic3(X):
                    src, cls = self.D.apply({"params": d_params}, X)
                    return jnp.sum(src[2 * n:]), (src, cls)

                dydx3, (src_cat, cls_cat) = jax.grad(
                    critic3, has_aux=True)(Xc)
                src_real, src_fake = src_cat[:n], src_cat[n:2 * n]
                cls_real = cls_cat[:n]
                dydx = dydx3[2 * n:]
            else:
                # ONE batched D apply for real+fake: same params, and both
                # terms need only param-grads; instance norm is per-sample
                # so the concat is mathematically identical to two applies
                # (`uganTrainer.py:149-156` runs them sequentially) — halves
                # the D-apply op count per step.
                src_cat, cls_cat = self.D.apply(
                    {"params": d_params},
                    jnp.concatenate([x_real, x_fake0], axis=0))
                src_real, src_fake = src_cat[:n], src_cat[n:]
                cls_real = cls_cat[:n]

                def critic_sum(xh):
                    src, _ = self.D.apply({"params": d_params}, xh)
                    return jnp.sum(src)

                dydx = jax.grad(critic_sum)(x_hat)   # grad-of-grad via jit
            d_real = -jnp.mean(src_real)
            d_cls = softmax_ce_with_logits(cls_real, mdl)
            d_fake = jnp.mean(src_fake)
            norms = jnp.sqrt(jnp.sum(jnp.square(dydx.reshape(n, -1)), axis=1))
            d_gp = jnp.mean(jnp.square(norms - 1.0))
            total = d_real + d_fake + self.lambda_cls * d_cls + self.lambda_gp * d_gp
            return total, (d_real, d_fake, d_cls, d_gp)

        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params)
        state = state.apply_d_gradients(d_grads)
        d_real, d_fake, d_cls, d_gp = d_aux

        # ---- G step against the UPDATED discriminator (reference order)
        gate1000 = (state.step
                    >= getattr(cfg, "consis_gate_step", 1000)).astype(jnp.float32)

        # auto: ON for ugan/uganShp0 (measured ties, fewer materializations),
        # OFF for uganConsis — its packed4 consistency tail measured 76.8 vs
        # 75.2 ms unpacked (BASELINE.md round-5 tails grid)
        po = getattr(cfg, "packed_loss_tails", None)
        po = bool(po) if po is not None else (self.variant != "uganConsis")

        def g_loss_fn(g_params):
            # seg logits stay PACKED through all seg-side losses (per-pixel
            # losses are repacking-invariant; ops/losses.py packed variants)
            # — the translation output x_fake stays unpacked for D/L1
            y_fake, x_fake, feat_x = self._g_forward(g_params, x_real, vec_ot,
                                                     patch_ids,
                                                     packed_seg=po)
            packed = y_fake.shape[-1] != cfg.n_class
            src, cls = self.D.apply({"params": state.d_params}, x_fake)
            g_fake = -jnp.mean(src)
            g_cls = softmax_ce_with_logits(cls, modal_trg)
            if packed:
                g_seg = dice_and_ce_loss_packed(y_fake[:bs], y_real,
                                                cfg.weight_dc, cfg.weight_ce)
            else:
                g_seg = dice_and_ce_loss(y_fake[:bs], y_real, cfg.weight_dc,
                                         cfg.weight_ce, batch_dice=True)
            y_rec, x_rec, feat_f = self._g_forward(g_params, x_fake, vec_to,
                                                   patch_ids,
                                                   packed_seg=po)
            g_rec = l1_loss(x_real, x_rec)

            total = (g_fake + self.lambda_rec * g_rec + self.lambda_cls * g_cls
                     + self.lambda_seg * g_seg)
            aux = {"G_fake": g_fake, "G_rec": g_rec, "G_cls": g_cls,
                   "G_seg": g_seg, "loss": g_seg}
            if self.variant == "ugan":
                if packed:
                    g_shp = dice_and_ce_loss_packed(y_rec, y_real,
                                                    cfg.weight_dc,
                                                    cfg.weight_ce)
                else:
                    g_shp = dice_and_ce_loss(y_rec, y_real, cfg.weight_dc,
                                             cfg.weight_ce, batch_dice=True)
                total = total + scalars["lambda_shp"] * g_shp
                aux["G_shp"] = g_shp
            if self.variant == "uganConsis":
                if packed:
                    tgt4 = jax.lax.stop_gradient(argmax_packed(y_fake))
                    g_semi = dice_and_ce_loss_packed4(
                        y_rec, tgt4, cfg.weight_dc, cfg.weight_ce) * gate1000
                else:
                    g_semi = argmax_consistency_loss(
                        y_rec, y_fake, cfg.weight_dc, cfg.weight_ce) * gate1000
                total = total + scalars["lambda_semi"] * g_semi
                aux["G_semi"] = g_semi
            if self.with_nce:
                g_nce = nce_loss_over_layers([feat_x], [feat_f], cfg.batch_size,
                                             cfg.nce_temperature)
                total = total + 1.0 * g_nce
                aux["G_nce"] = g_nce
            return total, aux

        (_, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params)
        state = state.apply_g_gradients(g_grads)
        state = state.replace(step=state.step + 1)

        metrics = {"D_real": d_real, "D_fake": d_fake, "D_cls": d_cls,
                   "D_gp": d_gp}
        metrics.update(g_aux)
        return state, metrics

    def _translate_impl(self, g_params, x, vec):
        if self.with_nce:
            seg, tsl = self.net.apply({"params": g_params}, x, vec,
                                      val_phase=True)
        else:
            seg, tsl = self.net.apply({"params": g_params}, x, vec)
        return seg, tsl

    # -------------------------------------------------------------- public
    def train_step(self, state, batch, scalars):
        return self._train_step(state, batch, scalars)

    def eval_fn(self, params, img):
        if self.with_nce:
            seg, _ = self.net.apply({"params": params}, img, val_phase=True)
        else:
            seg, _ = self.net.apply({"params": params}, img)
        return seg

    def eval_params(self, state):
        return state.g_params

    def epoch_scalars(self, epoch: int) -> Dict[str, jax.Array]:
        out = {}
        if self.variant == "ugan":
            lam = min(epoch * (self.lambda_shp / self.lambda_shp_lazy),
                      self.lambda_seg)
            out["lambda_shp"] = np.float32(lam)
        if self.variant == "uganConsis":
            lam = self.lambda_semi * sigmoid_rampup(epoch, self.cfg.max_epoch)
            out["lambda_semi"] = np.float32(lam)
        return out

    # ------------------------------------------------------ sample grids
    def on_epoch_end(self, trainer, epoch: int) -> None:
        """Per-epoch fixed-batch translation grid
        (`uganShp0Trainer.py:239-248`)."""
        if trainer.exp.sample_root is None or self._fixed is None:
            return
        import os

        from PIL import Image

        x_fixed, vec_fixed_org = self._fixed
        cols = [np.asarray(x_fixed)]
        for target in range(self.cfg.n_modal):
            vec_trg = jnp.tile(jax.nn.one_hot(target, self.cfg.n_modal),
                               (x_fixed.shape[0], 1))
            _, tsl = self._translate(trainer.algo.eval_params(trainer.state),
                                     x_fixed, vec_trg - vec_fixed_org)
            cols.append(np.asarray(tsl))
        grid = np.concatenate(cols, axis=2)      # concat along width
        grid = np.clip((grid + 1.0) / 2.0, 0, 1)[..., 0]
        rows = np.concatenate(list(grid), axis=0)  # stack batch along height
        img = Image.fromarray((rows * 255).astype(np.uint8))
        img.save(os.path.join(trainer.exp.sample_root,
                              f"train-{epoch + 1}-images.jpg"))

    def set_fixed_batch(self, x_fixed, mdl) -> None:
        # numpy one-hot: no device program on the training path
        onehot = np.eye(self.cfg.n_modal, dtype=np.float32)[np.asarray(mdl)]
        self._fixed = (np.asarray(x_fixed), onehot)


class UGANTrainerAlgo(UGANBase):
    """UGAN + shape loss (`uganTrainer.py`)."""

    name = "ugan"
    variant = "ugan"
    uses_unlabeled = False


class UGANShp0Algo(UGANBase):
    """UGANnce + PatchNCE, no shape loss (`uganShp0Trainer.py`)."""

    name = "uganShp0"
    variant = "uganShp0"
    uses_unlabeled = False


class UGANConsisAlgo(UGANBase):
    """Full SMSUT (`uganConsisTrainer.py`, `run0.sh:5-7`)."""

    name = "uganConsis"
    variant = "uganConsis"
    uses_unlabeled = True
