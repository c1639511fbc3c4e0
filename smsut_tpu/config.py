# -*- coding: utf-8 -*-
"""Typed configuration for SMSUT-TPU.

A single dataclass replaces the reference's module of global constants
(`/root/reference/config.py:7-94`) while keeping every knob name and default
value so runs are comparable 1:1.  TPU-specific knobs (dtype policy, mesh
shape, host prefetch depth) are additive.
"""
from __future__ import annotations

import dataclasses
import enum
import os
from typing import Dict, Optional, Sequence, Tuple


class Modality(enum.IntEnum):
    """Imaging modalities (reference `config.py:7-11`)."""

    ct = 0
    t1in = 1
    t1out = 2
    t2 = 3


MODALITIES: Tuple[str, ...] = tuple(Modality.__members__)


def default_data_aug() -> Dict[str, object]:
    # Reference `config.py:60-71`.
    return dict(
        rotate=True,
        rotate_degrees=15,
        resizeCrop=True,
        resizeCrop_size=256,
        elasticDeform=True,
        elasticDeform_sigmas=(9.0, 13.0),
        elasticDeform_points=3,
        colorJitter=False,
        gammaCorrect=False,
        gammaCorrect_gammas=(0.7, 1.5),
    )


@dataclasses.dataclass
class Config:
    # ----- misc (reference config.py:23-26) -----
    seed: int = 2020
    n_modal: int = len(Modality.__members__)
    n_label: int = 4  # 4 abdominal organs: liver, r-kidney, l-kidney, spleen

    # ----- training loop (config.py:29-33) -----
    num_iter_per_epoch: int = 150
    max_epoch: int = 200
    exp_alpha: float = 1.0
    weight_dc: float = 0.5
    weight_ce: float = 0.5

    # ----- network (config.py:36-37) -----
    img_channels: int = 1
    base_width: int = 16

    # ----- data roots (config.py:40-47); overridable via env -----
    atlas_root: str = ""
    chaos_root: str = ""
    base_root: str = ""
    expr_root: str = ""

    # ----- preprocessing (config.py:49-51) -----
    new_spacing: Tuple[float, float, float] = (1.5, 1.5, 5.0)
    input_size: int = 256
    mod_type: Tuple[str, ...] = MODALITIES  # intended 4-tuple (see SURVEY appendix)

    # ----- data loading (config.py:54-71) -----
    split_yaml: str = "semi-1910.yaml"
    batch_size: int = 8
    num_workers: int = 6
    data_aug: Dict[str, object] = dataclasses.field(default_factory=default_data_aug)

    # ----- optimization (config.py:74-75) -----
    lr: float = 1e-2
    weight_decay: float = 1e-3

    # ----- PatchNCE (config.py:78) -----
    nce_layers: Sequence[int] = (5,)
    nce_patches: int = 64
    nce_temperature: float = 0.07
    netF_nc: int = 256

    # ----- CoraNet (config.py:81-94) -----
    thres: float = 0.5
    default_w: Tuple[float, ...] = (1.0, 1.0)
    w_con: Tuple[float, ...] = (1.0, 5.0)
    w_rad: Tuple[float, ...] = (5.0, 1.0)
    pre_epoch: int = 100
    cora_epoch: int = 200
    pred_step: int = 10

    # ----- TPU-native additions -----
    # compute dtype for conv/matmul activations ("bfloat16" or "float32");
    # parameters and the loss are always float32.
    compute_dtype: str = "bfloat16"
    # number of data-parallel shards; 0 == use all local devices.
    data_parallel: int = 0
    # spatial parallelism: shard activations' H dim over a second 'space'
    # mesh axis (GSPMD inserts the conv halo exchanges; parallel/mesh.py).
    # 1 disables; devices = data_parallel x spatial_parallel.
    spatial_parallel: int = 1
    # host->device prefetch depth of the input pipeline.
    prefetch_depth: int = 2
    # use the fused Pallas instance-norm kernel where available.
    use_pallas: bool = False
    # run the first N U-Net/UGAN levels on the 2x2 space-to-depth grid
    # (identical math, ~4x fuller TPU lanes on the dominant 256^2/128^2
    # activations; see models/packed.py and tests/test_packed.py).
    pack_levels: int = 2
    # packing representation for the pack_levels: "hw" = 2x2 space-to-depth
    # (models/packed.py), "w" = W-only packing with free-reshape level
    # transitions and pack_w0 subpixels at level 0 (models/packed_w.py).
    pack_mode: str = "hw"
    pack_w0: int = 8
    # d_pack_mode="w" only: keep the discriminator's narrow-channel pyramid
    # W-packed past the stem (each stride-2 block halves the subpixels for
    # free until the lanes are full-width).
    d_pack_deep: bool = True
    # discriminator-only pack-mode override (""=inherit pack_mode).  The
    # round-3 A/B measured the generator fastest in "hw" but the
    # discriminator fastest W-packed-deep: the MIXED default below took
    # uganConsis 91.0 -> 81.8 ms/step on the dev chip (BASELINE.md).
    d_pack_mode: str = "w"
    # run the UGAN twin towers' level-0 stages as ONE paired program:
    # channel-concatenated activations + block-diagonal full-lane convs
    # (models/paired.py — identical math; kills the narrow-channel conv
    # emitter's C-minor<->W-minor layout flips at 2x the executed MACs,
    # measured ~28% faster per twin pair).  None = auto: on when the
    # generator packing is "hw" with pack_levels >= 1.
    pair_towers: Optional[bool] = None
    # pin intermediate activation layouts ("off"|"cmin"|"wmin") via
    # jax.experimental.layout.with_layout_constraint — an attack on the
    # GAN step's 27ms of XLA layout-flip copies (models/layout_pin.py).
    # MEASURED SLOWER both ways (uganConsis 91->103/130 ms; BASELINE.md)
    # and crashes the axon backend combined with d_pack_mode="w" — kept
    # as an experiment knob only.
    layout_pin: str = "off"
    # run the hot packed SAME convs through the Pallas TPU kernel
    # (ops/conv_pallas.py): "off" | "on" | "auto" (= on when the backend is
    # a real TPU).  Attacks the conv emitter's layout-flip copies.
    conv_pallas: str = "off"
    # fuse whole packed BasicBlocks (conv+instnorm+lrelu x2 + shortcut) into
    # one Pallas kernel per direction (ops/block_pallas.py) at 128-lane
    # shapes.  MEASURED SLOWER round 4 (kernel hits its 98 TF/s im2col-dot
    # cap; XLA's conv emitter runs the same chains at 150-170 TF/s on this
    # full-rate chip — BASELINE.md) — kept as tested opt-in for future XLA
    # versions.
    block_pallas: bool = False
    # instance-norm statistics: "reduce" (f32 jnp.sum fusions), "dot" (MXU
    # contractions against a ones vector — same f32 sums, measured slower),
    # or "bf16" (bf16-accumulated sums — drift bounded by
    # tests/test_norm_stats.py).  The GAN profile shows ~7 ms/step of
    # convert_reduce fusions, which these modes attack.  "auto" (default) =
    # accumulate in the compute dtype: bf16 sums under the bf16 default
    # (uganConsis 76.3->74.5 ms, unet -3%; BASELINE.md round 3), f32 sums
    # whenever compute_dtype=float32 — so the strict-parity switch
    # (--set compute_dtype=float32) still restores reference-identical
    # math end-to-end.  --set norm_stats=reduce isolates the stats alone.
    norm_stats: str = "auto"
    # fuse the packed pool->space_to_depth level transition so the narrow
    # [B,H',W',C] pooled tensor never materializes (8x lane-padded in HBM).
    # Measured: wins at batch>=32 (supervised 36.6->35.4 ms), loses at the
    # GAN's batch 16 (92.9->102.9 — the tensor was VMEM-resident anyway).
    # None = auto: on when batch_size >= 32 (the spilled regime), else off
    # (BASELINE.md round 3).
    pool_pack_fused: Optional[bool] = None
    # run joint augmentation on-device as one fused warp (this host has a
    # single CPU; the reference's host augmentation chain costs ~7ms/slice
    # vs a ~0.6ms TPU step).  False selects the strict-parity host pipeline.
    device_augment: bool = True
    # write a jax.profiler trace of one training epoch to this directory.
    profile_dir: str = ""
    # fuse N train iterations into ONE dispatch (lax.scan over stacked
    # batches).  Every execute through the remote tunnel pays a fixed
    # host/RTT cost (~10ms measured); chunking amortizes it N-fold.  All
    # per-iteration semantics (PRNG keys, poly-LR, metrics granularity,
    # non-finite detection) are preserved; logging/eval cadence unchanged.
    # Set 1 for strict single-dispatch-per-iteration behaviour.  Applies to
    # the fused device-augment path on a single host; algorithms with
    # host-side per-iteration batches (CoraNet stage B) fall back to 1.
    # Measured A/B (round 3, tunnel chip): T=4 17.8, T=8 12.4 (the device
    # floor), T=16 42.4 ms/iter (the 1-CPU host producer starves) -> 8.
    steps_per_dispatch: int = 8
    # stage train batches onto the device from the loader's producer thread
    # (double-buffered device_put): the H2D transfer of batch i+1 overlaps
    # the compute of batch i, so the train loop is dispatch-bound rather
    # than transfer-bound.  Host-side modality ids stay on the host.
    prefetch_device: bool = True
    # rematerialize GAN generator forwards (jax.checkpoint): trades FLOPs
    # for HBM, enabling larger batches.
    remat: bool = False
    # rematerialize the plain UNet's encoder/decoder blocks — identical
    # math, aimed at the batch>=32 VMEM-spilled regime (BASELINE.md).
    remat_unet: bool = False
    # pseudo phase: volumes whose slices are additionally assembled into a
    # whole-volume translation grid jpg — the reference's hand-picked
    # visualization list (`uganConsisTrainer.py:292`).
    pseudo_volumes: Tuple[str, ...] = ("ct_028", "t1in_037", "t1out_015",
                                       "t2_032")
    # evaluate/checkpoint every N epochs (1 == reference behaviour).  On the
    # axon-tunnelled dev chip, running ANY second executable (eval, grids,
    # checkpoint transfers) makes every later train-step execution pay a
    # ~330ms remote program reload — raise this there to amortize it.
    eval_every: int = 1
    # evaluate the whole test sweep as ONE lax.scan program over the
    # device-resident stacked test set (uint8, normalized in-body) instead
    # of one dispatch + H2D per batch.  Identical predictions/losses to the
    # per-batch path (tests/test_eval_scan.py); cuts an eval epoch to a
    # single execute + one uint8 fetch — on the tunnel chip this also
    # dodges the ~330ms per-dispatch program reload.  Multi-host: the
    # batch axis is sharded across processes and re-gathered.
    eval_scan: bool = True
    # consume the network's PACKED logits directly in the train-loss tails
    # (ops/losses.py packed variants; identical per-pixel math — the
    # full-grid depth_to_space unpack never materializes).  None = auto,
    # the round-5 measured per-algorithm optimum: ON for meanTeacher
    # (24.3 -> 18.0 ms) and crossPse (40.6 -> 37.4), ties for ugan/uganShp0
    # (kept ON), OFF for unet (7.14 -> 6.97) and uganConsis (76.8 -> 75.2)
    # whose packed4 consistency tail costs more than the unpack it saves
    # (BASELINE.md round 5).  True/False force it everywhere.
    packed_loss_tails: Optional[bool] = None
    # GAN D step: run real+fake+x_hat as ONE 3n-image D apply, recovering
    # the GP input-gradient as a slice of the batched input grad (identical
    # math — per-sample instance norm keeps slices independent).  Trades an
    # extra 2n of input-grad compute for one D program instead of two.
    d_concat_hat: bool = False
    # uganConsis: global step at which the consistency loss opens
    # (`uganConsisTrainer.py` gates g_semi at iter >= 1000).  Configurable
    # so short rehearsals/tests can cross the gate; 1000 == reference.
    consis_gate_step: int = 1000
    # test phase: replace the reference's HD==dice placeholder
    # (`misc/utils.py:245`) with the genuine Hausdorff distance in the
    # middle matrix.  Off by default for CSV output parity.
    real_hd: bool = False

    def __post_init__(self):
        env_base = os.environ.get("SMSUT_DATA_ROOT")
        if env_base and not self.base_root:
            self.base_root = env_base
        env_expr = os.environ.get("SMSUT_EXPR_ROOT")
        if env_expr and not self.expr_root:
            self.expr_root = env_expr
        if not self.expr_root:
            self.expr_root = os.path.join(os.path.expanduser("~"), "smsut-out")

    @property
    def n_class(self) -> int:
        """Segmentation channels: background + n_label."""
        return self.n_label + 1

    @property
    def total_iters(self) -> int:
        return self.max_epoch * self.num_iter_per_epoch

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_default_config: Config = None


def get_config() -> Config:
    global _default_config
    if _default_config is None:
        _default_config = Config()
    return _default_config


def set_config(cfg: Config) -> None:
    global _default_config
    _default_config = cfg
