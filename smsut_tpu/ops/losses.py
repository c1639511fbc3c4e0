# -*- coding: utf-8 -*-
"""Pure-function loss library.

Re-derivations of `/root/reference/misc/loss.py`, `network/patchnce.py:6-51`
and the trainer-local losses, as jit-friendly JAX functions over NHWC logits.
All losses compute in float32.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def one_hot_last(labels: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def get_tp_fp_fn(probs: jax.Array, labels: jax.Array,
                 batch_dice: bool) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """tp/fp/fn reduced over spatial dims — and the batch dim when
    ``batch_dice`` (`misc/loss.py:23-36` with dims=(0,2,3) or (2,3), NHWC here).
    Returns arrays of shape [C] (batch_dice) or [B, C].

    fp/fn are derived from the marginal sums instead of two extra
    full-tensor products: sum(p*(1-g)) == sum(p) - tp and
    sum((1-p)*g) == sum(g) - tp — identical math, two fewer HBM passes
    over the [B,H,W,C] probability tensor."""
    gt = one_hot_last(labels, probs.shape[-1])
    dims = (0, 1, 2) if batch_dice else (1, 2)
    tp = jnp.sum(probs * gt, axis=dims)
    fp = jnp.sum(probs, axis=dims) - tp
    fn = jnp.sum(gt, axis=dims) - tp
    return tp, fp, fn


def soft_dice_loss(logits: jax.Array, labels: jax.Array, batch_dice: bool = True,
                   smooth: float = 1e-5) -> jax.Array:
    """SoftDiceLoss (`misc/loss.py:39-63`): softmax, tp/fp/fn reduction,
    background channel excluded, 1 - mean dice."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tp, fp, fn = get_tp_fp_fn(probs, labels, batch_dice)
    inter = 2.0 * tp + smooth
    union = 2.0 * tp + fp + fn + smooth
    dc = inter / (union + 1e-8)
    dc = dc[1:] if batch_dice else dc[:, 1:]
    return 1.0 - jnp.mean(dc)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       class_weights: Optional[jax.Array] = None,
                       reduce: bool = True) -> jax.Array:
    """nn.CrossEntropyLoss semantics over [B,H,W,C] logits / [B,H,W] int
    labels.  With ``class_weights`` the mean is weighted by the per-pixel
    class weight (torch weighted-CE normalization)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot multiply-sum instead of take_along_axis: a gather along the
    # minor (lane) axis serializes on TPU — profiled at 7.3ms/step on the
    # supervised U-Net vs ~0.2ms for the dense contraction (same math)
    gt = one_hot_last(labels, logits.shape[-1])
    nll = -jnp.sum(logp * gt, axis=-1)
    if class_weights is not None:
        w = gt @ jnp.asarray(class_weights, jnp.float32)
        if not reduce:
            return nll * w
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)
    if not reduce:
        return nll
    return jnp.mean(nll)


def dice_and_ce_loss(logits: jax.Array, labels: jax.Array, weight_dc: float = 0.5,
                     weight_ce: float = 0.5, batch_dice: bool = True) -> jax.Array:
    """DiceAndCrossEntropyLoss (`misc/loss.py:8-20`), built with
    batch_dice=True by every trainer (`trainer/baseTrainer.py:57`).

    When both weights are active the two losses share ONE stabilized
    softmax evaluation: probs = e/s and logp = (x-m) - log(s) both derive
    from the same (m = max, e = exp(x-m), s = sum e) — the separate
    jax.nn.softmax + jax.nn.log_softmax calls each re-reduced the
    [B,H,W,C] logits (same math; one fewer pass over the lane-padded
    C=n_class tensor)."""
    if weight_dc == 0 or weight_ce == 0:
        dc = soft_dice_loss(logits, labels, batch_dice) if weight_dc else 0.0
        ce = cross_entropy_loss(logits, labels) if weight_ce else 0.0
        return weight_dc * dc + weight_ce * ce
    x = logits.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / s
    gt = one_hot_last(labels, x.shape[-1])
    # dice on probs (`misc/loss.py:39-63` semantics)
    dims = (0, 1, 2) if batch_dice else (1, 2)
    tp = jnp.sum(probs * gt, axis=dims)
    fp = jnp.sum(probs, axis=dims) - tp
    fn = jnp.sum(gt, axis=dims) - tp
    inter = 2.0 * tp + 1e-5
    union = 2.0 * tp + fp + fn + 1e-5
    dcv = inter / (union + 1e-8)
    dcv = dcv[1:] if batch_dice else dcv[:, 1:]
    dc = 1.0 - jnp.mean(dcv)
    # CE from the same (m, s): logp = (x - m) - log(s)
    nll = -(jnp.sum(x * gt, axis=-1) - m[..., 0] - jnp.log(s[..., 0]))
    ce = jnp.mean(nll)
    return weight_dc * dc + weight_ce * ce


# --------------------------------------------------------------------------
# packed-space loss variants: per-pixel losses are invariant to the 2x2
# space-to-depth repacking, so they consume the network's PACKED logits
# [B,H',W',4C] (channel layout s*C + c; models/packed.py) directly — the
# full-grid depth_to_space unpack never materializes.  Profiled round 4:
# the unpacked [.,256,256,5] f32 loss fusions cost ~3 ms/step on
# meanTeacher.  Identical math (sums are permutation-invariant) —
# tests/test_losses.py packed-parity cases.
# --------------------------------------------------------------------------

def pack_labels(labels: jax.Array) -> jax.Array:
    """[B,2H,2W] int labels -> [B,H,W,4] matching space_to_depth's
    subpixel order (dy*2+dx)."""
    b, h2, w2 = labels.shape
    l = labels.reshape(b, h2 // 2, 2, w2 // 2, 2)
    return l.transpose(0, 1, 3, 2, 4).reshape(b, h2 // 2, w2 // 2, 4)


def _group_mats(c: int, dtype=jnp.float32):
    """G [4C,4]: lane s*C+i -> subpixel group s (0/1), and its transpose."""
    import numpy as np

    g = np.zeros((4 * c, 4), np.float32)
    for s in range(4):
        g[s * c:(s + 1) * c, s] = 1.0
    gm = jnp.asarray(g, dtype)
    return gm, gm.T


def _packed_group_softmax(x: jax.Array, c: int):
    """Grouped softmax over each subpixel's C lanes of [B,H,W,4C] f32.

    Each subpixel group is stabilized by ITS OWN max (a shared 4C-wide max
    underflows a whole group to 0/0=NaN when a neighbouring subpixel's max
    logit exceeds this group's logits by ~88 — the f32 exp range); the
    per-lane max rides the same [4,4C] 0/1 contraction as the group sums
    (exact: each lane selects exactly one max), so there are still no
    lane->sublane reshapes.  Returns (probs, logp), both [B,H,W,4C]."""
    gm, gmt = _group_mats(c)
    m4 = jnp.stack([jnp.max(x[..., s * c:(s + 1) * c], axis=-1)
                    for s in range(4)], axis=-1)  # [B,H,W,4] per-group max
    m = jax.lax.stop_gradient(m4) @ gmt           # tile back to lanes, exact
    e = jnp.exp(x - m)
    s4 = e @ gm                                   # [B,H,W,4] group sums
    denom = s4 @ gmt                              # broadcast back to lanes
    probs = e / denom
    logp = (x - m) - jnp.log(s4) @ gmt
    return probs, logp


def _packed_one_hot(labels4: jax.Array, c: int) -> jax.Array:
    """[B,H,W,4] int -> [B,H,W,4C] one-hot in the packed lane layout."""
    lab = jnp.repeat(labels4, c, axis=-1)                     # s-major
    lane_class = jnp.tile(jnp.arange(c, dtype=labels4.dtype), 4)
    return (lab == lane_class).astype(jnp.float32)


def argmax_packed(logits_p: jax.Array) -> jax.Array:
    """Per-subpixel-group argmax of packed logits: [B,H,W,4C] ->
    [B,H,W,4] int32 — equal to pack_labels(argmax(depth_to_space(x)))."""
    c = logits_p.shape[-1] // 4
    x = logits_p.astype(jnp.float32)
    parts = [jnp.argmax(x[..., s * c:(s + 1) * c], axis=-1)
             for s in range(4)]
    return jnp.stack(parts, axis=-1).astype(jnp.int32)


def dice_and_ce_loss_packed4(logits_p: jax.Array, labels4: jax.Array,
                             weight_dc: float = 0.5, weight_ce: float = 0.5
                             ) -> jax.Array:
    """`dice_and_ce_loss` (batch_dice=True) on PACKED logits with PACKED
    [B,H,W,4] labels (pack_labels / argmax_packed output)."""
    x = logits_p.astype(jnp.float32)
    c = x.shape[-1] // 4
    gt = _packed_one_hot(labels4, c)
    return _dice_ce_packed_core(x, gt, c, weight_dc, weight_ce)


def dice_and_ce_loss_packed(logits_p: jax.Array, labels: jax.Array,
                            weight_dc: float = 0.5, weight_ce: float = 0.5
                            ) -> jax.Array:
    """`dice_and_ce_loss` (batch_dice=True) on PACKED logits [B,H,W,4C]
    with UNPACKED [B,2H,2W] labels — exactly equal to running the unpacked
    loss on depth_to_space(logits_p)."""
    x = logits_p.astype(jnp.float32)
    c = x.shape[-1] // 4
    gt = _packed_one_hot(pack_labels(labels), c)
    return _dice_ce_packed_core(x, gt, c, weight_dc, weight_ce)


def _dice_ce_packed_core(x, gt, c, weight_dc, weight_ce):
    probs, logp = _packed_group_softmax(x, c)
    # per-lane sums over (B,H,W) -> fold the 4 subpixel groups per class
    tp4 = jnp.sum(probs * gt, axis=(0, 1, 2))
    p4 = jnp.sum(probs, axis=(0, 1, 2))
    g4 = jnp.sum(gt, axis=(0, 1, 2))
    tp = tp4.reshape(4, c).sum(0)
    fp = p4.reshape(4, c).sum(0) - tp
    fn = g4.reshape(4, c).sum(0) - tp
    inter = 2.0 * tp + 1e-5
    union = 2.0 * tp + fp + fn + 1e-5
    dc = 1.0 - jnp.mean((inter / (union + 1e-8))[1:])
    n = x.shape[0] * x.shape[1] * x.shape[2] * 4
    ce = -jnp.sum(logp * gt) / n
    return weight_dc * dc + weight_ce * ce


def softmax_mse_consistency_packed(student_p: jax.Array,
                                   teacher_p: jax.Array) -> jax.Array:
    """`softmax_mse_consistency` on packed logits — same element set, same
    mean."""
    c = student_p.shape[-1] // 4
    ps, _ = _packed_group_softmax(student_p.astype(jnp.float32), c)
    pt, _ = _packed_group_softmax(
        jax.lax.stop_gradient(teacher_p.astype(jnp.float32)), c)
    return jnp.mean(jnp.square(ps - pt))


def softmax_mse_consistency(student_logits: jax.Array,
                            teacher_logits: jax.Array) -> jax.Array:
    """Mean-teacher consistency: MSE between softmaxes
    (`trainer/meanTeacherTrainer.py:129-130`)."""
    ps = jax.nn.softmax(student_logits.astype(jnp.float32), axis=-1)
    pt = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.square(ps - pt))


def argmax_consistency_loss(source_logits: jax.Array, target_logits: jax.Array,
                            weight_dc: float = 0.5, weight_ce: float = 0.5) -> jax.Array:
    """SMSUT consistency: Dice+CE of source vs argmax(target)
    (`trainer/uganConsisTrainer.py:45-53`)."""
    target = jnp.argmax(target_logits.astype(jnp.float32), axis=-1)
    target = jax.lax.stop_gradient(target)
    return dice_and_ce_loss(source_logits, target, weight_dc, weight_ce, batch_dice=True)


def patch_nce_loss(feat_q: jax.Array, feat_k: jax.Array, n_bmm: int,
                   temperature: float = 0.07) -> jax.Array:
    """PatchNCELoss (`network/patchnce.py:13-51`).

    ``feat_q``/``feat_k``: [B*P, C] L2-normalized pools; ``feat_k`` is
    detached.  Negatives are formed within groups of ``n_bmm`` — the
    reference constructs the loss with cfg.batch_size even when the pool
    comes from a 2x batch, mixing patches of two images per group; that
    behaviour is kept (`trainer/uganShp0Trainer.py:59`).
    Returns the per-patch loss vector [B*P] (reduction='none').
    """
    feat_q = feat_q.astype(jnp.float32)
    feat_k = jax.lax.stop_gradient(feat_k.astype(jnp.float32))
    n, dim = feat_q.shape
    l_pos = jnp.sum(feat_q * feat_k, axis=1, keepdims=True)          # [N,1]

    q = feat_q.reshape(n_bmm, -1, dim)
    k = feat_k.reshape(n_bmm, -1, dim)
    npatches = q.shape[1]
    l_neg = jnp.einsum("bpc,bqc->bpq", q, k, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(npatches, dtype=bool)[None]
    l_neg = jnp.where(eye, -10.0, l_neg).reshape(-1, npatches)       # [N,P]

    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    logp = jax.nn.log_softmax(logits, axis=1)
    return -logp[:, 0]


def nce_loss_over_layers(feat_x_pools: Sequence[jax.Array],
                         feat_f_pools: Sequence[jax.Array], n_bmm: int,
                         temperature: float = 0.07) -> jax.Array:
    """Average PatchNCE over nce layers (`trainer/uganConsisTrainer.py:55-64`);
    query = reconstruction-pass features, key = translate-pass features."""
    total = 0.0
    for f_x, f_f in zip(feat_x_pools, feat_f_pools):
        total += jnp.mean(patch_nce_loss(f_f, f_x, n_bmm, temperature))
    return total / len(feat_x_pools)


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def softmax_ce_with_logits(logits: jax.Array, target_index: jax.Array) -> jax.Array:
    """CE over [B, C] classifier logits (discriminator modality head)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    gt = one_hot_last(target_index, logits.shape[-1])
    return -jnp.mean(jnp.sum(logp * gt, axis=-1))
