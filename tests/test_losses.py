# -*- coding: utf-8 -*-
"""Loss parity tests against torch re-derivations of the reference semantics
(`/root/reference/misc/loss.py`, `network/patchnce.py`)."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from smsut_tpu.ops import losses


def _torch_soft_dice(logits, labels, batch_dice=True, smooth=1e-5):
    # reference SoftDiceLoss semantics (misc/loss.py:39-63), NCHW
    x = F.softmax(logits, dim=1)
    gt = torch.zeros_like(x)
    gt.scatter_(1, labels.unsqueeze(1), 1)
    dims = (0, 2, 3) if batch_dice else (2, 3)
    tp = torch.sum(x * gt, dim=dims)
    fp = torch.sum(x * (1 - gt), dim=dims)
    fn = torch.sum((1 - x) * gt, dim=dims)
    dc = (2 * tp + smooth) / (2 * tp + fp + fn + smooth + 1e-8)
    dc = dc[1:] if batch_dice else dc[:, 1:]
    return (1 - dc.mean()).item()


@pytest.mark.parametrize("batch_dice", [True, False])
def test_soft_dice_matches_torch(rng, batch_dice):
    logits = rng.normal(size=(4, 5, 16, 16)).astype(np.float32)
    labels = rng.integers(0, 5, size=(4, 16, 16))
    want = _torch_soft_dice(torch.tensor(logits), torch.tensor(labels), batch_dice)
    got = losses.soft_dice_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                                jnp.asarray(labels), batch_dice)
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(4, 5, 16, 16)).astype(np.float32)
    labels = rng.integers(0, 5, size=(4, 16, 16))
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels)).item()
    got = losses.cross_entropy_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                                    jnp.asarray(labels))
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_weighted_cross_entropy_matches_torch(rng):
    # CoraNet uses per-class CE weights (coraNetTrainer.py:44-58)
    w = np.array([1.0, 5.0, 5.0, 5.0, 5.0], np.float32)
    logits = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 8, 8))
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                           weight=torch.tensor(w)).item()
    got = losses.cross_entropy_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                                    jnp.asarray(labels), class_weights=jnp.asarray(w))
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_dice_and_ce_combination(rng):
    logits = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 8, 8))
    jl = jnp.asarray(logits.transpose(0, 2, 3, 1))
    jlab = jnp.asarray(labels)
    combined = losses.dice_and_ce_loss(jl, jlab, 0.5, 0.5)
    parts = 0.5 * losses.soft_dice_loss(jl, jlab) + 0.5 * losses.cross_entropy_loss(jl, jlab)
    np.testing.assert_allclose(float(combined), float(parts), rtol=1e-6)


def _torch_patch_nce(feat_q, feat_k, n_bmm, t=0.07):
    # reference PatchNCELoss (network/patchnce.py:13-51)
    feat_k = feat_k.detach()
    bs, dim = feat_q.shape
    l_pos = torch.bmm(feat_q.view(bs, 1, -1), feat_k.view(bs, -1, 1)).view(bs, 1)
    q = feat_q.view(n_bmm, -1, dim)
    k = feat_k.view(n_bmm, -1, dim)
    npatches = q.size(1)
    l_neg = torch.bmm(q, k.transpose(2, 1))
    diag = torch.eye(npatches, dtype=torch.bool)[None]
    l_neg.masked_fill_(diag, -10.0)
    l_neg = l_neg.view(-1, npatches)
    out = torch.cat((l_pos, l_neg), dim=1) / t
    return F.cross_entropy(out, torch.zeros(out.size(0), dtype=torch.long),
                           reduction="none")


def test_patch_nce_matches_torch(rng):
    n_bmm, patches, dim = 4, 16, 32
    q = rng.normal(size=(n_bmm * patches, dim)).astype(np.float32)
    k = rng.normal(size=(n_bmm * patches, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k /= np.linalg.norm(k, axis=1, keepdims=True)
    want = _torch_patch_nce(torch.tensor(q), torch.tensor(k), n_bmm).numpy()
    got = np.asarray(losses.patch_nce_loss(jnp.asarray(q), jnp.asarray(k), n_bmm))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_patch_nce_mixed_group_quirk(rng):
    """uganConsis feeds a 2x batch pool into a loss built with cfg.batch_size;
    groups then mix two images' patches — kept behaviour."""
    q = rng.normal(size=(8 * 16, 8)).astype(np.float32)
    k = rng.normal(size=(8 * 16, 8)).astype(np.float32)
    want = _torch_patch_nce(torch.tensor(q), torch.tensor(k), 4).numpy()
    got = np.asarray(losses.patch_nce_loss(jnp.asarray(q), jnp.asarray(k), 4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_softmax_mse_consistency(rng):
    s = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    t = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    want = torch.mean((F.softmax(torch.tensor(s), 1) - F.softmax(torch.tensor(t), 1)) ** 2).item()
    got = losses.softmax_mse_consistency(jnp.asarray(s.transpose(0, 2, 3, 1)),
                                         jnp.asarray(t.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-7)


def test_argmax_consistency_is_dice_ce_vs_argmax(rng):
    src = rng.normal(size=(2, 5, 8, 8)).astype(np.float32).transpose(0, 2, 3, 1)
    tgt = rng.normal(size=(2, 5, 8, 8)).astype(np.float32).transpose(0, 2, 3, 1)
    got = losses.argmax_consistency_loss(jnp.asarray(src), jnp.asarray(tgt))
    want = losses.dice_and_ce_loss(jnp.asarray(src), jnp.argmax(jnp.asarray(tgt), -1))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_classifier_ce(rng):
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    target = rng.integers(0, 4, size=(8,))
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(target)).item()
    got = losses.softmax_ce_with_logits(jnp.asarray(logits), jnp.asarray(target))
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


class TestPackedLossParity:
    """Packed-space loss variants == unpacked losses on the
    depth_to_space'd logits — values AND gradients (round 4; the packed
    tail avoids the full-grid unpack materializations)."""

    def _mk(self, rng, b=2, h=8, w=8, c=5):
        from smsut_tpu.models.packed import depth_to_space

        lp = jnp.asarray(rng.normal(size=(b, h, w, 4 * c))
                         .astype(np.float32))
        labels = jnp.asarray(rng.integers(0, c, size=(b, 2 * h, 2 * w))
                             .astype(np.int32))
        return lp, depth_to_space(lp, c), labels

    def test_dice_ce_packed_matches(self, rng):
        import jax
        from smsut_tpu.models.packed import depth_to_space

        lp, lu, labels = self._mk(rng)

        def f_p(x):
            return losses.dice_and_ce_loss_packed(x, labels)

        def f_u(x):
            return losses.dice_and_ce_loss(depth_to_space(x, 5), labels,
                                           batch_dice=True)

        vp, gp = jax.value_and_grad(f_p)(lp)
        vu, gu = jax.value_and_grad(f_u)(lp)
        np.testing.assert_allclose(float(vp), float(vu), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gu),
                                   rtol=1e-4, atol=1e-7)

    def test_mse_consistency_packed_matches(self, rng):
        import jax
        from smsut_tpu.models.packed import depth_to_space

        sp, su, _ = self._mk(rng)
        tp_, tu, _ = self._mk(np.random.default_rng(7))

        def f_p(x):
            return losses.softmax_mse_consistency_packed(x, tp_)

        def f_u(x):
            return losses.softmax_mse_consistency(depth_to_space(x, 5), tu)

        vp, gp = jax.value_and_grad(f_p)(sp)
        vu, gu = jax.value_and_grad(f_u)(sp)
        np.testing.assert_allclose(float(vp), float(vu), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gu),
                                   rtol=1e-4, atol=1e-8)

    def test_extreme_logit_no_nan(self, rng):
        """Regression (round-5 ADVICE): a shared 4C-wide softmax max
        underflowed a neighbouring subpixel group's exp-sum to 0 (0/0 =
        NaN loss AND grads) once any logit led another group's by ~88+.
        The per-group max must keep value and grad finite AND still equal
        the unpacked loss."""
        import jax
        from smsut_tpu.models.packed import depth_to_space

        lp, _, labels = self._mk(rng)
        lp = lp.at[0, 0, 0, 2].set(500.0)   # group 0 dominates groups 1-3

        def f_p(x):
            return losses.dice_and_ce_loss_packed(x, labels)

        vp, gp = jax.value_and_grad(f_p)(lp)
        assert np.isfinite(float(vp)) and np.all(np.isfinite(np.asarray(gp)))
        vu = losses.dice_and_ce_loss(depth_to_space(lp, 5), labels,
                                     batch_dice=True)
        np.testing.assert_allclose(float(vp), float(vu), rtol=1e-6)
        mse = losses.softmax_mse_consistency_packed(lp, lp * 0.5)
        assert np.isfinite(float(mse))

    def test_pack_labels_matches_space_to_depth(self, rng):
        from smsut_tpu.models.packed import space_to_depth

        labels = jnp.asarray(rng.integers(0, 5, size=(2, 16, 16))
                             .astype(np.int32))
        want = space_to_depth(labels[..., None].astype(jnp.float32))
        got = losses.pack_labels(labels).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
