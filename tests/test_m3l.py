# -*- coding: utf-8 -*-
"""SegFormer-lite + M3L masked-consistency tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.models.segformer import LinearFusionMaskedConsistencyMixBatch
from smsut_tpu.train.steps.m3l import M3L, soft_cross_entropy

CFG = Config(input_size=32, batch_size=2, compute_dtype="float32")


def test_segformer_shapes():
    net = LinearFusionMaskedConsistencyMixBatch(num_classes=5)
    x = jnp.zeros((2, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert y.shape == (2, 32, 32, 5)
    assert y.dtype == jnp.float32


def test_segformer_masking_changes_only_masked_range(rng):
    """At the backbone level (before the decoder's cross-sample batch norm)
    samples outside range_batches_to_mask must be untouched."""
    from smsut_tpu.models.segformer import MixVisionTransformer

    net = MixVisionTransformer()
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)

    hs = 32 // 4
    grid = jnp.ones((4, hs, hs), jnp.float32)
    in_range = (jnp.arange(4) >= 2).astype(jnp.float32)
    mask_map = grid * in_range[:, None, None]

    clean = net.apply(params, x)
    masked = net.apply(params, x, mask_map)
    for fc, fm in zip(clean, masked):
        np.testing.assert_allclose(np.asarray(fc[:2]), np.asarray(fm[:2]),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(fc[2:]), np.asarray(fm[2:]))


def test_soft_cross_entropy_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    probs = rng.random((2, 5, 8, 8)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(probs)).item()
    got = soft_cross_entropy(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                             jnp.asarray(probs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(got), want, rtol=1e-5, atol=1e-6)


def test_m3l_step(rng):
    algo = M3L(CFG)
    state = algo.init_state(jax.random.PRNGKey(0))
    batch = {
        "img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
        "msk": jnp.asarray(rng.integers(0, 5, size=(2, 32, 32)).astype(np.int32)),
        "mdl": jnp.zeros((2,), jnp.int32),
        "ul_img": jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32)),
        "ul_mdl": jnp.zeros((2,), jnp.int32),
    }
    scalars = dict(algo.epoch_scalars(0), rng=jax.random.PRNGKey(2))
    state, m = algo.train_step(state, batch, scalars)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["semi_loss"]))
    assert int(state.step) == 1
    seg = algo.eval_fn(algo.eval_params(state),
                       jnp.zeros((2, 32, 32, 1)))
    assert seg.shape == (2, 32, 32, 5)
