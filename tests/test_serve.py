# -*- coding: utf-8 -*-
"""Serving export (smsut_tpu/serve.py): the exported StableHLO artifact must
reproduce the live model's eval logits exactly, survive a disk round trip,
and be loadable without touching framework model code."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smsut_tpu.config import Config
from smsut_tpu.serve import export_eval, load_serving


def _algo(cfg):
    from smsut_tpu.train.steps.supervised import SupervisedUNet

    return SupervisedUNet(cfg)


def test_export_roundtrip_matches_live_model(tmp_path, rng):
    cfg = Config(input_size=32, base_width=4, batch_size=2,
                 compute_dtype="float32")
    algo = _algo(cfg)
    state = algo.init_state(jax.random.PRNGKey(0))
    params = algo.eval_params(state)
    out = str(tmp_path / "serving")
    path = export_eval(algo, params, cfg, out)
    assert os.path.exists(path)

    predict, manifest = load_serving(out)
    assert manifest["input"]["shape"] == [2, 32, 32, 1]
    assert manifest["n_class"] == cfg.n_class
    # the artifact must be multi-platform: exported on the TPU training
    # host, it still has to load on a CPU serving box
    assert manifest["platforms"] == ["cpu", "tpu"]

    img = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)
    want = np.asarray(algo.eval_fn(params, jnp.asarray(img)))
    got = np.asarray(predict(img))
    # the artifact is a separately compiled program: f32 reassociation only
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.999


def test_export_gan_takes_seg_head(tmp_path, rng):
    """GAN algorithms' eval returns (seg, tsl); the artifact serves seg."""
    from smsut_tpu.train.steps.gan import UGANConsisAlgo

    cfg = Config(input_size=32, base_width=4, batch_size=2,
                 compute_dtype="float32")
    algo = UGANConsisAlgo(cfg)
    state = algo.init_state(jax.random.PRNGKey(0))
    params = algo.eval_params(state)
    out = str(tmp_path / "serving")
    export_eval(algo, params, cfg, out)
    predict, manifest = load_serving(out)
    img = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)
    want = algo.eval_fn(params, jnp.asarray(img))
    want = np.asarray(want[0] if isinstance(want, tuple) else want)
    np.testing.assert_allclose(np.asarray(predict(img)), want,
                               rtol=1e-3, atol=5e-4)
    assert manifest["output"]["shape"][-1] == cfg.n_class
