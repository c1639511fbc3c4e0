# -*- coding: utf-8 -*-
"""Serving export: freeze a trained model's eval function into a portable
StableHLO artifact.

The reference's deployment story ends at torch ``.ckpt`` files that need the
full training code to run (`/root/reference/trainer/baseTrainer.py:113-123`).
Here `export_eval` bakes the parameters into a single serialized
``jax.export`` artifact (StableHLO): self-contained, loadable by any jax
runtime without this framework's model code, and compiled by XLA for
whatever device serves it (TPU/CPU).  A JSON manifest records the I/O
contract.

Input contract (matches the trainers' eval step): ``img`` float32
[B, input_size, input_size, 1], already ToTensor+Normalize(0.5, 0.5)
normalized to [-1, 1] (`baseLoader.py:107-108`).  Output: float32 seg
logits [B, H, W, n_class] (argmax -> label map).
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT = "model.stablehlo"
MANIFEST = "manifest.json"


def _seg_logits_fn(algo) -> Callable:
    """Normalize the zoo's eval_fn returns to bare seg logits (GAN
    algorithms return (seg, tsl) in val phase)."""

    def fn(params, img):
        out = algo.eval_fn(params, img)
        return out[0] if isinstance(out, tuple) else out

    return fn


def export_eval(algo, params: Any, cfg, out_dir: str,
                batch_size: int = 0,
                platforms: Tuple[str, ...] = ("cpu", "tpu")) -> str:
    """Serialize the eval function with ``params`` baked in as constants.

    Returns the artifact path.  ``batch_size`` defaults to cfg.batch_size
    (static shapes — TPU-friendly; export once per serving batch size).
    ``platforms`` makes the artifact multi-platform (default cpu+tpu) so a
    model exported on the TPU training host still loads on a CPU serving
    box — ``jax.export`` otherwise pins the artifact to the lowering
    backend and ``exp.call`` refuses to run anywhere else.
    """
    from jax import export as jexport

    bs = batch_size or cfg.batch_size
    hw = cfg.input_size
    fn = _seg_logits_fn(algo)
    params = jax.device_get(params)

    def serve(img):
        return fn(params, img)

    exp = jexport.export(jax.jit(serve), platforms=list(platforms))(
        jax.ShapeDtypeStruct((bs, hw, hw, cfg.img_channels), jnp.float32))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, ARTIFACT)
    with open(path, "wb") as f:
        f.write(exp.serialize())
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump({
            "artifact": ARTIFACT,
            "input": {"name": "img", "shape": [bs, hw, hw, cfg.img_channels],
                      "dtype": "float32",
                      "normalize": "(uint8/255 - 0.5) / 0.5"},
            "output": {"name": "seg_logits",
                       "shape": [bs, hw, hw, cfg.n_class],
                       "dtype": "float32", "postprocess": "argmax(-1)"},
            "n_class": cfg.n_class,
            "modalities": list(cfg.mod_type),
            "algo": type(algo).__name__,
            "platforms": list(platforms),
        }, f, indent=2)
    return path


def load_serving(out_dir: str) -> Tuple[Callable, dict]:
    """Load an exported artifact; returns (predict, manifest).

    ``predict(img_f32) -> seg logits`` — runs under jax.jit on whatever
    backend is active; no framework model code is touched."""
    from jax import export as jexport

    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    with open(os.path.join(out_dir, manifest["artifact"]), "rb") as f:
        exp = jexport.deserialize(f.read())

    def predict(img: np.ndarray):
        return exp.call(jnp.asarray(img, jnp.float32))

    return predict, manifest
