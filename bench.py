#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Benchmark: training throughput with a FLOPs/MFU sanity check.

Measures the jitted SMSUT-TPU train step at the reference's training
configuration (batch 8, 256x256x1, base_width 16 — `/root/reference/
config.py:29-56`) and compares against a reference-faithful PyTorch
implementation of the same model/step executed on this host's CPU (the
reference repo publishes no GPU numbers — BASELINE.md).  ``vs_baseline`` is
therefore TPU-vs-torch-CPU on identical shapes.

Every mode reports the XLA-compiled cost of the exact step being timed
(`lowered.compile().cost_analysis()`) and the implied model-flops
utilisation against the chip's declared bf16 peak.  A reading above 100%
of peak is by construction a harness bug, and the harness refuses to
print one silently (it sets ``"suspect": true``).

Timing protocol: steps are chained through the donated train state (each
dispatch depends on the previous state, so the device serializes them) and
the clock is stopped by fetching a checksum of the *entire* final state to
the host — not just the last loss, whose value is ready before the final
backward/update finishes.  The per-step time is taken as the difference
between a 2N-step and an N-step run, which cancels the fixed
sync/tunnel-roundtrip overhead that inflated round-1's large-batch numbers
(BASELINE.md round-1 caveat; VERDICT round 1, "What's weak" #1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

ALL_MODELS = ("unet", "meanTeacher", "crossPse", "coraNet", "coraNetSemi",
              "M3L", "ugan", "uganShp0", "uganConsis")

# Declared bf16 peak (dense matmul) per chip, FLOP/s.  Sources: public TPU
# spec sheets (v5e 197 TFLOP/s bf16; v4 275; v5p 459; v6e 918).
_PEAKS = (
    ("TPU v5 lite", 197e12),
    ("TPU v5p", 459e12),
    ("TPU v5", 459e12),
    ("TPU v4", 275e12),
    ("TPU v6 lite", 918e12),
    ("TPU v6", 918e12),
    ("TPU v7", 2307e12),
)


def chip_peak():
    import jax

    kind = jax.devices()[0].device_kind
    for prefix, peak in _PEAKS:
        if kind.startswith(prefix):
            return peak, kind
    return 0.0, kind  # CPU / unknown: MFU not defined


_CFG_OVERRIDES: dict = {}


def make_algo(model: str, cfg, batch_override: int = 0):
    """Build (algo, state, batch, scalars) for any algorithm in the zoo."""
    import jax
    import jax.numpy as jnp

    if _CFG_OVERRIDES:
        cfg = cfg.replace(**_CFG_OVERRIDES)
    if batch_override:
        cfg = cfg.replace(batch_size=batch_override)
    bs, hw = cfg.batch_size, cfg.input_size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(bs, hw, hw, 1)).astype(np.float32))
    msk = jnp.asarray(rng.integers(0, cfg.n_class, size=(bs, hw, hw))
                      .astype(np.int32))
    mdl = jnp.asarray(rng.integers(0, len(cfg.mod_type), size=(bs,))
                      .astype(np.int32))

    if model == "unet":
        from smsut_tpu.train.steps.supervised import SupervisedUNet

        algo = SupervisedUNet(cfg)
        batch = {"img": img, "msk": msk}
    elif model == "meanTeacher":
        from smsut_tpu.train.steps.mean_teacher import MeanTeacher

        algo = MeanTeacher(cfg)
        batch = {"img": img, "msk": msk, "ul_img": img}
    elif model == "crossPse":
        from smsut_tpu.train.steps.cross_pseudo import CrossPseudo

        algo = CrossPseudo(cfg)
        batch = {"img": img, "msk": msk, "ul_img": img}
    elif model in ("coraNet", "coraNetSemi"):
        from smsut_tpu.train.steps.coranet import CoraNet

        algo = CoraNet(cfg, stage="pre" if model == "coraNet" else "cora")
        batch = {"img": img, "msk": msk}
        if model == "coraNetSemi":
            batch.update(pse_img=img, pse_lab=msk,
                         pse_mask=(msk > 0).astype(jnp.int32))
    elif model == "M3L":
        from smsut_tpu.train.steps.m3l import M3L

        algo = M3L(cfg)
        batch = {"img": img, "msk": msk, "ul_img": img}
    elif model in ("ugan", "uganShp0", "uganConsis"):
        from smsut_tpu.train.steps import gan

        cls = {"ugan": gan.UGANTrainerAlgo, "uganShp0": gan.UGANShp0Algo,
               "uganConsis": gan.UGANConsisAlgo}[model]
        algo = cls(cfg)
        batch = {"img": img, "msk": msk, "mdl": mdl,
                 "ul_img": img, "ul_mdl": mdl}
    else:
        raise SystemExit(f"unknown model {model!r} (choose from {ALL_MODELS})")

    scalars = dict(algo.epoch_scalars(1))
    scalars["rng"] = jax.random.PRNGKey(1)
    state = algo.init_state(jax.random.PRNGKey(0))
    return algo, state, batch, scalars


def step_flops(algo, state, batch, scalars) -> float:
    """XLA-reported FLOP cost of one compiled train step."""
    import jax

    try:
        lowered = jax.jit(algo._train_step_impl, donate_argnums=(0,)).lower(
            state, batch, scalars)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):   # older jax returns [dict]
            cost = cost[0] if cost else {}
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def model_math_flops(model: str, cfg, batch_override: int = 0) -> float:
    """FLOPs of the SAME step compiled with pack_levels=0 — i.e. the model
    math without the packed kernels' structured zeros (VERDICT r2 #2: the
    headline TFLOP/s must not flatter the padded program).  Returns 0.0 when
    the effective config is already unpacked (executed == model math)."""
    global _CFG_OVERRIDES
    eff = cfg.replace(**_CFG_OVERRIDES) if _CFG_OVERRIDES else cfg
    if not getattr(eff, "pack_levels", 0):
        return 0.0
    saved = dict(_CFG_OVERRIDES)
    _CFG_OVERRIDES = dict(saved, pack_levels=0)
    try:
        algo0, st0, b0, sc0 = make_algo(model, cfg, batch_override)
        return step_flops(algo0, st0, b0, sc0)
    finally:
        _CFG_OVERRIDES = saved


def _flops_fields(flops: float, mflops: float, sec: float, peak: float) -> dict:
    """Executed and model-math FLOPs/throughput/MFU rows."""
    out = {
        "flops_per_step": flops,
        "tflops_per_sec": flops / sec / 1e12,
        "mfu": (flops / sec / peak) if peak else 0.0,
    }
    mf = mflops or flops
    out["model_flops_per_step"] = mf
    out["model_tflops_per_sec"] = mf / sec / 1e12
    out["model_mfu"] = (mf / sec / peak) if peak else 0.0
    return out


def _make_checksum():
    """A tiny jit that folds every array leaf of (state, metrics) into one
    scalar — fetching its value to the host forces the whole step chain,
    including the last parameter update (a bare ``loss`` fetch does not)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def cksum(tree):
        tot = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.inexact):
                # a real value-dependent reduction — XLA must wait for the leaf
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    return cksum


def time_step(step, state, batch, scalars, iters: int):
    """Per-step seconds via a 2-point fit: run N and 2N chained steps, each
    ended by a host fetch of a full-state checksum; the difference cancels
    the constant sync/roundtrip cost.  Returns (sec_per_step, final_state)."""
    import jax

    cksum = _make_checksum()

    # warmup / compile
    st = state
    for _ in range(3):
        st, metrics = step(st, batch, scalars)
    float(jax.device_get(cksum((st, metrics))))

    def timed(n, st):
        tic = time.perf_counter()
        for _ in range(n):
            st, metrics = step(st, batch, scalars)
        float(jax.device_get(cksum((st, metrics))))
        return time.perf_counter() - tic, st

    t1, st = timed(iters, st)
    t2, st = timed(2 * iters, st)
    sec = max((t2 - t1) / iters, 1e-9)
    # If the 2-point fit is degenerate (host noise made t2 < t1), fall back
    # to the longer run's amortized time — still fully synced.
    if t2 <= t1:
        sec = t2 / (2 * iters)
    return sec, st


def bench_jax(model: str, iters: int = 30, use_pallas: bool = False,
              batch: int = 0) -> dict:
    import jax

    from smsut_tpu.config import Config

    cfg = Config(use_pallas=use_pallas)
    algo, state, batch_d, scalars = make_algo(model, cfg, batch)
    # slices/s counts the LABELED batch actually in the compiled program
    # (--set batch_size overrides must be reflected — round-3 fix)
    bs = batch or _CFG_OVERRIDES.get("batch_size", cfg.batch_size)
    flops = step_flops(algo, state, batch_d, scalars)
    mflops = model_math_flops(model, cfg, batch)

    sec, _ = time_step(algo.train_step, state, batch_d, scalars, iters)
    peak, kind = chip_peak()
    out = {
        "slices_per_sec": bs / sec,
        "ms_per_step": sec * 1e3,
        "device": kind,
    }
    out.update(_flops_fields(flops, mflops, sec, peak))
    out["suspect"] = bool(peak and out["mfu"] > 1.0)
    return out


def bench_jax_scan(model: str, iters: int = 50, use_pallas: bool = False,
                   batch: int = 0) -> dict:
    """Device-only cross-check: `iters` steps chained with lax.scan inside a
    single jit — one dispatch, zero per-step host involvement."""
    import jax

    from smsut_tpu.config import Config

    cfg = Config(use_pallas=use_pallas)
    algo, state, batch_d, scalars = make_algo(model, cfg, batch)
    # slices/s counts the LABELED batch actually in the compiled program
    # (--set batch_size overrides must be reflected — round-3 fix)
    bs = batch or _CFG_OVERRIDES.get("batch_size", cfg.batch_size)
    flops = step_flops(algo, state, batch_d, scalars)
    mflops = model_math_flops(model, cfg, batch)

    @jax.jit
    def run(state):
        def body(s, _):
            s2, m = algo._train_step_impl(s, batch_d, scalars)
            return s2, m["loss"]

        return jax.lax.scan(body, state, None, length=iters)

    cksum = _make_checksum()
    st, losses = run(state)            # compile + warm
    float(jax.device_get(cksum((st, losses))))
    tic = time.perf_counter()
    st, losses = run(st)
    float(jax.device_get(cksum((st, losses))))
    sec = (time.perf_counter() - tic) / iters
    peak, kind = chip_peak()
    out = {
        "slices_per_sec": bs / sec,
        "ms_per_step": sec * 1e3,
        "device": kind,
    }
    out.update(_flops_fields(flops, mflops, sec, peak))
    out["suspect"] = bool(peak and out["mfu"] > 1.0)
    return out


def bench_torch_cpu(iters: int = 2, warmup: int = 1) -> float:
    """Reference-equivalent supervised step in torch on CPU: residual U-Net
    (width 16, instance norm, lrelu), Dice+CE, SGD(momentum) — built from the
    spec in SURVEY.md §2.4, not copied."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.set_num_threads(max(1, __import__("os").cpu_count() - 2))

    class Block(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
            self.n1 = nn.InstanceNorm2d(cout, affine=True)
            self.c2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
            self.n2 = nn.InstanceNorm2d(cout, affine=True)
            self.sc = (nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                                     nn.InstanceNorm2d(cout, affine=True))
                       if cin != cout else nn.Identity())
            self.act = nn.LeakyReLU(0.01)

        def forward(self, x):
            y = self.act(self.n1(self.c1(x)))
            y = self.n2(self.c2(y))
            return self.act(y + self.sc(x))

    class UNet(nn.Module):
        def __init__(self, w=16, out_ch=5):
            super().__init__()
            self.pre = nn.Sequential(nn.Conv2d(1, w // 2, 5, padding=2, bias=False),
                                     nn.InstanceNorm2d(w // 2, affine=True),
                                     nn.LeakyReLU(0.01))
            self.enc = nn.ModuleList([Block(w // 2, w), Block(w, 2 * w),
                                      Block(2 * w, 4 * w), Block(4 * w, 8 * w)])
            self.bott = Block(8 * w, 16 * w)
            self.ups = nn.ModuleList([
                nn.ConvTranspose2d(16 * w, 8 * w, 2, 2, bias=False),
                nn.ConvTranspose2d(8 * w, 4 * w, 2, 2, bias=False),
                nn.ConvTranspose2d(4 * w, 2 * w, 2, 2, bias=False),
                nn.ConvTranspose2d(2 * w, w, 2, 2, bias=False)])
            self.dec = nn.ModuleList([Block(16 * w, 8 * w), Block(8 * w, 4 * w),
                                      Block(4 * w, 2 * w), Block(2 * w, w)])
            self.fc = nn.Conv2d(w, out_ch, 1, bias=False)

        def forward(self, x):
            x = self.pre(x)
            skips = []
            for blk in self.enc:
                x = blk(x)
                skips.append(x)
                x = F.max_pool2d(x, 2)
            x = self.bott(x)
            for up, blk, sk in zip(self.ups, self.dec, reversed(skips)):
                x = blk(torch.cat([up(x), sk], 1))
            return self.fc(x)

    net = UNet()
    opt = torch.optim.SGD(net.parameters(), lr=1e-2, momentum=0.9,
                          weight_decay=1e-3)
    rng = np.random.default_rng(0)
    img = torch.tensor(rng.normal(size=(8, 1, 256, 256)).astype(np.float32))
    msk = torch.tensor(rng.integers(0, 5, size=(8, 256, 256)))

    def dice_ce(logits, labels):
        probs = F.softmax(logits, 1)
        gt = torch.zeros_like(probs).scatter_(1, labels.unsqueeze(1), 1)
        tp = (probs * gt).sum((0, 2, 3))
        fp = (probs * (1 - gt)).sum((0, 2, 3))
        fn = ((1 - probs) * gt).sum((0, 2, 3))
        dc = ((2 * tp + 1e-5) / (2 * tp + fp + fn + 1e-5 + 1e-8))[1:]
        return 0.5 * (1 - dc.mean()) + 0.5 * F.cross_entropy(logits, labels)

    def one_iter():
        opt.zero_grad()
        loss = dice_ce(net(img), msk)
        loss.backward()
        opt.step()

    for _ in range(warmup):
        one_iter()
    tic = time.perf_counter()
    for _ in range(iters):
        one_iter()
    dt = time.perf_counter() - tic
    return iters * 8 / dt


def bench_pipeline(device_augment: bool, iters: int = 30) -> dict:
    """Full input pipeline + train step on synthetic 256^2 data, mirroring
    the production loop (`train/loop.py fit`): persistent producer thread,
    producer-side augment-param sampling and device staging
    (cfg.prefetch_device), fused augment+step dispatch."""
    import random
    import tempfile

    import jax

    from smsut_tpu.config import Config
    from smsut_tpu.data.dataset import Batch, get_loader
    from smsut_tpu.data.synthetic import make_synthetic_dataset
    from smsut_tpu.train.steps.supervised import SupervisedUNet

    root = tempfile.mkdtemp(prefix="smsut-bench-")
    make_synthetic_dataset(root, n_patients_per_modality=3, n_slice=8, size=256)
    cfg = Config(base_root=root, device_augment=device_augment)
    if _CFG_OVERRIDES:  # --no-pack / --set apply to pipeline mode too
        cfg = cfg.replace(**_CFG_OVERRIDES)
    # chunked dispatch drains T batches at once — keep the producer ahead
    cfg = cfg.replace(prefetch_depth=max(cfg.prefetch_depth,
                                         2 * int(cfg.steps_per_dispatch)))
    algo = SupervisedUNet(cfg)
    state = algo.init_state(jax.random.PRNGKey(0))

    rng = random.Random(0)
    loader = get_loader(root, "train", 0, cfg.batch_size, cfg.data_aug, cfg=cfg,
                        rng=rng, raw=device_augment)
    fused = None
    T = 1
    if device_augment:
        from smsut_tpu.data.device_augment import DeviceAugment
        from smsut_tpu.train.loop import make_fused_chunk, make_fused_step

        da = DeviceAugment(cfg, random.Random(1))
        T = max(1, int(cfg.steps_per_dispatch))
        stage = bool(cfg.prefetch_device) and T == 1

        def post(b):
            h, w = b.img.shape[1:3]
            params = da.sample_params_packed(b.batch_size, h, w)
            if stage:
                b = Batch(jax.device_put(b.img), jax.device_put(b.msk),
                          b.mdl, b.names)
                params = jax.device_put(params)
            return (b, params)

        loader.post = post
        fused = (make_fused_chunk(algo, da, T) if T > 1
                 else make_fused_step(algo, da))

    it = loader.iter_cycle()
    scalars = {"rng": (np.zeros((T, 2), np.uint32) if T > 1
                       else np.zeros(2, np.uint32))}
    extra: dict = {}

    def one():
        if fused is not None and T > 1:
            items = [next(it) for _ in range(T)]
            args = [jax.device_put(np.stack([b.img for b, _ in items])),
                    jax.device_put(np.stack([b.msk for b, _ in items])),
                    jax.device_put(np.stack([b.mdl for b, _ in items])),
                    jax.device_put(np.stack([p for _, p in items]))]
            return fused(state_holder[0], *args, scalars)
        if fused is not None:
            b, params = next(it)
            return fused(state_holder[0], b.img, b.msk, b.mdl, params,
                         extra, scalars)
        b = next(it)
        return algo.train_step(state_holder[0], {"img": b.img, "msk": b.msk,
                                                 "mdl": b.mdl}, scalars)

    cksum = _make_checksum()
    state_holder = [state]
    for _ in range(3):
        state_holder[0], m = one()
    float(jax.device_get(cksum((state_holder[0], m))))
    tic = time.perf_counter()
    for _ in range(iters):
        state_holder[0], m = one()
    float(jax.device_get(cksum((state_holder[0], m))))
    sec = (time.perf_counter() - tic) / (iters * T)
    peak, kind = chip_peak()
    # bare-step cost for MFU context (the augment warp's flops are not
    # included, so the pipeline MFU is a slight lower bound)
    _, fstate, fbatch, fscalars = make_algo("unet", cfg)
    sflops = step_flops(algo, fstate, fbatch, fscalars)
    mfu = (sflops / sec / peak) if peak and sflops else 0.0
    return {"slices_per_sec": cfg.batch_size / sec, "ms_per_step": sec * 1e3,
            "flops_per_step": sflops, "tflops_per_sec": sflops / sec / 1e12,
            "mfu": mfu, "device": kind, "suspect": bool(peak and mfu > 1.0)}


def bench_eval(eval_scan: bool, repeats: int = 3) -> dict:
    """Eval-epoch wall time (validate_epoch over the synthetic 256^2 test
    set): the whole-sweep scan path vs the per-batch dispatch path."""
    import tempfile

    from smsut_tpu.config import Config
    from smsut_tpu.data.dataset import get_label_npys, get_loader
    from smsut_tpu.data.synthetic import make_synthetic_dataset
    from smsut_tpu.train.loop import Trainer
    from smsut_tpu.train.steps.supervised import SupervisedUNet

    root = tempfile.mkdtemp(prefix="smsut-bench-eval-")
    make_synthetic_dataset(root, n_patients_per_modality=6, n_slice=16,
                           size=256)
    cfg = Config(base_root=root, expr_root=tempfile.mkdtemp(
        prefix="smsut-bench-expr-"), eval_scan=eval_scan)
    if _CFG_OVERRIDES:
        cfg = cfg.replace(**_CFG_OVERRIDES)
    algo = SupervisedUNet(cfg)
    trainer = Trainer(algo, cfg, "test")
    loader = get_loader(root, "test", 0, cfg.batch_size, cfg=cfg)
    n_gt, gt_npys = get_label_npys(root, "test", cfg.split_yaml)

    n, _ = trainer.validate_epoch(loader, gt_npys, None)   # compile + stack
    assert n == n_gt
    tic = time.perf_counter()
    for _ in range(repeats):
        trainer.validate_epoch(loader, gt_npys, None)
    sec = (time.perf_counter() - tic) / repeats
    _, kind = chip_peak()
    return {"slices_per_sec": n_gt / sec, "ms_per_step": sec * 1e3,
            "device": kind, "suspect": False, "n_slices": n_gt}


def bench_serve(model: str, iters: int = 30, batch: int = 0) -> dict:
    """Serving latency of the exported StableHLO artifact
    (`smsut_tpu/serve.py`): export the model's eval function with its
    parameters baked in, reload it with NO framework model code, and time
    queued async dispatches drained by a device-side scalar checksum, under
    the same honesty rules as the train bench (2N−N difference; the tunnel
    never moves the [B,H,W,C] logits to the host)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from smsut_tpu.config import Config
    from smsut_tpu.serve import export_eval, load_serving

    algo, state, batch_d, _ = make_algo(model, Config(), batch)
    # single source of truth for the export shape: the benchmarked algo's
    # own resolved config (ADVICE r3)
    cfg = algo.cfg
    with tempfile.TemporaryDirectory() as td:
        export_eval(algo, algo.eval_params(state), cfg, td)
        predict, manifest = load_serving(td)
    bs = manifest["input"]["shape"][0]
    assert bs == cfg.batch_size, (bs, cfg.batch_size)
    img = batch_d["img"]
    fn = jax.jit(predict)

    @jax.jit
    def cksum(y):
        return jnp.sum(y.astype(jnp.float32))

    for _ in range(3):                             # compile + warm (3
        y = fn(img)                                # dispatches, matching
    float(jax.device_get(cksum(y)))                # time_step's protocol)

    def timed(n):
        y = None
        tic = time.perf_counter()
        for _ in range(n):
            y = fn(img)
        float(jax.device_get(cksum(y)))            # drains the whole queue
        return time.perf_counter() - tic

    t1, t2 = timed(iters), timed(2 * iters)
    sec = max((t2 - t1) / iters, 1e-9)
    if t2 <= t1:
        sec = t2 / (2 * iters)
    _, kind = chip_peak()
    return {"slices_per_sec": bs / sec, "ms_per_step": sec * 1e3,
            "device": kind, "suspect": False, "n_slices": bs}


def _emit(metric: str, res: dict, vs_baseline: float = 0.0):
    out = {
        "metric": metric,
        "value": round(res["slices_per_sec"], 2),
        "unit": "slices/s",
        "vs_baseline": round(vs_baseline, 2),
        "ms_per_step": round(res["ms_per_step"], 3),
        "device": res["device"],
        "suspect": res["suspect"],
    }
    # model-math MFU is the HEADLINE utilization (the chip is full-rate —
    # BASELINE.md round 4); executed-FLOPs figures (which count the packed
    # kernels' structured zeros) follow as secondary hardware-throughput
    # context.
    if res.get("model_flops_per_step"):
        out["model_flops_per_step"] = round(res["model_flops_per_step"])
        out["model_tflops_per_sec"] = round(res["model_tflops_per_sec"], 2)
        out["model_mfu"] = round(res["model_mfu"], 4)
    if res.get("flops_per_step"):
        out["exec_flops_per_step"] = round(res["flops_per_step"])
        out["exec_tflops_per_sec"] = round(res["tflops_per_sec"], 2)
        out["exec_mfu"] = round(res["mfu"], 4)
    if "n_slices" in res:
        out["n_slices"] = res["n_slices"]
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet", help=f"one of {ALL_MODELS}")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--pallas", action="store_true",
                    help="use the fused Pallas instance-norm kernel")
    ap.add_argument("--pipeline", choices=("device", "host"), default=None,
                    help="bench the full input pipeline instead of the bare step")
    ap.add_argument("--scan", action="store_true",
                    help="chain steps with lax.scan (device-only throughput)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override batch size (0 = reference batch 8)")
    ap.add_argument("--all", action="store_true",
                    help="bench every algorithm, one JSON line each")
    ap.add_argument("--no-pack", action="store_true",
                    help="disable the space-to-depth packed stem (A/B)")
    ap.add_argument("--eval", dest="eval_mode", choices=("scan", "batch"),
                    default=None,
                    help="bench an eval epoch (whole-sweep scan vs per-batch)")
    ap.add_argument("--serve", action="store_true",
                    help="bench the exported StableHLO serving artifact "
                         "(inference latency, params baked in)")
    ap.add_argument("--set", dest="sets", action="append", default=[],
                    metavar="K=V", help="config override, like the trainer CLI")
    args = ap.parse_args()
    if args.no_pack:
        _CFG_OVERRIDES["pack_levels"] = 0
    if args.sets:
        import ast

        for item in args.sets:
            key, _, raw = item.partition("=")
            try:
                _CFG_OVERRIDES[key] = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                _CFG_OVERRIDES[key] = raw

    try:  # persistent compile cache (TPU compiles through the tunnel are slow)
        from smsut_tpu.train.cli import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    if args.all:
        for model in ALL_MODELS:
            res = bench_jax(model, args.iters, use_pallas=args.pallas,
                            batch=args.batch)
            _emit(f"{model}_train_slices_per_sec_per_chip", res)
        return

    if args.scan:
        res = bench_jax_scan(args.model, args.iters, args.pallas, args.batch)
        _emit(f"{args.model}_train_slices_per_sec_per_chip_scan", res)
        return

    if args.pipeline:
        res = bench_pipeline(args.pipeline == "device", args.iters)
        _emit(f"pipeline_{args.pipeline}_aug_slices_per_sec_per_chip", res)
        return

    if args.eval_mode:
        res = bench_eval(eval_scan=(args.eval_mode == "scan"))
        _emit(f"eval_{args.eval_mode}_slices_per_sec_per_chip", res)
        return

    if args.serve:
        res = bench_serve(args.model, args.iters, args.batch)
        _emit(f"serve_{args.model}_slices_per_sec_per_chip", res)
        return

    res = bench_jax(args.model, args.iters, use_pallas=args.pallas,
                    batch=args.batch)
    baseline = 0.0
    if not args.skip_baseline:
        try:
            baseline = bench_torch_cpu()
        except Exception:
            baseline = 0.0
    vs = res["slices_per_sec"] / baseline if baseline > 0 else 0.0
    _emit(f"{args.model}_train_slices_per_sec_per_chip", res, vs)


if __name__ == "__main__":
    main()
