#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Benchmark: training throughput (slices/sec/chip) at the reference scale.

Measures the jitted SMSUT-TPU train step on the real TPU at the reference's
training configuration (batch 8, 256x256x1, base_width 16 — `/root/reference/
config.py:29-56`) and compares against a reference-faithful PyTorch
implementation of the same model/step executed on this host's CPU (the
reference repo publishes no GPU numbers — BASELINE.md).  ``vs_baseline`` is
therefore TPU-vs-torch-CPU on identical shapes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_jax_scan(model: str, iters: int = 50, use_pallas: bool = False) -> float:
    """Device-only throughput: `iters` train steps chained with lax.scan in a
    single jit — immune to host dispatch noise (this box has 1 CPU shared
    with everything else)."""
    import jax
    import jax.numpy as jnp

    from smsut_tpu.config import Config

    cfg = Config(use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(cfg.batch_size, cfg.input_size,
                                       cfg.input_size, 1)).astype(np.float32))
    msk = jnp.asarray(rng.integers(0, cfg.n_class,
                                   size=(cfg.batch_size, cfg.input_size,
                                         cfg.input_size)).astype(np.int32))
    mdl = jnp.zeros((cfg.batch_size,), jnp.int32)

    if model == "unet":
        from smsut_tpu.train.steps.supervised import SupervisedUNet

        algo = SupervisedUNet(cfg)
        batch = {"img": img, "msk": msk}
        scalars = {}
    elif model == "uganConsis":
        from smsut_tpu.train.steps.gan import UGANConsisAlgo

        algo = UGANConsisAlgo(cfg)
        batch = {"img": img, "msk": msk, "mdl": mdl,
                 "ul_img": img, "ul_mdl": mdl}
        scalars = dict(algo.epoch_scalars(1), rng=jax.random.PRNGKey(1))
    else:
        raise SystemExit(f"unknown model {model}")

    state = algo.init_state(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(s, _):
            s2, m = algo._train_step_impl(s, batch, scalars)
            return s2, m["loss"]

        return jax.lax.scan(body, state, None, length=iters)

    state, losses = run(state)          # compile + warm
    jax.block_until_ready(losses)
    tic = time.perf_counter()
    state, losses = run(state)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - tic
    return iters * cfg.batch_size / dt


def bench_jax(model: str, iters: int = 30, warmup: int = 3,
              use_pallas: bool = False, batch: int = 0) -> float:
    import jax
    import jax.numpy as jnp

    from smsut_tpu.config import Config

    cfg = Config(use_pallas=use_pallas)
    if batch:
        cfg = cfg.replace(batch_size=batch)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(cfg.batch_size, cfg.input_size,
                                       cfg.input_size, 1)).astype(np.float32))
    msk = jnp.asarray(rng.integers(0, cfg.n_class,
                                   size=(cfg.batch_size, cfg.input_size,
                                         cfg.input_size)).astype(np.int32))

    if model == "unet":
        from smsut_tpu.train.steps.supervised import SupervisedUNet

        algo = SupervisedUNet(cfg)
        state = algo.init_state(jax.random.PRNGKey(0))
        batch = {"img": img, "msk": msk}
        scalars = {}

        def step(state):
            return algo.train_step(state, batch, scalars)
    elif model == "uganConsis":
        # full SMSUT iteration at reference scale: 16-image concat batch,
        # D step + WGAN-GP + G triple forward + PatchNCE
        from smsut_tpu.train.steps.gan import UGANConsisAlgo

        algo = UGANConsisAlgo(cfg)
        state = algo.init_state(jax.random.PRNGKey(0))
        mdl = jnp.zeros((cfg.batch_size,), jnp.int32)
        batch = {"img": img, "msk": msk, "mdl": mdl,
                 "ul_img": img, "ul_mdl": mdl}
        scalars = dict(algo.epoch_scalars(1), rng=jax.random.PRNGKey(1))

        def step(state):
            return algo.train_step(state, batch, scalars)
    else:
        raise SystemExit(f"unknown model {model}")

    # warmup/compile
    for _ in range(warmup):
        state, metrics = step(state)
    jax.block_until_ready(metrics["loss"])
    tic = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - tic
    return iters * cfg.batch_size / dt


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


def bench_pipeline(device_augment: bool, iters: int = 30) -> float:
    """Full input pipeline + train step on synthetic 256^2 data: loader ->
    augmentation (host or fused on-device warp) -> jitted supervised step."""
    import random
    import tempfile

    import jax

    from smsut_tpu.config import Config
    from smsut_tpu.data.dataset import get_loader
    from smsut_tpu.data.synthetic import make_synthetic_dataset
    from smsut_tpu.train.steps.supervised import SupervisedUNet

    root = tempfile.mkdtemp(prefix="smsut-bench-")
    make_synthetic_dataset(root, n_patients_per_modality=3, n_slice=8, size=256)
    cfg = Config(base_root=root, device_augment=device_augment)
    algo = SupervisedUNet(cfg)
    state = algo.init_state(jax.random.PRNGKey(0))

    rng = random.Random(0)
    loader = get_loader(root, "train", 0, cfg.batch_size, cfg.data_aug, cfg=cfg,
                        rng=rng, raw=device_augment)
    dev_aug = None
    if device_augment:
        from smsut_tpu.data.device_augment import DeviceAugment

        dev_aug = DeviceAugment(cfg, rng)

    def batches():
        while True:
            for b in loader:
                yield b

    it = batches()

    fused = None
    if dev_aug is not None:
        from smsut_tpu.train.loop import make_fused_step

        fused = make_fused_step(algo, dev_aug)
    key = np.zeros(2, np.uint32)

    def one(b):
        if fused is not None:
            h, w = b.img.shape[1:3]
            params = dev_aug.sample_params(b.img.shape[0], h, w)
            return fused(state_holder[0], b.img, b.msk, b.mdl, params, {},
                         {"rng": key})
        return algo.train_step(state_holder[0], {"img": b.img, "msk": b.msk,
                                                 "mdl": b.mdl}, {"rng": key})

    state_holder = [state]
    for _ in range(3):
        state_holder[0], m = one(next(it))
    jax.block_until_ready(m["loss"])
    tic = time.perf_counter()
    for _ in range(iters):
        state_holder[0], m = one(next(it))
    jax.block_until_ready(m["loss"])
    return iters * cfg.batch_size / (time.perf_counter() - tic)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet")
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
    args = ap.parse_args()

    if args.scan:
        v = bench_jax_scan(args.model, args.iters, args.pallas)
        print(json.dumps({
            "metric": f"{args.model}_train_slices_per_sec_per_chip_scan",
            "value": round(v, 2), "unit": "slices/s", "vs_baseline": 0.0}))
        return

    if args.pipeline:
        v = bench_pipeline(args.pipeline == "device", args.iters)
        print(json.dumps({
            "metric": f"pipeline_{args.pipeline}_aug_slices_per_sec_per_chip",
            "value": round(v, 2), "unit": "slices/s", "vs_baseline": 0.0}))
        return

    tpu = bench_jax(args.model, args.iters, use_pallas=args.pallas,
                    batch=args.batch)
    baseline = 0.0
    if not args.skip_baseline:
        try:
            baseline = bench_torch_cpu()
        except Exception:
            baseline = 0.0
    vs = tpu / baseline if baseline > 0 else 0.0
    print(json.dumps({
        "metric": f"{args.model}_train_slices_per_sec_per_chip",
        "value": round(tpu, 2),
        "unit": "slices/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
