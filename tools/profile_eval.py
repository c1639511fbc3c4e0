#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Break an eval epoch's wall time into device compute vs host/tunnel
overhead: runs bench.py's eval setup, times validate_epoch, then traces it
and prints the device-plane total next to the wall clock.

Usage:  python tools/profile_eval.py [OUTDIR]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/smsut-prof-eval"
    import tempfile

    import jax

    from smsut_tpu.config import Config
    from smsut_tpu.data.dataset import get_label_npys, get_loader
    from smsut_tpu.data.synthetic import make_synthetic_dataset
    from smsut_tpu.train.loop import Trainer
    from smsut_tpu.train.steps.supervised import SupervisedUNet

    root = tempfile.mkdtemp(prefix="smsut-prof-eval-")
    make_synthetic_dataset(root, n_patients_per_modality=6, n_slice=16,
                           size=256)
    cfg = Config(base_root=root, expr_root=tempfile.mkdtemp(
        prefix="smsut-prof-expr-"), eval_scan=True)
    algo = SupervisedUNet(cfg)
    trainer = Trainer(algo, cfg, "test")
    loader = get_loader(root, "test", 0, cfg.batch_size, cfg=cfg)
    n_gt, gt_npys = get_label_npys(root, "test", cfg.split_yaml)

    trainer.validate_epoch(loader, gt_npys, None)   # compile + device stack

    # --- timed phases ----------------------------------------------------
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        trainer.validate_epoch(loader, gt_npys, None)
    wall = (time.perf_counter() - t0) / reps * 1e3

    # device-only: the jitted scan with donated nothing, block until ready
    params = trainer.algo.eval_params(trainer.state)
    dev = trainer._eval_dev[1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = trainer._eval_scan_c(params, *dev)
        jax.block_until_ready(out)
    dev_ms = (time.perf_counter() - t0) / reps * 1e3

    # dispatch+fetch split: run but fetch only the (tiny) losses
    t0 = time.perf_counter()
    for _ in range(reps):
        losses, preds = trainer._eval_scan_c(params, *dev)
        jax.block_until_ready(losses)
    loss_ms = (time.perf_counter() - t0) / reps * 1e3

    # host fetch of preds alone
    import numpy as np
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(preds)
    fetch_ms = (time.perf_counter() - t0) / reps * 1e3
    nbytes = preds.size * preds.dtype.itemsize / 1e6

    print(f"n_slices={n_gt}  wall={wall:.1f} ms  device(block)={dev_ms:.1f} "
          f"ms  losses-only={loss_ms:.1f} ms  pred-fetch={fetch_ms:.1f} ms "
          f"({nbytes:.1f} MB)  host-side={wall - dev_ms - fetch_ms:.1f} ms")

    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = trainer._eval_scan_c(params, *dev)
            jax.block_until_ready(out)
    print(f"trace written to {outdir} (3 sweeps)")


if __name__ == "__main__":
    main()
