#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Trace N chained train steps of any zoo algorithm and summarize the
device plane.

Usage:  python tools/profile_step.py MODEL [BATCH] [N_STEPS] [OUTDIR]
        python tools/profile_step.py unet 32 12 /tmp/smsut-prof-b32

Reuses bench.py's make_algo so the traced program is byte-identical to the
benched one; honors SMSUT_* env and any bench-style config via --set K=V
appended after the positionals.
"""
from __future__ import annotations

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))


def main():
    import ast

    # accept both "--set K=V" (the usage string's form) and "--set=K=V"
    argv, args, sets = sys.argv[1:], [], []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--set" and i + 1 < len(argv):
            sets.append((None, argv[i + 1]))
            i += 2
        elif a.startswith("--set="):
            sets.append((None, a.split("=", 1)[1]))
            i += 1
        else:
            args.append(a)
            i += 1
    model = args[0] if args else "unet"
    batch = int(args[1]) if len(args) > 1 else 0
    n_steps = int(args[2]) if len(args) > 2 else 12
    outdir = args[3] if len(args) > 3 else f"/tmp/smsut-prof-{model}"

    import bench
    from smsut_tpu.config import Config

    for _, kv in sets:
        k, _, raw = kv.partition("=")
        try:
            bench._CFG_OVERRIDES[k] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            bench._CFG_OVERRIDES[k] = raw

    import jax

    try:
        from smsut_tpu.train.cli import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    cfg = Config()
    algo, state, batch_d, scalars = bench.make_algo(model, cfg, batch)
    cksum = bench._make_checksum()

    # warm up: compile + 2 steps
    for _ in range(2):
        state, m = algo.train_step(state, batch_d, scalars)
    float(jax.device_get(cksum((state, m))))

    with jax.profiler.trace(outdir):
        for _ in range(n_steps):
            state, m = algo.train_step(state, batch_d, scalars)
        float(jax.device_get(cksum((state, m))))
    print(f"trace written to {outdir} ({n_steps} steps)")


if __name__ == "__main__":
    main()
