#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Export a trained checkpoint to a portable serving artifact.

Usage:
  python tools/export_serving.py MODEL EXPR_DIR[:TAG] OUT_DIR [--set K=V ...]

  MODEL     zoo name (unet, meanTeacher, ..., uganConsis)
  EXPR_DIR  numbered experiment directory holding ckpt/ (TAG default: best)
  OUT_DIR   output directory for model.stablehlo + manifest.json

The artifact is self-contained (parameters baked in); see smsut_tpu/serve.py.
"""
from __future__ import annotations

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # accept both "--set K=V" (the usage string's form) and "--set=K=V"
    argv, args, sets = sys.argv[1:], [], []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--set" and i + 1 < len(argv):
            sets.append(argv[i + 1])
            i += 2
        elif a.startswith("--set="):
            sets.append(a.split("=", 1)[1])
            i += 1
        else:
            args.append(a)
            i += 1
    if len(args) != 3:
        raise SystemExit(__doc__)
    model, expr, out_dir = args
    expr_dir, _, tag = expr.partition(":")
    tag = tag or "best"

    import bench
    from smsut_tpu.config import Config
    from smsut_tpu.train import checkpoints
    from smsut_tpu.serve import export_eval

    for kv in sets:
        k, _, raw = kv.partition("=")
        try:
            bench._CFG_OVERRIDES[k] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            bench._CFG_OVERRIDES[k] = raw

    cfg = Config()
    algo, state, _, _ = bench.make_algo(model, cfg)
    state = checkpoints.load_state(state, os.path.join(expr_dir, "ckpt"), tag)
    params = algo.eval_params(state)
    path = export_eval(algo, params, cfg.replace(**bench._CFG_OVERRIDES)
                       if bench._CFG_OVERRIDES else cfg, out_dir)
    print(f"exported {model} [{tag}] -> {path}")


if __name__ == "__main__":
    main()
