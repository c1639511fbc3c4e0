#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""CHAOS preparation CLI (`/root/reference/data_pprocess/chaosPreparation.py`).

Usage: python data_pprocess/chaosPreparation.py --chaos_root <CHAOS Train_Sets>
       --out <bimod_root> [--spacing 1.5 1.5 5] [--size 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.config import get_config
from smsut_tpu.preprocess.chaos import ChaosPreparation
from smsut_tpu.utils.io import maybe_mkdir

if __name__ == "__main__":
    cfg = get_config()
    ap = argparse.ArgumentParser()
    ap.add_argument("--chaos_root", default=cfg.chaos_root)
    ap.add_argument("--out", default=cfg.base_root)
    ap.add_argument("--spacing", type=float, nargs=3, default=list(cfg.new_spacing))
    ap.add_argument("--size", type=int, default=cfg.input_size)
    args = ap.parse_args()
    maybe_mkdir(args.out)
    for modality in ("t1in", "t1out", "t2"):
        ChaosPreparation(args.chaos_root, modality).run(
            args.out, tuple(args.spacing), args.size)
