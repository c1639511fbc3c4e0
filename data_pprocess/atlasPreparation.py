#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Multi-Atlas (BTCV) preparation CLI
(`/root/reference/data_pprocess/atlasPreparation.py`)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.config import get_config
from smsut_tpu.preprocess.atlas import AtlasPreparation
from smsut_tpu.utils.io import maybe_mkdir

if __name__ == "__main__":
    cfg = get_config()
    ap = argparse.ArgumentParser()
    ap.add_argument("--atlas_root", default=cfg.atlas_root)
    ap.add_argument("--out", default=cfg.base_root)
    ap.add_argument("--spacing", type=float, nargs=3, default=list(cfg.new_spacing))
    ap.add_argument("--size", type=int, default=cfg.input_size)
    args = ap.parse_args()
    maybe_mkdir(args.out)
    AtlasPreparation(args.atlas_root).run(args.out, tuple(args.spacing), args.size)
