#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""nii->PNG conversion + split-yaml generation CLI
(`/root/reference/data_pprocess/toPngAndSplit.py`)."""
import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.config import get_config
from smsut_tpu.preprocess.to_png_and_split import split_train_val_test, to_png

if __name__ == "__main__":
    cfg = get_config()
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=cfg.base_root, help="nii.gz tree (bimod_root)")
    ap.add_argument("--dst", default=cfg.base_root, help="png tree (png_root)")
    ap.add_argument("--skip-png", action="store_true")
    ap.add_argument("--skip-split", action="store_true")
    args = ap.parse_args()
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    if not args.skip_png:
        to_png(args.src, args.dst)
    if not args.skip_split:
        split_train_val_test(args.dst, args.dst, cfg)
