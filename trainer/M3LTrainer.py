#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""M3L masked-consistency SegFormer trainer CLI
(`/root/reference/trainer/M3LTrainer.py`; the reference's backbone module is
absent upstream — re-created in smsut_tpu/models/segformer.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.train.cli import run_main
from smsut_tpu.train.steps.m3l import M3L

if __name__ == "__main__":
    run_main(M3L)
