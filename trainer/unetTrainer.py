#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Supervised U-Net trainer CLI — reference-compatible entry point
(`/root/reference/trainer/unetTrainer.py`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.train.cli import run_main
from smsut_tpu.train.steps.supervised import SupervisedUNet

if __name__ == "__main__":
    run_main(SupervisedUNet)
