#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""UGAN+PatchNCE (no shape loss) trainer CLI
(`/root/reference/trainer/uganShp0Trainer.py`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.train.cli import run_main
from smsut_tpu.train.steps.gan import UGANShp0Algo

if __name__ == "__main__":
    run_main(UGANShp0Algo)
