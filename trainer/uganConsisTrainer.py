#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Full SMSUT trainer CLI (`/root/reference/trainer/uganConsisTrainer.py`,
`run0.sh:5-7`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.train.cli import run_main
from smsut_tpu.train.steps.gan import UGANConsisAlgo

if __name__ == "__main__":
    run_main(UGANConsisAlgo)
