#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Cross-pseudo supervision trainer CLI
(`/root/reference/trainer/crossPseTrainer.py`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.train.cli import run_main
from smsut_tpu.train.steps.cross_pseudo import CrossPseudo

if __name__ == "__main__":
    run_main(CrossPseudo)
