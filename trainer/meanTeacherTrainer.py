#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Mean-Teacher trainer CLI (`/root/reference/trainer/meanTeacherTrainer.py`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.train.cli import run_main
from smsut_tpu.train.steps.mean_teacher import MeanTeacher

if __name__ == "__main__":
    run_main(MeanTeacher)
