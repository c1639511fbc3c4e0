# -*- coding: utf-8 -*-
"""Experiment manager: numbered dirs, subdirectory layout, code snapshot,
registry, logging (`/root/reference/trainer/baseTrainer.py:74-99`)."""
import os
from os.path import join as pjoin

import pytest

from smsut_tpu.train.experiment import Experiment


def test_numbered_experiment_dirs(tmp_path):
    root = str(tmp_path)
    e0 = Experiment(root, "MyExp", "train", snapshot_src="")
    e1 = Experiment(root, "MyExp", "train", snapshot_src="")
    assert e0.model_idx == "000"
    assert e1.model_idx == "001"
    for sub in ("ckpt", "tb", "result", "sample"):
        assert os.path.isdir(pjoin(e0.model_root, sub))
    assert os.path.isfile(pjoin(e0.model_root, "train.log"))


def test_test_phase_creates_nothing(tmp_path):
    e = Experiment(str(tmp_path), "MyExp", "test")
    assert e.model_idx is None
    assert not os.path.isdir(pjoin(str(tmp_path), "MyExp"))


def test_code_snapshot_default(tmp_path):
    e = Experiment(str(tmp_path), "Snap", "train")
    code = pjoin(e.model_root, "code")
    assert os.path.isdir(pjoin(code, "smsut_tpu"))
    assert os.path.isfile(pjoin(code, "smsut_tpu", "config.py"))
    assert not os.path.isdir(pjoin(code, ".git"))


def test_registry_appender(tmp_path):
    e = Experiment(str(tmp_path), "Reg", "train", snapshot_src="")
    e.register_experiment_args({"fold": 0})
    log = pjoin(os.path.dirname(e.expr_root), "expriments.log")
    content = open(log).read()
    assert "Reg" in content and "fold" in content


def test_info_writes_to_train_log(tmp_path):
    e = Experiment(str(tmp_path), "Log", "train", snapshot_src="")
    e.info("hello smsut")
    assert "hello smsut" in open(pjoin(e.model_root, "train.log")).read()
