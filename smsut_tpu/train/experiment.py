# -*- coding: utf-8 -*-
"""Experiment directory manager, logging, TensorBoard, code snapshot.

Mirrors `/root/reference/trainer/baseTrainer.py:74-99`: numbered experiment
dirs (000, 001, ...) with ckpt/tb/result/sample subdirs, a code snapshot, a
file+console logger, and the ``expriments.log`` registry appender."""
from __future__ import annotations

import logging
import os
import shutil
from os.path import join as pjoin
from typing import Optional

from smsut_tpu.utils.io import maybe_mkdir

try:
    from tensorboardX import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


class Experiment:
    def __init__(self, expr_root: str, expr_name: str, phase: str = "train",
                 snapshot_src: Optional[str] = None, spectator: bool = False):
        """``spectator=True`` (non-primary hosts of a multi-process run):
        no directories, no logger, no TensorBoard — host 0 owns all
        artifacts; info() falls back to stdout."""
        maybe_mkdir(expr_root)
        self.expr_root = pjoin(expr_root, expr_name)
        self.phase = phase
        self.model_idx: Optional[str] = None
        self.writer = None
        self.logger: Optional[logging.Logger] = None
        self.model_root = None
        self.ckpt_root = self.result_root = self.sample_root = None
        self.spectator = spectator
        if phase == "train" and not spectator:
            self._init_train_env(snapshot_src)

    def _init_train_env(self, snapshot_src: Optional[str]) -> None:
        if snapshot_src is None:
            # default: snapshot the framework source like the reference's
            # copytree-of-CWD (`baseTrainer.py:91`)
            snapshot_src = os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        maybe_mkdir(self.expr_root)
        self.model_idx = str(len(os.listdir(self.expr_root))).rjust(3, "0")
        self.model_root = pjoin(self.expr_root, self.model_idx)
        self.ckpt_root = pjoin(self.model_root, "ckpt")
        tb_root = pjoin(self.model_root, "tb")
        self.result_root = pjoin(self.model_root, "result")
        self.sample_root = pjoin(self.model_root, "sample")
        maybe_mkdir(self.model_root, self.ckpt_root, tb_root, self.result_root,
                    self.sample_root)
        inside = os.path.abspath(self.model_root).startswith(
            os.path.abspath(snapshot_src) + os.sep) if snapshot_src else False
        if snapshot_src and os.path.isdir(snapshot_src) and not inside:
            shutil.copytree(snapshot_src, pjoin(self.model_root, "code"),
                            ignore=shutil.ignore_patterns(
                                ".git", "__pycache__", "*.ckpt", "*.so",
                                ".pytest_cache"),
                            dirs_exist_ok=True)
        if SummaryWriter is not None and os.environ.get("SMSUT_NO_TB") != "1":
            self.writer = SummaryWriter(tb_root)

        self.logger = logging.getLogger(f"smsut.{self.model_idx}")
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False  # jax may have configured the root logger
        fmt = logging.Formatter("%(asctime)s - %(levelname)s: %(message)s")
        for handler in (logging.StreamHandler(),
                        logging.FileHandler(pjoin(self.model_root, "train.log"),
                                            mode="a", encoding="utf-8")):
            handler.setFormatter(fmt)
            self.logger.addHandler(handler)
        self.info(f"Create train environment in {self.model_root}.")

    def register_experiment_args(self, args, filename: str = "expriments.log") -> None:
        # (sic) filename kept for parity (`baseTrainer.py:74-79`)
        if self.spectator:
            return
        with open(pjoin(os.path.dirname(self.expr_root), filename), "a") as f:
            f.write(f"{os.path.basename(self.expr_root)}, {self.model_root}\n")
            f.write(str(args) + "\n\n")

    def info(self, s) -> None:
        if self.logger is not None:
            self.logger.info(s)
        else:
            print(s)

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
