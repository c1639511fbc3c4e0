#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""CoraNet two-stage trainer CLI (`/root/reference/trainer/coraNetTrainer.py`).

Stage A (prefit, pre_epoch epochs): ``-p train`` with no ``-i`` — saves
``pre_best``/``pre_last`` (full state incl. EMA).
Stage B (cora, cora_epoch epochs): ``-p train -i <model_id>`` — loads stage
A's ``pre_best`` and runs the pseudo-label loop, saving ``best``/``last``.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from os.path import join as pjoin


def main():
    from smsut_tpu.train.cli import (apply_overrides, enable_compilation_cache,
                                     make_parser, saving_pseudo)
    from smsut_tpu.config import get_config
    import random
    import numpy as np

    args = make_parser().parse_args()
    cfg = get_config()
    if args.data_root:
        cfg = cfg.replace(base_root=args.data_root)
    if args.expr_root:
        cfg = cfg.replace(expr_root=args.expr_root)
    cfg = apply_overrides(cfg, args.overrides)

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    enable_compilation_cache()

    from smsut_tpu.train.loop import Trainer
    from smsut_tpu.train.steps.coranet import CoraNet

    stage = "cora" if (args.phase == "train" and args.model_id) else "pre"
    if args.phase != "train":
        stage = "cora"  # eval uses head-0 either way
    algo = CoraNet(cfg, stage=stage)
    trainer = Trainer(algo, cfg, args.phase, args)

    if args.phase == "train":
        if stage == "cora":
            algo.load_pretrained(trainer, args.model_id)
        trainer.fit("inTurn")
    elif args.phase == "test":
        if not args.model_id:
            raise SystemExit("error: -p test requires -i/--model_id")
        trainer.load_model(args.model_id, args.which_ckpt)
        trainer.test("inTurn", pjoin(trainer.exp.expr_root, args.model_id))
    elif args.phase == "pseudo":
        trainer.load_model(args.model_id, args.which_ckpt)
        saving_pseudo(trainer, pjoin(trainer.exp.expr_root, args.model_id))
    else:
        raise NotImplementedError


if __name__ == "__main__":
    main()
