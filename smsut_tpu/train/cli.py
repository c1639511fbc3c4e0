# -*- coding: utf-8 -*-
"""Shared CLI for all trainer entry points — flags preserved verbatim from
the reference (`/root/reference/trainer/unetTrainer.py:145-153`):
``-p/--phase {train,test,pseudo} -f/--fold -nm/--expr_name -i/--model_id
-wh/--which_ckpt``."""
from __future__ import annotations

import argparse
import random
from os.path import join as pjoin

import numpy as np

from smsut_tpu.config import Config, get_config


def enable_compilation_cache(path: str = "/tmp/smsut-jax-cache") -> None:
    """Persistent XLA compilation cache — TPU compiles through the tunnel run
    ~2min each; the cache makes repeat CLI invocations start instantly.
    Keyed by machine: see utils/cachekey.py (stale cross-host XLA:CPU AOT
    blobs risk SIGILL)."""
    import jax

    from smsut_tpu.utils.cachekey import cache_dir

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--phase", type=str,
                        choices=("train", "test", "pseudo"))
    parser.add_argument("-f", "--fold", type=int, default=0)
    parser.add_argument("-nm", "--expr_name", type=str)
    parser.add_argument("-i", "--model_id", type=str, help="only for test")
    parser.add_argument("-wh", "--which_ckpt", type=str, default="last")
    parser.add_argument("--data_root", type=str, default=None,
                        help="override SMSUT_DATA_ROOT")
    parser.add_argument("--expr_root", type=str, default=None)
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="override any Config field, e.g. --set max_epoch=2")
    parser.add_argument("--resume", type=str, default=None, metavar="IDX[:TAG]",
                        help="resume training from a saved full state, e.g. "
                             "--resume 000 or --resume 000:last (the reference "
                             "cannot resume; our checkpoints carry optimizer+"
                             "step+EMA)")
    return parser


def apply_overrides(cfg: Config, overrides) -> Config:
    import ast

    for item in overrides or []:
        key, _, raw = item.partition("=")
        if not hasattr(cfg, key):
            raise SystemExit(f"error: unknown config field '{key}' in --set {item}")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw  # bare strings
        cfg = cfg.replace(**{key: value})
    return cfg


def run_main(algo_factory, args=None) -> None:
    """Seed RNGs and drive the train/test/pseudo phases like each reference
    trainer's ``__main__`` block."""
    if args is None:
        args = make_parser().parse_args()
    cfg = get_config()
    if args.data_root:
        cfg = cfg.replace(base_root=args.data_root)
    if args.expr_root:
        cfg = cfg.replace(expr_root=args.expr_root)
    cfg = apply_overrides(cfg, getattr(args, "overrides", []))

    if args.phase in ("test", "pseudo") and not args.model_id:
        raise SystemExit(f"error: -p {args.phase} requires -i/--model_id "
                         "(the numbered experiment dir to load)")

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    # multi-host first: jax.distributed.initialize must precede backend
    # creation (env-driven; a no-op on single-host runs)
    from smsut_tpu.parallel import distributed

    if distributed.initialize():
        import jax

        print(f"[distributed] process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    enable_compilation_cache()

    from smsut_tpu.train.loop import Trainer

    algo = algo_factory(cfg)
    trainer = Trainer(algo, cfg, args.phase, args)
    if args.phase == "train":
        trainer.exp.register_experiment_args(args)  # expriments.log registry
        if getattr(args, "resume", None):
            idx, _, tag = args.resume.partition(":")
            trainer.load_model(idx, tag or "last")
            trainer.epoch = int(trainer.state.step) // cfg.num_iter_per_epoch
        trainer.fit("inTurn")
    elif args.phase == "test":
        trainer.load_model(args.model_id, args.which_ckpt)
        expr_root = pjoin(trainer.exp.expr_root, args.model_id)
        trainer.test("inTurn", expr_root)
    elif args.phase == "pseudo":
        trainer.load_model(args.model_id, args.which_ckpt)
        expr_root = pjoin(trainer.exp.expr_root, args.model_id)
        saving_pseudo(trainer, expr_root)
    else:
        raise NotImplementedError


def saving_pseudo(trainer, expr_root: str) -> None:
    """Colorized prediction/gt/original dumps (`baseTrainer.py:320-375`)."""
    import os

    from PIL import Image

    from smsut_tpu.data.dataset import get_loader
    from smsut_tpu.utils.io import colorize, maybe_mkdir

    cfg = trainer.cfg
    pred_root = pjoin(expr_root, "pseudo")
    maybe_mkdir(pred_root)
    loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    trainer.info(f"Predict and save in {pred_root}.")
    params = trainer.algo.eval_params(trainer.state)
    # GAN algorithms additionally dump a per-slice translation strip
    # (original | ->ct | ->t1in | ->t1out | ->t2), like the reference's
    # selected-volume fk dumps (`uganConsisTrainer.py:248-303`)
    translate = getattr(trainer.algo, "_translate", None)
    count = 0
    # whole-volume translation grids for the reference's hand-picked volumes
    # (`uganConsisTrainer.py:292`: ct_028, t1in_037, t1out_015, t2_032)
    vol_strips: dict = {k: [] for k in (cfg.pseudo_volumes or ())}
    for batch in loader:
        b = batch.batch_size
        img, msk = batch.img, batch.msk
        if b != cfg.batch_size:
            pad = cfg.batch_size - b
            img = np.concatenate([img, np.zeros((pad,) + img.shape[1:], img.dtype)])
            msk = np.concatenate([msk, np.zeros((pad,) + msk.shape[1:], msk.dtype)])
        _, pred = trainer._eval_step(params, img, msk)
        pred = np.asarray(pred)[:b]
        strips = None
        if translate is not None:
            import jax.numpy as jnp
            import jax as _jax

            vec_org = _jax.nn.one_hot(np.asarray(batch.mdl[0]).repeat(
                img.shape[0]), cfg.n_modal)
            cols = [img]
            for target in range(cfg.n_modal):
                vec_trg = jnp.tile(_jax.nn.one_hot(target, cfg.n_modal),
                                   (img.shape[0], 1))
                _, tsl = translate(params, jnp.asarray(img), vec_trg - vec_org)
                cols.append(np.asarray(tsl))
            strips = np.clip((np.concatenate(cols, axis=2) + 1) / 2, 0, 1)
        count += b
        for i in range(b):
            p = colorize(pred[i])
            m = colorize(batch.msk[i])
            a = (batch.img[i, ..., 0] + 1) * 255
            Image.fromarray(p.astype(np.uint8)).save(
                pjoin(pred_root, batch.names[i] + "pse.jpg"))
            Image.fromarray(m.astype(np.uint8)).save(
                pjoin(pred_root, batch.names[i] + "gt.jpg"))
            Image.fromarray(a.astype(np.uint8)).convert("RGB").save(
                pjoin(pred_root, batch.names[i] + "ori.jpg"))
            if strips is not None:
                Image.fromarray((strips[i, ..., 0] * 255).astype(np.uint8)).save(
                    pjoin(pred_root, batch.names[i] + "fk.jpg"))
                mod, pid, z = batch.names[i].split("_")
                key = f"{mod}_{pid}"
                if key in vol_strips:
                    vol_strips[key].append((int(z), strips[i, ..., 0]))
    for key, rows in vol_strips.items():
        if not rows:
            continue
        rows.sort(key=lambda t: t[0])
        grid = np.concatenate([r for _, r in rows], axis=0)
        Image.fromarray((grid * 255).astype(np.uint8)).save(
            pjoin(pred_root, key + "_grid.jpg"))
        trainer.info(f"Saved translation grid {key}_grid.jpg "
                     f"({len(rows)} slices).")
    print(count)
