# -*- coding: utf-8 -*-
"""The fit / validate / test harness.

Functional re-design of `/root/reference/trainer/baseTrainer.py:125-318`: one
generic epoch loop drives any Algorithm object (pure jitted train step) while
the host side keeps the reference semantics — in-turn loaders, per-modality
loss metering, slice→volume scatter for evaluation, mean-Dice model selection,
best/last checkpoints, and the trois CSV in the test phase."""
from __future__ import annotations

import os
import time
from functools import partial
from os.path import join as pjoin
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smsut_tpu.config import Config, Modality
from smsut_tpu.data.dataset import Batch, BatchLoader, get_label_npys, get_loader
from smsut_tpu.ops.losses import dice_and_ce_loss
from smsut_tpu.ops.metrics import get_all_matrix, get_mo_matrix, matrix_to_csv
from smsut_tpu.ops.schedules import poly_lr_host
from smsut_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from smsut_tpu.train import checkpoints
from smsut_tpu.train.experiment import Experiment
from smsut_tpu.utils.meter import Meter


class _Cycler:
    """next()-with-restart iteration like the reference's try/except
    StopIteration pattern (`unetTrainer.py:59-63`), backed by the loader's
    single persistent cycling producer when available."""

    def __init__(self, loader):
        self.loader = loader
        if hasattr(loader, "iter_cycle"):
            self.itr = loader.iter_cycle()
        else:
            self.itr = iter(loader)

    def next(self) -> Batch:
        try:
            return next(self.itr)
        except StopIteration:
            self.itr = iter(self.loader)
            return next(self.itr)


def make_fused_step(algo, device_aug):
    """Augment + train step as ONE jitted dispatch (the host has a single
    CPU; per-iteration Python is the throughput ceiling)."""
    uses_ul = getattr(algo, "uses_unlabeled", False)

    if uses_ul:
        def fused(state, li, lm, lmdl, lp, ui, um, umdl, up, extra, scalars):
            img, msk = device_aug._apply_impl(li, lm, lp)
            uimg, _ = device_aug._apply_impl(ui, um, up)
            batch = {"img": img, "msk": msk, "mdl": lmdl,
                     "ul_img": uimg, "ul_mdl": umdl}
            batch.update(extra)
            return algo._train_step_impl(state, batch, scalars)
    else:
        def fused(state, li, lm, lmdl, lp, extra, scalars):
            img, msk = device_aug._apply_impl(li, lm, lp)
            batch = {"img": img, "msk": msk, "mdl": lmdl}
            batch.update(extra)
            return algo._train_step_impl(state, batch, scalars)

    return jax.jit(fused, donate_argnums=(0,))


def make_fused_chunk(algo, device_aug, n_steps: int):
    """T augment+train iterations in ONE dispatch (`lax.scan` over stacked
    batches): through the remote-tunnel backend every execute pays a fixed
    host/RTT cost (~10ms measured); chunking amortizes it T-fold.  Batch
    inputs carry a leading [T] dim; per-iteration PRNG keys ride in
    ``scalars['rng']`` as [T, 2]; metrics come back [T]-stacked."""
    uses_ul = getattr(algo, "uses_unlabeled", False)

    if uses_ul:
        def chunk(state, li, lm, lmdl, lp, ui, um, umdl, up, scalars):
            base = {k: v for k, v in scalars.items() if k != "rng"}

            def body(s, xs):
                (bli, blm, blmdl, blp, bui, bum, bumdl, bup, key) = xs
                img, msk = device_aug._apply_impl(bli, blm, blp)
                uimg, _ = device_aug._apply_impl(bui, bum, bup)
                batch = {"img": img, "msk": msk, "mdl": blmdl,
                         "ul_img": uimg, "ul_mdl": bumdl}
                return algo._train_step_impl(s, batch, dict(base, rng=key))

            return jax.lax.scan(
                body, state,
                (li, lm, lmdl, lp, ui, um, umdl, up, scalars["rng"]),
                length=n_steps)
    else:
        def chunk(state, li, lm, lmdl, lp, scalars):
            base = {k: v for k, v in scalars.items() if k != "rng"}

            def body(s, xs):
                (bli, blm, blmdl, blp, key) = xs
                img, msk = device_aug._apply_impl(bli, blm, blp)
                batch = {"img": img, "msk": msk, "mdl": blmdl}
                return algo._train_step_impl(s, batch, dict(base, rng=key))

            return jax.lax.scan(body, state,
                                (li, lm, lmdl, lp, scalars["rng"]),
                                length=n_steps)

    return jax.jit(chunk, donate_argnums=(0,))


class Trainer:
    def __init__(self, algo, cfg: Config, phase: str, args=None,
                 experiment: Optional[Experiment] = None, use_mesh: bool = True):
        self.algo = algo
        self.cfg = cfg
        self.phase = phase
        self.args = args
        self.fold = 0 if args is None else getattr(args, "fold", 0)
        expr_name = None
        if args is not None and getattr(args, "expr_name", None):
            expr_name = args.expr_name
        self.expr_name = expr_name or algo.__class__.__name__
        # multi-host: host 0 owns logs/checkpoints/TB; other hosts run the
        # same compute as spectators (jax collectives need every process)
        self._mp = jax.process_count() > 1
        self._primary = jax.process_index() == 0
        self.exp = experiment or Experiment(cfg.expr_root, self.expr_name, phase,
                                            spectator=not self._primary)
        self.mesh = (make_mesh(cfg.data_parallel, batch_size=cfg.batch_size,
                               spatial=getattr(cfg, "spatial_parallel", 1))
                     if use_mesh else None)
        if self.mesh is not None and "space" in self.mesh.axis_names:
            # measured envelope (tests/test_spatial_parallel.py): GSPMD's
            # spatially-partitioned gradients are exact while the coarsest
            # feature map (input/16 after 4 pools) keeps >= max(4, sp) rows;
            # below that XLA's degenerate-halo handling corrupts gradients
            # (rel-L2 ~1 at 32^2) — refuse instead of training wrong.
            spx = self.mesh.shape["space"]
            assert cfg.input_size // 16 >= max(4, spx), (
                f"spatial_parallel={spx} needs input_size >= "
                f"{16 * max(4, spx)} (got {cfg.input_size})")
        self.epoch = 0
        self.device_aug = None
        self._fused_step = None
        self._fused_chunk = None
        # dispatch chunking eligibility (see Config.steps_per_dispatch);
        # multi-host is supported — per-host stacks assemble into global
        # [T, B_global] arrays via shard_batch(axis=1)
        self._chunk_T = int(getattr(cfg, "steps_per_dispatch", 1) or 1)
        if (self._chunk_T < 2
                or hasattr(algo, "make_extra_batch")
                or not cfg.device_augment):
            self._chunk_T = 1
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(self.rng)
        self.state = algo.init_state(init_rng)
        self._log_param_counts()
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
        self._eval_step = jax.jit(self._eval_step_impl)
        self._eval_scan_c = None     # compiled whole-sweep eval scan
        self._eval_dev = None        # device-resident stacked test set
        self._eval_mp_synced = False  # one-time pre-allgather barrier done

    def _log_param_counts(self) -> None:
        """Startup parameter-count log, matching the reference's
        ``count_param_number(self.net, verbose=True, logger=self)`` call in
        every trainer (`misc/visualize.py:25-33`, `crossPseTrainer.py:51-52`,
        `meanTeacherTrainer.py:52`, `coraNetTrainer.py:155`,
        `uganShp0Trainer.py:69`)."""
        from smsut_tpu.utils.io import count_param_number

        trees = (("net", getattr(self.state, "params", None)),
                 ("net2", getattr(self.state, "params2", None)),
                 ("G", getattr(self.state, "g_params", None)),
                 ("D", getattr(self.state, "d_params", None)))
        for label, tree in trees:
            if tree is not None:
                n = count_param_number(tree)
                self.info(f"[{label}] Number of parameters: {n} "
                          f"({n / 1e6:.4f}M)")

    # ------------------------------------------------------------------ utils
    def info(self, s):
        self.exp.info(s)

    def _put(self, tree):
        if self.mesh is not None:
            return shard_batch(self.mesh, tree)
        return jax.device_put(tree)

    def _eval_step_impl(self, params, img, msk):
        logits = self.algo.eval_fn(params, img)
        loss = dice_and_ce_loss(logits, msk, self.cfg.weight_dc, self.cfg.weight_ce,
                                batch_dice=True)
        # uint8 predictions: n_label <= 255 and the per-volume npys are uint8;
        # keeps eval HBM residency small on real test sets
        pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return loss, pred

    # ------------------------------------------------------------------- fit
    def fit(self, loader_type: str = "inTurn") -> None:
        cfg = self.cfg
        tic = time.time()
        import random as pyrandom

        data_rng = pyrandom.Random(cfg.seed)
        self._data_rng = data_rng
        raw = bool(cfg.device_augment)
        if raw:
            from smsut_tpu.data.device_augment import DeviceAugment

            self.device_aug = DeviceAugment(cfg, data_rng)
        else:
            self.device_aug = None
        if loader_type not in ("inTurn", "balance"):
            raise NotImplementedError(loader_type)
        if self._chunk_T > 1:
            # chunked dispatch drains T batches at once — keep producers ahead
            cfg = cfg.replace(prefetch_depth=max(cfg.prefetch_depth,
                                                 2 * self._chunk_T))
        lb_loader = get_loader(cfg.base_root, "train", self.fold, cfg.batch_size,
                               cfg.data_aug, cfg=cfg, rng=data_rng, raw=raw,
                               loader_type=loader_type)
        ul_loader = get_loader(cfg.base_root, "val", self.fold, cfg.batch_size,
                               cfg.data_aug, cfg=cfg, rng=data_rng, raw=raw,
                               loader_type=loader_type)
        test_loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
        if raw and os.environ.get("SMSUT_NO_POST") != "1":
            # sample augment params in the producer threads so the training
            # thread only dispatches; independent RNG streams per loader keep
            # determinism despite threading
            from smsut_tpu.data.device_augment import DeviceAugment as _DA

            da_lb = _DA(cfg, pyrandom.Random(cfg.seed + 101))
            da_ul = _DA(cfg, pyrandom.Random(cfg.seed + 202))
            # stage batches on-device from the producer thread so the H2D
            # transfer of batch i+1 overlaps the compute of batch i (the
            # round-1 pipeline was ~2x slower than the bare step; transfers
            # were on the critical path).  mdl stays host-side — the train
            # loop reads int(mdl[0]) per iteration for metering, which must
            # not become a blocking device fetch.  Multi-host keeps host
            # arrays (shard_batch assembles global arrays itself).
            # chunked dispatch stacks T host batches into one transfer, so
            # per-batch staging only applies at T == 1
            stage = (bool(cfg.prefetch_device) and not self._mp
                     and self._chunk_T == 1)

            def _attach(da):
                def post(b):
                    h, w = b.img.shape[1:3]
                    params = da.sample_params_packed(b.batch_size, h, w)
                    if stage:
                        b = Batch(jax.device_put(b.img), jax.device_put(b.msk),
                                  b.mdl, b.names)
                        params = jax.device_put(params)
                    return (b, params)

                return post

            lb_loader.post = _attach(da_lb)
            ul_loader.post = _attach(da_ul)

        self.info(f"train labeled images: {len(lb_loader.dataset)}")
        self.info(f"train unlabel images: {len(ul_loader.dataset)}")
        self.info(f"test  images: {len(test_loader.dataset)}")

        n_tst_slic, tst_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)
        self.info("Load data cost %.4fs." % (time.time() - tic))
        tic = time.time()

        min_keys = [f"loss_{i}" for i in range(cfg.n_modal)] + ["loss"]
        max_keys = [f"dice_{i}" for i in range(cfg.n_modal)] + ["dice"]
        train_meter = Meter(min_keys, [], alpha=cfg.exp_alpha)
        test_meter = Meter(min_keys, max_keys, alpha=1.0)
        best_epoch = -1

        self._ul_loader = ul_loader  # algorithms with host-side pseudo-label
        lb_itr, ul_itr = _Cycler(lb_loader), _Cycler(ul_loader)
        if hasattr(self.algo, "set_fixed_batch"):
            # fixed images for the per-epoch translation grid
            # (`uganShp0Trainer.py:149-155`)
            fb = lb_itr.next()
            fb = fb[0] if isinstance(fb, tuple) else fb
            img, mdl = fb.img, fb.mdl
            if getattr(self.algo, "uses_unlabeled", False):
                fb2 = ul_itr.next()
                fb2 = fb2[0] if isinstance(fb2, tuple) else fb2
                img = np.concatenate([img, fb2.img])
                mdl = np.concatenate([mdl, fb2.mdl])
            if self.device_aug is not None:  # raw uint8 [B,H,W] batches
                img = (img.astype(np.float32) / 255.0 - 0.5)[..., None] / 0.5
            self.algo.set_fixed_batch(img, mdl)  # numpy; no device program
        max_epoch = (self.algo.max_epoch if hasattr(self.algo, "max_epoch")
                     else cfg.max_epoch)
        best_prefix = getattr(self.algo, "best_prefix", "best")
        last_prefix = getattr(self.algo, "last_prefix", "last")
        if self.epoch:
            self.info(f"Resuming at epoch {self.epoch} (step {int(self.state.step)}).")
        for epoch in range(self.epoch, max_epoch):
            if hasattr(self.algo, "on_epoch_start"):
                self.algo.on_epoch_start(self, epoch)
            train_meter.reset_cur()
            if cfg.profile_dir and epoch == 1:
                # profile the second epoch (first is compile-dominated)
                with jax.profiler.trace(cfg.profile_dir):
                    self.train_epoch(lb_itr, ul_itr, train_meter)
            else:
                self.train_epoch(lb_itr, ul_itr, train_meter)
            self.epoch += 1
            train_meter.update_cur()

            # logged LR comes from the algo when its schedule differs from
            # the default poly (CoraNet: constant in stage A, poly over
            # cora_epoch in stage B); poly_lr_host clamps past-end steps
            if hasattr(self.algo, "lr_at"):
                lr = self.algo.lr_at(int(self.state.step))
            else:
                lr = poly_lr_host(cfg.lr, int(self.state.step),
                                  cfg.total_iters)
            self.info("")
            self.info(f"lr: {lr}.")
            self.info("[TRN] Epoch: %d(%d)/%d, elapsed: %.2fs," %
                      (epoch, best_epoch, max_epoch, time.time() - tic)
                      + str(train_meter))
            self._write_scalars("train", train_meter, epoch)
            self.exp.scalar("train/lr", lr, epoch)
            tic = time.time()

            # eval_every > 1 skips eval/checkpoint/grids on off-epochs (the
            # axon dev tunnel reloads the train program after ANY other
            # executable runs — ~330ms per subsequent step; see CLAUDE.md)
            if (epoch + 1) % max(1, cfg.eval_every) and epoch != max_epoch - 1:
                continue

            test_meter.reset_cur()
            n_prd_slic, prd_npys = self.validate_epoch(test_loader, tst_npys, test_meter)
            assert n_prd_slic == n_tst_slic
            v = self.validate_dice(prd_npys, tst_npys)
            test_meter.accumulate(v, {k: 1.0 for k in v.keys()})
            test_meter.update_cur()
            self.info("[TST] Epoch: %d/%d, elapsed: %.2fs," %
                      (epoch, max_epoch, time.time() - tic) + str(test_meter))
            self._write_scalars("test", test_meter, epoch)
            tic = time.time()

            if test_meter.cur_values["dice"] >= test_meter.best_values["dice"]:
                self.save_model(best_prefix)
                best_epoch = epoch

            if hasattr(self.algo, "on_epoch_end"):
                self.algo.on_epoch_end(self, epoch)

        self.save_model(last_prefix)

    def _write_scalars(self, prefix: str, meter: Meter, epoch: int) -> None:
        for k, v in meter.cur_values.items():
            if "_" in k:
                typ, m = k.split("_")
                new_k = f"{typ}_{Modality(int(m)).name}"
            else:
                new_k = k
            self.exp.scalar(f"{prefix}/{new_k}", v, epoch)

    # ----------------------------------------------------------- train epoch
    def train_epoch(self, lb_itr: _Cycler, ul_itr: _Cycler, meter: Meter) -> None:
        cfg = self.cfg
        scalars_host = self.algo.epoch_scalars(self.epoch)
        pending = []  # (device loss, modality, n) fetched lazily
        log_step = getattr(self.algo, "log_step", 0)
        tic = time.time()
        n_iters = cfg.num_iter_per_epoch * getattr(self.algo, "n_critic", 1)
        uses_ul = getattr(self.algo, "uses_unlabeled", False)
        # per-iteration PRNG keys derived host-side (uint32 pairs are valid
        # threefry keys): zero device programs on the training path — the
        # dev tunnel reloads the main program after any other executable
        self._key_epoch = getattr(self, "_key_epoch", 0) + 1
        hi = np.uint32((self.cfg.seed * 2654435761 + self._key_epoch) & 0xFFFFFFFF)
        keys = np.stack([np.array([hi, i], np.uint32) for i in range(n_iters + 1)])
        if self.device_aug is not None and self._fused_step is None:
            self._fused_step = make_fused_step(self.algo, self.device_aug)
        if (self.device_aug is not None and self._chunk_T > 1):
            self._train_epoch_chunked(lb_itr, ul_itr, meter, scalars_host,
                                      keys, n_iters, log_step, tic)
            return

        import os as _os

        timing = _os.environ.get("SMSUT_TIMING") == "1"
        t_fetch = t_dispatch = t_other = 0.0
        _t0 = time.perf_counter()
        # IMPORTANT: the scalars/extra containers must be the SAME dict
        # objects every call — this backend's jit fastpath keys on container
        # identity and a fresh dict per iteration falls back to a ~330ms
        # slow-path dispatch (measured; values are re-read each call, so
        # in-place reassignment below is safe).
        scalars = dict(scalars_host)
        extra_buf: Dict = {}
        for i in range(n_iters):
            if timing:
                _t = time.perf_counter()
                t_other += _t - _t0
            item = lb_itr.next()
            lb, lb_params = item if isinstance(item, tuple) else (item, None)
            if timing:
                _t2 = time.perf_counter()
                t_fetch += _t2 - _t
            m = int(lb.mdl[0])
            scalars["rng"] = keys[i + 1]
            if hasattr(self.algo, "make_extra_batch"):
                extra_buf.update(self.algo.make_extra_batch())
            extra = extra_buf

            if self.device_aug is not None:
                if lb_params is None:
                    h, w = lb.img.shape[1:3]
                    lb_params = self.device_aug.sample_params_packed(lb.batch_size, h, w)
                args = [lb.img, lb.msk, lb.mdl, lb_params]
                if uses_ul:
                    uitem = ul_itr.next()
                    ul, ul_params = (uitem if isinstance(uitem, tuple)
                                     else (uitem, None))
                    if ul_params is None:
                        h, w = ul.img.shape[1:3]
                        ul_params = self.device_aug.sample_params_packed(
                            ul.batch_size, h, w)
                    args += [ul.img, ul.msk, ul.mdl, ul_params]
                if timing:
                    _t3 = time.perf_counter()
                if self._mp:
                    # assemble the per-host slices into global arrays;
                    # epoch scalars ride along replicated
                    args = shard_batch(self.mesh, args)
                    if extra:
                        extra = shard_batch(self.mesh, extra)
                    scalars = replicate(self.mesh, dict(scalars))
                self.state, metrics = self._fused_step(self.state, *args,
                                                       extra, scalars)
                if timing:
                    _t0 = time.perf_counter()
                    t_dispatch += _t0 - _t3
            else:
                batch = {"img": lb.img, "msk": lb.msk, "mdl": lb.mdl}
                if uses_ul:
                    ul = ul_itr.next()
                    batch["ul_img"] = ul.img
                    batch["ul_mdl"] = ul.mdl
                batch.update(extra)
                batch = self._put(batch)
                sc = (replicate(self.mesh, dict(scalars)) if self._mp
                      else scalars)
                self.state, metrics = self.algo.train_step(self.state, batch,
                                                           sc)
            pending.append((metrics, m, lb.batch_size))
            if log_step and (i + 1) % log_step == 0:
                last = {k: float(v) for k, v in pending[-1][0].items()}
                msg = "Iter: %d/%d(%d), elapsed: %.2fs," % (
                    i, n_iters, int(self.state.step), time.time() - tic)
                tic = time.time()
                for k, v in last.items():
                    msg += " %s: %.4f," % (k, v)
                self.info(msg)
        if timing:
            self.info(f"[TIMING] fetch={t_fetch:.2f}s dispatch={t_dispatch:.2f}s "
                      f"other={t_other:.2f}s over {n_iters} iters")
        # drain metrics once per epoch (single host sync); non-finite losses
        # abort with context (failure detection — the reference would train
        # silently through NaNs)
        for it, (metrics, m, n) in enumerate(pending):
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                diag = {k: float(v) for k, v in metrics.items()
                        if np.ndim(v) == 0}
                raise FloatingPointError(
                    f"non-finite loss at epoch {self.epoch} iter {it}: {diag}")
            v, cnt = Meter.collect_loss_by(loss, m, n)
            meter.accumulate(v, cnt)
            if "loss2" in metrics:  # cross-pseudo meters both nets
                v, cnt = Meter.collect_loss_by(float(metrics["loss2"]), m, n)
                meter.accumulate(v, cnt)

    def _train_epoch_chunked(self, lb_itr, ul_itr, meter, scalars_host, keys,
                             n_iters, log_step, tic) -> None:
        """Chunked variant of the fused train loop: T iterations per
        dispatch (Config.steps_per_dispatch) with one stacked H2D transfer.
        Identical iteration semantics — same batches, augment params and
        per-iteration PRNG keys in the same order as the T=1 loop."""
        T = self._chunk_T
        uses_ul = getattr(self.algo, "uses_unlabeled", False)
        if self._fused_chunk is None:
            self._fused_chunk = make_fused_chunk(self.algo, self.device_aug, T)
        scalars = dict(scalars_host)     # remainder path (same-dict rule)
        scalars_c = dict(scalars_host)   # chunk path
        extra0: Dict = {}
        pending = []

        def fetch(itr):
            item = itr.next()
            b, p = item if isinstance(item, tuple) else (item, None)
            if p is None:
                h, w = b.img.shape[1:3]
                p = self.device_aug.sample_params_packed(b.batch_size, h, w)
            return b, p

        done = 0
        while done < n_iters:
            t = min(T, n_iters - done)
            lbs = [fetch(lb_itr) for _ in range(t)]
            uls = [fetch(ul_itr) for _ in range(t)] if uses_ul else []
            ms = [int(b.mdl[0]) for b, _ in lbs]
            ns = [b.batch_size for b, _ in lbs]
            if t == T:
                stack = ((lambda xs: np.stack(xs)) if self._mp
                         else (lambda xs: jax.device_put(np.stack(xs))))
                args = [stack([b.img for b, _ in lbs]),
                        stack([b.msk for b, _ in lbs]),
                        stack([b.mdl for b, _ in lbs]),
                        stack([p for _, p in lbs])]
                if uses_ul:
                    args += [stack([b.img for b, _ in uls]),
                             stack([b.msk for b, _ in uls]),
                             stack([b.mdl for b, _ in uls]),
                             stack([p for _, p in uls])]
                scalars_c["rng"] = keys[done + 1: done + 1 + T]
                sc = scalars_c
                if self._mp:
                    # per-host [T, B_local] stacks -> global [T, B_global]
                    args = shard_batch(self.mesh, args, axis=1)
                    sc = replicate(self.mesh, dict(scalars_c))
                self.state, mets = self._fused_chunk(self.state, *args,
                                                     sc)
                pending.append((mets, ms, ns))
            else:  # remainder: per-iteration fused dispatches
                for j, (b, p) in enumerate(lbs):
                    scalars["rng"] = keys[done + 1 + j]
                    a = [b.img, b.msk, b.mdl, p]
                    if uses_ul:
                        ub, up = uls[j]
                        a += [ub.img, ub.msk, ub.mdl, up]
                    sc = scalars
                    if self._mp:
                        a = shard_batch(self.mesh, a)
                        sc = replicate(self.mesh, dict(scalars))
                    self.state, met = self._fused_step(self.state, *a,
                                                       extra0, sc)
                    pending.append((met, [ms[j]], [ns[j]]))
            done += t
            if log_step and (done % log_step) < t:
                mets = pending[-1][0]
                last = {k: float(np.asarray(v).reshape(-1)[-1])
                        for k, v in mets.items()}
                msg = "Iter: %d/%d(%d), elapsed: %.2fs," % (
                    done - 1, n_iters, int(self.state.step), time.time() - tic)
                tic = time.time()
                for k, v in last.items():
                    msg += " %s: %.4f," % (k, v)
                self.info(msg)

        it = 0
        for mets, ms, ns in pending:
            host = {k: np.asarray(v).reshape(len(ms), -1)
                    for k, v in mets.items()}
            for j, (m, n) in enumerate(zip(ms, ns)):
                loss = float(host["loss"][j, 0])
                if not np.isfinite(loss):
                    diag = {k: float(v[j, 0]) for k, v in host.items()}
                    raise FloatingPointError(
                        f"non-finite loss at epoch {self.epoch} iter {it}: "
                        f"{diag}")
                v, cnt = Meter.collect_loss_by(loss, m, n)
                meter.accumulate(v, cnt)
                if "loss2" in host:
                    v, cnt = Meter.collect_loss_by(float(host["loss2"][j, 0]),
                                                   m, n)
                    meter.accumulate(v, cnt)
                it += 1

    # ------------------------------------------------------------ validation
    def _eval_stack(self, loader: BatchLoader):
        """Stack the (static) padded test batches once: uint8 images/masks
        [N,B,H,W], per-row validity mask [N,B] and host metadata.  The test
        sweep never changes across epochs, so the arrays live on device for
        the whole run (uint8: the reference-scale test set is ~100MB)."""
        # key by the loader OBJECT (a held reference, not id()): a freed
        # loader's id can be reused by a new one, which would silently
        # serve a stale stacked test set
        cached = getattr(self, "_eval_cache", None)
        if cached is not None and cached[0] is loader:
            return cached[1]
        B = self.cfg.batch_size
        ds = loader.dataset
        imgs, msks, valid, metas = [], [], [], []
        for idxs in loader.sampler:
            fast = ds.gather_batch_u8(idxs)
            if fast is not None:
                img, msk = fast
            else:
                raws = [ds.get_raw(i) for i in idxs]
                img = np.stack([r[0] for r in raws])
                msk = np.stack([r[1] for r in raws])
            names = [ds.samples[i][3] for i in idxs]
            mdl0 = int(ds.samples[idxs[0]][2])
            assert all(ds.samples[i][2] == mdl0 for i in idxs)
            b = len(idxs)
            if b < B:   # pad to the single compiled shape (zeroed rows, like
                # the per-batch path's normalized-zero image padding)
                pad = B - b
                img = np.concatenate([img, np.zeros((pad,) + img.shape[1:],
                                                    img.dtype)])
                msk = np.concatenate([msk, np.zeros((pad,) + msk.shape[1:],
                                                    msk.dtype)])
            v = np.zeros(B, np.float32)
            v[:b] = 1.0
            imgs.append(img)
            msks.append(msk)
            valid.append(v)
            metas.append((b, mdl0, names))
        stack = (np.stack(imgs), np.stack(msks), np.stack(valid))
        self._eval_cache = (loader, (stack, metas))
        return stack, metas

    @staticmethod
    def _eval_scan_fn(eval_step_impl):
        """(params, [N,B,H,W] u8 imgs/msks, [N,B] valid) -> ([N], [N,B,H,W]).
        Normalization matches the host ToTensor+Normalize(0.5,0.5); padded
        rows become exactly 0.0 like the per-batch float padding."""
        def run(params, imgs, msks, valid):
            def body(_, xs):
                img8, msk8, v = xs
                img = (img8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
                img = (img * v[:, None, None])[..., None]
                msk = msk8.astype(jnp.int32)
                loss, pred = eval_step_impl(params, img, msk)
                return 0, (loss, pred)
            return jax.lax.scan(body, 0, (imgs, msks, valid))[1]

        return run

    def _validate_epoch_scan(self, loader, npys, meter):
        """One (or per-host one) dispatch for the whole eval sweep."""
        from jax.sharding import NamedSharding, PartitionSpec

        (imgs, msks, valid), metas = self._eval_stack(loader)
        n = imgs.shape[0]
        params = self.algo.eval_params(self.state)
        if self._mp:
            # shard the sweep across hosts: each process evals its padded
            # contiguous slice locally (host-local params copy — a few MB),
            # then the results are re-gathered on every host
            from jax.experimental import multihost_utils
            nproc = jax.process_count()
            per = -(-n // nproc)
            pad = per * nproc - n
            if pad:
                rep = lambda a: np.concatenate([a, a[-1:].repeat(pad, 0)])
                imgs, msks, valid = rep(imgs), rep(msks), rep(valid)
            pid = jax.process_index()
            sl = slice(pid * per, (pid + 1) * per)
            host_params = jax.tree_util.tree_map(np.asarray, params)
            if self._eval_scan_c is None:
                self._eval_scan_c = jax.jit(
                    self._eval_scan_fn(self._eval_step_impl))
            losses, preds = self._eval_scan_c(
                host_params, imgs[sl], msks[sl], valid[sl])
            losses, preds = np.asarray(losses), np.asarray(preds)
            if not self._eval_mp_synced:
                # the host-local eval compile above can skew processes by
                # minutes; if this allgather is the process's FIRST
                # collective, the Gloo context init would hit its ~30s
                # deadline (distributed.barrier docstring) — re-sync once
                from smsut_tpu.parallel import distributed as _dist
                _dist.barrier("eval-sweep-compiled")
                self._eval_mp_synced = True
            losses, preds = jax.tree_util.tree_map(
                lambda x: np.asarray(x),
                multihost_utils.process_allgather((losses, preds)))
            losses = losses.reshape(per * nproc)[:n]
            preds = preds.reshape((per * nproc,) + preds.shape[2:])[:n]
        else:
            if self._eval_scan_c is None:
                self._eval_scan_c = jax.jit(
                    self._eval_scan_fn(self._eval_step_impl))
            dev = self._eval_dev
            if dev is None or dev[0] is not loader:
                if self.mesh is not None:
                    from smsut_tpu.parallel.mesh import batch_sharding

                    def put(x):
                        return jax.device_put(
                            x, batch_sharding(self.mesh, 1, np.ndim(x)))
                else:
                    put = jax.device_put
                dev = (loader, (put(imgs), put(msks), put(valid)))
                self._eval_dev = dev
            losses, preds = self._eval_scan_c(params, *dev[1])
            losses = np.asarray(losses)
            preds = np.asarray(preds)

        prd_npys = {k: np.zeros(v.shape, dtype=v.dtype) for k, v in npys.items()}
        n_prd_slic = 0
        for j, (b, mdl0, names) in enumerate(metas):
            if meter is not None:
                v, cnt = Meter.collect_loss_by(float(losses[j]), mdl0, b)
                meter.accumulate(v, cnt)
            for i in range(b):
                m, pid_, z = names[i].split("_")
                prd_npys[f"{m}_{pid_}"][int(z)] = preds[j, i]
                n_prd_slic += 1
        return n_prd_slic, prd_npys

    def validate_epoch(self, loader: BatchLoader, npys: Dict[str, np.ndarray],
                       meter: Optional[Meter] = None
                       ) -> Tuple[int, Dict[str, np.ndarray]]:
        cfg = self.cfg
        if getattr(cfg, "eval_scan", False):
            return self._validate_epoch_scan(loader, npys, meter)
        prd_npys = {k: np.zeros(v.shape, dtype=v.dtype) for k, v in npys.items()}
        n_prd_slic = 0
        params = self.algo.eval_params(self.state)
        pending = []
        for batch in loader:
            b = batch.batch_size
            img, msk = batch.img, batch.msk
            if b != cfg.batch_size:
                # pad partial batches to keep a single compiled shape
                # (`baseTrainer.py:216-226`)
                pad = cfg.batch_size - b
                img = np.concatenate([img, np.zeros((pad,) + img.shape[1:],
                                                    img.dtype)])
                msk = np.concatenate([msk, np.zeros((pad,) + msk.shape[1:],
                                                    msk.dtype)])
            assert len(np.unique(batch.mdl)) == 1
            # multi-host: eval is replicated (test loaders are global — every
            # host computes the full eval; host 0 logs it)
            dev = (replicate(self.mesh, {"img": img, "msk": msk}) if self._mp
                   else self._put({"img": img, "msk": msk}))
            loss, pred = self._eval_step(params, dev["img"], dev["msk"])
            pending.append((loss, pred, batch))
        for loss, pred, batch in pending:
            b = batch.batch_size
            if meter is not None:
                v, n = Meter.collect_loss_by(float(loss), int(batch.mdl[0]),
                                             batch.img.shape[0])
                meter.accumulate(v, n)
            pred = np.asarray(pred)[:b]
            for i in range(b):
                m, pid, z = batch.names[i].split("_")
                prd_npys[f"{m}_{pid}"][int(z)] = pred[i]
                n_prd_slic += 1
        return n_prd_slic, prd_npys

    def validate_dice(self, prd_npys, gt_npys) -> Dict[str, float]:
        mo = get_mo_matrix(prd_npys, gt_npys, self.cfg)
        dices = {f"dice_{i}": mo[i, -1] for i in range(self.cfg.n_modal)}
        dices["dice"] = mo[-1, -1]
        return dices

    # ------------------------------------------------------------------ test
    def test(self, loader_type: str, expr_root: str) -> str:
        cfg = self.cfg
        test_loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
        n_gt_slic, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)
        n_prd_slic, prd_npys = self.validate_epoch(test_loader, gt_npys, None)
        assert n_prd_slic == n_gt_slic
        matrix = get_mo_matrix(prd_npys, gt_npys, cfg)
        dc_matrix, hd_matrix, assd_matrix = get_all_matrix(prd_npys, gt_npys, cfg)
        log = matrix_to_csv(matrix, assd_matrix)
        save_path = pjoin(expr_root, "all_trois_matrix.csv")
        with open(save_path, "w") as f:
            f.write(log)
        self.info(log)
        return save_path

    # ------------------------------------------------------------ checkpoint
    def save_model(self, prefix: str) -> None:
        if not self._primary:
            return  # host 0 owns checkpoints (state is replicated)
        path = checkpoints.save_state(self.state, self.exp.ckpt_root, prefix)
        self.info(f"Save model to {path}.")

    def load_model(self, model_idx: Optional[str], which_ckpt: str = "last") -> None:
        ckpt_root = pjoin(self.exp.expr_root, model_idx or self.exp.model_idx, "ckpt")
        self.state = checkpoints.load_state(self.state, ckpt_root, which_ckpt)
        self.info(f"Load model from {ckpt_root}/{which_ckpt}.ckpt.")
