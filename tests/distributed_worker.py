# -*- coding: utf-8 -*-
"""One process of the multi-host test (driven by tests/test_distributed.py).

Initializes jax.distributed from the SMSUT_* env contract, builds the global
('data',) mesh across both processes (4 CPU devices each -> 8 global), feeds
its local slice of a fixed global batch through ``shard_batch``'s
process-local assembly, runs N supervised train steps, and prints a JSON
line with the final loss and a parameter checksum for the parent to compare
against the single-process run."""
import json
import os
import sys

import jax

from smsut_tpu.utils.cachekey import cache_dir

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", cache_dir("/tmp/smsut-jax-cache-cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:  # cross-process CPU collectives
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from smsut_tpu.parallel import distributed

if __name__ == "__main__":
    assert distributed.initialize(), "SMSUT_* env vars must be set"

import jax.numpy as jnp
import numpy as np

from smsut_tpu.config import Config
from smsut_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from smsut_tpu.train.steps.supervised import SupervisedUNet


def _state_checksum(state) -> float:
    leaves = [l for l in jax.tree_util.tree_leaves(state)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    return float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))


def _dump_leaves(state, path: str) -> None:
    """Debug aid: per-leaf |sum| map (SMSUT_DUMP_LEAVES=file)."""
    from jax.tree_util import keystr, tree_flatten_with_path

    flat, _ = tree_flatten_with_path(state)
    out = {keystr(k): float(jnp.sum(jnp.abs(v)))
           for k, v in flat
           if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)}
    with open(path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)


def _gan_inputs(n_steps: int, gb: int, size: int = 64):
    """Deterministic raw uint8 batches + augment params, identical on every
    process (same seeds)."""
    import random

    from smsut_tpu.data.device_augment import DeviceAugment

    cfg = Config(input_size=size, base_width=4, batch_size=gb,
                 compute_dtype="float32",
                 data_aug=dict(Config().data_aug, resizeCrop_size=size))
    da = DeviceAugment(cfg, random.Random(5))
    rng = np.random.default_rng(0)
    mk = lambda: rng.integers(0, 255, (n_steps, gb, size, size)).astype(np.uint8)
    mkm = lambda: rng.integers(0, 5, (n_steps, gb, size, size)).astype(np.uint8)
    li, lm, ui, um = mk(), mkm(), mk(), mkm()
    lmdl = np.tile(rng.integers(0, 4, (n_steps, 1)).astype(np.int32), (1, gb))
    umdl = np.tile(rng.integers(0, 4, (n_steps, 1)).astype(np.int32), (1, gb))
    lp = np.stack([da.sample_params_packed(gb, size, size)
                   for _ in range(n_steps)])
    up = np.stack([da.sample_params_packed(gb, size, size)
                   for _ in range(n_steps)])
    keys = np.stack([np.array([7, i], np.uint32) for i in range(n_steps)])
    return cfg, da, (li, lm, lmdl, lp, ui, um, umdl, up, keys)


def run_gan(n_steps: int = None, gb: int = 8):
    """uganConsis fused augment+D+GP+G step over the global mesh: the
    flagship multi-host path (VERDICT r2 #5).

    One step is the honest comparison horizon: the WGAN-GP grad-of-grad
    update is measurably chaotic in f32 (tests/test_gan_training_parity.py
    envelope), so the gloo(2x4)-vs-XLA(8) all-reduce grouping drift (~1e-7
    rel on gradients) amplifies ~1000x per step through the updated D.
    Measured at step 1: params match to 3e-7 (G) / 1e-5 (D) rel while D's
    Adam second moments of the huge GP gradients already differ 1.3e-4 —
    so the comparison is per-metric + param-only checksums, not full state.
    """
    if n_steps is None:
        n_steps = int(os.environ.get("SMSUT_GAN_STEPS", "1"))
    from smsut_tpu.train.loop import make_fused_step
    from smsut_tpu.train.steps.gan import UGANConsisAlgo

    cfg, da, (li, lm, lmdl, lp, ui, um, umdl, up, keys) = _gan_inputs(n_steps, gb)
    algo = UGANConsisAlgo(cfg)
    mesh = make_mesh(batch_size=gb)
    state = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))
    fused = make_fused_step(algo, da)
    sl = (distributed.local_batch_slice(gb) if jax.process_count() > 1
          else slice(None))
    base = algo.epoch_scalars(0)
    for t in range(n_steps):
        # augment params are per-sample rows: sliced like the batch
        args = [li[t][sl], lm[t][sl], lmdl[t][sl], lp[t][sl],
                ui[t][sl], um[t][sl], umdl[t][sl], up[t][sl]]
        args = shard_batch(mesh, args)
        sc = replicate(mesh, dict(base, rng=keys[t]))
        if t == 0:
            # AOT-compile then re-sync: the Gloo context init at the first
            # collective has a ~30s deadline, far below the compile skew of
            # two cold processes on one CPU (distributed.barrier docstring)
            fused.lower(state, *args, {}, sc).compile()
            distributed.barrier("gan-compiled")
        state, metrics = fused(state, *args, {}, sc)
    dump = os.environ.get("SMSUT_DUMP_LEAVES")
    if dump and distributed.is_primary():
        _dump_leaves(state, dump)
        with open(dump + ".metrics", "w") as f:
            json.dump({k: float(np.asarray(v).mean())
                       for k, v in metrics.items()}, f, indent=0, sort_keys=True)
    return ({k: float(np.asarray(v).mean()) for k, v in metrics.items()},
            _state_checksum(state.g_params), _state_checksum(state.d_params))


def run_chunked(T: int = 2, n_chunks: int = 2, gb: int = 8):
    """Chunked dispatch (T iterations per execute) over the global mesh —
    the multi-host T>1 path (VERDICT r2 #5)."""
    from smsut_tpu.train.loop import make_fused_chunk

    n_steps = T * n_chunks
    cfg, da, (li, lm, lmdl, lp, ui, um, umdl, up, keys) = _gan_inputs(n_steps, gb)
    algo = SupervisedUNet(cfg)
    mesh = make_mesh(batch_size=gb)
    state = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))
    chunk = make_fused_chunk(algo, da, T)
    sl = (distributed.local_batch_slice(gb) if jax.process_count() > 1
          else slice(None))
    for c in range(n_chunks):
        t0 = c * T
        args = [li[t0:t0 + T, sl], lm[t0:t0 + T, sl], lmdl[t0:t0 + T, sl],
                lp[t0:t0 + T, sl]]
        args = shard_batch(mesh, args, axis=1)
        sc = replicate(mesh, {"rng": keys[t0:t0 + T]})
        if c == 0:
            chunk.lower(state, *args, sc).compile()
            distributed.barrier("chunk-compiled")
        state, mets = chunk(state, *args, sc)
    return float(np.asarray(mets["loss"])[-1]), _state_checksum(state)


def run_pseudo():
    """CoraNet stage-B pseudo pipeline under multi-process: the unlabeled
    stream must be GLOBAL (identical self._pseudo on every host — it is
    deliberately NOT sharded) and make_extra_batch's per-host slice of the
    shared shuffled index list must assemble to the single-process batch.
    Returns (proc, pseudo_sha, [per-draw slice shas], plab_dice)."""
    import hashlib
    import random as pyrandom

    from smsut_tpu.train.steps.coranet import CoraNet

    data_root = os.environ["SMSUT_DATA_ROOT"]
    cfg = Config(base_root=data_root, input_size=32, base_width=4,
                 batch_size=4, device_augment=False, compute_dtype="float32",
                 data_aug=dict(Config().data_aug, resizeCrop_size=32))
    algo = CoraNet(cfg, stage="cora")
    state = algo.init_state(jax.random.PRNGKey(0))

    class _T:
        fold = 0
        _data_rng = pyrandom.Random(2020)

    algo._pseudo, plab_dice = algo.pred_unlabel(state, algo._unlabeled_stream(_T()))
    algo._pseudo_order = []

    def sha(*arrays):
        h = hashlib.sha256()
        for a in arrays:
            h.update(np.ascontiguousarray(a).tobytes())
        return h.hexdigest()

    pseudo_sha = sha(*(algo._pseudo[k] for k in sorted(algo._pseudo)))
    draws = []
    for _ in range(3):
        b = algo.make_extra_batch()
        draws.append(sha(b["pse_img"], b["pse_lab"], b["pse_mask"]))
    return pseudo_sha, draws, float(plab_dice)


def run_eval():
    """Multi-host sharded whole-sweep eval (train/loop.py
    _validate_epoch_scan `_mp` branch): each host evals its contiguous
    padded slice with a host-local params copy, then allgathers.  Returns
    (n_pred_slices, sha256 of the reassembled volume predictions, meter
    values) for the parent to compare against a single-process run."""
    import hashlib

    from smsut_tpu.data.dataset import get_label_npys, get_loader
    from smsut_tpu.train.loop import Trainer
    from smsut_tpu.train.steps.supervised import SupervisedUNet
    from smsut_tpu.utils.meter import Meter

    # batch 8: make_mesh clamps the data axis to divide the batch, and a
    # narrower mesh would hold no local devices on process 1
    cfg = Config(base_root=os.environ["SMSUT_DATA_ROOT"],
                 expr_root=os.environ["SMSUT_EXPR_ROOT"],
                 input_size=32, base_width=4, batch_size=8,
                 compute_dtype="float32")
    algo = SupervisedUNet(cfg)
    trainer = Trainer(algo, cfg, "test")
    loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    n_gt, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)
    meter = Meter([f"loss_{i}" for i in range(4)] + ["loss"], [], alpha=1.0)
    meter.reset_cur()
    n_prd, prd = trainer.validate_epoch(loader, gt_npys, meter)
    meter.update_cur()
    h = hashlib.sha256()
    for k in sorted(prd):
        h.update(np.ascontiguousarray(prd[k]).tobytes())
    return n_prd, h.hexdigest(), {k: float(v) for k, v in
                                  dict(meter.cur_values).items()}


def run_ckpt(global_batch: int = 8):
    """Elastic resume, save side (VERDICT r3 #5): train 3 supervised steps on
    the 2-process global mesh, checkpoint the FULL replicated state via
    orbax's multi-host path, continue 2 more steps, and report the final
    checksum.  The parent restores the checkpoint in a SINGLE process and
    replays the last 2 steps — matching checksums prove the checkpoint is
    portable across process counts (`uganShp0Trainer.py:76-107` save/load
    surface, extended with true mid-training resume)."""
    from smsut_tpu.train import checkpoints

    cfg = Config(input_size=64, base_width=4, batch_size=global_batch,
                 norm_stats="reduce")
    algo = SupervisedUNet(cfg)
    mesh = make_mesh(batch_size=global_batch)
    state = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    img_g = rng.normal(size=(global_batch, 64, 64, 1)).astype(np.float32)
    msk_g = rng.integers(0, cfg.n_class,
                         size=(global_batch, 64, 64)).astype(np.int32)
    sl = distributed.local_batch_slice(global_batch)
    batch = shard_batch(mesh, {"img": img_g[sl], "msk": msk_g[sl]})
    algo._train_step.lower(state, batch, {}).compile()
    distributed.barrier("ckpt-compiled")
    for _ in range(3):
        state, _ = algo.train_step(state, batch, {})
    checkpoints.save_state(state, os.environ["SMSUT_CKPT_DIR"], "elastic")
    distributed.barrier("ckpt-saved")
    for _ in range(2):
        state, metrics = algo.train_step(state, batch, {})
    return float(metrics["loss"]), _state_checksum(state.params)


def main(n_steps: int = 3, global_batch: int = 8) -> None:
    mode = os.environ.get("SMSUT_MODE", "step")
    if mode == "ckpt":
        loss, cksum = run_ckpt()
        if distributed.is_primary():
            print(json.dumps({"loss": loss, "checksum": cksum}))
        sys.stdout.flush()
        return
    if mode == "eval":
        n_prd, sha, mets = run_eval()
        print(json.dumps({"proc": distributed.process_index(),
                          "n_prd": n_prd, "sha": sha, "meter": mets}))
        sys.stdout.flush()
        return
    if mode == "pseudo":
        pseudo_sha, draws, plab_dice = run_pseudo()
        print(json.dumps({"proc": distributed.process_index(),
                          "pseudo_sha": pseudo_sha, "draws": draws,
                          "plab_dice": plab_dice}))
        sys.stdout.flush()
        return
    if mode == "gan":
        metrics, g_cksum, d_cksum = run_gan()
        if distributed.is_primary():
            print(json.dumps({"metrics": metrics, "g_checksum": g_cksum,
                              "d_checksum": d_cksum}))
        sys.stdout.flush()
        return
    if mode == "chunked":
        loss, cksum = run_chunked()
        if distributed.is_primary():
            print(json.dumps({"loss": loss, "checksum": cksum}))
        sys.stdout.flush()
        return
    main_step(n_steps, global_batch)


def main_step(n_steps: int = 3, global_batch: int = 8) -> None:
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    # norm_stats pinned: the 1e-4 cross-arrangement tolerance in
    # test_distributed was calibrated with f32 statistics; bf16-stat
    # quantization amplifies the all-reduce-grouping drift past it.
    cfg = Config(input_size=64, base_width=4, batch_size=global_batch,
                 norm_stats="reduce")
    algo = SupervisedUNet(cfg)
    mesh = make_mesh(batch_size=global_batch)
    assert mesh.devices.size == 8, mesh

    state = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    img_g = rng.normal(size=(global_batch, 64, 64, 1)).astype(np.float32)
    msk_g = rng.integers(0, cfg.n_class, size=(global_batch, 64, 64)).astype(np.int32)
    sl = distributed.local_batch_slice(global_batch)
    batch = shard_batch(mesh, {"img": img_g[sl], "msk": msk_g[sl]})

    algo._train_step.lower(state, batch, {}).compile()
    distributed.barrier("step-compiled")
    for _ in range(n_steps):
        state, metrics = algo.train_step(state, batch, {})

    leaves = jax.tree_util.tree_leaves(state.params)
    cksum = float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))
    loss = float(metrics["loss"])
    if distributed.is_primary():
        print(json.dumps({"loss": loss, "checksum": cksum}))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
