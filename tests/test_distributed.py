# -*- coding: utf-8 -*-
"""Multi-host data parallelism, end to end.

The reference's only multi-device path is single-process DataParallel
(`/root/reference/trainer/uganShp0Trainer.py:66-68`); SURVEY §2.7 promises
multi-host via standard JAX distributed init.  These tests prove the wiring:

  * ``ShardedBatchSampler`` partitions every global batch into contiguous
    per-process slices whose union is the original stream;
  * two REAL ``jax.distributed`` CPU processes (4 virtual devices each, 8
    global) run supervised train steps over the global ('data',) mesh and
    match the single-process 8-device run.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sharded_sampler_partitions_batches():
    from smsut_tpu.data.samplers import InTurnTrainBatchSampler, ShardedBatchSampler
    import random

    samples = [list(range(i * 100, i * 100 + 40)) for i in range(4)]
    base = InTurnTrainBatchSampler([list(s) for s in samples], 8,
                                   rng=random.Random(7))
    global_batches = list(base)

    shards = []
    for sid in range(2):
        base_i = InTurnTrainBatchSampler([list(s) for s in samples], 8,
                                         rng=random.Random(7))
        shards.append(list(ShardedBatchSampler(base_i, 2, sid)))

    assert len(shards[0]) == len(shards[1]) == len(global_batches)
    for g, a, b in zip(global_batches, shards[0], shards[1]):
        assert len(a) == len(b) == 4
        assert a + b == g  # contiguous slices, in order


def test_local_batch_slice_rejects_indivisible(monkeypatch):
    """An indivisible global batch must fail loud, not silently drop rows
    (VERDICT r3 #6)."""
    from smsut_tpu.parallel import distributed

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert distributed.local_batch_slice(9) == slice(3, 6)
    with pytest.raises(ValueError, match="not divisible"):
        distributed.local_batch_slice(8)


def test_get_loader_explicit_shards(tmp_path):
    from smsut_tpu.data.dataset import get_loader
    from smsut_tpu.data.synthetic import make_synthetic_dataset
    import random

    root = str(tmp_path)
    make_synthetic_dataset(root, n_patients_per_modality=2, n_slice=8, size=32)
    full = get_loader(root, "train", 0, 4, rng=random.Random(3),
                      num_shards=1, shard_id=0)
    l0 = get_loader(root, "train", 0, 4, rng=random.Random(3),
                    num_shards=2, shard_id=0)
    l1 = get_loader(root, "train", 0, 4, rng=random.Random(3),
                    num_shards=2, shard_id=1)
    for bf, b0, b1 in zip(full, l0, l1):
        assert b0.batch_size == b1.batch_size == 2
        np.testing.assert_array_equal(
            np.concatenate([b0.img, b1.img]), bf.img)
        np.testing.assert_array_equal(
            np.concatenate([b0.msk, b1.msk]), bf.msk)
        assert b0.names + b1.names == bf.names


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference(n_steps: int = 3, global_batch: int = 8):
    """Same computation as distributed_worker.main on this process's
    8-device mesh."""
    from smsut_tpu.config import Config
    from smsut_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from smsut_tpu.train.steps.supervised import SupervisedUNet

    cfg = Config(input_size=64, base_width=4, batch_size=global_batch,
                 norm_stats="reduce")   # match distributed_worker.main_step
    algo = SupervisedUNet(cfg)
    mesh = make_mesh(batch_size=global_batch)
    state = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    img = rng.normal(size=(global_batch, 64, 64, 1)).astype(np.float32)
    msk = rng.integers(0, cfg.n_class, size=(global_batch, 64, 64)).astype(np.int32)
    batch = shard_batch(mesh, {"img": img, "msk": msk})
    for _ in range(n_steps):
        state, metrics = algo.train_step(state, batch, {})
    leaves = jax.tree_util.tree_leaves(state.params)
    cksum = float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))
    return float(metrics["loss"]), cksum


def _run_two_workers(mode: str, timeout: int = 600, extra_env: dict = None,
                     all_outputs: bool = False):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ, **(extra_env or {}))
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["SMSUT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["SMSUT_NUM_PROCESSES"] = "2"
        env["SMSUT_PROCESS_ID"] = str(pid)
        env["SMSUT_MODE"] = mode
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "distributed_worker.py")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)
    if all_outputs:
        return [json.loads(o.strip().splitlines()[-1]) for o in outs]
    return json.loads(outs[0].strip().splitlines()[-1])


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    result = _run_two_workers("step")
    ref_loss, ref_cksum = _single_process_reference()
    # identical math, different all-reduce grouping -> tiny float drift
    assert abs(result["loss"] - ref_loss) < 1e-4, (result, ref_loss)
    assert abs(result["checksum"] - ref_cksum) / max(abs(ref_cksum), 1.0) < 1e-5, \
        (result, ref_cksum)


@pytest.mark.slow
def test_elastic_resume_two_proc_to_one_proc(tmp_path):
    """Train 2-proc, checkpoint mid-training, resume SINGLE-process and
    match (VERDICT r3 #5).  The 2-proc workers save the full state (params +
    optimizer + step) after step 3 via orbax's multi-host path and finish 5
    steps; here we restore that checkpoint with jax.process_count()==1,
    replay steps 4-5 on the local 8-device mesh, and compare checksums."""
    from smsut_tpu.config import Config
    from smsut_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from smsut_tpu.train import checkpoints
    from smsut_tpu.train.steps.supervised import SupervisedUNet

    result = _run_two_workers("ckpt",
                              extra_env={"SMSUT_CKPT_DIR": str(tmp_path)})

    global_batch = 8
    cfg = Config(input_size=64, base_width=4, batch_size=global_batch,
                 norm_stats="reduce")
    algo = SupervisedUNet(cfg)
    template = algo.init_state(jax.random.PRNGKey(1))
    restored = checkpoints.load_state(template, str(tmp_path), "elastic")
    assert int(restored.step) == 3   # mid-training, not weights-only
    mesh = make_mesh(batch_size=global_batch)
    state = replicate(mesh, restored)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(global_batch, 64, 64, 1)).astype(np.float32)
    msk = rng.integers(0, cfg.n_class,
                       size=(global_batch, 64, 64)).astype(np.int32)
    batch = shard_batch(mesh, {"img": img, "msk": msk})
    for _ in range(2):
        state, metrics = algo.train_step(state, batch, {})
    leaves = jax.tree_util.tree_leaves(state.params)
    cksum = float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))
    # identical math, different all-reduce grouping -> tiny float drift
    assert abs(result["loss"] - float(metrics["loss"])) < 1e-4, result
    assert abs(result["checksum"] - cksum) / max(abs(cksum), 1.0) < 1e-5, \
        (result, cksum)


@pytest.mark.slow
def test_two_process_gan_step_matches_single_process():
    """Flagship uganConsis fused augment+D+GP+G step, 2 real processes vs
    this process's 8-device run (VERDICT r2 #5).

    One step, per-metric + param-only comparison: the WGAN-GP update is
    chaotic in f32 (see distributed_worker.run_gan docstring), so tolerances
    are set from the measured gloo-vs-XLA reduction-grouping drift — the
    pre-update metrics match to ~1e-6, the G metrics computed through the
    freshly-updated D carry the one-step amplification (~2e-4 abs), and the
    opt-state Adam moments of the GP gradients are excluded entirely."""
    import tests.distributed_worker as worker

    result = _run_two_workers("gan", timeout=1200)
    ref_metrics, ref_g, ref_d = worker.run_gan()
    m = result["metrics"]
    # computed from identical (replicated) pre-update params:
    for k in ("loss", "D_cls", "D_real", "D_fake", "D_gp",
              "G_nce", "G_rec", "G_seg"):
        assert abs(m[k] - ref_metrics[k]) <= 1e-4 * max(abs(ref_metrics[k]), 1.0), \
            (k, m[k], ref_metrics[k])
    # computed through the once-updated D (one chaos amplification):
    for k in ("G_cls", "G_fake"):
        assert abs(m[k] - ref_metrics[k]) < 5e-3, (k, m[k], ref_metrics[k])
    assert abs(result["g_checksum"] - ref_g) / max(abs(ref_g), 1.0) < 1e-5, \
        (result, ref_g)
    assert abs(result["d_checksum"] - ref_d) / max(abs(ref_d), 1.0) < 1e-4, \
        (result, ref_d)


@pytest.mark.slow
def test_two_process_chunked_dispatch_matches_single_process():
    """steps_per_dispatch > 1 under multi-process: per-host [T, B_local]
    stacks assemble into the same global chunk (VERDICT r2 #5)."""
    import tests.distributed_worker as worker

    result = _run_two_workers("chunked")
    ref_loss, ref_cksum = worker.run_chunked()
    assert abs(result["loss"] - ref_loss) < 1e-4, (result, ref_loss)
    assert abs(result["checksum"] - ref_cksum) / max(abs(ref_cksum), 1.0) < 1e-5, \
        (result, ref_cksum)


@pytest.mark.slow
def test_two_process_coranet_pseudo_matches_single_process(tmp_path):
    """CoraNet stage B's pseudo-label pipeline under 2 real processes: the
    unlabeled stream stays GLOBAL (identical _pseudo on both hosts) and the
    per-host make_extra_batch slices assemble to exactly the single-process
    global batch.  Regression for the auto-sharded 'val' loader bug."""
    import hashlib

    from smsut_tpu.data.synthetic import make_synthetic_dataset

    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=4,
                           size=32)
    results = _run_two_workers("pseudo", extra_env={"SMSUT_DATA_ROOT": data_root},
                               all_outputs=True)
    by_proc = {r["proc"]: r for r in results}
    assert set(by_proc) == {0, 1}
    # premise 1: the pseudo set is bit-identical on every host
    assert by_proc[0]["pseudo_sha"] == by_proc[1]["pseudo_sha"]

    # premise 2: the two hosts' slices are this process's global batch
    import random as pyrandom

    from smsut_tpu.config import Config
    from smsut_tpu.train.steps.coranet import CoraNet

    cfg = Config(base_root=data_root, input_size=32, base_width=4,
                 batch_size=4, device_augment=False, compute_dtype="float32",
                 data_aug=dict(Config().data_aug, resizeCrop_size=32))
    algo = CoraNet(cfg, stage="cora")
    state = algo.init_state(jax.random.PRNGKey(0))

    class _T:
        fold = 0
        _data_rng = pyrandom.Random(2020)

    algo._pseudo, plab_dice = algo.pred_unlabel(state,
                                                algo._unlabeled_stream(_T()))
    algo._pseudo_order = []

    def sha(*arrays):
        h = hashlib.sha256()
        for a in arrays:
            h.update(np.ascontiguousarray(a).tobytes())
        return h.hexdigest()

    assert by_proc[0]["pseudo_sha"] == sha(
        *(algo._pseudo[k] for k in sorted(algo._pseudo)))
    assert abs(by_proc[0]["plab_dice"] - float(plab_dice)) < 1e-6
    for d in range(3):
        b = algo.make_extra_batch()
        assert by_proc[0]["draws"][d] == sha(
            b["pse_img"][:2], b["pse_lab"][:2], b["pse_mask"][:2])
        assert by_proc[1]["draws"][d] == sha(
            b["pse_img"][2:], b["pse_lab"][2:], b["pse_mask"][2:])


@pytest.mark.slow
def test_two_process_eval_matches_single_process(tmp_path):
    """Sharded whole-sweep eval under 2 real processes (each host evals
    its contiguous slice, results allgathered — loop.py
    _validate_epoch_scan `_mp` branch) reproduces the single-device eval:
    identical volume predictions (sha256) and matching meter losses."""
    from smsut_tpu.config import Config
    from smsut_tpu.data.dataset import get_label_npys, get_loader
    from smsut_tpu.data.synthetic import make_synthetic_dataset
    from smsut_tpu.train.loop import Trainer
    from smsut_tpu.train.steps.supervised import SupervisedUNet
    from smsut_tpu.utils.meter import Meter

    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=3, n_slice=5,
                           size=32)
    results = _run_two_workers(
        "eval", extra_env={"SMSUT_DATA_ROOT": data_root,
                           "SMSUT_EXPR_ROOT": str(tmp_path / "expr")},
        all_outputs=True)
    # the allgather hands every host the same reassembled predictions
    assert results[0]["sha"] == results[1]["sha"]
    assert results[0]["n_prd"] == results[1]["n_prd"]

    # single-device reference (no mesh): same per-step program as each
    # host's local-slice eval
    import hashlib

    cfg = Config(base_root=data_root, expr_root=str(tmp_path / "expr_ref"),
                 input_size=32, base_width=4, batch_size=8,
                 compute_dtype="float32")
    algo = SupervisedUNet(cfg)
    trainer = Trainer(algo, cfg, "test", use_mesh=False)
    loader = get_loader(cfg.base_root, "test", 0, cfg.batch_size, cfg=cfg)
    n_gt, gt_npys = get_label_npys(cfg.base_root, "test", cfg.split_yaml)
    meter = Meter([f"loss_{i}" for i in range(4)] + ["loss"], [], alpha=1.0)
    meter.reset_cur()
    n_prd, prd = trainer.validate_epoch(loader, gt_npys, meter)
    meter.update_cur()
    h = hashlib.sha256()
    for k in sorted(prd):
        h.update(np.ascontiguousarray(prd[k]).tobytes())
    assert results[0]["n_prd"] == n_prd == n_gt
    assert results[0]["sha"] == h.hexdigest()
    for k, v in dict(meter.cur_values).items():
        assert abs(results[0]["meter"][k] - float(v)) < 1e-5, (k, v)
