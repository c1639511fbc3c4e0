# -*- coding: utf-8 -*-
"""Orbax checkpointing with the reference's tag semantics.

The reference saves bare ``state_dict`` files per tag — ``best.ckpt`` /
``last.ckpt`` (`/root/reference/trainer/baseTrainer.py:113-123`), GAN trainers
``{tag}_G.ckpt``/``{tag}_D.ckpt`` (`uganShp0Trainer.py:94-107`), CoraNet
``pre_best``/``pre_ema_best`` (`coraNetTrainer.py:596-602`).  Here each tag is
an orbax directory holding the *full* train state (params + optimizer + step
+ EMA), which additionally enables true mid-training resume — something the
reference lacks (SURVEY §5)."""
from __future__ import annotations

import os
from os.path import join as pjoin
from typing import Any

import jax
import orbax.checkpoint as ocp

PyTree = Any


def save_state(state: PyTree, ckpt_root: str, prefix: str) -> str:
    path = os.path.abspath(pjoin(ckpt_root, f"{prefix}.ckpt"))
    ckptr = ocp.StandardCheckpointer()
    # strip non-pytree fields (optax transforms) is handled by struct.PyTreeNode
    if jax.process_count() > 1:
        # multi-host: hand orbax the (possibly process-spanning, sharded)
        # jax.Arrays directly — every process calls save and orbax writes
        # each shard from its owning host.  device_get would throw on
        # non-addressable shards.
        ckptr.save(path, state, force=True)
    else:
        # single host: a host copy is always addressable, whatever the
        # device layout (incl. channel-wise TP sharding over a local mesh)
        ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def load_state(template: PyTree, ckpt_root: str, prefix: str) -> PyTree:
    """Restore into ``template``'s structure.  Device-array template leaves
    keep their shardings: orbax reads the global arrays from tensorstore and
    lays each one out per the template — so a checkpoint written from a
    TP-sharded or multi-process run restores onto ANY mesh / process count
    (elastic resume; tests/test_checkpoints.py, tests/test_distributed.py)."""
    path = os.path.abspath(pjoin(ckpt_root, f"{prefix}.ckpt"))
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree_util.tree_map(lambda x: x, template)
    if jax.process_count() > 1 or any(
            isinstance(leaf, jax.Array) and not leaf.is_fully_replicated
            for leaf in jax.tree_util.tree_leaves(target)
            if isinstance(leaf, jax.Array)):
        return ckptr.restore(path, target=target)
    return ckptr.restore(path, target=jax.device_get(target))


def load_raw(ckpt_root: str, prefix: str) -> PyTree:
    """Restore a checkpoint as a raw pytree (no template) — used for partial
    restores across stages with different optimizer trees (CoraNet stage B
    loads only params/ema from stage A's ``pre_best``)."""
    path = os.path.abspath(pjoin(ckpt_root, f"{prefix}.ckpt"))
    return ocp.StandardCheckpointer().restore(path)
