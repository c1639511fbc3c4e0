# -*- coding: utf-8 -*-
"""Device mesh and sharding helpers.

The reference's only multi-device path is single-process
`torch.nn.DataParallel` (`/root/reference/trainer/uganShp0Trainer.py:66-68`).
Here data parallelism is first-class: a 1-D ``('data',)`` mesh (extensible to
('data', 'model')), batches sharded over the data axis, parameters/optimizer
state replicated, and gradient all-reduce left to XLA's collectives over ICI.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, devices: Optional[Sequence] = None,
              batch_size: int = 0, spatial: int = 1) -> Mesh:
    """Data-parallel mesh over the first ``n_devices`` devices (all local
    devices when 0).  When ``batch_size`` is given, the data axis is clamped
    to the largest count that divides the batch so batch-dim sharding is
    always valid.

    ``spatial > 1`` adds a second ``'space'`` axis: activations shard their
    H dimension across it (GSPMD spatial partitioning — XLA inserts the
    conv halo exchanges and norm/loss cross-shard reductions over ICI
    automatically; the reference is single-GPU, §2.7).  Combine with data
    parallelism to scale past the batch dimension, e.g. 8 devices as
    dp=2 x sp=4."""
    if devices is None:
        devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    if spatial > 1:
        assert len(devices) >= spatial, (len(devices), spatial)
        dp = len(devices) // spatial
        if batch_size:
            while dp > 1 and batch_size % dp:
                dp -= 1
        arr = np.asarray(devices[: dp * spatial]).reshape(dp, spatial)
        return Mesh(arr, ("data", "space"))
    if batch_size:
        n = len(devices)
        while n > 1 and batch_size % n:
            n -= 1
        devices = devices[:n]
    return Mesh(np.asarray(devices), ("data",))


def make_mesh_2d(dp: int, tp: int, devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh for combined data + channel-wise tensor
    parallelism.  The reference has nothing comparable (§2.7); at base_width
    16 the models are small enough that TP is optional, but the axis is
    first-class: conv kernels shard on their output-channel dim and XLA
    inserts the all-gathers/reduce-scatters over ICI."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, f"need {dp * tp} devices"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def shard_params_channelwise(mesh: Mesh, params: Any) -> Any:
    """device_put a param tree with every kernel's output-channel (last) dim
    sharded over 'model' when divisible; everything else replicated over the
    whole mesh.  Gradients/optimizer state inherit the layout.

    Tensor parallelism must NOT be combined with spatial parallelism: XLA's
    GSPMD partitioner mis-compiles convolutions whose kernels are
    feature-sharded while activations are H-sharded (jax 0.9.0: wrong
    forward values and gradients off by exact collective factors — 0.5x/3x;
    minimal repro in tests/test_mesh_guard.py, which also serves as the
    canary for lifting this guard when upstream fixes it).  dp x tp and
    dp x sp are both verified equivalent to single-device
    (__graft_entry__.dryrun_multichip)."""
    tp = mesh.shape["model"]
    if tp > 1 and mesh.shape.get("space", 1) > 1:
        raise ValueError(
            "channel-wise tensor parallelism cannot be combined with "
            "spatial parallelism ('model' and 'space' mesh axes both > 1): "
            "XLA GSPMD mis-compiles feature+space-sharded convolutions "
            "(see parallel/mesh.py docstring).  Use dp x tp or dp x sp.")

    def put(x):
        # shard only when each shard keeps >= 4 output channels: tiny head
        # kernels (e.g. the Discriminator's n_modal=4 cls head) gain nothing
        # from TP and their sharded [B,1,1,4] outputs provoked a GSPMD
        # "involuntary full rematerialization" in the backward reshape
        # (MULTICHIP_r04 tail; round-5 fix — the dryrun now compiles clean)
        if x.ndim >= 2 and x.shape[-1] % tp == 0 and x.shape[-1] // tp >= 4:
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params)


def batch_sharding(mesh: Mesh, axis: int = 0,
                   ndim: Optional[int] = None) -> NamedSharding:
    """Shard the batch dim (``axis``) over 'data'; on a spatial mesh,
    arrays with an H dim (rank >= axis+3, i.e. [..., B, H, W(, C)]) also
    shard H over 'space'."""
    names = [None] * axis + ["data"]
    if ("space" in mesh.axis_names and ndim is not None
            and ndim >= axis + 3):
        names.append("space")
    return NamedSharding(mesh, P(*names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: int = 0) -> Any:
    """device_put a host batch pytree with the batch dim (``axis``) sharded
    over 'data'.  Batch dims must divide the mesh size (eval pads batches,
    so they do).  ``axis=1`` serves chunked dispatch's [T, B, ...] stacks.

    Multi-host: the tree holds this process's *local* slice (the loaders are
    wrapped in ``ShardedBatchSampler``); the slices are assembled into global
    arrays with ``jax.make_array_from_process_local_data``."""
    if jax.process_count() > 1:
        nproc = jax.process_count()

        def put_local(x):
            x = np.asarray(x)
            gshape = list(x.shape)
            gshape[axis] *= nproc
            sh = batch_sharding(mesh, axis, x.ndim)
            return jax.make_array_from_process_local_data(sh, x,
                                                          tuple(gshape))

        return jax.tree_util.tree_map(put_local, tree)

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, axis, np.ndim(x)))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree over the whole mesh.  Multi-host: every process
    holds the same host value (same seeds/IO), so a callback-built global
    array is valid; single-host keeps the plain device_put fast path."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        def put_local(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh,
                                                lambda idx: x[idx])

        return jax.tree_util.tree_map(put_local, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
