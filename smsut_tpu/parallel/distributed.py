# -*- coding: utf-8 -*-
"""Multi-host data parallelism: initialization + the host-side plumbing.

The reference has no distributed backend at all (SURVEY §2.7: its only
multi-device path is single-process ``nn.DataParallel``,
`/root/reference/trainer/uganShp0Trainer.py:66-68`).  Here multi-host scaling
is the standard JAX recipe, and it is *wired*:

  * ``train/cli.run_main`` calls :func:`initialize` once per host before any
    other JAX use (env-driven: ``SMSUT_COORDINATOR``, ``SMSUT_NUM_PROCESSES``,
    ``SMSUT_PROCESS_ID``); ``jax.devices()`` then spans the pod and the
    ``('data',)`` mesh in ``parallel/mesh.py`` covers every chip, with XLA
    routing the gradient all-reduce over ICI within a slice / DCN across
    slices.
  * ``data/dataset.get_loader`` partitions every sampler's index stream with
    :class:`~smsut_tpu.data.samplers.ShardedBatchSampler` using
    :func:`local_batch_slice`, so each host decodes only its contiguous slice
    of the global batch.
  * ``parallel/mesh.shard_batch`` assembles the per-host slices into global
    ``jax.Array``s via ``jax.make_array_from_process_local_data``;
    ``parallel/mesh.replicate`` builds replicated global state.

Tested end-to-end by ``tests/test_distributed.py``: two real
``jax.distributed`` CPU processes train in lockstep and match the
single-process run bit-for-bit.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """``jax.distributed.initialize`` with env-var fallbacks.

    Env contract (one process per host, all three set on every host):
    ``SMSUT_COORDINATOR=host:port``, ``SMSUT_NUM_PROCESSES=N``,
    ``SMSUT_PROCESS_ID=i``.  A no-op returning False on single-host runs.
    Must run before any JAX computation creates the backend.
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("SMSUT_COORDINATOR"))
    if num_processes is None and os.environ.get("SMSUT_NUM_PROCESSES"):
        num_processes = int(os.environ["SMSUT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SMSUT_PROCESS_ID"):
        process_id = int(os.environ["SMSUT_PROCESS_ID"])
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """Host 0 owns logging/checkpoint writes."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of a globally-sharded batch.  The slice
    order matches ``mesh.shard_batch``'s device order (process-major), so
    host i's rows land on host i's chips with no resharding."""
    count = max(1, jax.process_count())
    if global_batch % count:
        raise ValueError(
            f"global batch {global_batch} is not divisible by the "
            f"{count} processes — rows would be silently dropped.  Pick a "
            f"batch_size that is a multiple of the process count (or change "
            f"SMSUT_NUM_PROCESSES).")
    per = global_batch // count
    start = jax.process_index() * per
    return slice(start, start + per)


def barrier(name: str, timeout_ms: int = 1_200_000) -> None:
    """Coordination-service barrier (plain TCP, no device collectives).

    Used to re-sync processes around multi-minute XLA compiles: the CPU
    backend's Gloo context initialization has a hard ~30s deadline at the
    FIRST cross-process collective, so if one process finishes compiling
    much earlier than another (cold persistent cache on a 1-CPU host), it
    times out waiting.  AOT-compile, barrier here, then execute."""
    import jax
    from jax._src import distributed as jdist

    if jax.process_count() <= 1:
        return
    client = jdist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
