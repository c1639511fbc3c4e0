# -*- coding: utf-8 -*-
"""Multi-host initialization.

The reference has no distributed backend at all (SURVEY §2.7: single-process
DataParallel).  Here multi-host scaling is the standard JAX recipe: call
``initialize()`` once per host before any other JAX use; `jax.devices()` then
spans the pod, the `('data',)` mesh in `parallel/mesh.py` covers all chips,
and XLA routes the gradient all-reduce over ICI within a slice / DCN across
slices.  Each host feeds its local shard of the batch (use
``process_index()`` to partition the sampler's index stream)."""
from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks (no-op on 1 host)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def local_batch_slice(global_batch: int):
    """This host's slice of a globally-sharded batch."""
    per = global_batch // max(1, jax.process_count())
    start = jax.process_index() * per
    return slice(start, start + per)
