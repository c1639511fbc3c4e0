# -*- coding: utf-8 -*-
"""One process of the multi-host test (driven by tests/test_distributed.py).

Initializes jax.distributed from the SMSUT_* env contract, builds the global
('data',) mesh across both processes (4 CPU devices each -> 8 global), feeds
its local slice of a fixed global batch through ``shard_batch``'s
process-local assembly, runs N supervised train steps, and prints a JSON
line with the final loss and a parameter checksum for the parent to compare
against the single-process run."""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/smsut-jax-cache-cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:  # cross-process CPU collectives
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from smsut_tpu.parallel import distributed

assert distributed.initialize(), "SMSUT_* env vars must be set"

import jax.numpy as jnp
import numpy as np

from smsut_tpu.config import Config
from smsut_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from smsut_tpu.train.steps.supervised import SupervisedUNet


def main(n_steps: int = 3, global_batch: int = 8) -> None:
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    cfg = Config(input_size=64, base_width=4, batch_size=global_batch)
    algo = SupervisedUNet(cfg)
    mesh = make_mesh(batch_size=global_batch)
    assert mesh.devices.size == 8, mesh

    state = replicate(mesh, algo.init_state(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    img_g = rng.normal(size=(global_batch, 64, 64, 1)).astype(np.float32)
    msk_g = rng.integers(0, cfg.n_class, size=(global_batch, 64, 64)).astype(np.int32)
    sl = distributed.local_batch_slice(global_batch)
    batch = shard_batch(mesh, {"img": img_g[sl], "msk": msk_g[sl]})

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
