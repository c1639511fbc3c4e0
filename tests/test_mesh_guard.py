# -*- coding: utf-8 -*-
"""Guard + canary for the XLA GSPMD feature x space conv mis-compilation.

Discovered in round 4: on jax 0.9.0, a convolution whose kernel is sharded
on its output-feature dim ('model') while its activations are sharded on H
('space') compiles to WRONG code — the forward value deviates by orders of
magnitude and gradients come out scaled by exact collective factors
(0.5x / 3x), i.e. missing/duplicated psums, not float drift.  Each axis
alone is equivalent to single-device (verified by
__graft_entry__.dryrun_multichip with tight bounds).

Until upstream fixes it, ``shard_params_channelwise`` refuses meshes with
both axes > 1.  ``test_upstream_bug_still_present`` is the canary: it
asserts the mis-compilation still reproduces, so the day an XLA upgrade
fixes it this test FAILS and tells us to lift the guard.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smsut_tpu.parallel.mesh import shard_params_channelwise


def _tp_sp_mesh():
    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    return Mesh(np.asarray(devices[:4]).reshape(1, 2, 2),
                ("data", "model", "space"))


def test_guard_rejects_tp_times_sp():
    mesh = _tp_sp_mesh()
    params = {"kernel": jnp.zeros((3, 3, 4, 8))}
    with pytest.raises(ValueError, match="spatial parallelism"):
        shard_params_channelwise(mesh, params)


def test_upstream_bug_still_present():
    """Canary: the minimal feature+space sharded conv still mis-compiles.

    When this starts FAILING (deviation becomes small), the upstream bug is
    fixed — lift the guard in parallel/mesh.shard_params_channelwise and
    re-enable the combined mesh in __graft_entry__.dryrun_multichip.
    """
    mesh = _tp_sp_mesh()

    def f(k1, k2, x):
        dn = ("NHWC", "HWIO", "NHWC")
        y = jax.lax.conv_general_dilated(x, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
        y = jax.nn.leaky_relu(y)
        z = jax.lax.conv_general_dilated(y, k2, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return jnp.sum(z * z)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 4)).astype(np.float32)
    k1 = rng.standard_normal((3, 3, 4, 8)).astype(np.float32) * 0.1
    k2 = rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1
    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
    v1, g1 = vg(jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(x))

    ks = NamedSharding(mesh, P(None, None, None, "model"))
    xs = NamedSharding(mesh, P("data", "space"))
    vm, gm = vg(jax.device_put(k1, ks), jax.device_put(k2, ks),
                jax.device_put(x, xs))
    rel = max(
        float(np.linalg.norm(np.asarray(b, np.float64)
                             - np.asarray(a, np.float64))
              / np.linalg.norm(np.asarray(a, np.float64)))
        for a, b in zip(g1, gm))
    assert rel > 0.1, (
        f"feature x space conv sharding now matches single-device "
        f"(max grad rel dev {rel:.2e}) — upstream XLA fixed the "
        f"mis-compilation; lift the guard in shard_params_channelwise")
