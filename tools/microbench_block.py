# -*- coding: utf-8 -*-
"""A/B the fused Pallas packed-block kernel vs XLA's unfused chain.

Shapes benchmarked are the production hot blocks (base_width 16,
pack_levels 2): the dense level-1 encoder block ([B,64,64,128] packed,
f=32) and the GAN's tower-paired level-0 block ([B,128,128,128] packed,
block-diagonal kernels, f=2x16).  Honest tunnel timing: chained scan with
a loop-carried dependency + scalar fetch, 2N-N difference (CLAUDE.md).

Forward-only gate for the fused kernel design (BASELINE.md round 4): the
round-3 conv-only Pallas kernel lost at Cout=64 (19.6 vs 47 TF/s); the
128-lane dot measures ~98 TF/s, so the fused block should beat the XLA
chain before the backward is built.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smsut_tpu.models import packed as pk
from smsut_tpu.ops.block_pallas import fused_block_fwd


def xla_block(x, wp1, s1, b1, wp2, s2, b2, wps, ss, bs, dtype):
    """The unfused packed chain exactly as models/packed.py emits it."""
    co = wp1.shape[-1]
    c = co // 4

    def norm(t, scale, bias, act):
        b_, h, w, cp = t.shape
        tf = t.astype(jnp.float32)
        m1 = tf.sum((1, 2)).reshape(b_, 4, c).sum(1)
        m2 = (tf * tf).sum((1, 2)).reshape(b_, 4, c).sum(1)
        n = h * w * 4
        mean = m1 / n
        var = m2 / n - mean ** 2
        rstd = jax.lax.rsqrt(var + 1e-5)
        g = jnp.tile(rstd * scale, (1, 4))[:, None, None, :]
        bb = jnp.tile(bias - mean * rstd * scale, (1, 4))[:, None, None, :]
        y = (tf * g + bb).astype(dtype)
        return jnp.where(y > 0, y, (0.01 * y).astype(dtype)) if act else y

    def conv(t, wp, k):
        pad = [(1, 1)] * 2 if k == 3 else [(0, 0)] * 2
        return jax.lax.conv_general_dilated(
            t.astype(dtype), wp.astype(dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = norm(conv(x, wp1, 3), s1, b1, True)
    y = norm(conv(y, wp2, 3), s2, b2, False)
    if wps is not None:
        idn = norm(conv(x, wps, 1), ss, bs, False)
    else:
        idn = x.astype(dtype)
    p = y + idn
    return jnp.where(p > 0, p, (0.01 * p).astype(dtype))


def bench(fn, args, iters=200, label=""):
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(a, n):
        def body(c, _):
            x = (args[0] + (c * 1e-30).astype(args[0].dtype),) + args[1:]
            y = fn(*x)
            y0 = y[0] if isinstance(y, (tuple, list)) else y
            return y0[0, 0, 0, 0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    float(chain(args[0], iters))
    float(chain(args[0], 2 * iters))
    t1 = time.perf_counter(); float(chain(args[0], iters)); t1 = time.perf_counter() - t1
    t2 = time.perf_counter(); float(chain(args[0], 2 * iters)); t2 = time.perf_counter() - t2
    sec = max((t2 - t1) / iters, 1e-9)
    return sec


def run_case(name, B, HW, cin_orig, co_orig, segs, iters=200,
             dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    cin = sum(segs)
    x = jnp.asarray(rng.standard_normal((B, HW, HW, 4 * cin)), dtype)
    w1 = jnp.asarray(rng.standard_normal((3, 3, cin, co_orig)) * .1,
                     jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, co_orig, co_orig)) * .1,
                     jnp.float32)
    mk = lambda: jnp.asarray(1 + .1 * rng.standard_normal(co_orig),
                             jnp.float32)
    s1, b1, s2, b2 = mk(), mk(), mk(), mk()
    has_short = cin != co_orig
    ws = (jnp.asarray(rng.standard_normal((1, 1, cin, co_orig)) * .3,
                      jnp.float32) if has_short else None)
    ss, bs = (mk(), mk()) if has_short else (None, None)

    wp1 = pk.pack_kernel(w1, segs).astype(dtype)
    wp2 = pk.pack_kernel(w2, (co_orig,)).astype(dtype)
    wps = pk.pack_kernel(ws, segs).astype(dtype) if has_short else None

    co = 4 * co_orig
    flops = 2 * B * HW * HW * (9 * 4 * cin * co + 9 * co * co
                               + (4 * cin * co if has_short else 0))

    t_xla = bench(lambda *a: xla_block(*a, dtype),
                  (x, wp1, s1, b1, wp2, s2, b2, wps, ss, bs), iters)
    t_pl = bench(fused_block_fwd,
                 (x, wp1, s1, b1, wp2, s2, b2, wps, ss, bs), iters)
    print(f"{name}: XLA {t_xla*1e6:.0f} us ({flops/t_xla/1e12:.1f} TF/s) | "
          f"pallas fused {t_pl*1e6:.0f} us ({flops/t_pl/1e12:.1f} TF/s) | "
          f"speedup x{t_xla/t_pl:.2f}")
    return t_xla, t_pl


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    # level-1 encoder block, every model (dense 128 lanes, identity block
    # variant f=32->32 and channel-change 16->32)
    run_case("L1 dense 32->32 [16,64,64,128]", 16, 64, (32,), 32, (32,), iters)
    run_case("L1 change 16->32 [16,64,64,64->128]", 16, 64, (16,), 32, (16,),
             iters)
    # GAN tower-paired level-0: block-diagonal 2x16->2x16 via segments
    run_case("L0 paired 2x16 [16,128,128,128]", 16, 128, (16, 16), 16 * 2,
             (16, 16), iters)
    # unpaired level-0 (the regime the conv-only kernel lost): expect XLA win
    run_case("L0 unpaired 16->16 [16,128,128,64]", 16, 128, (16,), 16, (16,),
             iters)
