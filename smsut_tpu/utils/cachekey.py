# -*- coding: utf-8 -*-
"""Machine-keyed persistent-compile-cache paths.

XLA:CPU caches AOT executables compiled for the EXACT host CPU; loading a
blob produced on a different machine logs `cpu_aot_loader` feature-mismatch
errors and "could lead to execution errors such as SIGILL".  This repo's
/tmp caches survive across driver rounds while the underlying host changes,
so every cache path is suffixed with a fingerprint of (jax version, CPU
flags) — a new machine or jax upgrade gets a fresh cache instead of
poisoned hits."""
from __future__ import annotations

import hashlib
import platform
from functools import lru_cache


@lru_cache(maxsize=1)
def machine_tag() -> str:
    try:
        import jax

        ver = jax.__version__
    except Exception:  # pragma: no cover
        ver = "nojax"
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:  # pragma: no cover - non-Linux
        flags = platform.processor()
    return hashlib.sha1(f"{ver}|{flags}".encode()).hexdigest()[:8]


def cache_dir(base: str) -> str:
    """`/tmp/smsut-jax-cache` -> `/tmp/smsut-jax-cache-<tag>`."""
    return f"{base}-{machine_tag()}"
