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
        # the ENTIRE first-processor block, not just the flags line: two
        # hosts with identical flag sets but different model/stepping get
        # different LLVM tuning (e.g. +prefer-no-scatter), which changes
        # codegen — and with it f32 reduction order — so a flags-only key
        # still served cross-host blobs (seen round 3: a migrated VM's
        # /tmp cache drifted test_two_process_training by 1.6e-4).
        keep = ("vendor_id", "cpu family", "model", "model name",
                "stepping", "microcode", "flags")
        with open("/proc/cpuinfo") as f:
            block = []
            for line in f:
                if not line.strip():
                    break   # first processor only
                if line.split(":")[0].strip() in keep:  # skip cpu MHz etc.
                    block.append(line)
            cpu = "".join(block)
    except OSError:  # pragma: no cover - non-Linux
        cpu = platform.processor()
    return hashlib.sha1(f"{ver}|{cpu}".encode()).hexdigest()[:8]


def cache_dir(base: str) -> str:
    """`/tmp/smsut-jax-cache` -> `/tmp/smsut-jax-cache-<tag>`."""
    return f"{base}-{machine_tag()}"
