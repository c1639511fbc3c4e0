# -*- coding: utf-8 -*-
"""Experimental intermediate-layout pinning (attack on the GAN copy wall).

Round-3 profiling (BASELINE.md) found ~27 ms/step of the 91 ms uganConsis
iteration is XLA layout-assignment copies flipping bf16[16,128,128,64]
activations between C-minor {3,0,2,1} and W-minor {2,3,1,0}: the TPU conv
emitter wants W-minor inputs for narrow-channel convs while producing
C-minor outputs, and the reduce-window pools anchor W-minor.  All six
graph-level restructurings measured slower; this module instead pins the
activation layouts directly with ``jax.experimental.layout.
with_layout_constraint`` so layout assignment cannot ping-pong.

Modes (env ``SMSUT_LAYOUT_PIN`` or :func:`set_mode`):
  * ``off``  — no-op (default).
  * ``cmin`` — pin conv/pool outputs C-minor (channels on lanes).
  * ``wmin`` — pin conv/pool outputs W-minor (width on lanes).

Only 4-D activations with >=16 channels are pinned (1-channel heads and
scalars pass through).  The pin is a trace-time annotation: identical math,
verified by the existing forward-parity suite with the mode forced on.
"""
from __future__ import annotations

import os

import jax

_MODE = os.environ.get("SMSUT_LAYOUT_PIN", "off")
_MTM = {"cmin": (1, 2, 0, 3), "wmin": (0, 1, 3, 2)}


def set_mode(mode: str) -> None:
    global _MODE
    if mode not in ("off", "cmin", "wmin"):
        raise ValueError(f"layout pin mode {mode!r}")
    _MODE = mode


def mode() -> str:
    return _MODE


def pin(x: jax.Array) -> jax.Array:
    """Constrain ``x``'s layout per the active mode (no-op when off)."""
    if _MODE == "off":
        return x
    if getattr(x, "ndim", 0) != 4 or x.shape[-1] < 16:
        return x
    from jax.experimental.layout import Layout, with_layout_constraint

    return with_layout_constraint(x, Layout(major_to_minor=_MTM[_MODE]))
