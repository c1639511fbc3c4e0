#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Aggregate a jax.profiler xplane trace's device 'XLA Ops' line by op
CATEGORY (copy / convolution / fusion kinds / reduce / ...), per step.

Complements tools/xprof_summary.py (per-op top list): this answers "how
much of the step is layout copies vs conv vs norm-stat reductions".

Usage:  python tools/xprof_categories.py /tmp/smsut-prof [n_steps]
"""
from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from xprof_summary import load_space  # noqa: E402

_NAME = re.compile(r"^%([a-zA-Z_\-]+)")


def categorize(hlo: str) -> str:
    m = _NAME.match(hlo)
    kind = m.group(1).rstrip("_-") if m else "?"
    if kind in ("copy", "copy-start", "copy-done", "bitcast", "transpose"):
        return "layout/copy"
    if kind.startswith("convolution"):
        return "convolution"
    if kind == "fusion":
        if "conv" in hlo.split("=", 1)[-1][:400]:
            # output fusions wrapping a convolution keep 'convolution(' in
            # the body — separate them from pure elementwise fusions
            return "fusion (conv)"
        return "fusion"
    if "reduce" in kind:
        return f"reduce ({kind})" if "fusion" in kind else "reduce"
    return kind


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/smsut-prof"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    xs, path = load_space(root)
    print(f"# {path}  (per-step = total / {n_steps})")
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            per_cat = collections.Counter()
            n_ev = collections.Counter()
            total = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                cat = categorize(name)
                per_cat[cat] += ev.duration_ps
                n_ev[cat] += 1
                total += ev.duration_ps
            print(f"\n== {plane.name} 'XLA Ops': {total/1e9:.1f} ms total, "
                  f"{total/1e9/n_steps:.2f} ms/step ==")
            for cat, ps in per_cat.most_common(20):
                print(f"  {ps/1e9/n_steps:8.3f} ms/step  {100*ps/total:5.1f}%"
                      f"  x{n_ev[cat]//n_steps:<6d} {cat}")


if __name__ == "__main__":
    main()
