#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Summarize a jax.profiler xplane trace without the TensorBoard profile
plugin (absent from this image): parse the xplane.pb with TF's bundled
protobuf, aggregate device-plane event durations by op name, and print the
top ops and per-line totals.

Usage:  python tools/xprof_summary.py /tmp/smsut-prof [top_n]
        (picks the newest *.xplane.pb under the directory)
"""
from __future__ import annotations

import collections
import glob
import os
import re
import sys


def load_space(root: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise SystemExit(f"no *.xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs, files[-1]


_FUSION_STRIP = re.compile(r"\.\d+$")


def summarize(root: str, top_n: int = 25):
    xs, path = load_space(root)
    print(f"# {path}")
    for plane in xs.planes:
        if not plane.lines:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        print(f"\n== plane {plane.name} ==")
        for line in plane.lines:
            if not line.events:
                continue
            per_op = collections.Counter()
            n_ev = collections.Counter()
            total_ps = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps
                n_ev[name] += 1
                total_ps += ev.duration_ps
            print(f"-- line '{line.name}': {len(line.events)} events, "
                  f"{total_ps / 1e9:.3f} ms total")
            for name, ps in per_op.most_common(top_n):
                print(f"   {ps / 1e9:9.3f} ms  x{n_ev[name]:<4d} {name[:110]}")
    return xs


if __name__ == "__main__":
    summarize(sys.argv[1] if len(sys.argv) > 1 else "/tmp/smsut-prof",
              int(sys.argv[2]) if len(sys.argv) > 2 else 25)
