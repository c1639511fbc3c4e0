# -*- coding: utf-8 -*-
"""Generate golden fixtures for dc / assd / hd on nontrivial volumes.

medpy (the library the reference calls — `/root/reference/misc/utils.py:7,
206-283`) is not installable in this image, so the golden values are computed
by an INDEPENDENT brute-force implementation of medpy's documented algorithm
(`medpy.metric.binary.__surface_distances`):

  * border voxel = foreground voxel removed by one binary erosion with the
    connectivity-1 footprint and border_value=0 (voxels at the array edge
    with no outside neighbours count as border);
  * surface distance = Euclidean distance from each border voxel of A to the
    NEAREST border voxel of B (unit spacing);
  * dc  = 2|P∧G| / (|P|+|G|), 0.0 when both empty;
  * assd = mean of the concatenated A→B and B→A surface distances;
  * hd  = max(max(A→B), max(B→A)).

The brute force shares NO code with `smsut_tpu/ops/metrics.py` (explicit
neighbour loops + pairwise cdist instead of scipy binary_erosion +
distance_transform_edt), so agreement to 1e-9 on volumes with touching
borders, edge-clipped shapes, multiple components, anisotropic arrays and
empty classes validates the production re-derivation's border semantics.

Writes tests/fixtures/metric_golden.npz.  Deterministic (seeded); re-run to
regenerate after any intentional semantic change.
"""
from __future__ import annotations

import os

import numpy as np


# --------------------------------------------------------------- brute force

def _border_voxels(a: np.ndarray) -> np.ndarray:
    """Coordinates of border voxels: foreground with at least one
    connectivity-1 neighbour (axis-aligned) that is background or outside."""
    a = a.astype(bool)
    coords = np.argwhere(a)
    border = []
    for idx in coords:
        is_border = False
        for ax in range(a.ndim):
            for step in (-1, 1):
                nb = idx.copy()
                nb[ax] += step
                if (nb[ax] < 0 or nb[ax] >= a.shape[ax]
                        or not a[tuple(nb)]):
                    is_border = True
                    break
            if is_border:
                break
        if is_border:
            border.append(idx)
    return np.asarray(border, dtype=np.float64).reshape(-1, a.ndim)


def _directed_sds(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """All distances from a's border voxels to the nearest b border voxel."""
    ba, bb = _border_voxels(a), _border_voxels(b)
    if len(ba) == 0 or len(bb) == 0:
        raise RuntimeError("empty structure")
    # pairwise distances in blocks (volumes are small, this is exact)
    d2 = ((ba[:, None, :] - bb[None, :, :]) ** 2).sum(-1)
    return np.sqrt(d2.min(axis=1))


def brute_dc(p: np.ndarray, g: np.ndarray) -> float:
    p, g = p.astype(bool), g.astype(bool)
    denom = int(p.sum()) + int(g.sum())
    if denom == 0:
        return 0.0
    return 2.0 * int(np.logical_and(p, g).sum()) / float(denom)


def brute_assd(p: np.ndarray, g: np.ndarray) -> float:
    sds = np.concatenate([_directed_sds(p, g), _directed_sds(g, p)])
    return float(sds.mean())


def brute_hd(p: np.ndarray, g: np.ndarray) -> float:
    return float(max(_directed_sds(p, g).max(), _directed_sds(g, p).max()))


# ------------------------------------------------------------------- volumes

def _blob(shape, centers_radii, rng=None, noise=0.0):
    """Union of balls, optional boundary noise."""
    grid = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                                indexing="ij"), axis=-1).astype(np.float64)
    vol = np.zeros(shape, dtype=bool)
    for c, r in centers_radii:
        vol |= ((grid - np.asarray(c)) ** 2).sum(-1) <= r * r
    if noise and rng is not None:
        vol ^= rng.random(shape) < noise
    return vol


def build_cases():
    rng = np.random.default_rng(42)
    cases = {}
    # 1. overlapping offset balls — generic nontrivial pair
    cases["offset_balls"] = (
        _blob((12, 14, 16), [((5, 6, 7), 3.5)]),
        _blob((12, 14, 16), [((6, 8, 9), 4.0)]))
    # 2. edge-clipped shapes — border_value=0 semantics at the array edge
    cases["edge_clipped"] = (
        _blob((10, 10, 10), [((0, 0, 5), 4.0)]),
        _blob((10, 10, 10), [((0, 2, 5), 3.5)]))
    # 3. multi-component vs single component
    cases["multi_component"] = (
        _blob((14, 14, 14), [((3, 3, 3), 2.2), ((10, 10, 10), 2.8)]),
        _blob((14, 14, 14), [((6, 6, 6), 4.5)]))
    # 4. touching (adjacent, zero-overlap) slabs
    a = np.zeros((8, 8, 8), bool)
    b = np.zeros((8, 8, 8), bool)
    a[2:4, :, :] = True
    b[4:6, :, :] = True
    cases["touching_slabs"] = (a, b)
    # 5. identical volumes — assd/hd exactly 0
    ident = _blob((9, 11, 13), [((4, 5, 6), 3.0)])
    cases["identical"] = (ident, ident.copy())
    # 6. anisotropic array, noisy borders
    cases["noisy_aniso"] = (
        _blob((7, 13, 19), [((3, 6, 9), 4.5)], rng, 0.05),
        _blob((7, 13, 19), [((3, 7, 10), 4.0)], rng, 0.05))
    # 7. 2-D slices (per-slice metrics path)
    cases["slice_2d"] = (
        _blob((20, 24), [((9, 11), 5.0)], rng, 0.03),
        _blob((20, 24), [((11, 13), 6.0)]))
    # 8. one voxel each — degenerate borders
    a = np.zeros((6, 6, 6), bool)
    b = np.zeros((6, 6, 6), bool)
    a[1, 2, 3] = True
    b[4, 4, 1] = True
    cases["single_voxels"] = (a, b)
    # 9. empty-vs-empty and empty-vs-full (dc only; assd/hd raise)
    cases["both_empty"] = (np.zeros((5, 5, 5), bool), np.zeros((5, 5, 5), bool))
    cases["pred_empty"] = (np.zeros((5, 5, 5), bool),
                           _blob((5, 5, 5), [((2, 2, 2), 1.6)]))
    return cases


def main():
    out = {}
    for name, (p, g) in build_cases().items():
        out[f"{name}__pred"] = p
        out[f"{name}__gt"] = g
        out[f"{name}__dc"] = np.float64(brute_dc(p, g))
        if p.any() and g.any():
            out[f"{name}__assd"] = np.float64(brute_assd(p, g))
            out[f"{name}__hd"] = np.float64(brute_hd(p, g))
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                        "metric_golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(build_cases())} cases")
    for name in build_cases():
        line = f"  {name}: dc={out[f'{name}__dc']:.6f}"
        if f"{name}__assd" in out:
            line += (f" assd={out[f'{name}__assd']:.6f}"
                     f" hd={out[f'{name}__hd']:.6f}")
        print(line)


if __name__ == "__main__":
    main()
