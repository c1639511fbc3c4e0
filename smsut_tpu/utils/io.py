# -*- coding: utf-8 -*-
"""Small filesystem / yaml helpers (`/root/reference/misc/utils.py:39-55`)."""
from __future__ import annotations

import os
from typing import Any

import yaml


def maybe_mkdir(*paths: str) -> None:
    for p in paths:
        os.makedirs(p, exist_ok=True)


def read_yaml(path: str) -> Any:
    with open(path, "r") as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def write_yaml(data: Any, path: str) -> None:
    with open(path, "w") as f:
        yaml.dump(data, f)


def count_param_number(params, verbose: bool = False, logger=None) -> int:
    """Parameter count over a pytree (`misc/visualize.py:25-33`)."""
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if verbose:
        msg = f"Number of parameters: {n} ({n / 1e6:.4f}M)"
        if logger is not None:
            logger.info(msg)
        else:
            print(msg)
    return n


def colorize(mask) -> "np.ndarray":
    """Overlay palette for predictions (`misc/visualize.py:6-22`)."""
    import numpy as np

    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    h, w = mask.shape
    color_img = np.zeros((h, w, 3))
    for i in range(1, 5):
        color_img[mask == i, :] = colors[i - 1][:]
    return color_img
