# -*- coding: utf-8 -*-
"""Host-side joint (image, mask) augmentations.

Numpy/cv2/scipy re-implementations of
`/root/reference/data_loader/externalTransforms.py`: rotate (bilinear img /
nearest msk), elastic grid deformation (p=0.5, order 0 for both — the
reference passes order=[0,0]), random resized crop (scale 0.6-1.0, torchvision
parameter sampling), optional gamma.  Masks always use nearest-neighbour.

All transforms consume/produce uint8 arrays; randomness comes from an explicit
``random.Random`` so samplers and augs share the reference's seeding
discipline.
"""
from __future__ import annotations

import math
import random
from typing import Dict, Optional, Tuple

import cv2
import numpy as np
from scipy import ndimage


def rotate_pair(img: np.ndarray, msk: np.ndarray, angle: float) -> Tuple[np.ndarray, np.ndarray]:
    """PIL-style center rotation, expand=False, zero fill
    (`externalTransforms.py:57-65`)."""
    h, w = img.shape
    mat = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, 1.0)
    img_r = cv2.warpAffine(img, mat, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    msk_r = cv2.warpAffine(msk, mat, (w, h), flags=cv2.INTER_NEAREST,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    return img_r, msk_r


def elastic_deform_pair(img: np.ndarray, msk: np.ndarray, sigma: float,
                        points: int, rng: random.Random) -> Tuple[np.ndarray, np.ndarray]:
    """elasticdeform.deform_random_grid equivalent: a (2, points, points)
    normal(0, sigma) displacement grid, B-spline-interpolated over the image,
    order-0 resampling for both tensors (`externalTransforms.py:79-86`)."""
    h, w = img.shape
    np_rng = np.random.default_rng(rng.getrandbits(63))
    disp = np_rng.normal(0.0, sigma, size=(2, points, points))
    # cubic-spline upsample of the control grid to the full image
    zoom = (h / points, w / points)
    dy = ndimage.zoom(disp[0], zoom, order=3, mode="nearest")
    dx = ndimage.zoom(disp[1], zoom, order=3, mode="nearest")
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([yy + dy, xx + dx])
    img_d = ndimage.map_coordinates(img, coords, order=0, mode="constant")
    msk_d = ndimage.map_coordinates(msk, coords, order=0, mode="constant")
    return img_d, msk_d


def resized_crop_params(h: int, w: int, scale: Tuple[float, float],
                        ratio: Tuple[float, float], rng: random.Random
                        ) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params: 10 attempts of
    (area, log-uniform ratio) sampling, then center-crop fallback."""
    area = h * w
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            i = rng.randint(0, h - ch)
            j = rng.randint(0, w - cw)
            return i, j, ch, cw
    # fallback: center crop at a clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw = w
        ch = int(round(cw / ratio[0]))
    elif in_ratio > ratio[1]:
        ch = h
        cw = int(round(ch * ratio[1]))
    else:
        cw, ch = w, h
    i = (h - ch) // 2
    j = (w - cw) // 2
    return i, j, ch, cw


def resized_crop_pair(img: np.ndarray, msk: np.ndarray, i: int, j: int, ch: int,
                      cw: int, size: int) -> Tuple[np.ndarray, np.ndarray]:
    img_c = img[i:i + ch, j:j + cw]
    msk_c = msk[i:i + ch, j:j + cw]
    img_r = cv2.resize(img_c, (size, size), interpolation=cv2.INTER_LINEAR)
    msk_r = cv2.resize(msk_c, (size, size), interpolation=cv2.INTER_NEAREST)
    return img_r, msk_r


def gamma_correct(img: np.ndarray, gamma: float) -> np.ndarray:
    """torchvision adjust_gamma on uint8: 255 * (x/255)^gamma."""
    x = img.astype(np.float32) / 255.0
    return np.clip(np.power(x, gamma) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def color_jitter(img: np.ndarray, brightness: float, contrast: float,
                 rng: random.Random) -> np.ndarray:
    """torchvision ColorJitter for grayscale: brightness/contrast factors
    drawn from U(max(0, 1-x), 1+x); saturation/hue are no-ops on L images
    (`baseLoader.py:104` with brightness=contrast=0.4)."""
    ops = []
    if brightness > 0:
        b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda x: x * b)
    if contrast > 0:
        c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda x: (x - x.mean()) * c + x.mean())
    rng.shuffle(ops)
    x = img.astype(np.float32)
    for op in ops:
        x = op(x)
    return np.clip(x + 0.5, 0, 255).astype(np.uint8)


class JointAugment:
    """Composed train-time augmentation pipeline (`baseLoader.parse_aug`,
    `baseLoader.py:87-112`): rotate -> elastic -> resizedCrop on the joint
    pair, then optional img-only gamma, then normalize."""

    def __init__(self, data_aug: Optional[Dict], rng: Optional[random.Random] = None):
        self.cfg = data_aug or {}
        self.rng = rng or random.Random()

    def __call__(self, img: np.ndarray, msk: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        cfg, rng = self.cfg, self.rng
        if not cfg:
            return img, msk
        if cfg.get("rotate"):
            deg = cfg["rotate_degrees"]
            angle = rng.uniform(-deg, deg)
            img, msk = rotate_pair(img, msk, angle)
        if cfg.get("elasticDeform"):
            sigma = rng.uniform(*cfg["elasticDeform_sigmas"])
            if rng.random() < 0.5:
                img, msk = elastic_deform_pair(img, msk, sigma,
                                               cfg["elasticDeform_points"], rng)
        if cfg.get("resizeCrop"):
            size = cfg["resizeCrop_size"]
            i, j, ch, cw = resized_crop_params(img.shape[0], img.shape[1],
                                               (0.6, 1.0), (3.0 / 4.0, 4.0 / 3.0), rng)
            img, msk = resized_crop_pair(img, msk, i, j, ch, cw, size)
        if cfg.get("colorJitter"):
            img = color_jitter(img, 0.4, 0.4, rng)
        if cfg.get("gammaCorrect"):
            gamma = rng.uniform(*cfg["gammaCorrect_gammas"])
            if rng.random() < 0.5:
                img = gamma_correct(img, gamma)
        return img, msk


def normalize_img(img: np.ndarray) -> np.ndarray:
    """ToTensor + Normalize(0.5, 0.5): uint8 -> float32 in [-1, 1]
    (`baseLoader.py:107-108`)."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5
