# -*- coding: utf-8 -*-
"""nii.gz -> per-slice PNGs + 3-D label npy + semi-supervised split yaml
(`/root/reference/data_pprocess/toPngAndSplit.py`).

``to_png``: per volume — intensity clip (CT fixed window [-1000, 400], MR
percentile [0.05, 99.5], `:34-37`), min-max to [0, 255] (`:40`), save 8-bit
slice PNGs `{modal}_{pid}_{zzz}.png` into `{modal}/{pid}/{images,labels}/`
plus the full 3-D label volume as `{modal}_{pid}.npy` (`:50-61`).

``split_train_val_test``: delegates to `data.split.make_semi_split` with the
(1, 9, 10) ratios — 5% labeled train / 45% unlabeled / 50% test per modality,
5 rotating folds, t1in/t1out sharing patient splits — using the intended
4-name modality tuple (the committed reference iterates the characters of a
string; SURVEY appendix)."""
from __future__ import annotations

import os
from os.path import join as pjoin
from typing import Dict, List

import cv2
import numpy as np

from smsut_tpu.config import Config, MODALITIES
from smsut_tpu.data.split import make_semi_split, save_split
from smsut_tpu.preprocess.niftio import read_nifti
from smsut_tpu.utils.io import maybe_mkdir


def to_png(src: str, dst: str) -> None:
    maybe_mkdir(dst)
    for modality in sorted(os.listdir(src)):
        if not os.path.isdir(pjoin(src, modality)):
            continue
        dst_modal_root = pjoin(dst, modality)
        maybe_mkdir(dst_modal_root)
        src_img_root = pjoin(src, modality, "images")
        for name in sorted(os.listdir(src_img_root)):
            image = read_nifti(pjoin(src_img_root, name)).data.astype(np.float32)
            label = read_nifti(pjoin(src_img_root, name)
                               .replace("images", "labels")).data

            if modality == "ct":
                mi, ma = -1000.0, 400.0
            else:
                mi, ma = np.percentile(image, 0.05), np.percentile(image, 99.5)
            image = np.clip(image, mi, ma)
            image = (image - image.min()) / max(image.max() - image.min(), 1e-8) * 255

            pid = name.split("_")[1][:3]
            pid_root = pjoin(dst_modal_root, pid)
            img_root = pjoin(pid_root, "images")
            lbl_root = pjoin(pid_root, "labels")
            maybe_mkdir(pid_root, img_root, lbl_root)
            np.save(pjoin(pid_root, name.replace(".nii.gz", ".npy")),
                    label.astype(np.uint8))
            for z in range(image.shape[0]):
                png = f"{modality}_{pid}_{str(z).rjust(3, '0')}.png"
                cv2.imwrite(pjoin(img_root, png), image[z].astype(np.uint8))
                cv2.imwrite(pjoin(lbl_root, png), label[z].astype(np.uint8))


def split_train_val_test(data_root: str, save_root: str = "",
                         cfg: Config = None) -> Dict:
    cfg = cfg or Config()
    pids: Dict[str, List[str]] = {}
    for modality in MODALITIES:
        mroot = pjoin(data_root, modality)
        if not os.path.isdir(mroot):
            continue
        pids[modality] = [p for p in os.listdir(mroot)
                          if os.path.isdir(pjoin(mroot, p))]
    split = make_semi_split(pids, ratios=(1, 9, 10), n_fold=5, seed=cfg.seed)
    save_split(split, pjoin(save_root or data_root, cfg.split_yaml))
    return split
