# -*- coding: utf-8 -*-
"""PNG slice dataset + batch loaders feeding the TPU input pipeline.

Mirrors the reference data contract (`/root/reference/data_loader/
baseLoader.py:29-62`, `balanceLoader.py:31-69`): the on-disk tree is
``{root}/{modality}/{pid}/{images,labels}/{modality}_{pid}_{zzz}.png`` plus a
3-D ``{modality}_{pid}.npy`` label volume per patient; batches carry
(img [B,H,W,1] float32 in [-1,1], msk [B,H,W] int32, mdl [B] int32, names).

Unlike the reference's fork-based DataLoader, decoding and augmentation run in
a thread pool (cv2/scipy release the GIL) with an N-deep host-side prefetch
queue; arrays land in pinned host buffers ready for a single device_put.
"""
from __future__ import annotations

import concurrent.futures as futures
import os
import queue
import random
import threading
from dataclasses import dataclass, field
from os.path import join as pjoin
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from smsut_tpu.config import Config, MODALITIES, Modality
from smsut_tpu.data.augment import JointAugment, normalize_img
from smsut_tpu.data.samplers import (
    InTurnTestBatchSampler,
    InTurnTrainBatchSampler,
    ModalityBalanceBatchSampler,
    ShardedBatchSampler,
)
from smsut_tpu.utils.io import read_yaml


@dataclass
class Batch:
    img: np.ndarray            # [B, H, W, 1] float32 in [-1, 1]
    msk: np.ndarray            # [B, H, W] int32
    mdl: np.ndarray            # [B] int32
    names: List[str] = field(default_factory=list)  # '{modal}_{pid}_{zzz}'

    @property
    def batch_size(self) -> int:
        return self.img.shape[0]


def _imread_gray(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


class SliceDataset:
    """Flat list of (img, msk, modality_id, name) slices from the split yaml.

    RAM mode is backed by the native C++ slice cache (native/slicecache.cpp:
    one contiguous buffer per image/label set, PNG decoded once, batch
    gathers via memcpy) with a cv2 fallback when the library is absent."""

    def __init__(self, data_root: str, phase: str, fold: int = 0,
                 load_in_ram: bool = True, split_yaml: str = "semi-1910.yaml"):
        self.data_root = data_root
        self.phase = phase
        self.fold = fold
        self.load_in_ram = load_in_ram
        self.samples: List[Tuple] = []
        self.modal_sample_ids: List[List[int]] = [[] for _ in MODALITIES]
        img_paths, msk_paths = [], []
        split = read_yaml(pjoin(data_root, split_yaml))
        n = 0
        for m in MODALITIES:
            if m not in split:
                continue
            part = split[m][phase] if phase == "test" else split[m][phase][fold]
            for pid in part:
                pid_root = pjoin(data_root, m, str(pid), "images")
                for png in sorted(os.listdir(pid_root)):
                    img_p = pjoin(pid_root, png)
                    msk_p = img_p.replace("images", "labels")
                    img_paths.append(img_p)
                    msk_paths.append(msk_p)
                    self.samples.append((img_p, msk_p, Modality[m].value,
                                         png.replace(".png", "")))
                    self.modal_sample_ids[Modality[m].value].append(n)
                    n += 1
        self.n = n

        self._img_cache = self._msk_cache = None
        self._ram: List[Tuple[np.ndarray, np.ndarray]] = []
        if load_in_ram and n:
            try:
                from smsut_tpu.data.native_cache import SliceCache, available

                if available():
                    self._img_cache = SliceCache(img_paths)
                    self._msk_cache = SliceCache(msk_paths)
            except Exception:
                self._img_cache = self._msk_cache = None
            if self._img_cache is None:
                self._ram = [(_imread_gray(i), _imread_gray(s))
                             for i, s in zip(img_paths, msk_paths)]

    def __len__(self) -> int:
        return self.n

    def get_raw(self, i: int) -> Tuple[np.ndarray, np.ndarray, int, str]:
        _, _, mdl, name = self.samples[i]
        if self._img_cache is not None:
            return (self._img_cache.gather_u8([i])[0],
                    self._msk_cache.gather_u8([i])[0], mdl, name)
        if self.load_in_ram and self._ram:
            img, msk = self._ram[i]
            return img, msk, mdl, name
        img_p, msk_p, _, _ = self.samples[i]
        return _imread_gray(img_p), _imread_gray(msk_p), mdl, name

    def gather_batch_u8(self, idxs: Sequence[int]):
        """Native fast path: packed uint8 [B,H,W] image+mask blocks."""
        if self._img_cache is None:
            return None
        return (self._img_cache.gather_u8(list(idxs)),
                self._msk_cache.gather_u8(list(idxs)))

    def __repr__(self) -> str:
        return (f"{self.__class__.__name__}(samples={self.n}, "
                f"phase={self.phase} {self.fold})")


class BatchLoader:
    """Sampler + augmentation + collation with threaded prefetch."""

    def __init__(self, dataset: SliceDataset, sampler, augment: Optional[JointAugment],
                 num_workers: int = 6, prefetch_depth: int = 2, raw: bool = False):
        self.dataset = dataset
        self.sampler = sampler
        self.augment = augment
        self.raw = raw  # yield uint8 [B,H,W] pairs for on-device augmentation
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = prefetch_depth
        # optional producer-thread hook: Batch -> item yielded by __iter__
        # (the Trainer attaches device-augment parameter sampling here so the
        # main thread only dispatches)
        self.post = None
        self._pool = futures.ThreadPoolExecutor(max_workers=self.num_workers)

    def _make_sample(self, i: int) -> Tuple[np.ndarray, np.ndarray, int, str]:
        img, msk, mdl, name = self.dataset.get_raw(i)
        if self.raw:
            return img, msk, mdl, name
        if self.augment is not None:
            img, msk = self.augment(img, msk)
        return normalize_img(img), msk.astype(np.int32), mdl, name

    def _collate(self, idxs: Sequence[int]) -> Batch:
        if self.raw:
            fast = self.dataset.gather_batch_u8(idxs)
            if fast is not None:
                img, msk = fast
                mdl = np.asarray([self.dataset.samples[i][2] for i in idxs],
                                 np.int32)
                names = [self.dataset.samples[i][3] for i in idxs]
                return Batch(img, msk, mdl, names)
        parts = list(self._pool.map(self._make_sample, idxs))
        img = np.stack([p[0] for p in parts])
        if not self.raw:
            img = img[..., None]
        msk = np.stack([p[1] for p in parts])
        if not self.raw:
            msk = msk.astype(np.int32)
        mdl = np.asarray([p[2] for p in parts], np.int32)
        names = [p[3] for p in parts]
        return Batch(img, msk, mdl, names)

    def __iter__(self) -> Iterator[Batch]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        stop = object()

        def producer():
            try:
                for idxs in self.sampler:
                    item = self._collate(idxs)
                    if self.post is not None:
                        item = self.post(item)
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def iter_cycle(self) -> Iterator[Batch]:
        """Endless stream from ONE persistent producer thread.  Training
        pulls num_iter_per_epoch batches regardless of sampler length
        (`unetTrainer.py:59-63`'s StopIteration-restart pattern); restarting
        __iter__ for every wraparound leaks a blocked producer thread per
        restart on small datasets — this keeps exactly one."""
        if self._cycle_q is None:
            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)

            def producer():
                while True:
                    for idxs in self.sampler:
                        item = self._collate(idxs)
                        if self.post is not None:
                            item = self.post(item)
                        q.put(item)

            threading.Thread(target=producer, daemon=True).start()
            self._cycle_q = q
        while True:
            yield self._cycle_q.get()

    _cycle_q = None

    def __len__(self) -> int:
        return len(self.sampler)


def get_loader(data_root: str, phase: str, fold: int, batch_size: int,
               data_aug: Optional[Dict] = None, load_in_ram: bool = True,
               cfg: Optional[Config] = None, loader_type: str = "inTurn",
               rng: Optional[random.Random] = None, raw: bool = False,
               num_shards: Optional[int] = None,
               shard_id: Optional[int] = None) -> BatchLoader:
    """Reference `inTurnLoader.get_loader` equivalent
    (`inTurnLoader.py:83-97`); ``loader_type='balance'`` selects the
    modality-balanced sampler (`balanceLoader.py:112-125`).

    Multi-host: train/val samplers are partitioned so each process decodes
    only its contiguous slice of every global batch (``num_shards``/
    ``shard_id`` default to the ``jax.distributed`` process layout; test
    loaders stay global — eval is replicated across hosts)."""
    cfg = cfg or Config()
    rng = rng or random.Random()
    dataset = SliceDataset(data_root, phase, fold, load_in_ram, cfg.split_yaml)
    if phase in ("train", "val"):
        augment = JointAugment(data_aug, rng) if data_aug else None
        if loader_type == "inTurn":
            sampler = InTurnTrainBatchSampler(dataset.modal_sample_ids, batch_size,
                                              shuffle=False, rng=rng)
        elif loader_type == "balance":
            sampler = ModalityBalanceBatchSampler(dataset.modal_sample_ids,
                                                  batch_size, rng=rng)
        else:
            raise NotImplementedError(loader_type)
        if num_shards is None:
            from smsut_tpu.parallel import distributed

            num_shards = distributed.process_count()
            shard_id = distributed.process_index()
        if num_shards > 1:
            sampler = ShardedBatchSampler(sampler, num_shards, shard_id or 0)
    else:
        augment = None
        sampler = InTurnTestBatchSampler(dataset.modal_sample_ids, batch_size)
    return BatchLoader(dataset, sampler, None if raw else augment,
                       cfg.num_workers, cfg.prefetch_depth, raw=raw)


def get_label_npys(data_root: str, phase: str,
                   split_yaml: str = "semi-1910.yaml") -> Tuple[int, Dict[str, np.ndarray]]:
    """Ground-truth 3-D label volumes keyed '{modal}_{pid}'
    (`misc/utils.py:163-177`)."""
    retn, n = {}, 0
    split = read_yaml(pjoin(data_root, split_yaml))
    for m in MODALITIES:
        if m not in split:
            continue
        for p in split[m][phase]:
            npy = np.load(pjoin(data_root, m, str(p), f"{m}_{p}.npy"))
            n += npy.shape[0]
            retn[f"{m}_{p}"] = npy
    return n, retn
