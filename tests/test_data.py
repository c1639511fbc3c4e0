# -*- coding: utf-8 -*-
"""Data layer tests: samplers, augmentations, dataset tree, split."""
import random

import numpy as np
import pytest

from smsut_tpu.config import Config, MODALITIES
from smsut_tpu.data.augment import (
    JointAugment,
    gamma_correct,
    normalize_img,
    resized_crop_params,
    rotate_pair,
)
from smsut_tpu.data.dataset import SliceDataset, get_label_npys, get_loader
from smsut_tpu.data.samplers import (
    InTurnTestBatchSampler,
    InTurnTrainBatchSampler,
    ModalityBalanceBatchSampler,
)
from smsut_tpu.data.split import make_semi_split
from smsut_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root), n_patients_per_modality=3,
                                  n_slice=4, size=32)


def _pools(n_per_modal=(20, 12, 12, 8)):
    pools, n = [], 0
    for c in n_per_modal:
        pools.append(list(range(n, n + c)))
        n += c
    return pools


def test_inturn_train_sampler_single_modality_round_robin():
    pools = _pools()
    sampler = InTurnTrainBatchSampler(pools, batch_size=4, rng=random.Random(0))
    batches = list(sampler)
    assert len(batches) == len(sampler)
    pool_sets = [set(p) for p in _pools()]
    for i, b in enumerate(batches):
        assert len(b) == 4
        # round robin: batch i comes wholly from modality i % 4
        modal = i % 4
        assert set(b) <= pool_sets[modal]


def test_inturn_train_sampler_epoch_length():
    pools = _pools((20, 12, 12, 8))
    # per reference: batches/modality = len//bs - 1 if remainder else len//bs
    # 20//4=5, others < 5 -> n = 4 * 5
    sampler = InTurnTrainBatchSampler(pools, 4, rng=random.Random(0))
    assert len(sampler) == 20


def test_inturn_test_sampler_partial_batches():
    pools = _pools((10, 4, 4, 4))
    sampler = InTurnTestBatchSampler(pools, 4)
    batches = list(sampler)
    # every sample exactly once
    flat = [i for b in batches for i in b]
    assert sorted(flat) == sorted(sum(_pools((10, 4, 4, 4)), []))
    # partial final batch for modality 0 kept
    assert any(len(b) == 2 for b in batches)


def test_balance_sampler_mixes_modalities():
    pools = _pools((16, 16, 16, 16))
    sampler = ModalityBalanceBatchSampler(pools, 8, rng=random.Random(0))
    pool_sets = [set(p) for p in _pools((16, 16, 16, 16))]
    for b in sampler:
        assert len(b) == 8
        for m in range(4):
            assert len(set(b) & pool_sets[m]) == 2


def test_rotate_pair_mask_stays_integer(rng):
    img = (rng.random((32, 32)) * 255).astype(np.uint8)
    msk = rng.integers(0, 5, (32, 32)).astype(np.uint8)
    ri, rm = rotate_pair(img, msk, 10.0)
    assert set(np.unique(rm)) <= set(np.unique(msk)) | {0}
    assert ri.shape == img.shape


def test_resized_crop_params_bounds():
    r = random.Random(0)
    for _ in range(50):
        i, j, ch, cw = resized_crop_params(64, 64, (0.6, 1.0), (0.75, 4 / 3), r)
        assert 0 <= i <= 64 - ch and 0 <= j <= 64 - cw
        assert 0.5 <= ch * cw / (64 * 64) <= 1.0


def test_gamma_correct_matches_torch_formula(rng):
    img = (rng.random((8, 8)) * 255).astype(np.uint8)
    out = gamma_correct(img, 1.5)
    want = np.clip(255 * (img / 255.0) ** 1.5 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_normalize_range():
    img = np.array([[0, 255]], np.uint8)
    out = normalize_img(img)
    np.testing.assert_allclose(out, [[-1.0, 1.0]])


def test_joint_augment_shapes(rng):
    cfg = Config()
    aug = JointAugment(dict(cfg.data_aug, resizeCrop_size=32), random.Random(1))
    img = (rng.random((32, 32)) * 255).astype(np.uint8)
    msk = rng.integers(0, 5, (32, 32)).astype(np.uint8)
    for _ in range(5):
        ai, am = aug(img, msk)
        assert ai.shape == (32, 32) and am.shape == (32, 32)
        assert am.max() <= 4


def test_slice_dataset_tree(data_root):
    ds = SliceDataset(data_root, "train", fold=0, load_in_ram=True)
    assert len(ds) == 4 * 4  # 1 train pid x 4 slices x 4 modalities
    img, msk, mdl, name = ds.get_raw(0)
    assert img.shape == (32, 32) and msk.shape == (32, 32)
    assert name.count("_") == 2


def test_get_label_npys(data_root):
    n, npys = get_label_npys(data_root, "test")
    assert n == 4 * 4
    for k, v in npys.items():
        assert v.shape == (4, 32, 32)


def test_loader_batches(data_root):
    cfg = Config(num_workers=2, batch_size=4)
    aug = dict(cfg.data_aug, resizeCrop_size=32)
    loader = get_loader(data_root, "train", 0, 4, aug, cfg=cfg,
                        rng=random.Random(0))
    batch = next(iter(loader))
    assert batch.img.shape == (4, 32, 32, 1)
    assert batch.img.dtype == np.float32
    assert batch.msk.dtype == np.int32
    assert -1.0 <= batch.img.min() and batch.img.max() <= 1.0
    assert len(np.unique(batch.mdl)) == 1  # single-modality inTurn batches


def test_make_semi_split_invariants():
    pids = {m: [str(i).rjust(3, "0") for i in range(20)] for m in MODALITIES}
    split = make_semi_split(pids, n_fold=5)
    for m in MODALITIES:
        s = split[m]
        assert len(s["test"]) == 10  # 50%
        for fold in range(5):
            seen = list(s["test"]) + list(s["train"][fold]) + list(s["val"][fold])
            assert sorted(seen) == sorted(pids[m])  # each pid exactly once
    # t1in/t1out share patient split
    assert split["t1in"]["test"] == split["t1out"]["test"]


def test_split_self_check_catches_dropped_volume():
    """The self-check must assert completeness (count==1 over ALL volumes
    per fold, `toPngAndSplit.py:138-150`), not just no-duplicates — a
    dropped volume has to trip it."""
    from smsut_tpu.data.split import _check_split_modality

    pids = [str(i).rjust(3, "0") for i in range(20)]
    split = make_semi_split({"t2": pids})["t2"]
    _check_split_modality("t2", split, pids, 5)          # intact: passes
    broken = dict(split, test=split["test"][1:])         # drop one volume
    with pytest.raises(AssertionError, match="appears 0x"):
        _check_split_modality("t2", broken, pids, 5)
    dup = dict(split, test=split["test"] + split["test"][:1])
    with pytest.raises(AssertionError, match="appears 2x"):
        _check_split_modality("t2", dup, pids, 5)
