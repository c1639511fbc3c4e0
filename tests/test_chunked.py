# -*- coding: utf-8 -*-
"""Dispatch chunking (Config.steps_per_dispatch): T fused iterations per
dispatch must reproduce the T=1 loop — same batches, augment params and
PRNG keys in the same order — to float tolerance."""
import jax
import numpy as np
import pytest

from smsut_tpu.config import Config
from smsut_tpu.data.synthetic import make_synthetic_dataset
from smsut_tpu.train.loop import Trainer
from smsut_tpu.train.steps.mean_teacher import MeanTeacher
from smsut_tpu.utils.meter import Meter


@pytest.mark.parametrize("T", [3])
def test_chunked_matches_per_iteration(tmp_path, T):
    data_root = str(tmp_path / "synth")
    make_synthetic_dataset(data_root, n_patients_per_modality=2, n_slice=4,
                           size=32)
    base = Config(
        base_root=data_root, expr_root=str(tmp_path / "expr"), input_size=32,
        base_width=4, batch_size=2, num_iter_per_epoch=7, max_epoch=1,
        num_workers=2, compute_dtype="float32", eval_every=99,
        data_aug=dict(Config().data_aug, resizeCrop_size=32),
    )

    finals = []
    for spd in (1, T):
        cfg = base.replace(steps_per_dispatch=spd)
        algo = MeanTeacher(cfg)   # uses_unlabeled covers the 2-loader path
        tr = Trainer(algo, cfg, "train")
        tr.fit("inTurn")
        finals.append((tr.state.params, int(tr.state.step)))

    (p1, s1), (pT, sT) = finals
    assert s1 == sT == 7
    for (k1, l1), (k2, l2) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(pT)):
        assert k1 == k2
        # after ONE chunk the match is bit-level (measured 6e-8); over 7
        # SGD steps the scan-vs-eager float-order noise is amplified by
        # training chaos (consistency gates, lr 1e-2) to ~1e-4..1e-3
        # (mean up to 6.1e-4 observed across hosts), so bound at 2e-3
        d = np.abs(np.asarray(l2) - np.asarray(l1))
        assert d.mean() < 2e-3, (str(k1), d.mean())
        assert d.max() < 1e-2, (str(k1), d.max())
