# -*- coding: utf-8 -*-
"""Meter accumulator semantics (`/root/reference/misc/utils.py:58-160`)."""
import numpy as np
import pytest

import jax.numpy as jnp

from smsut_tpu.ops.metrics import batch_dice_scores
from smsut_tpu.utils.meter import Meter


def test_accumulate_and_average():
    m = Meter(["loss"], ["dice"])
    m.accumulate({"loss": 10.0, "dice": 4.0}, {"loss": 5, "dice": 4})
    m.update_cur()
    assert m.cur_values["loss"] == pytest.approx(2.0)
    assert m.cur_values["dice"] == pytest.approx(1.0)


def test_best_tracking_min_max():
    m = Meter(["loss"], ["dice"])
    for loss, dice in [(2.0, 0.5), (1.0, 0.8), (1.5, 0.6)]:
        m.reset_cur()
        m.accumulate({"loss": loss, "dice": dice}, {"loss": 1, "dice": 1})
        m.update_cur()
    assert m.best_values["loss"] == 1.0   # min-better
    assert m.best_values["dice"] == 0.8   # max-better
    assert m.cur_values["loss"] == 1.5


def test_ema_smoothing():
    m = Meter(["loss"], [], alpha=0.5)
    m.accumulate({"loss": 4.0}, {"loss": 1})
    m.update_cur()
    assert m.cur_values["loss"] == 4.0    # first epoch: no previous
    m.reset_cur()
    m.accumulate({"loss": 0.0}, {"loss": 1})
    m.update_cur()
    assert m.cur_values["loss"] == pytest.approx(2.0)  # 0.5*4 + 0.5*0


def test_collect_loss_by():
    v, n = Meter.collect_loss_by(0.5, 2, 8)
    assert v == {"loss": 4.0, "loss_2": 4.0}
    assert n == {"loss": 8, "loss_2": 8}


def test_collect_dice_by_and_batch_dice_scores(rng):
    logits = jnp.asarray(rng.normal(size=(4, 8, 8, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(4, 8, 8)).astype(np.int32))
    scores = np.asarray(batch_dice_scores(logits, labels))
    assert scores.shape == (4,)
    assert np.all((scores >= 0) & (scores <= 1))
    a, b = Meter.collect_dice_by(scores, [0, 0, 1, 3], 4)
    assert a["dice"] == pytest.approx(scores.sum())
    assert a["dice_0"] == pytest.approx(scores[0] + scores[1])
    assert b == {"dice_0": 2, "dice_1": 1, "dice_2": 0, "dice_3": 1, "dice": 4}
    # perfect prediction -> dice ~1
    perfect = jnp.asarray(np.eye(5, dtype=np.float32)[np.asarray(labels)] * 10)
    s = np.asarray(batch_dice_scores(perfect, labels))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_repr_formats_modalities():
    m = Meter(["loss_0", "loss"], [])
    m.accumulate({"loss_0": 1.0, "loss": 1.0}, {"loss_0": 1, "loss": 1})
    m.update_cur()
    assert "loss_ct" in repr(m)
