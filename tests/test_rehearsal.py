# -*- coding: utf-8 -*-
"""Long-horizon training-equivalence rehearsal (VERDICT r3 #1): the REAL
``Trainer.fit`` loop — several epochs of train -> validate (slice->volume
scatter) -> mean-dice model selection -> test-phase trois CSV — on a
reference-shaped synthetic dataset in strict-parity mode, versus an
independent torch re-derivation of the reference trainer replaying the
identical recorded batch stream (tools/rehearse_parity.py; reference
surface `trainer/baseTrainer.py:125-201` + `trainer/unetTrainer.py` driven
like `run0.sh`).

Envelopes are calibrated ~3x above the measured f32 drift at 8 epochs
(train loss 0.007, mean dice 0.005, per-modality 0.014, mo matrix 0.037).
ASSD is reported but only sanity-bounded: for near-random segmentations it
is chaotic (marginal connected components flip under 1-pixel prediction
differences).
"""
import numpy as np
import pytest


@pytest.mark.slow
def test_fit_loop_tracks_torch_rederivation(tmp_path):
    from tools.rehearse_parity import rehearse

    rep = rehearse(str(tmp_path), epochs=4, iters=6, size=64, width=8,
                   batch=4)
    assert rep["train_loss_dev"] < 0.02, rep
    assert rep["test_dice_dev"] < 0.02, rep
    assert rep["per_modality_dice_dev"] < 0.04, rep
    # selected-model quality (not epoch index — the curve may plateau
    # within the drift envelope)
    assert rep["best_dice_dev"] < 0.02, rep
    assert rep["mo_matrix_dev"] < 0.08, rep
    assert np.isfinite(rep["assd_matrix_dev"]), rep
    # the trajectory genuinely learns (the comparison is not vacuous)
    assert rep["jax_dice_trajectory"][-1] > 2 * rep["jax_dice_trajectory"][0]
