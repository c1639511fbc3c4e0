# -*- coding: utf-8 -*-
"""Config dataclass sanity: annotations stay introspectable (VERDICT r3 #7)
and the reference knob defaults hold (`/root/reference/config.py:7-94`)."""
import typing

import pytest

from smsut_tpu.config import Config, Modality


def test_type_hints_resolvable():
    """Every annotation (incl. Optional[...] under PEP 563) must resolve —
    serialization/introspection tooling calls get_type_hints."""
    hints = typing.get_type_hints(Config)
    assert hints["pair_towers"] == typing.Optional[bool]
    assert hints["pool_pack_fused"] == typing.Optional[bool]
    assert hints["seed"] is int


def test_reference_defaults():
    cfg = Config()
    assert cfg.seed == 2020
    assert (cfg.num_iter_per_epoch, cfg.max_epoch) == (150, 200)
    assert (cfg.weight_dc, cfg.weight_ce) == (0.5, 0.5)
    assert cfg.base_width == 16
    assert cfg.split_yaml == "semi-1910.yaml"
    assert cfg.n_class == 5
    assert tuple(Modality.__members__) == ("ct", "t1in", "t1out", "t2")


def test_layout_pin_w_pack_guard():
    """The documented-crashing layout_pin + W-packed-D combination must fail
    fast with an actionable error (VERDICT r3 #8)."""
    from smsut_tpu.train.steps import setup_compute

    with pytest.raises(ValueError, match="layout_pin"):
        setup_compute(Config(layout_pin="cmin"))  # d_pack_mode defaults "w"
    # the non-crashing combination is accepted
    setup_compute(Config(layout_pin="cmin", d_pack_mode="hw"))
    setup_compute(Config())  # restore defaults for other tests
