# -*- coding: utf-8 -*-
import jax
import jax.numpy as jnp

from smsut_tpu.config import Config
from smsut_tpu.models.layers import set_fused_norm, set_norm_stats


def setup_compute(cfg: Config):
    """Shared algorithm setup: resolve the activation dtype and arm the fused
    Pallas norm path / fused pool transition when requested."""
    set_fused_norm(cfg.use_pallas)
    mode = getattr(cfg, "norm_stats", "auto")
    if mode == "auto":   # stats accumulate in the compute dtype (config.py)
        mode = "bf16" if cfg.compute_dtype == "bfloat16" else "reduce"
    set_norm_stats(mode)
    from smsut_tpu.models import packed as pk

    ppf = getattr(cfg, "pool_pack_fused", None)
    if ppf is None:   # auto: the narrow pooled tensor spills HBM at b>=32
        ppf = cfg.batch_size >= 32
    pk.set_pool_fused(bool(ppf))
    from smsut_tpu.models import packed_w as pwk

    pwk.set_pack_mode(getattr(cfg, "pack_mode", "hw"),
                      getattr(cfg, "pack_w0", 8),
                      getattr(cfg, "d_pack_deep", False),
                      getattr(cfg, "d_pack_mode", ""))
    from smsut_tpu.models import layout_pin

    pin_mode = getattr(cfg, "layout_pin", "off")
    d_mode = getattr(cfg, "d_pack_mode", "") or getattr(cfg, "pack_mode", "hw")
    if pin_mode != "off" and d_mode == "w":
        # Documented-crashing combination (config.py layout_pin note): the
        # axon TPU backend aborts compiling W-packed discriminator convs
        # under a layout constraint.  Fail with a clear message instead.
        raise ValueError(
            f"layout_pin={pin_mode!r} cannot be combined with the W-packed "
            f"discriminator (d_pack_mode='w', the default) — it crashes the "
            f"TPU backend.  Use --set d_pack_mode=hw (or pack_mode=hw with "
            f"d_pack_mode='') to experiment with layout pinning.")
    layout_pin.set_mode(pin_mode)
    from smsut_tpu.ops import conv_pallas as cp

    mode = getattr(cfg, "conv_pallas", "off")
    cp.set_conv_pallas(mode == "on" or (
        mode == "auto" and jax.default_backend() == "tpu"))
    from smsut_tpu.ops import block_pallas as bp

    bp.set_block_pallas(getattr(cfg, "block_pallas", False))
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
