# -*- coding: utf-8 -*-
from smsut_tpu.models.unet import UNet
from smsut_tpu.models.ugan import (
    Discriminator,
    PatchSampleF,
    UGAN,
    UGANnce,
    sample_patch_ids,
)
from smsut_tpu.models.dtc import DTCUNet

__all__ = [
    "UNet",
    "UGAN",
    "UGANnce",
    "Discriminator",
    "PatchSampleF",
    "sample_patch_ids",
    "DTCUNet",
]
