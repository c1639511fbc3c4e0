# -*- coding: utf-8 -*-
"""SMSUT-TPU: a TPU-native (JAX/XLA/pjit/Pallas) framework with the
capabilities of Sue1347/SMSUT-MedicalImgSegmentation."""

__version__ = "0.1.0"

from smsut_tpu.config import Config, Modality, get_config, set_config

__all__ = ["Config", "Modality", "get_config", "set_config", "__version__"]
