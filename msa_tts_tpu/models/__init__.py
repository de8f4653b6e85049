from .loss import Tacotron2Loss, tacotron2_loss
from .tacotron2nv import (
    ModelConfig,
    config_from_params,
    init_tacotron2nv,
    tacotron2nv_forward,
    tacotron2nv_infer,
)

__all__ = [
    "ModelConfig",
    "config_from_params",
    "init_tacotron2nv",
    "tacotron2nv_forward",
    "tacotron2nv_infer",
    "Tacotron2Loss",
    "tacotron2_loss",
]
