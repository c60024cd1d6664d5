from healnet_tpu.models.healnet import HealNet, HealNetModule, attention_module_order
from healnet_tpu.models.layers import (
    Attention,
    FeedForward,
    PreNormAttention,
    PreNormFeedForward,
)
# reference `healnet.models` export surface (`healnet/models/__init__.py:1-11`)
from healnet_tpu.train.losses import CoxPHSurvLoss, CrossEntropySurvLoss
from healnet_tpu.models.baselines.generic import FCNN

__all__ = [
    "HealNet",
    "HealNetModule",
    "attention_module_order",
    "Attention",
    "FeedForward",
    "PreNormAttention",
    "PreNormFeedForward",
    "CoxPHSurvLoss",
    "CrossEntropySurvLoss",
    "FCNN",
]
