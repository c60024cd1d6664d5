from healnet_tpu.models.healnet import HealNet, HealNetModule, attention_module_order
from healnet_tpu.models.layers import (
    Attention,
    FeedForward,
    PreNormAttention,
    PreNormFeedForward,
)

__all__ = [
    "HealNet",
    "HealNetModule",
    "attention_module_order",
    "Attention",
    "FeedForward",
    "PreNormAttention",
    "PreNormFeedForward",
]
