from healnet_tpu.ops.fourier import fourier_encode, fourier_channels, positional_encoding
from healnet_tpu.ops.activations import (
    GATED_ACTIVATIONS,
    gated_gelu,
    gated_relu,
    gated_selu,
    temperature_softmax,
)
from healnet_tpu.ops.attention import (
    attention_scores,
    multihead_attention,
    split_heads,
)
from healnet_tpu.ops.quantize import (
    QuantizedContext,
    quantize_context,
    quantize_context_host,
)

__all__ = [
    "fourier_encode",
    "fourier_channels",
    "positional_encoding",
    "GATED_ACTIVATIONS",
    "gated_gelu",
    "gated_relu",
    "gated_selu",
    "temperature_softmax",
    "attention_scores",
    "multihead_attention",
    "split_heads",
    "QuantizedContext",
    "quantize_context",
    "quantize_context_host",
]
