"""Gated activations and temperature softmax.

Parity targets:
- gated chunk activations GELU/SELU/RELU (`/root/reference/healnet/models/healnet.py:323-336`):
  the input is split in half along the channel axis and the first half is
  multiplied by the activated second half;
- ``temperature_softmax`` (`healnet.py:354-365`), used at T=0.5 inside attention
  (`healnet.py:419`).

Note: torch's ``F.gelu`` is the exact erf formulation, so we use
``jax.nn.gelu(..., approximate=False)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Value used to fill masked attention logits. The reference uses -finfo.max and
# divides by temperature afterwards (`healnet.py:413-419`), which overflows to
# -inf in fp32; we use half of finfo.max so that the temperature division stays
# finite, keeping softmax rows NaN-free even when every key is masked.
def mask_value(dtype) -> float:
    return -0.5 * float(jnp.finfo(dtype).max)


def gated_gelu(x: jnp.ndarray) -> jnp.ndarray:
    x, gates = jnp.split(x, 2, axis=-1)
    return x * jax.nn.gelu(gates, approximate=False)


def gated_selu(x: jnp.ndarray) -> jnp.ndarray:
    x, gates = jnp.split(x, 2, axis=-1)
    return x * jax.nn.selu(gates)


def gated_relu(x: jnp.ndarray) -> jnp.ndarray:
    x, gates = jnp.split(x, 2, axis=-1)
    return x * jax.nn.relu(gates)


GATED_ACTIVATIONS = {
    "gelu": gated_gelu,
    "selu": gated_selu,
    "relu": gated_relu,
}


def temperature_softmax(
    logits: jnp.ndarray, temperature: float = 1.0, axis: int = -1
) -> jnp.ndarray:
    """Temperature-scaled softmax (`healnet.py:354-365`)."""
    return jax.nn.softmax(logits / temperature, axis=axis)
