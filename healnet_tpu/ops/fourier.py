"""Fourier positional encodings over N spatial axes.

Numerical-parity re-implementation of the reference encoding
(`/root/reference/healnet/models/healnet.py:292-302` and its use at
`healnet.py:210-222`):

- per spatial axis, positions are ``linspace(-1, 1, size)``;
- ``fourier_encode`` multiplies by ``linspace(1, max_freq / 2, num_bands) * pi``
  and concatenates ``[sin, cos, raw]`` along the last axis, giving
  ``2 * num_bands + 1`` features per axis;
- per-modality encoded channel count is ``n_axes * (2 * num_bands + 1)``
  (`healnet.py:134-139`).

On TPU these encodings are input-independent constants for a given static shape:
they are computed inside the traced function and constant-folded by XLA, so they
cost nothing at step time.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def fourier_encode(x: jnp.ndarray, max_freq: float, num_bands: int = 4) -> jnp.ndarray:
    """Sin/cos Fourier features plus the raw coordinate.

    Args:
        x: positions of any shape ``(...)``, typically in ``[-1, 1]``.
        max_freq: maximum frequency; band scales span ``[1, max_freq / 2]``.
        num_bands: number of frequency bands.

    Returns:
        Array of shape ``(..., 2 * num_bands + 1)``: ``[sin, cos, raw]``.
    """
    x = x[..., None]
    scales = jnp.linspace(1.0, max_freq / 2.0, num_bands, dtype=x.dtype)
    scales = scales.reshape((1,) * (x.ndim - 1) + (num_bands,))
    scaled = x * scales * math.pi
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled), x], axis=-1)


def fourier_channels(n_axes: int, num_bands: int) -> int:
    """Encoded channel count for a modality (`healnet.py:137`)."""
    return n_axes * (2 * num_bands + 1)


def positional_encoding(
    spatial_shape: Sequence[int],
    max_freq: float,
    num_bands: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Dense positional encoding grid for the given spatial shape.

    Returns shape ``(*spatial_shape, n_axes * (2 * num_bands + 1))`` — the
    flattened per-position encoding that is concatenated onto the data channels
    (`healnet.py:211-217`).
    """
    axis_pos = [jnp.linspace(-1.0, 1.0, size, dtype=dtype) for size in spatial_shape]
    grids = jnp.meshgrid(*axis_pos, indexing="ij")
    pos = jnp.stack(grids, axis=-1)  # (*spatial, n_axes)
    enc = fourier_encode(pos, max_freq, num_bands)  # (*spatial, n_axes, 2b+1)
    return enc.reshape(*spatial_shape, -1)
