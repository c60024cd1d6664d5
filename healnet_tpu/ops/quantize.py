"""Per-token int8 context quantization.

WSI patch-feature contexts dominate step HBM traffic (b x tokens x 2048; the
bench-scale bag is ~134 MB in bf16). The feature values enter the model only
through (a) per-token LayerNorm statistics and (b) the merged folded-KV
projection (`models/healnet.py` kv_cache) — both of which commute with a
per-token rescale:

    x = s_t * q_t            (q int8, s per-token f32)
    rowsum(x)   = s_t * rowsum(q)
    rowsum(x^2) = s_t^2 * rowsum(q^2)
    x @ W       = s_t * (q @ W)

so storing the context as (int8 values, per-token scales) halves the bytes
the step must stream from HBM — and halves host->device transfer and the
device-arena footprint (`train/loop.py` arena mode) — while the matmul/stats
run on exact integer values rescaled after accumulation. Symmetric absmax
quantization per token: s = max|x_row| / 127.

This is a TPU-side design choice the Torch reference has no analog for (its
features ship as fp32 `.pt` tensors, `/root/reference/healnet/etl/
loaders.py:382-395`); end-task neutrality is validated the same way the bf16
path was (BENCH_NOTES.md "bf16 quality validation").
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QuantizedContext:
    """A per-token int8 quantized modality context.

    data:  int8, ``(b, *spatial, channels)``
    scale: f32,  ``(b, *spatial)`` — per-token dequantization factor.

    The logical (dequantized) value is ``data * scale[..., None]``. Passing
    one of these as a modality tensor to :class:`HealNetModule` routes the
    KV projection through the quantized fused path (one int8 context read).
    """

    __slots__ = ("data", "scale")

    def __init__(self, data, scale):
        self.data = data
        self.scale = scale

    # pytree protocol — lets QuantizedContext ride through jit/vmap/scan
    def tree_flatten(self):
        return (self.data, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def dequantize(self, dtype: Any = jnp.float32) -> jnp.ndarray:
        return (
            self.data.astype(jnp.float32) * self.scale[..., None]
        ).astype(dtype)


def quantize_context(x: jnp.ndarray) -> QuantizedContext:
    """Symmetric per-token (last-axis) absmax int8 quantization (traced).

    Zero rows quantize to scale 0 / values 0 — dequantizing reproduces the
    zeros exactly (arena pad rows, masked bag tails).
    """
    xf = jnp.asarray(x, jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    return QuantizedContext(q, scale)


def quantize_context_host(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """numpy twin of :func:`quantize_context` for host-side arena packing.

    Returns ``(values int8, scales f32)`` with identical semantics so a
    host-quantized arena and a device-quantized batch agree bit-for-bit.
    """
    xf = np.asarray(x, np.float32)
    absmax = np.max(np.abs(xf), axis=-1)
    scale = (absmax / 127.0).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)
    q = np.clip(np.round(xf * inv[..., None]), -127, 127).astype(np.int8)
    return q, scale
