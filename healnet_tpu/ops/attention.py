"""Functional attention core (XLA reference path).

Numerical contract mirrors the reference `Attention.forward`
(`/root/reference/healnet/models/healnet.py:400-426`):

- scores = ``q @ k^T * scale`` with ``scale = dim_head ** -0.5``;
- optional boolean key mask filled with a large negative value (`healnet.py:411-415`);
- **temperature softmax at T=0.5** (`healnet.py:419`) — folded here as a single
  multiplicative factor on the scale so the fused kernel needs no extra pass;
- optional dropout on the attention probabilities (`healnet.py:421`);
- weighted sum over values.

This module is pure-JAX; the Pallas flash kernel in
:mod:`healnet_tpu.ops.flash_attention` implements the identical math with
online softmax and is parity-tested against this implementation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from healnet_tpu.ops.activations import mask_value


def attention_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    scale: float,
    temperature: float = 1.0,
    kv_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked, temperature-scaled attention probabilities.

    Args:
        q: queries ``(b, h, lq, d)``.
        k: keys ``(b, h, lkv, d)``.
        scale: ``dim_head ** -0.5``.
        temperature: softmax temperature (0.5 in HealNet).
        kv_mask: optional boolean key mask ``(b, lkv)``; True = attend.

    Returns:
        probabilities ``(b, h, lq, lkv)``.
    """
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * scale / temperature
    if kv_mask is not None:
        # fill AFTER the temperature division: dividing the half-finfo.max
        # fill by a temperature < 0.5 would overflow to -inf and turn
        # fully-masked rows into NaN (NaN * the zero-guard is still NaN)
        fill = mask_value(sim.dtype)
        sim = jnp.where(kv_mask[:, None, None, :], sim, fill)
    return jax.nn.softmax(sim, axis=-1)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    temperature: float = 0.5,
    kv_mask: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    return_weights: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Multi-head attention over already-projected q/k/v.

    Args:
        q: ``(b, h, lq, d)``; k, v: ``(b, h, lkv, d)``.

    Returns:
        (output ``(b, lq, h * d)``, attention weights ``(b, h, lq, lkv)`` or None).
    """
    attn = attention_scores(q, k, scale, temperature=temperature, kv_mask=kv_mask)
    if kv_mask is not None:
        # All-keys-masked convention: output ZERO, not the uniform-softmax mean
        # of values (which a -1e30 fill would yield, and which the reference's
        # NaN propagation makes moot). This matches the flash kernel, so
        # attention_impl='auto' cannot change model outputs for empty bags.
        valid = jnp.any(kv_mask, axis=-1)[:, None, None, None]  # (b, 1, 1, 1)
        attn = attn * valid
    weights = attn if return_weights else None
    if dropout_rate > 0.0 and dropout_rng is not None:
        # Coordinate-hash keep mask (hash_dropout), NOT jax.random.bernoulli:
        # the mask is a pure function of (seed, absolute coordinates), so this
        # path, the Pallas flash kernel, and the sequence-parallel shard all
        # realise BIT-IDENTICAL dropout from the same rng — `attention_impl`
        # can never change a training trajectory. It is also cheaper: ~10 VPU
        # integer ops per element fused into the softmax pipeline vs a
        # threefry-2x32 bernoulli tensor.
        from healnet_tpu.ops.hash_dropout import (
            dense_keep_mask,
            mask_family,
            seed_from_rng,
        )

        b, h, lq, lkv = attn.shape
        if mask_family() == "threefry":
            # torch-family bernoulli masks — the parity falsification
            # switch (see ops/hash_dropout.mask_family); never the
            # default: attention_impl must not change trajectories
            keep = jax.random.bernoulli(
                dropout_rng, 1.0 - dropout_rate, attn.shape
            )
        else:
            seed = seed_from_rng(dropout_rng)
            keep = dense_keep_mask(seed, b * h, lq, lkv, dropout_rate).reshape(
                b, h, lq, lkv
            )
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v)
    b, h, lq, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, h * d)
    return out, weights


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """``(b, n, h * d) -> (b, h, n, d)``."""
    b, n, hd = x.shape
    d = hd // heads
    return x.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
