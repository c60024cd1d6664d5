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


def streaming_attention_stats(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    temperature: float = 0.5,
    kv_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> Tuple[jnp.ndarray, dict]:
    """Attention output + streaming inspection stats, never materialising
    the ``(b, h, lq, lkv)`` probability map.

    The WSI-scale inspection path: ``get_attention_weights``'s dense capture
    materialises the full map — gigabytes at the 50k-token contexts the
    Explainer targets (`/root/reference/healnet/models/explainer.py:201-349`)
    — while every downstream consumer only reduces it (per-token column
    means for heatmaps/rankings, whole-map std for layer selection). This
    computes those reductions exactly, two ``lax.scan`` passes over KV
    chunks (online-softmax lse, then normalised per-chunk probabilities),
    with peak attention memory ``(b, h, lq, chunk)``.

    Contract matches :func:`multihead_attention`: temperature-folded scores,
    mask fill after the temperature division, all-keys-masked rows output
    ZERO, stats from PRE-dropout probabilities (the dense capture returns
    ``weights`` before the dropout block), output from post-dropout
    probabilities realised via the coordinate-hash family — which is what
    makes exact chunked replay possible at all (the keep decision is a pure
    function of absolute coordinates; a bernoulli stream could not be
    re-chunked without changing the realised masks).

    Returns:
        (output ``(b, lq, h*d)``, stats dict):
            ``colsum``: (b, tokens) f32 — per-key prob mass summed over
                heads and queries (column mean = colsum / (h * lq));
            ``psum``, ``psumsq``: () f32 — whole-map prob sum / sum of
                squares (std of the dense map = sqrt(E[p^2] - E[p]^2));
            ``count``: () f32 — element count of the dense map.
    """
    from healnet_tpu.ops.hash_dropout import hash_keep, seed_from_rng

    b, h, lq, d = q.shape
    lkv = k.shape[2]
    chunk = max(1, min(int(chunk), lkv))
    nc = -(-lkv // chunk)
    pad = nc * chunk - lkv
    fill = mask_value(jnp.float32)

    mask = (
        jnp.ones((b, lkv), bool) if kv_mask is None else kv_mask.astype(bool)
    )
    valid = jnp.any(mask, axis=-1)[:, None, None, None]  # (b,1,1,1)
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))

    # (nc, ...) chunk-major views for scan
    kc = jnp.moveaxis(k.reshape(b, h, nc, chunk, -1), 2, 0)
    vc = jnp.moveaxis(v.reshape(b, h, nc, chunk, -1), 2, 0)
    mc = jnp.moveaxis(mask.reshape(b, nc, chunk), 1, 0)
    starts = jnp.arange(nc, dtype=jnp.uint32) * jnp.uint32(chunk)

    qf = q.astype(jnp.float32)
    inv_t = float(scale) / float(temperature)

    def sim_chunk(kci, mci):
        s = jnp.einsum(
            "bhid,bhjd->bhij", qf, kci.astype(jnp.float32)
        ) * inv_t
        return jnp.where(mci[:, None, None, :], s, fill)

    # ---- pass 1: running (max, denom) -> lse (b, h, lq)
    def p1(carry, xs):
        m, s = carry
        kci, mci = xs
        sim = sim_chunk(kci, mci)
        m_new = jnp.maximum(m, jnp.max(sim, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(sim - m_new[..., None]), -1)
        return (m_new, s), None

    m0 = jnp.full((b, h, lq), fill, jnp.float32)
    s0 = jnp.zeros((b, h, lq), jnp.float32)
    (m_fin, s_fin), _ = jax.lax.scan(p1, (m0, s0), (kc, mc))
    lse = m_fin + jnp.log(jnp.maximum(s_fin, 1e-30))

    drop = dropout_rate > 0.0 and dropout_rng is not None
    if drop:
        seed = seed_from_rng(dropout_rng).astype(jnp.uint32)[0, 0]
        rid = jnp.arange(b * h, dtype=jnp.uint32).reshape(b, h, 1, 1)
        qid = jnp.arange(lq, dtype=jnp.uint32).reshape(1, 1, lq, 1)

    # ---- pass 2: exact probs per chunk -> output + reductions
    def p2(carry, xs):
        acc, colslices, psum, psumsq = carry
        kci, vci, mci, start, ci = xs
        sim = sim_chunk(kci, mci)
        probs = jnp.exp(sim - lse[..., None]) * valid  # (b,h,lq,chunk)
        colsum = jnp.sum(probs, axis=(1, 2))           # (b, chunk)
        psum = psum + jnp.sum(probs)
        psumsq = psumsq + jnp.sum(jnp.square(probs))
        if drop:
            # absolute coordinates -> bit-identical to dense_keep_mask
            kvid = (start + jnp.arange(chunk, dtype=jnp.uint32)).reshape(
                1, 1, 1, chunk
            )
            keep = hash_keep(seed, rid, qid, kvid, dropout_rate)
            probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
        acc = acc + jnp.einsum("bhij,bhjd->bhid", probs, vci.astype(jnp.float32))
        colslices = jax.lax.dynamic_update_slice_in_dim(
            colslices, colsum[:, None], ci, axis=1
        )
        return (acc, colslices, psum, psumsq), None

    acc0 = jnp.zeros((b, h, lq, v.shape[-1]), jnp.float32)
    col0 = jnp.zeros((b, nc, chunk), jnp.float32)
    (out, cols, psum, psumsq), _ = jax.lax.scan(
        p2,
        (acc0, col0, jnp.float32(0.0), jnp.float32(0.0)),
        (kc, vc, mc, starts, jnp.arange(nc)),
    )
    colsum = cols.reshape(b, nc * chunk)[:, :lkv]
    out = out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, lq, h * v.shape[-1])
    stats = {
        "colsum": colsum,
        "psum": psum,
        "psumsq": psumsq,
        "count": jnp.float32(b * h * lq * lkv),
    }
    return out, stats


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """``(b, n, h * d) -> (b, h, n, d)``."""
    b, n, hd = x.shape
    d = hd // heads
    return x.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
