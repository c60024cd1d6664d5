"""Sequence-parallel cross-attention: KV sharded across chips.

The ring-attention analog for HealNet's latent bottleneck (SURVEY.md §2.6/§5):
the latent query array is tiny and replicated; the per-modality KV context
(WSI patch bags) is sharded along the token axis over the ``seq`` mesh axis.
Each chip computes attention over its local KV shard with *online-softmax
statistics*, then the partial (max, sum, weighted-value) accumulators are
combined with two ``psum``-family collectives — no chip ever holds the full
context or the full (l_c x M) weight matrix:

    local:  m_k = max_j s_kj ;  l_k = sum_j e^(s_kj - m_k) ;
            o_k = sum_j e^(s_kj - m_k) v_j
    global: m = pmax_k m_k ;    out = psum_k(o_k e^(m_k - m)) / psum_k(l_k e^(m_k - m))

Built on ``shard_map`` so the collectives are explicit and the math is
testable on the virtual CPU mesh; XLA lowers the psums onto ICI on real pods.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from healnet_tpu.ops.activations import mask_value
from healnet_tpu.ops.hash_dropout import hash_keep
from healnet_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ


def _local_attention_stats(q, k, v, kv_mask, scale, temperature, drop=None):
    """Per-shard online-softmax accumulators.

    q: (b, h, lq, d); k, v: (b, h, lkv_local, d); kv_mask: (b, lkv_local).
    ``drop``: optional (keep/keep_prob) multiplier over the local score block
    — dropout applies to the weighted-value accumulator only; the softmax
    denominator ``l`` stays pre-drop (dropout acts on normalised probs).
    Returns (m (b,h,lq,1), l (b,h,lq,1), o (b,h,lq,d)).
    """
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (scale / temperature)
    if kv_mask is not None:
        fill = mask_value(sim.dtype)
        sim = jnp.where(kv_mask[:, None, None, :], sim, fill)
    # the softmax max-shift is gradient-invariant; stop-gradient keeps the
    # pmax collective out of the backward pass (pmax has no JVP rule)
    m = jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
    p = jnp.exp(sim - m)
    if kv_mask is not None:
        p = p * kv_mask[:, None, None, :].astype(p.dtype)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhij,bhjd->bhid", p if drop is None else p * drop, v)
    return m, l, o


def sequence_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    scale: float,
    temperature: float = 0.5,
    kv_mask: Optional[jnp.ndarray] = None,
    axis: str = AXIS_SEQ,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross-attention with the KV token axis sharded over ``axis``.

    Args:
        q: (b, h, lq, d) — replicated over ``axis``.
        k, v: (b, h, lkv, d) — sharded over ``axis`` on the token dim.
        kv_mask: optional (b, lkv) bool, sharded like k.
        dropout_rate: drop probability on the normalised attention
            probabilities. The keep mask is the coordinate hash of
            :mod:`healnet_tpu.ops.hash_dropout` over *global* (row, q, kv)
            coordinates, so the realisation is identical for every mesh
            topology (and bit-equal to a single-device run with the same
            seed) — each shard computes only its local slice of the mask.
        dropout_seed: (1, 1) int32 seed; required when dropout_rate > 0.

    Returns:
        (b, lq, h * d) merged-head output, replicated over ``axis``.
    """
    has_mask = kv_mask is not None
    if not has_mask:
        kv_mask = jnp.ones(k.shape[:1] + k.shape[2:3], bool)
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1, 1), jnp.int32)
    dropout_seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
    n_heads = q.shape[1]

    # keep the batch axis sharded over `data` and (when divisible) the head
    # axis over `model`, so entering the shard_map never all-gathers what the
    # surrounding GSPMD program keeps distributed — only the online-softmax
    # partials (b, h, lq, {1,d}) ever cross the interconnect
    sizes = dict(mesh.shape)
    b_axis = AXIS_DATA if q.shape[0] % max(sizes.get(AXIS_DATA, 1), 1) == 0 else None
    h_axis = (
        AXIS_MODEL
        if sizes.get(AXIS_MODEL, 1) > 1 and q.shape[1] % sizes[AXIS_MODEL] == 0
        else None
    )
    _b_sharded = b_axis is not None and sizes.get(AXIS_DATA, 1) > 1
    _h_sharded = h_axis is not None

    def local_fn(q, k, v, kv_mask, seed):
        drop = None
        if dropout_rate > 0.0:
            bl, hl, lq, _ = q.shape
            lkv_l = k.shape[2]
            shape = (bl, hl, lq, lkv_l)
            # global coordinates: local iota + this shard's axis offsets
            u32 = lambda x: jnp.asarray(x).astype(jnp.uint32)
            b0 = u32(jax.lax.axis_index(AXIS_DATA) * bl) if _b_sharded else jnp.uint32(0)
            h0 = u32(jax.lax.axis_index(AXIS_MODEL) * hl) if _h_sharded else jnp.uint32(0)
            kv0 = u32(jax.lax.axis_index(axis) * lkv_l)
            bid = b0 + jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            hid = h0 + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            rid = bid * jnp.uint32(n_heads) + hid
            qid = jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
            kid = kv0 + jax.lax.broadcasted_iota(jnp.uint32, shape, 3)
            seed_u = jax.lax.bitcast_convert_type(seed, jnp.uint32)[0, 0]
            keep = hash_keep(seed_u, rid, qid, kid, dropout_rate)
            drop = keep.astype(jnp.float32) * (1.0 / (1.0 - dropout_rate))
        m, l, o = _local_attention_stats(
            q, k, v, kv_mask, scale, temperature, drop=drop
        )
        # combine partial softmax stats across the KV shards
        m_global = jax.lax.stop_gradient(jax.lax.pmax(m, axis))
        correction = jnp.exp(m - m_global)
        l_global = jnp.maximum(jax.lax.psum(l * correction, axis), 1e-30)
        o_global = jax.lax.psum(o * correction, axis)
        return o_global / l_global

    qspec = P(b_axis, h_axis, None, None)
    kvspec = P(b_axis, h_axis, axis, None)
    mspec = P(b_axis, axis)
    out = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(qspec, kvspec, kvspec, mspec, P(None, None)),
        out_specs=qspec,
        check_vma=False,
    )(q, k, v, kv_mask, dropout_seed)
    b, h, lq, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, lq, h * d)
