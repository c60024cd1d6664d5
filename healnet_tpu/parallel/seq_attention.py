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
from jax.experimental.shard_map import shard_map

from healnet_tpu.ops.activations import mask_value
from healnet_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ


def _local_attention_stats(q, k, v, kv_mask, scale, temperature):
    """Per-shard online-softmax accumulators.

    q: (b, h, lq, d); k, v: (b, h, lkv_local, d); kv_mask: (b, lkv_local).
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
    o = jnp.einsum("bhij,bhjd->bhid", p, v)
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
) -> jnp.ndarray:
    """Cross-attention with the KV token axis sharded over ``axis``.

    Args:
        q: (b, h, lq, d) — replicated over ``axis``.
        k, v: (b, h, lkv, d) — sharded over ``axis`` on the token dim.
        kv_mask: optional (b, lkv) bool, sharded like k.

    Returns:
        (b, lq, h * d) merged-head output, replicated over ``axis``.
    """
    has_mask = kv_mask is not None
    if not has_mask:
        kv_mask = jnp.ones(k.shape[:1] + k.shape[2:3], bool)

    def local_fn(q, k, v, kv_mask):
        m, l, o = _local_attention_stats(q, k, v, kv_mask, scale, temperature)
        # combine partial softmax stats across the KV shards
        m_global = jax.lax.stop_gradient(jax.lax.pmax(m, axis))
        correction = jnp.exp(m - m_global)
        l_global = jnp.maximum(jax.lax.psum(l * correction, axis), 1e-30)
        o_global = jax.lax.psum(o * correction, axis)
        return o_global / l_global

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
    qspec = P(b_axis, h_axis, None, None)
    kvspec = P(b_axis, h_axis, axis, None)
    mspec = P(b_axis, axis)
    out = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(qspec, kvspec, kvspec, mspec),
        out_specs=qspec,
        check_rep=False,
    )(q, k, v, kv_mask)
    b, h, lq, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, lq, h * d)
