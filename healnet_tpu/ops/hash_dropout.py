"""Counter-based (coordinate-hash) dropout for attention probabilities.

The reference applies dropout to the attention probabilities
(`/root/reference/healnet/models/healnet.py:421`), and every tuned config
trains with it (`config/best_hyperparams.yml` attn_dropout 0.08-0.46). A
flash kernel cannot use `jax.random.bernoulli` (the keep mask would be a
materialised (l_q x l_kv) HBM tensor — exactly what flash exists to avoid),
and a stateful in-kernel PRNG stream would couple the mask realisation to the
kernel's chunk/grouping schedule, breaking fwd/bwd mask agreement whenever the
backward uses a different KV chunk size.

Instead the keep decision is a **pure function of the element's absolute
coordinates**: ``keep(row, q, kv) = mix32(seed ^ f(row, q, kv)) < threshold``
with a splitmix/murmur-style 32-bit finaliser. Properties:

- layout-invariant: the forward (lq, C)-blocked kernel, the transposed
  (C, lq)-blocked backward kernel, the XLA reference path, and the
  sequence-parallel shard all regenerate bit-identical masks from the same
  seed, independent of chunk size, batch grouping, or shard topology;
- pure VPU integer ops (mul/xor/shift on uint32) — a handful of cheap
  elementwise ops fused into the score pipeline, no HBM traffic;
- deterministic per (seed, coordinates): a fixed training step reproduces
  exactly, which the resume-bit-equality guarantee requires.

This is the standard Philox-style "counter-based RNG" design specialised to a
single 32-bit word per decision; the mixer is the murmur3/splitmix32
finaliser, whose avalanche properties are well studied.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# murmur3/splitmix32 finaliser constants. NumPy scalars embed as jaxpr
# literals — a module-level jnp scalar would be a captured device constant,
# which Pallas kernels disallow, and weak Python ints above 2^31 overflow
# int32 parsing.
_M1 = np.uint32(0x7FEB352D)
_M2 = np.uint32(0x846CA68B)
# distinct odd constants decorrelating the three coordinate streams
_C_ROW = np.uint32(0x9E3779B1)
_C_Q = np.uint32(0x85EBCA77)
_C_KV = np.uint32(0xC2B2AE3D)


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """splitmix32 finaliser: full avalanche over 32 bits."""
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 15)
    x = x * _M2
    x = x ^ (x >> 16)
    return x


def keep_threshold(dropout_rate: float) -> np.uint32:
    """uint32 threshold t with P(mix < t) = 1 - rate."""
    keep = max(0.0, min(1.0, 1.0 - float(dropout_rate)))
    return np.uint32(min(int(keep * 2.0**32), 2**32 - 1))


def hash_keep(
    seed: jnp.ndarray,
    row_ids: jnp.ndarray,
    q_ids: jnp.ndarray,
    kv_ids: jnp.ndarray,
    dropout_rate: float,
) -> jnp.ndarray:
    """Boolean keep mask from absolute coordinates.

    Args:
        seed: uint32 scalar (or broadcastable array).
        row_ids: flattened batch*head row index, broadcastable vs q/kv ids.
        q_ids: query token index.
        kv_ids: key/value token index.
        dropout_rate: static drop probability in [0, 1).

    Returns:
        bool array over the broadcast shape; True = keep.
    """
    h = (
        row_ids.astype(jnp.uint32) * _C_ROW
        ^ q_ids.astype(jnp.uint32) * _C_Q
        ^ kv_ids.astype(jnp.uint32) * _C_KV
        ^ seed.astype(jnp.uint32)
    )
    return _mix32(h) < keep_threshold(dropout_rate)


def dense_keep_mask(
    seed: jnp.ndarray, bh: int, lq: int, lkv: int, dropout_rate: float
) -> jnp.ndarray:
    """Materialised (bh, lq, lkv) keep mask — the XLA-side reference of the
    in-kernel hash, used by parity tests and the weight-inspection path."""
    rid = jax.lax.broadcasted_iota(jnp.uint32, (bh, lq, lkv), 0)
    qid = jax.lax.broadcasted_iota(jnp.uint32, (bh, lq, lkv), 1)
    kid = jax.lax.broadcasted_iota(jnp.uint32, (bh, lq, lkv), 2)
    return hash_keep(seed, rid, qid, kid, dropout_rate)


def seed_from_rng(rng: jax.Array) -> jnp.ndarray:
    """Derive a (1, 1) int32 seed (SMEM-friendly) from a JAX PRNG key."""
    bits = jax.random.bits(rng, (1, 1), jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.int32)


# Attention-prob dropout mask family (trace-time; XLA dense path only):
#   "hash"     — the coordinate-hash mask above (default; the only family
#                the flash / sequence-parallel kernels can realise).
#   "threefry" — jax.random.bernoulli draws, the same mask family as the
#                Torch reference's materialised F.dropout tensors.
# Exists to FALSIFY the parity narrative (VERDICT r4 weak #2): the tpu side
# beat torch on the test split in 5/5 PARITY_FULL folds, attributed to the
# different dropout-mask family. Re-running the full protocol with
# mask_family("threefry") isolates that variable: if the one-sided offset
# tracks the family, the claim is proven; if it persists, the cause is
# elsewhere. Not a serving/production switch — flash and seq-parallel paths
# always hash (a bernoulli tensor in HBM is what they exist to avoid).
_MASK_FAMILY = "hash"


def mask_family(value: str = None) -> str:
    """Get or set the attention dropout mask family ("hash"/"threefry")."""
    global _MASK_FAMILY
    if value is not None:
        assert value in ("hash", "threefry"), value
        _MASK_FAMILY = value
    return _MASK_FAMILY
