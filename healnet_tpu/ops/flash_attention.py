"""Fused flash cross-attention Pallas kernel (TPU).

The HealNet hot loop is latent-bottleneck cross-attention: a small latent
query array (l_c = 16..256 tokens) attends to a long per-modality context
(WSI patch bags of thousands of tokens) — `SURVEY.md §3.2`. The reference
materialises the full (l_c x M) attention matrix in HBM per layer per
modality (`/root/reference/healnet/models/healnet.py:409-424`); this kernel
streams KV chunks HBM->VMEM with an online-softmax accumulator so the weights
never touch HBM, with the T=0.5 temperature folded into the scale
(`healnet.py:419`).

Layout:
- grid = (bh/G, kv_chunks): each step processes a GROUP of G batch*head rows
  against one KV chunk with a batched dot_general, amortising per-step
  pipeline overhead (the latent query is tiny, so per-(bh, chunk) steps are
  launch-bound otherwise). The TPU grid is sequential over the minor axis, so
  per-row softmax stats (m, l) and the output accumulator live in VMEM
  scratch across chunk iterations (standard flash schedule);
- the head dim stays UNPADDED (Mosaic handles non-128 lanes); padding d=63/64
  to 128 would double KV HBM traffic;
- forward also emits per-row logsumexp, the only residual backward needs
  besides q/k/v; backward computes dk/dv per chunk block and accumulates dq
  in scratch (flash backward with the delta = rowsum(dO * O) trick).

Falls back to interpret mode off-TPU so CPU tests exercise identical code.

Dropout on the attention probabilities (`/root/reference/healnet/models/
healnet.py:421`) is implemented with the coordinate-hash counter RNG from
:mod:`healnet_tpu.ops.hash_dropout`: the keep decision is a pure function of
(seed, row, q index, kv index), so the forward's (lq, C)-blocked kernel and
the backward's transposed (C, lq)-blocked kernel regenerate bit-identical
masks regardless of chunk size or batch grouping, at the cost of a few VPU
integer ops fused into the score pipeline — no (lq x lkv) mask ever touches
HBM. Semantics match the XLA path: dropout applies to the *normalised*
probabilities, the softmax denominator is computed pre-drop.
Weight-inspection still routes to the XLA path at the module layer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from healnet_tpu.ops.hash_dropout import hash_keep

DEFAULT_KV_CHUNK = 2048
_NEG_BIG = -1e30
# VMEM working-set budgets used to pick the batch-group size G
_FWD_BYTES_BUDGET = 11 * 1024 * 1024
_BWD_BYTES_BUDGET = 10 * 1024 * 1024

_BATCH_DN = lambda: (((2,), (2,)), ((0,), (0,)))  # contract d, batch G


from healnet_tpu.ops.pallas_utils import on_tpu as _on_tpu
from healnet_tpu.ops.pallas_utils import round_up as _round_up


def _pick_group(bh: int, lq: int, chunk: int, d: int, budget: int, n_tmp: int = 3) -> int:
    """Largest divisor of bh whose per-step buffers fit the VMEM budget.

    Accounts for double-buffered k/v input blocks plus the (lq x chunk)
    score/prob temporaries the kernel materialises in registers/stack
    (``n_tmp`` of them; the dropout hash adds two more: ids + keep mask).
    """
    per_g = 2 * (2 * chunk * d * 4) + n_tmp * lq * chunk * 4 + lq * (3 * d + 512) * 4
    g = max(1, budget // max(per_g, 1))
    while g > 1 and bh % g != 0:
        g -= 1
    return max(1, min(g, bh))


# --------------------------------------------------------------------- fwd

def _keep_scale(seed_ref, shape, row0, kv0, dropout_rate, transposed=False):
    """(keep / keep_prob) multiplier over a score block.

    ``shape`` is (G, lq, C) for the forward layout or (G, C, lq) when
    ``transposed`` (the backward kernel's score layout); coordinates are
    absolute, so both layouts regenerate the identical mask realisation.
    ``seed_ref`` is a (1, 1) uint32 SMEM scalar (converted outside the
    kernel: Mosaic has no scalar bitcast).
    """
    seed_u = seed_ref[0, 0]
    rid = row0.astype(jnp.uint32) + jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    kv_dim, q_dim = (1, 2) if transposed else (2, 1)
    qid = jax.lax.broadcasted_iota(jnp.uint32, shape, q_dim)
    kid = kv0.astype(jnp.uint32) + jax.lax.broadcasted_iota(jnp.uint32, shape, kv_dim)
    keep = hash_keep(seed_u, rid, qid, kid, dropout_rate)
    return keep.astype(jnp.float32) * (1.0 / (1.0 - dropout_rate))


def _fwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, seed_ref,
    o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale, dropout_rate
):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # keep q/k/v in their input dtype: the MXU accumulates bf16 x bf16 in f32
    # natively (preferred_element_type); explicit per-chunk astype(f32) costs
    # a VPU conversion pass over every KV element
    q = q_ref[...]                              # (G, lq, d)
    k = k_ref[...]                              # (G, C, d)
    v = v_ref[...]                              # (G, C, d)
    mask = mask_ref[...]                        # (G, 1, C) float: 1 keep

    s = jax.lax.dot_general(q, k, _BATCH_DN(), preferred_element_type=jnp.float32)
    s = s * scale + (mask - 1.0) * (-_NEG_BIG)  # (G, lq, C); masked -> -1e30

    m_prev = m_scr[..., 0:1]                    # (G, lq, 1)
    l_prev = l_scr[..., 0:1]
    m_cur = jnp.max(s, axis=2, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # multiply by the mask so a fully-masked chunk contributes exactly zero
    # (exp(s - m) would be 1 when every key is masked and m == s == -1e30)
    p = jnp.exp(s - m_new) * mask               # (G, lq, C) f32
    correction = jnp.exp(m_prev - m_new)
    # the softmax denominator uses the PRE-dropout probabilities (dropout
    # applies to normalised probs, matching the XLA path / torch reference)
    l_new = l_prev * correction + jnp.sum(p, axis=2, keepdims=True)
    if dropout_rate > 0.0:
        g_sz, _, c_sz = s.shape
        p_acc = p * _keep_scale(
            seed_ref, s.shape, pl.program_id(0) * g_sz, j * c_sz, dropout_rate
        )
    else:
        p_acc = p
    # probabilities cast to the value dtype for the second matmul (standard
    # flash practice; exact for f32 inputs, bf16-rounded otherwise)
    acc_scr[...] = acc_scr[...] * correction + jax.lax.dot_general(
        p_acc.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_chunks - 1)
    def _():
        l_final = l_scr[..., 0:1]
        o_ref[...] = (acc_scr[...] / jnp.maximum(l_final, 1e-30)).astype(o_ref.dtype)
        # lse is PACKED: one f32 per query row ((g, lq, 1) block), not a
        # 128-lane broadcast — the residual write is 1/128th the bytes
        lse_ref[...] = (
            m_scr[..., 0:1] + jnp.log(jnp.maximum(l_final, 1e-30))
        ).astype(lse_ref.dtype)


def _fwd_call(q, k, v, mask, seed, scale, kv_chunk, interpret, dropout_rate):
    bh, lq, d = q.shape
    _, lkv, _ = k.shape
    n_chunks = lkv // kv_chunk
    n_tmp = 5 if dropout_rate > 0.0 else 3
    g = _pick_group(bh, lq, kv_chunk, d, _FWD_BYTES_BUDGET, n_tmp=n_tmp)

    kernel = functools.partial(_fwd_kernel, scale=scale, dropout_rate=dropout_rate)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh // g, n_chunks),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[
            pl.BlockSpec((g, lq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kv_chunk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kv_chunk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, kv_chunk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, lq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lq, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, lq, 128), jnp.float32),
            pltpu.VMEM((g, lq, 128), jnp.float32),
            pltpu.VMEM((g, lq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask, seed)
    return out, lse


# --------------------------------------------------------------------- bwd

def _bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref, seed_ref,
    dq_ref, dk_ref, dv_ref, dq_scr, *, scale, dropout_rate
):
    """Flash backward in TRANSPOSED score layout.

    Scores/probabilities are computed as (C, lq) rather than (lq, C): the dv
    and dk products then contract over the canonical (last-of-A, middle-of-B)
    dims, avoiding the per-chunk operand transposes that held the original
    layout to half the HBM roofline.
    """
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[...]                               # (G, lq, d) input dtype
    k = k_ref[...]                               # (G, C, d)
    v = v_ref[...]                               # (G, C, d)
    do = do_ref[...]                             # (G, lq, d)
    # lse/delta arrive PACKED as (G, lq, 1) blocks (one f32 per query row);
    # swapaxes relayouts the tiny tile, keeping everything slice/transpose-
    # based: integer indexing lowers to gathers Mosaic does not support
    # beyond 2D
    lse_row = jnp.swapaxes(lse_ref[...], 1, 2)                 # (G, 1, lq)
    delta_row = jnp.swapaxes(delta_ref[...], 1, 2)             # (G, 1, lq)
    mask_col = jnp.swapaxes(mask_ref[...], 1, 2)               # (G, C, 1)

    # s_T = (k q^T) : (G, C, lq) — contraction over d on the last dims
    s_t = jax.lax.dot_general(k, q, _BATCH_DN(), preferred_element_type=jnp.float32)
    s_t = s_t * scale + (mask_col - 1.0) * (-_NEG_BIG)
    p_t = jnp.exp(s_t - lse_row) * mask_col                    # (G, C, lq)

    # regenerate the forward's dropout realisation from absolute coordinates
    # (transposed block layout; see hash_dropout). With probs a, keep e, rate r:
    #   out_i  = sum_j (e_ij/(1-r)) a_ij v_j
    #   dv_j   = sum_i (e_ij/(1-r)) a_ij do_i
    #   ds_ij  = a_ij * ((e_ij/(1-r)) dp_ij - delta_i),  delta = rowsum(dO*O)
    # (delta absorbs the dropout factor because it is rowsum against the
    # dropped-out output — the same identity as standard flash backward)
    if dropout_rate > 0.0:
        g_sz, c_sz, _ = s_t.shape
        keep_scale = _keep_scale(
            seed_ref, s_t.shape, pl.program_id(0) * g_sz, j * c_sz,
            dropout_rate, transposed=True,
        )
        p_drop_t = p_t * keep_scale
    else:
        keep_scale = None
        p_drop_t = p_t

    # dv_chunk = p̃^T @ do : (G, C, lq) x (G, lq, d) — canonical batched matmul
    dv_ref[...] = jax.lax.dot_general(
        p_drop_t.astype(do.dtype), do, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dp_T = v do^T : (G, C, lq); ds_T = p_T * (keep·dp_T - delta)
    dp_t = jax.lax.dot_general(v, do, _BATCH_DN(), preferred_element_type=jnp.float32)
    if keep_scale is not None:
        dp_t = dp_t * keep_scale
    ds_t = p_t * (dp_t - delta_row)                       # (G, C, lq) f32
    ds_cast = ds_t.astype(q.dtype)
    # dk_chunk = ds^T @ q : (G, C, lq) x (G, lq, d) — canonical
    dk_ref[...] = (
        jax.lax.dot_general(
            ds_cast, q, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk_ref.dtype)
    # dq += ds @ k = ds_T^T @ k : contract over C (dim 1 of both)
    dq_scr[...] = dq_scr[...] + jax.lax.dot_general(
        ds_cast, k, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(j == n_chunks - 1)
    def _():
        dq_ref[...] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_call(q, k, v, mask, do, lse, delta, seed, scale, kv_chunk, interpret, dropout_rate):
    bh, lq, d = q.shape
    _, lkv, _ = k.shape
    n_chunks = lkv // kv_chunk
    # bwd holds twice the chunk-sized buffers (k/v in, dk/dv out) — model that
    # by doubling the chunk in the working-set estimate
    n_tmp = 5 if dropout_rate > 0.0 else 3
    g = _pick_group(bh, lq, kv_chunk * 2, d, _BWD_BYTES_BUDGET, n_tmp=n_tmp)

    kernel = functools.partial(_bwd_kernel, scale=scale, dropout_rate=dropout_rate)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh // g, n_chunks),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[
            pl.BlockSpec((g, lq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kv_chunk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kv_chunk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, kv_chunk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lq, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lq, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, lq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kv_chunk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kv_chunk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lkv, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lkv, d), q.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((g, lq, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, mask, do, lse, delta, seed)
    return dq, dk, dv


# ------------------------------------------------------------------ public

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, mask, seed, scale, kv_chunk, bwd_kv_chunk, interpret, dropout_rate):
    out, _ = _fwd_call(q, k, v, mask, seed, scale, kv_chunk, interpret, dropout_rate)
    return out


def _flash_fwd(q, k, v, mask, seed, scale, kv_chunk, bwd_kv_chunk, interpret, dropout_rate):
    out, lse = _fwd_call(q, k, v, mask, seed, scale, kv_chunk, interpret, dropout_rate)
    return out, (q, k, v, mask, seed, out, lse)


def _flash_bwd(scale, kv_chunk, bwd_kv_chunk, interpret, dropout_rate, residuals, g):
    q, k, v, mask, seed, out, lse = residuals
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)
    dq, dk, dv = _bwd_call(
        q, k, v, mask, g, lse, delta, seed, scale, bwd_kv_chunk, interpret, dropout_rate
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    temperature: float = 0.5,
    kv_mask: Optional[jnp.ndarray] = None,
    kv_chunk: int = DEFAULT_KV_CHUNK,
    bwd_kv_chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused flash cross-attention.

    Args:
        q: (b, h, lq, d); k, v: (b, h, lkv, d); kv_mask: optional (b, lkv) bool.
        dropout_rate: drop probability on the normalised attention
            probabilities (reference `healnet.py:421`); requires
            ``dropout_rng`` (or an explicit ``dropout_seed``) when > 0.
        dropout_seed: optional (1, 1) int32 — the raw coordinate-hash seed
            (see :mod:`healnet_tpu.ops.hash_dropout`); parity tests use it to
            reproduce the exact mask realisation outside the kernel.

    Returns:
        (b, lq, h * d) — merged heads, matching
        :func:`healnet_tpu.ops.attention.multihead_attention`.
    """
    if interpret is None:
        interpret = not _on_tpu()
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0:
        if dropout_seed is None:
            if dropout_rng is None:
                raise ValueError("dropout_rate > 0 requires dropout_rng or dropout_seed")
            from healnet_tpu.ops.hash_dropout import seed_from_rng

            dropout_seed = seed_from_rng(dropout_rng)
        seed = jax.lax.bitcast_convert_type(
            jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1), jnp.uint32
        )
    else:
        seed = jnp.zeros((1, 1), jnp.uint32)
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    eff_scale = float(scale) / float(temperature)

    # Pad only the query rows (cheap: l_c is tiny) and the KV length to a
    # chunk multiple; the head dim stays unpadded (see module docstring).
    # Prefer a chunk that DIVIDES lkv: padding k/v to a chunk multiple costs
    # a full HBM copy of the context each call (and slice-copies of dk/dv in
    # the backward), which dominated profiles at WSI scale.
    lq_p = _round_up(max(lq, 16), 16)
    chunk = min(kv_chunk, _round_up(lkv, 128))
    for candidate in (kv_chunk, kv_chunk // 2, 1024, 512, 256, 128):
        if candidate and candidate <= kv_chunk and lkv % candidate == 0:
            chunk = candidate
            break
    lkv_p = _round_up(lkv, chunk)

    qf = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    kf = k if lkv_p == lkv else jnp.pad(k, ((0, 0), (0, 0), (0, lkv_p - lkv), (0, 0)))
    vf = v if lkv_p == lkv else jnp.pad(v, ((0, 0), (0, 0), (0, lkv_p - lkv), (0, 0)))
    qf = qf.reshape(b * h, lq_p, d)
    kf = kf.reshape(b * h, lkv_p, d)
    vf = vf.reshape(b * h, lkv_p, d)

    if kv_mask is None:
        mask = jnp.ones((b, lkv), jnp.float32)
    else:
        mask = kv_mask.astype(jnp.float32)
    mask = jnp.pad(mask, ((0, 0), (0, lkv_p - lkv)))
    mask = jnp.repeat(mask[:, None, None, :], h, axis=1).reshape(b * h, 1, lkv_p)

    if bwd_kv_chunk is None:
        bwd_kv_chunk = min(chunk, 1024)
    # the backward grid covers lkv_p in bwd_chunk steps: the chunk MUST divide
    # lkv_p or trailing dk/dv blocks would silently stay uninitialized
    bwd_chunk = chunk  # chunk always divides lkv_p
    for candidate in (bwd_kv_chunk, chunk // 2, 1024, 512, 256, 128):
        if candidate and candidate <= min(bwd_kv_chunk, chunk) and lkv_p % candidate == 0:
            bwd_chunk = candidate
            break

    out = _flash(qf, kf, vf, mask, seed, eff_scale, chunk, bwd_chunk, interpret, dropout_rate)
    out = out.reshape(b, h, lq_p, d)[:, :, :lq, :]
    return out.transpose(0, 2, 1, 3).reshape(b, lq, h * d)
