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
Dropout on attention probabilities and weight-inspection are handled by the
XLA path (`healnet_tpu.ops.attention`) — the module layer routes there when
either is requested.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_KV_CHUNK = 2048
_NEG_BIG = -1e30
# VMEM working-set budgets used to pick the batch-group size G
_FWD_BYTES_BUDGET = 11 * 1024 * 1024
_BWD_BYTES_BUDGET = 10 * 1024 * 1024

_BATCH_DN = lambda: (((2,), (2,)), ((0,), (0,)))  # contract d, batch G


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_group(bh: int, lq: int, chunk: int, d: int, budget: int) -> int:
    """Largest divisor of bh whose per-step buffers fit the VMEM budget.

    Accounts for double-buffered k/v input blocks plus the (lq x chunk)
    score/prob temporaries the kernel materialises in registers/stack.
    """
    per_g = 2 * (2 * chunk * d * 4) + 3 * lq * chunk * 4 + lq * (3 * d + 512) * 4
    g = max(1, budget // max(per_g, 1))
    while g > 1 and bh % g != 0:
        g -= 1
    return max(1, min(g, bh))


# --------------------------------------------------------------------- fwd

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale):
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
    l_new = l_prev * correction + jnp.sum(p, axis=2, keepdims=True)
    # probabilities cast to the value dtype for the second matmul (standard
    # flash practice; exact for f32 inputs, bf16-rounded otherwise)
    acc_scr[...] = acc_scr[...] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_chunks - 1)
    def _():
        l_final = l_scr[..., 0:1]
        o_ref[...] = (acc_scr[...] / jnp.maximum(l_final, 1e-30)).astype(o_ref.dtype)
        lse_ref[...] = (m_scr[...] + jnp.log(jnp.maximum(l_scr[...], 1e-30))).astype(
            lse_ref.dtype
        )


def _fwd_call(q, k, v, mask, scale, kv_chunk, interpret):
    bh, lq, d = q.shape
    _, lkv, _ = k.shape
    n_chunks = lkv // kv_chunk
    g = _pick_group(bh, lq, kv_chunk, d, _FWD_BYTES_BUDGET)

    kernel = functools.partial(_fwd_kernel, scale=scale)
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
        ],
        out_specs=[
            pl.BlockSpec((g, lq, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lq, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lq, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, lq, 128), jnp.float32),
            pltpu.VMEM((g, lq, 128), jnp.float32),
            pltpu.VMEM((g, lq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, mask)
    return out, lse[:, :, 0:1]


# --------------------------------------------------------------------- bwd

def _bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, dq_scr, *, scale
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
    # keep everything slice/transpose-based: integer indexing lowers to
    # gathers Mosaic does not support beyond 2D
    lse_row = jnp.swapaxes(lse_ref[...][:, :, 0:1], 1, 2)      # (G, 1, lq)
    delta_row = jnp.swapaxes(delta_ref[...][:, :, 0:1], 1, 2)  # (G, 1, lq)
    mask_col = jnp.swapaxes(mask_ref[...], 1, 2)               # (G, C, 1)

    # s_T = (k q^T) : (G, C, lq) — contraction over d on the last dims
    s_t = jax.lax.dot_general(k, q, _BATCH_DN(), preferred_element_type=jnp.float32)
    s_t = s_t * scale + (mask_col - 1.0) * (-_NEG_BIG)
    p_t = jnp.exp(s_t - lse_row) * mask_col                    # (G, C, lq)

    # dv_chunk = p^T @ do : (G, C, lq) x (G, lq, d) — canonical batched matmul
    dv_ref[...] = jax.lax.dot_general(
        p_t.astype(do.dtype), do, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dp_T = v do^T : (G, C, lq); ds_T = p_T * (dp_T - delta)
    dp_t = jax.lax.dot_general(v, do, _BATCH_DN(), preferred_element_type=jnp.float32)
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


def _bwd_call(q, k, v, mask, do, lse, delta, scale, kv_chunk, interpret):
    bh, lq, d = q.shape
    _, lkv, _ = k.shape
    n_chunks = lkv // kv_chunk
    # bwd holds twice the chunk-sized buffers (k/v in, dk/dv out) — model that
    # by doubling the chunk in the working-set estimate
    g = _pick_group(bh, lq, kv_chunk * 2, d, _BWD_BYTES_BUDGET)

    kernel = functools.partial(_bwd_kernel, scale=scale)
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
            pl.BlockSpec((g, lq, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, lq, 128), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
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
    )(q, k, v, mask, do, jnp.broadcast_to(lse, (bh, lq, 128)),
      jnp.broadcast_to(delta, (bh, lq, 128)))
    return dq, dk, dv


# ------------------------------------------------------------------ public

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, mask, scale, kv_chunk, bwd_kv_chunk, interpret):
    out, _ = _fwd_call(q, k, v, mask, scale, kv_chunk, interpret)
    return out


def _flash_fwd(q, k, v, mask, scale, kv_chunk, bwd_kv_chunk, interpret):
    out, lse = _fwd_call(q, k, v, mask, scale, kv_chunk, interpret)
    return out, (q, k, v, mask, out, lse)


def _flash_bwd(scale, kv_chunk, bwd_kv_chunk, interpret, residuals, g):
    q, k, v, mask, out, lse = residuals
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)
    dq, dk, dv = _bwd_call(q, k, v, mask, g, lse, delta, scale, bwd_kv_chunk, interpret)
    return dq, dk, dv, None


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
) -> jnp.ndarray:
    """Fused flash cross-attention.

    Args:
        q: (b, h, lq, d); k, v: (b, h, lkv, d); kv_mask: optional (b, lkv) bool.

    Returns:
        (b, lq, h * d) — merged heads, matching
        :func:`healnet_tpu.ops.attention.multihead_attention`.
    """
    if interpret is None:
        interpret = not _on_tpu()
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

    out = _flash(qf, kf, vf, mask, eff_scale, chunk, bwd_chunk, interpret)
    out = out.reshape(b, h, lq_p, d)[:, :, :lq, :]
    return out.transpose(0, 2, 1, 3).reshape(b, lq, h * d)
