"""Fused merged-KV projection + LayerNorm statistics (TPU Pallas).

The HealNet forward projects every fusion layer's KV from the raw context in
ONE merged matmul with the per-layer context-LayerNorm affines folded into
the weights (`models/healnet.py` kv_cache; the algebra is

    x_hat @ W = (1/sigma) (ctx @ W_c + enc @ W_e - mu * colsum(W)) + beta @ W

so normalization applies on the tiny projection output, never on the
2k-channel context). At WSI scale the context (b x tokens x 2048, ~134 MB
bf16) dominates step HBM traffic, so whether the statistics reductions cost
a second full read of the context is the difference between ~1 and ~2
context-passes in the forward.

This kernel computes the row statistics AND the matmul from a single pass
over each context block held in VMEM, applies the folded normalization on
the (tokens x F) projection output in-register, and writes only the tiny KV
result — the context is read exactly once in the whole forward.

**Measured outcome (v5e, flagship shape, fair harness): graph-dependent.**
For the bare dot+stats subgraph XLA's fusion machinery already emits both at
one-context-read speed (0.193 ms vs a 0.178 ms bare read) and the kernel
loses (0.261 ms). But in the REAL graph — where the folded normalization
consumes the dot output and both reductions, and per-layer slices consume
the result — XLA falls back to a separate statistics pass and the kernel
wins 1.43x forward / 1.10x fwd+bwd (0.258 vs 0.368 ms fwd). ``auto``
therefore engages the kernel on TPU for HBM-bound contexts; its one-read
schedule is guaranteed by construction while XLA's depends on fusion
heuristics that break under composition. Beware harnesses that perturb the
context inside a timing loop: that elementwise pass fuses into XLA
consumers but cannot be absorbed by a pallas_call, biasing ~2 extra
context-passes against the kernel. Details: BENCH_NOTES.md "Fused KV
projection".

Backward needs no extra context state: parameter gradients are

    d_raw   = inv * g                      (g = d_kv)
    d_W_c   = ctx^T @ d_raw                (the one context read of the bwd)
    d_W_e   = enc^T @ sum_b d_raw
    d_colsum= -sum_{b,t} mu * inv * g      -> added to every row of d_W
    d_bias  = sum_{b,t} g

with (mu, inv) recovered from the saved per-row sums — so the residuals are
two (b, tokens) f32 vectors instead of a (b, tokens, F) raw tensor. Input
cotangents (d_ctx / d_enc, which need the pre-normalization projection P)
are expressed as standalone expressions so XLA dead-code-eliminates their
extra context read in parameter-only training.

Numerics match the XLA path: the dot accumulates f32 on the MXU and is
rounded to the context dtype before the enc addition (exactly what
``ctx @ w.astype(bf16) + enc @ w_e.astype(bf16)`` produces), and the
statistics are f32 sums of the low-precision context values.

**Quantized contexts** (`ops/quantize.py`): the context may arrive as
per-token int8 values + f32 scales. Both the statistics and the projection
commute with the per-token rescale (``rowsum(s*q) = s*rowsum(q)``,
``(s*q) @ W = s*(q @ W)``), so the kernel streams HALF the context bytes and
applies the scale on the tiny (tile, F) accumulator. The backward dW reads
the int8 values directly (the scale folds into d_raw, which is
weight-sized per token). Rounding contract, identical in both impls:
``round_to_cdtype(acc_f32) -> f32 -> * scale -> round_to_cdtype -> + enc``.

Falls back to interpret mode off-TPU so CPU tests exercise identical code.

Reference behaviour being accelerated: the per-layer
``PreNorm(ctx) -> to_kv`` chain of `/root/reference/healnet/models/
healnet.py:306-321,378-379`, restructured as one fused pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEF_TILE = 512

# auto engages the kernel only for contexts big enough to be HBM-bound
# (b * tokens * channels elements); the omic modality (1 token) never
# qualifies, WSI bags always do.
_MIN_ELEMENTS = 1 << 22

# Backward-pass implementation switch (trace-time): True = the pallas
# backward kernel (one HBM read of the cotangent), False = the XLA-ops
# formulation. Module-level so benchmarks can A/B both paths in ONE session
# (the axon relay drifts ~50% across sessions, swamping cross-run timing).
# MEASURED (scripts/probe_bwd_ab.py, v5e, interleaved A/B within one
# process): the kernel LOSES on the kirp depth-5 step, ~1.65 ms vs ~1.38 ms
# for the XLA formulation, consistent across rounds — the kernel's pad /
# slice / launch overhead exceeds the single-read saving, and XLA already
# fuses the f32 convert into its reduction consumers. Default False; kept
# for same-session A/B and as documentation of the falsified hypothesis.
_BWD_KERNEL = False


from healnet_tpu.ops.pallas_utils import on_tpu as _on_tpu
from healnet_tpu.ops.pallas_utils import round_up as _round_up


# ---------------------------------------------------------------------------
# XLA reference implementation (the exact pre-existing model path)
# ---------------------------------------------------------------------------


def _xla_project(
    dat: jnp.ndarray,
    enc: Optional[jnp.ndarray],
    w_all: jnp.ndarray,
    b_all: jnp.ndarray,
    eps: float,
    scale: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Two-pass XLA path: fused stats read + matmul read.

    ``scale`` given => ``dat`` is per-token int8 (``ops/quantize.py``) and the
    logical context is ``dat * scale[..., None]``.
    """
    cdt = jnp.dtype(out_dtype) if out_dtype is not None else dat.dtype
    c_dim = dat.shape[-1]
    w_c, w_e = w_all[:c_dim], w_all[c_dim:]
    colsum = jnp.sum(w_all, axis=0)
    d_total = w_all.shape[0]

    xf = dat.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-1)
    s2 = jnp.sum(jnp.square(xf), axis=-1)
    if scale is not None:
        s1 = scale * s1
        s2 = jnp.square(scale) * s2
    if enc is not None:
        ef = enc.astype(jnp.float32)
        s1 = s1 + jnp.sum(ef, axis=-1)
        s2 = s2 + jnp.sum(jnp.square(ef), axis=-1)
    mu = s1 / d_total
    var = s2 / d_total - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)

    raw = dat.astype(cdt) @ w_c.astype(cdt)
    if scale is not None:
        # rounding contract shared with the kernel: round the accumulator to
        # the compute dtype, rescale in f32, round again, then the enc add
        raw = (raw.astype(jnp.float32) * scale[..., None]).astype(cdt)
    if enc is not None:
        raw = raw + enc.astype(cdt) @ w_e.astype(cdt)
    return (
        inv[..., None] * (raw.astype(jnp.float32) - mu[..., None] * colsum) + b_all
    ).astype(cdt)


# ---------------------------------------------------------------------------
# Pallas kernel: one context read for matmul + statistics + normalization
# ---------------------------------------------------------------------------


def _kernel(d_total, eps, quantized, *refs):
    """One (1, tile, C) context block -> (1, tile, F_pad) normalized KV.

    aux_ref rows: 0 = colsum(W), 1 = folded bias.
    encs_ref rows: 0 = enc row-sums, 1 = enc row-sum-squares (zeros if the
    modality has no positional encoding).
    quantized: the context block is int8 with a (1, tile) f32 per-token
    scale block appended to the inputs.
    """
    if quantized:
        (dat_ref, w_ref, encp_ref, encs_ref, aux_ref, scl_ref,
         kv_ref, s1_ref, s2_ref) = refs
    else:
        (dat_ref, w_ref, encp_ref, encs_ref, aux_ref,
         kv_ref, s1_ref, s2_ref) = refs
    cdt = kv_ref.dtype
    x = dat_ref[0]                                    # (tile, C)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)                          # (tile,)
    s2 = jnp.sum(xf * xf, axis=1)
    if quantized:
        s = scl_ref[0, :, 0]                          # (tile,) f32
        s1 = s * s1
        s2 = s * s * s2
    s1 = s1 + encs_ref[0]
    s2 = s2 + encs_ref[1]

    acc = jnp.dot(x.astype(cdt), w_ref[:], preferred_element_type=jnp.float32)
    # replicate the XLA path's rounding: compute-dtype matmul output (+
    # f32 rescale for quantized contexts) + compute-dtype enc add
    if quantized:
        low = (acc.astype(cdt).astype(jnp.float32) * s[:, None]).astype(cdt)
        low = low + encp_ref[:]
    else:
        low = acc.astype(cdt) + encp_ref[:]
    raw = low.astype(jnp.float32)                     # (tile, F_pad)

    mu = s1 / d_total
    var = s2 / d_total - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    kv = inv[:, None] * (raw - mu[:, None] * aux_ref[0]) + aux_ref[1]

    kv_ref[0] = kv.astype(kv_ref.dtype)
    # stats outputs are (b, t, 1): a trailing singleton lane keeps the block
    # shape (1, tile, 1) legal on TPU (tile in the sublane dim)
    s1_ref[0, :, 0] = s1
    s2_ref[0, :, 0] = s2


def _pallas_call(dat, w_pad, enc_proj, enc_stats, aux, scale, d_total, eps,
                 tile, interpret):
    b, t, c = dat.shape
    cdt = w_pad.dtype
    f_pad = w_pad.shape[1]
    tiles = pl.cdiv(t, tile)
    quantized = scale is not None
    kernel = functools.partial(_kernel, float(d_total), eps, quantized)
    in_specs = [
        pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, f_pad), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, f_pad), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, tile), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, f_pad), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [dat, w_pad, enc_proj, enc_stats, aux]
    if quantized:
        # scales ride as (b, t, 1): a (1, tile) block over (b, t) violates
        # Mosaic's (8, 128) trailing-dims rule, while (tile, 1) trailing
        # dims are legal (same layout as the s1/s2 outputs)
        in_specs.append(
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(scale[..., None])
    return pl.pallas_call(
        kernel,
        grid=(b, tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile, f_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, f_pad), cdt),
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * c * f_pad,
            bytes_accessed=dat.size * dat.dtype.itemsize
            + b * t * f_pad * jnp.dtype(cdt).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _bwd_kernel(d_total, eps, quantized, with_bsum, *refs):
    """One (1, tile, F_pad) cotangent block -> d_raw + running reductions.

    Replaces the XLA backward's full-width float32 materialisation of the
    cotangent (``gf = g.astype(f32)`` feeding d_bias / d_colsum / d_raw as
    a multi-consumer buffer): the cotangent is read from HBM exactly once,
    in its storage dtype, and every reduction accumulates across the grid.

    Outputs: d_raw (for the dW matmul, rounding contract identical to the
    XLA path), dsum2 rows [sum(g); sum((inv*mu)*g)] = [d_bias; -d_colsum],
    and (quantized+enc only) the batch-sum of inv*g for the encoding-weight
    gradient.
    """
    if quantized:
        (g_ref, s1_ref, s2_ref, scl_ref, *outs) = refs
    else:
        (g_ref, s1_ref, s2_ref, *outs) = refs
    if with_bsum:
        d_raw_ref, dsum2_ref, bsum_ref = outs
    else:
        d_raw_ref, dsum2_ref = outs

    j = pl.program_id(0)   # token tile (outer)
    i = pl.program_id(1)   # batch (inner)

    g = g_ref[0].astype(jnp.float32)                   # (tile, F_pad)
    s1 = s1_ref[0, :, 0]
    s2 = s2_ref[0, :, 0]
    mu = s1 / d_total
    var = s2 / d_total - mu * mu
    inv = jax.lax.rsqrt(var + eps)

    cdt = d_raw_ref.dtype
    if quantized:
        # match the XLA path's association: (scale*inv) first, then * g
        factor = scl_ref[0, :, 0] * inv
        d_raw_ref[0] = (factor[:, None] * g).astype(cdt)
    else:
        d_raw_ref[0] = (inv[:, None] * g).astype(cdt)

    part = jnp.stack([jnp.sum(g, axis=0), jnp.sum((inv * mu)[:, None] * g, axis=0)])

    @pl.when((i == 0) & (j == 0))
    def _init():
        dsum2_ref[...] = jnp.zeros_like(dsum2_ref)

    dsum2_ref[...] += part

    if with_bsum:
        plain = inv[:, None] * g                       # f32, pre-scale

        @pl.when(i == 0)
        def _init_bsum():
            bsum_ref[...] = jnp.zeros_like(bsum_ref)

        bsum_ref[...] += plain


def _pallas_bwd_call(g_pad, s1, s2, scale, d_total, eps, tile, interpret,
                     with_bsum, cdt):
    b, t, f_pad = g_pad.shape
    tiles = pl.cdiv(t, tile)
    quantized = scale is not None
    kernel = functools.partial(
        _bwd_kernel, float(d_total), eps, quantized, with_bsum
    )
    # grid (tiles, batch): batch innermost, so the dsum2 block (revisited
    # every iteration) and the per-tile bsum block (revisited across the
    # batch sweep) are both revisited CONSECUTIVELY — the TPU-pallas
    # accumulation requirement
    in_specs = [
        pl.BlockSpec((1, tile, f_pad), lambda j, i: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 1), lambda j, i: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 1), lambda j, i: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [g_pad, s1[..., None], s2[..., None]]
    if quantized:
        in_specs.append(
            pl.BlockSpec((1, tile, 1), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(scale[..., None])
    out_specs = [
        pl.BlockSpec((1, tile, f_pad), lambda j, i: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, f_pad), lambda j, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, t, f_pad), cdt),
        jax.ShapeDtypeStruct((2, f_pad), jnp.float32),
    ]
    if with_bsum:
        out_specs.append(
            pl.BlockSpec((tile, f_pad), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((t, f_pad), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(tiles, b),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * g_pad.size,
            bytes_accessed=2 * g_pad.size * g_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _prep(dat, enc, w_all, b_all, cdt):
    """Host-side (traced) prep: pad F, precompute tiny enc projection/stats."""
    b, t, c = dat.shape
    f = w_all.shape[1]
    f_pad = _round_up(f, 128)
    w_c = w_all[:c]
    w_pad = jnp.zeros((c, f_pad), cdt).at[:, :f].set(w_c.astype(cdt))
    colsum = jnp.sum(w_all, axis=0)
    aux = jnp.zeros((2, f_pad), jnp.float32)
    aux = aux.at[0, :f].set(colsum).at[1, :f].set(b_all)

    if enc is not None:
        w_e = w_all[c:]
        ep = enc.astype(cdt) @ w_e.astype(cdt)                 # (t, F)
        enc_proj = jnp.zeros((t, f_pad), cdt).at[:, :f].set(ep)
        ef = enc.astype(jnp.float32)
        enc_stats = jnp.stack(
            [jnp.sum(ef, axis=-1), jnp.sum(jnp.square(ef), axis=-1)]
        )                                                      # (2, t)
    else:
        enc_proj = jnp.zeros((t, f_pad), cdt)
        enc_stats = jnp.zeros((2, t), jnp.float32)
    return w_pad, enc_proj, enc_stats, aux, f, f_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_project(cfg, dat, enc, w_all, b_all, scale=None):
    kv, _, _ = _pallas_forward(cfg, dat, enc, w_all, b_all, scale)
    return kv


def _pallas_forward(cfg, dat, enc, w_all, b_all, scale):
    eps, tile, interpret, cdt_name, keep_pad = cfg
    cdt = jnp.dtype(cdt_name) if cdt_name is not None else dat.dtype
    w_pad, enc_proj, enc_stats, aux, f, _ = _prep(dat, enc, w_all, b_all, cdt)
    d_total = w_all.shape[0]
    kv_pad, s1, s2 = _pallas_call(
        dat, w_pad, enc_proj, enc_stats, aux, scale, d_total, eps, tile, interpret
    )
    # keep_pad: hand the padded buffer to the caller (which slices layer
    # groups out of it directly) instead of materialising a full-width
    # unpadded copy — one (b, tokens, F_pad) write + (b, tokens, F) copy
    # saved per step
    kv = kv_pad if keep_pad else kv_pad[..., :f]
    return kv, s1[..., 0], s2[..., 0]


def _pallas_fwd(cfg, dat, enc, w_all, b_all, scale=None):
    kv, s1, s2 = _pallas_forward(cfg, dat, enc, w_all, b_all, scale)
    return kv, (dat, enc, w_all, b_all, scale, s1, s2)


def _pallas_bwd(cfg, res, g):
    eps, tile, interpret, _, keep_pad = cfg
    dat, enc, w_all, b_all, scale, s1, s2 = res
    quantized = scale is not None
    cdt = g.dtype
    c = dat.shape[-1]
    d_total = w_all.shape[0]
    f = w_all.shape[1]
    f_pad = _round_up(f, 128)
    colsum = jnp.sum(w_all, axis=0)

    mu = s1 / d_total                                          # (b, t)
    var = s2 / d_total - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)

    if _BWD_KERNEL:
        # ---- weight cotangents via the backward kernel: the cotangent is
        # read from HBM exactly once (in its storage dtype); d_raw, d_bias
        # and d_colsum come out of that single pass. The XLA formulation
        # makes g.astype(f32) a multi-consumer buffer.
        g_pad = g if g.shape[-1] == f_pad else jnp.pad(
            g, ((0, 0), (0, 0), (0, f_pad - g.shape[-1]))
        )
        with_bsum = quantized and enc is not None
        outs = _pallas_bwd_call(
            g_pad, s1, s2, scale, d_total, eps, tile, interpret, with_bsum, cdt
        )
        d_raw_pad, dsum2 = outs[0], outs[1]
        d_bias = dsum2[0, :f]
        d_colsum = -dsum2[1, :f]
        d_raw = jax.lax.slice_in_dim(d_raw_pad, 0, f, axis=-1)
        d_wc = jnp.einsum(
            "btc,btf->cf", dat.astype(cdt), d_raw,
            preferred_element_type=jnp.float32,
        )
        d_w = jnp.zeros_like(w_all).at[:c].set(d_wc) + d_colsum[None, :]
        if enc is not None:
            if with_bsum:
                d_raw_t = outs[2][:, :f]                       # (t, F) f32
            else:
                # dtype= fuses the f32 convert into the reduction (an
                # .astype first materialises a full-width f32 copy)
                d_raw_t = jnp.sum(d_raw, axis=0, dtype=jnp.float32)
            d_we = jnp.einsum(
                "te,tf->ef", enc.astype(jnp.float32), d_raw_t,
                preferred_element_type=jnp.float32,
            )
            d_w = d_w.at[c:].add(d_we)
        gf = jax.lax.slice_in_dim(g, 0, f, axis=-1).astype(jnp.float32)
    else:
        # XLA-ops backward (pre-kernel reference; kept A/B-able via
        # _BWD_KERNEL for same-session benchmarking and as a fallback)
        g = jax.lax.slice_in_dim(g, 0, f, axis=-1) if g.shape[-1] != f else g
        gf = g.astype(jnp.float32)
        d_bias = jnp.sum(gf, axis=(0, 1))
        if quantized:
            # dW_c = (scale*q)^T d_raw = q^T (scale*d_raw): fold the
            # per-token scale into the tiny d_raw so the context read
            # stays int8
            d_raw = ((scale * inv)[..., None] * gf).astype(cdt)   # (b, t, F)
            d_raw_plain = (inv[..., None] * gf).astype(cdt)       # for d_we
        else:
            d_raw = (inv[..., None] * gf).astype(cdt)
            d_raw_plain = d_raw
        d_wc = jnp.einsum(
            "btc,btf->cf", dat.astype(cdt), d_raw,
            preferred_element_type=jnp.float32,
        )
        d_colsum = -jnp.sum((inv * mu)[..., None] * gf, axis=(0, 1))
        d_w = jnp.zeros_like(w_all).at[:c].set(d_wc) + d_colsum[None, :]
        if enc is not None:
            d_raw_t = jnp.sum(d_raw_plain.astype(jnp.float32), axis=0)
            d_we = jnp.einsum(
                "te,tf->ef", enc.astype(jnp.float32), d_raw_t,
                preferred_element_type=jnp.float32,
            )
            d_w = d_w.at[c:].add(d_we)

    # ---- input cotangents: standalone so XLA DCEs the extra context read
    # whenever the context does not require gradients (the training case).
    w_c = w_all[:c]
    raw = (dat.astype(cdt) @ w_c.astype(cdt)).astype(jnp.float32)
    if quantized:
        raw = raw * scale[..., None]
    if enc is not None:
        raw = raw + (enc.astype(cdt) @ w_all[c:].astype(cdt)).astype(
            jnp.float32
        )
    p_term = raw - mu[..., None] * colsum                      # P
    d_inv = jnp.sum(gf * p_term, axis=-1)                      # (b, t)
    d_p = inv[..., None] * gf
    d_mu = -jnp.sum(d_p * colsum, axis=-1)
    d_var = d_inv * (-0.5) * inv * inv * inv
    d_s2 = d_var / d_total
    d_mu = d_mu - 2.0 * mu * d_var
    d_s1 = d_mu / d_total
    # d/d(effective context x = dat or scale*dat); all three terms standalone
    x_eff_f32 = dat.astype(jnp.float32)
    if quantized:
        x_eff_f32 = x_eff_f32 * scale[..., None]
    d_x = (
        (d_p @ w_c.T.astype(jnp.float32))
        + d_s1[..., None]
        + 2.0 * x_eff_f32 * d_s2[..., None]
    )
    if quantized:
        # int8 values carry no tangent; the scale's cotangent is the row
        # contraction of d_x with the integer values
        d_dat = np.zeros(dat.shape, dtype=jax.dtypes.float0)
        d_scale = jnp.sum(d_x * dat.astype(jnp.float32), axis=-1).astype(
            scale.dtype
        )
    else:
        d_dat = d_x.astype(dat.dtype)
        d_scale = None
    if enc is not None:
        d_enc = (
            jnp.sum(d_p, axis=0) @ w_all[c:].T.astype(jnp.float32)
            + jnp.sum(d_s1, axis=0)[..., None]
            + 2.0 * enc.astype(jnp.float32) * jnp.sum(d_s2, axis=0)[..., None]
        ).astype(enc.dtype)
    else:
        d_enc = None
    return d_dat, d_enc, d_w.astype(w_all.dtype), d_bias.astype(b_all.dtype), d_scale


_pallas_project.defvjp(_pallas_fwd, _pallas_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def fused_kv_project(
    dat,
    enc: Optional[jnp.ndarray],
    w_all: jnp.ndarray,
    b_all: jnp.ndarray,
    *,
    eps: float = 1e-5,
    impl: str = "auto",
    tile: int = _DEF_TILE,
    interpret: Optional[bool] = None,
    out_dtype=None,
    keep_pad: bool = False,
) -> jnp.ndarray:
    """Merged folded-KV projection of a raw context.

    dat: (b, tokens, C) raw context — either an array or a
    :class:`healnet_tpu.ops.quantize.QuantizedContext` (per-token int8 values
    + f32 scales: half the HBM bytes, scale applied on the accumulator);
    enc: optional (tokens, E) positional encoding shared across the batch;
    w_all: (C+E, F) f32 folded projection weights (all layer groups
    concatenated); b_all: (F,) folded biases. Returns (b, tokens, F) in
    ``out_dtype`` (default: the context dtype; quantized contexts must pass
    ``out_dtype`` explicitly or default to float32).

    impl: 'xla', 'pallas', or 'auto' (pallas on TPU for HBM-bound contexts,
    xla otherwise — and always under a mesh, where pallas_call cannot be
    GSPMD-partitioned; the model handles that fallback).

    keep_pad: return the kernel's lane-padded buffer as-is — last dim
    ``round_up(F, 128)`` with zero columns beyond F — so the caller can
    slice layer groups straight out of it (no full-width unpadded copy).
    The XLA impl ignores it (its output is never padded).

    Measured on v5e at the flagship shape (8 x 4096 x 2048 bf16,
    scripts/bench_fused_project.py): for the FULL op — projection + folded
    normalization + per-layer slicing — the kernel wins 1.43x forward
    (0.258 vs 0.368 ms) and 1.10x fwd+bwd, because XLA schedules a separate
    statistics pass once the normalization consumes both the dot output and
    the reductions. For the bare dot+stats subgraph XLA's own fusion already
    runs at one-read speed (0.193 ms) and the kernel loses — the win exists
    only in the real model graph. Details: BENCH_NOTES.md "Fused KV
    projection".
    """
    from healnet_tpu.ops.quantize import QuantizedContext

    scale = None
    if isinstance(dat, QuantizedContext):
        scale = dat.scale
        dat = dat.data
        if out_dtype is None:
            out_dtype = jnp.float32
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown fused projection impl: {impl!r}")
    if impl == "auto":
        impl = "pallas" if (_on_tpu() and dat.size >= _MIN_ELEMENTS) else "xla"
    if impl != "pallas":
        return _xla_project(dat, enc, w_all, b_all, eps, scale=scale,
                            out_dtype=out_dtype)
    if interpret is None:
        interpret = not _on_tpu()
    t = dat.shape[1]
    # TPU block rules: the token tile is the sublane dim of the context block
    # and the lane dim of the enc-stats block — either a multiple of 128 or
    # the full token count.
    tile = t if t <= 128 else min(tile, (t // 128) * 128)
    cdt_name = jnp.dtype(out_dtype).name if out_dtype is not None else None
    cfg = (eps, tile, bool(interpret), cdt_name, bool(keep_pad))
    return _pallas_project(cfg, dat, enc, w_all, b_all, scale)


def split_columns(x: jnp.ndarray, widths) -> Tuple[jnp.ndarray, ...]:
    """Split ``x`` along the last axis into contiguous column blocks, with a
    VJP that CONCATENATES the cotangents.

    XLA's default backward for a column slice is pad-to-full-width, and the
    per-layer slices of the merged KV buffer then accumulate as a chain of
    (iota, compare, select, pad, add) ops each touching the FULL
    (tokens, sum(widths)) buffer — measured at ~120 MB of HBM traffic per
    fusion layer on the kirp depth-5 step (scripts/probe_kirp_hlo.py), the
    entire gap between that row and the HBM roofline. The slices are
    disjoint and jointly exhaustive, so the gradient is exactly one concat:
    each column is written once, no padding, no accumulation.
    """
    widths = tuple(int(w) for w in widths)
    assert sum(widths) == x.shape[-1], (widths, x.shape)
    dtype = x.dtype  # static per call site; closure, not a residual

    def _slices(x):
        out, off = [], 0
        for w in widths:
            out.append(jax.lax.slice_in_dim(x, off, off + w, axis=-1))
            off += w
        return tuple(out)

    @jax.custom_vjp
    def _split(x):
        return _slices(x)

    def _fwd(x):
        return _slices(x), None

    def _bwd(_, g):
        # cotangents arrive materialised (instantiate_zeros) in the primal
        # slice dtype; columns are disjoint so concat is the exact gradient
        return (jnp.concatenate([gi.astype(dtype) for gi in g], axis=-1),)

    _split.defvjp(_fwd, _bwd)
    return _split(x)
