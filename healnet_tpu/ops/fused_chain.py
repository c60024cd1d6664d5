"""Fused latent-chain Pallas kernel: the whole fusion stack in two launches.

Why this exists: the HealNet fusion loop
(`/root/reference/healnet/models/healnet.py:227-245`) runs, per layer and
per modality, a cross-attention + feed-forward block over a tiny latent
array (l_c x l_d, e.g. 17 x 62). On TPU the latent-side tensors are so small
that every XLA kernel in that chain is launch-bound, not compute- or
bandwidth-bound: the kirp-5 trace (BENCH_NOTES.md round-5 trace accounting)
shows ~1,140 kernels per train step averaging ~0.3 us each — ~27% of the
step — plus a 57 us dKV concatenate re-assembling the merged-projection
cotangent. No amount of XLA-level fusion collapses a *sequential* chain of
tiny dependent matmuls into one kernel.

This module does it manually:

- :func:`fused_latent_chain` runs the ENTIRE latent chain — every layer's
  PreNorm -> Q proj -> scores -> T-softmax -> hash dropout -> @V -> out proj
  -> LeakyReLU -> presence residual -> PreNorm -> gated FF -> dropout ->
  residual, for every modality — in ONE Pallas kernel (grid over the batch,
  everything VMEM-resident), with a custom VJP whose backward is ONE more
  kernel (forward recompute in VMEM + reverse sweep).
- The backward writes the merged-KV cotangent **full-width** directly
  (each layer's dK/dV lands at its column offset of the merged buffer), so
  the `split_columns` concat disappears from the step entirely.
- Attention dropout reuses the coordinate-hash family
  (:mod:`healnet_tpu.ops.hash_dropout`) with the SAME per-site seeds the XLA
  path derives, so realised masks are bit-identical across impls. FF dropout
  masks are generated outside (same `make_rng` stream as the XLA path) and
  passed in as pre-scaled keep multipliers.

Numerics: latent-side math (LayerNorm, projections, FF, softmax) runs in
f32 inside the kernel; context-facing dots (scores, @V) take the KV buffer
in its storage dtype with f32 accumulation (same contract as the flash
kernel). This is slightly *more* precise than the bf16 XLA module path;
parity tests compare at f32 exactly and at bf16 within rounding tolerance.

:func:`chain_reference` is the pure-JAX mirror of the kernel math — the
test oracle for both values and gradients, and the CPU fallback semantics.

Scope (falls back to the XLA module path otherwise): cross-heads == 1 and
self_per_cross_attn == 0 — which covers every tuned reference config
(`/root/reference/config/best_hyperparams.yml`: all datasets use 1 cross
head and no latent self-attention) — plus a VMEM working-set budget.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from healnet_tpu.ops.hash_dropout import hash_keep
from healnet_tpu.ops.pallas_utils import on_tpu as _on_tpu

_NEG_BIG = 1e30
# selu constants (jax.nn.selu)
_SELU_ALPHA = 1.6732632423543772
_SELU_SCALE = 1.0507009873554805
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327

# VMEM working-set ceiling for auto-engagement (bytes). The backward holds
# kv + dkv + weight-grad accumulators + (l_c x t) f32 temporaries.
VMEM_BUDGET = 12 * 1024 * 1024

# weight bundle order (all stacked over (layers, modalities) on axes 0, 1)
WEIGHT_FIELDS = (
    "ln1_s", "ln1_b",        # (L, M, 1, l_d) f32 — attention PreNorm affine
    "wq",                    # (L, M, l_d, inner) f32
    "wout", "bout",          # (L, M, inner, l_d), (L, M, 1, l_d) f32
    "ln2_s", "ln2_b",        # (L, M, 1, l_d) f32 — FF PreNorm affine
    "w0", "b0",              # (L, M, l_d, 2*mult*l_d), (L, M, 1, 2*mult*l_d)
    "w2", "b2",              # (L, M, mult*l_d, l_d), (L, M, 1, l_d)
)


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """Static configuration of one fused chain call (hashable: custom_vjp
    nondiff arg and pallas closure)."""

    depth: int
    n_modalities: int
    l_c: int
    l_d: int
    inner: int               # cross_dim_head * x_heads (x_heads == 1)
    mult: int                # FF expansion (reference: 4)
    act: str                 # "selu" | "gelu"
    scale: float             # inner ** -0.5 folded with 1/temperature outside
    attn_dropout: float
    ff_dropout: float
    tokens: Tuple[int, ...]      # per-modality context length
    offsets: Tuple[int, ...]     # per-LAYER column offset into kv_all
    has_mask: Tuple[bool, ...]   # per-modality kv_mask present
    out_dtype: str               # latent/compute storage dtype name

    @property
    def sites(self) -> int:
        return self.depth * self.n_modalities


# --------------------------------------------------------------- reference

def _act(g: jnp.ndarray, act: str) -> jnp.ndarray:
    if act == "selu":
        return _SELU_SCALE * jnp.where(g > 0, g, _SELU_ALPHA * jnp.expm1(g))
    return 0.5 * g * (1.0 + jax.lax.erf(g * _INV_SQRT2))


def _act_grad(g: jnp.ndarray, act: str) -> jnp.ndarray:
    if act == "selu":
        return _SELU_SCALE * jnp.where(g > 0, 1.0, _SELU_ALPHA * jnp.exp(g))
    phi = jnp.exp(-0.5 * g * g) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + jax.lax.erf(g * _INV_SQRT2))
    return cdf + g * phi


def _ln(x: jnp.ndarray, s: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5):
    """f32 LayerNorm over the last axis; returns (y, x_hat, inv_sigma)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    xn = (x - mu) * inv
    return xn * s + b, xn, inv


def chain_reference(
    x0: jnp.ndarray,
    kvs: Sequence[jnp.ndarray],
    masks: Sequence[Optional[jnp.ndarray]],
    ff_keep: Optional[jnp.ndarray],
    presence: jnp.ndarray,
    seeds: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    spec: ChainSpec,
) -> jnp.ndarray:
    """Pure-JAX mirror of the fused kernel (batched over b).

    Args:
        x0: (b, l_c, l_d) latent in compute dtype.
        kvs: per modality, (b, t_m, F) merged-KV buffer (all layer groups'
            K|V columns side by side; possibly lane-padded).
        masks: per modality, optional (b, t_m) f32 (1 = attend).
        ff_keep: (b, L*M, l_c, l_d) pre-scaled FF keep multipliers, or None.
        presence: (b, M) f32.
        seeds: (L, M) uint32 attention-dropout hash seeds.
        weights: the 11 stacked arrays of WEIGHT_FIELDS (f32).
        spec: static config.

    Returns:
        (b, l_c, l_d) final latent in compute dtype.
    """
    w = dict(zip(WEIGHT_FIELDS, weights))
    b = x0.shape[0]
    cdt = x0.dtype
    x = x0.astype(jnp.float32)
    dn_ctx = (((2,), (2,)), ((0,), (0,)))   # (b,lc,i)x(b,t,i) -> (b,lc,t)
    dn_av = (((2,), (1,)), ((0,), (0,)))    # (b,lc,t)x(b,t,i) -> (b,lc,i)
    for l in range(spec.depth):
        off = spec.offsets[l]
        for m in range(spec.n_modalities):
            s_idx = l * spec.n_modalities + m
            pres = presence[:, m][:, None, None].astype(jnp.float32)
            # ---- attention block
            y, _, _ = _ln(x, w["ln1_s"][l, m], w["ln1_b"][l, m])
            q = y @ w["wq"][l, m]                        # (b, lc, inner) f32
            k = kvs[m][:, :, off:off + spec.inner]
            v = kvs[m][:, :, off + spec.inner:off + 2 * spec.inner]
            s = jax.lax.dot_general(
                q.astype(k.dtype), k, dn_ctx, preferred_element_type=jnp.float32
            ) * spec.scale                               # (b, lc, t)
            if masks[m] is not None:
                mk = masks[m].astype(jnp.float32)[:, None, :]
                s = s + (mk - 1.0) * _NEG_BIG
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            if masks[m] is not None:
                p = p * mk
            probs = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
            if spec.attn_dropout > 0.0:
                rid = jnp.arange(b, dtype=jnp.uint32)[:, None, None]
                qid = jnp.arange(spec.l_c, dtype=jnp.uint32)[None, :, None]
                kid = jnp.arange(spec.tokens[m], dtype=jnp.uint32)[None, None, :]
                keep = hash_keep(seeds[l, m], rid, qid, kid, spec.attn_dropout)
                probs = jnp.where(
                    keep, probs * (1.0 / (1.0 - spec.attn_dropout)), 0.0
                )
            av = jax.lax.dot_general(
                probs.astype(v.dtype), v, dn_av, preferred_element_type=jnp.float32
            )                                            # (b, lc, inner) f32
            o = av @ w["wout"][l, m] + w["bout"][l, m]
            u = jnp.where(o >= 0, o, 0.01 * o)
            x = pres * u + x
            # ---- feed-forward block
            y2, _, _ = _ln(x, w["ln2_s"][l, m], w["ln2_b"][l, m])
            h1 = y2 @ w["w0"][l, m] + w["b0"][l, m]      # (b, lc, 2F)
            f = spec.mult * spec.l_d
            gated = h1[..., :f] * _act(h1[..., f:], spec.act)
            h2 = gated @ w["w2"][l, m] + w["b2"][l, m]
            if ff_keep is not None:
                h2 = h2 * ff_keep[:, s_idx].astype(jnp.float32)
            x = pres * h2 + x
    return x.astype(cdt)


# ------------------------------------------------------------- fwd kernel

def _site_fwd(x, k, v, mask_row, seed, pid, wd, l, m, spec):
    """One (layer, modality) forward in f32; returns new x and residuals."""
    y, _, _ = _ln(x, wd["ln1_s"][l, m], wd["ln1_b"][l, m])
    q = jnp.dot(y, wd["wq"][l, m], preferred_element_type=jnp.float32)
    s = jax.lax.dot_general(
        q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * spec.scale                                        # (lc, t)
    if mask_row is not None:
        s = s + (mask_row - 1.0) * _NEG_BIG
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    if mask_row is not None:
        p = p * mask_row
    probs = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    if spec.attn_dropout > 0.0:
        shape = (spec.l_c, k.shape[0])
        qid = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        kid = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        keep = hash_keep(seed, pid.astype(jnp.uint32), qid, kid, spec.attn_dropout)
        pd = jnp.where(keep, probs * (1.0 / (1.0 - spec.attn_dropout)), 0.0)
    else:
        pd = probs
    av = jax.lax.dot_general(
        pd.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # (lc, inner)
    o = jnp.dot(av, wd["wout"][l, m], preferred_element_type=jnp.float32)
    o = o + wd["bout"][l, m]
    return jnp.where(o >= 0, o, 0.01 * o)                 # update u


def _ff_fwd(x, ffk, wd, l, m, spec):
    y, _, _ = _ln(x, wd["ln2_s"][l, m], wd["ln2_b"][l, m])
    h1 = jnp.dot(y, wd["w0"][l, m], preferred_element_type=jnp.float32)
    h1 = h1 + wd["b0"][l, m]
    f = spec.mult * spec.l_d
    gated = h1[:, :f] * _act(h1[:, f:], spec.act)
    h2 = jnp.dot(gated, wd["w2"][l, m], preferred_element_type=jnp.float32)
    h2 = h2 + wd["b2"][l, m]
    if ffk is not None:
        h2 = h2 * ffk
    return h2


def _unpack_refs(refs, spec, with_g):
    """Shared ref layout for fwd/bwd kernels -> named dict."""
    n = {}
    i = 0
    n["x0"] = refs[i]; i += 1
    n["kv"] = refs[i:i + spec.n_modalities]; i += spec.n_modalities
    n["mask"] = []
    for m in range(spec.n_modalities):
        if spec.has_mask[m]:
            n["mask"].append(refs[i]); i += 1
        else:
            n["mask"].append(None)
    if spec.ff_dropout > 0.0:
        n["ffk"] = refs[i]; i += 1
    else:
        n["ffk"] = None
    n["pres"] = refs[i]; i += 1
    n["seeds"] = refs[i]; i += 1
    n["w"] = dict(zip(WEIGHT_FIELDS, refs[i:i + len(WEIGHT_FIELDS)]))
    i += len(WEIGHT_FIELDS)
    if with_g:
        n["g"] = refs[i]; i += 1
    assert i == len(refs), (i, len(refs))
    return n


def _read_weights(wrefs):
    return {k: r[...] for k, r in wrefs.items()}


def _fwd_kernel(*refs, spec: ChainSpec):
    n = _unpack_refs(refs[:-1], spec, with_g=False)
    out_ref = refs[-1]
    pid = pl.program_id(0)
    wd = _read_weights(n["w"])
    x = n["x0"][0].astype(jnp.float32)                   # (lc, ld)
    for l in range(spec.depth):
        off = spec.offsets[l]
        for m in range(spec.n_modalities):
            pres = n["pres"][0, m]
            kv = n["kv"][m]
            k = kv[0, :, off:off + spec.inner]
            v = kv[0, :, off + spec.inner:off + 2 * spec.inner]
            mask_row = n["mask"][m][...] if n["mask"][m] is not None else None
            seed = n["seeds"][l, m]
            u = _site_fwd(x, k, v, mask_row, seed, pid, wd, l, m, spec)
            x = pres * u + x
            ffk = (
                n["ffk"][0, l * spec.n_modalities + m]
                if n["ffk"] is not None else None
            )
            h2 = _ff_fwd(x, ffk, wd, l, m, spec)
            x = pres * h2 + x
    out_ref[0] = x.astype(out_ref.dtype)


def _build_specs(spec: ChainSpec, weights, with_g: bool):
    """(in_specs, kernel-input arrays order) shared by fwd and bwd."""
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((1, spec.l_c, spec.l_d), lambda i: (i, 0, 0), memory_space=vm)
    ]
    for m in range(spec.n_modalities):
        pass  # shapes resolved at call site; specs appended below
    return in_specs


def _common_in_specs(spec: ChainSpec, f_pads):
    vm = pltpu.VMEM
    specs = [
        pl.BlockSpec((1, spec.l_c, spec.l_d), lambda i: (i, 0, 0), memory_space=vm),
    ]
    for m in range(spec.n_modalities):
        t, fp = spec.tokens[m], f_pads[m]
        specs.append(
            pl.BlockSpec((1, t, fp), lambda i: (i, 0, 0), memory_space=vm)
        )
    for m in range(spec.n_modalities):
        if spec.has_mask[m]:
            specs.append(
                pl.BlockSpec(
                    (1, spec.tokens[m]), lambda i: (i, 0), memory_space=vm
                )
            )
    if spec.ff_dropout > 0.0:
        specs.append(
            pl.BlockSpec(
                (1, spec.sites, spec.l_c, spec.l_d),
                lambda i: (i, 0, 0, 0),
                memory_space=vm,
            )
        )
    specs.append(
        pl.BlockSpec((1, spec.n_modalities), lambda i: (i, 0), memory_space=pltpu.SMEM)
    )
    specs.append(
        pl.BlockSpec(
            (spec.depth, spec.n_modalities), lambda i: (0, 0),
            memory_space=pltpu.SMEM,
        )
    )
    for _ in WEIGHT_FIELDS:
        specs.append(pl.BlockSpec(memory_space=vm))
    return specs


def _fwd_call(x0, kvs, masks, ff_keep, presence, seeds, weights, spec, interpret):
    b = x0.shape[0]
    f_pads = tuple(kv.shape[-1] for kv in kvs)
    inputs = [x0, *kvs]
    for m in range(spec.n_modalities):
        if spec.has_mask[m]:
            inputs.append(masks[m].astype(jnp.float32))
    if spec.ff_dropout > 0.0:
        inputs.append(ff_keep)
    inputs.extend([presence.astype(jnp.float32), seeds, *weights])

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        grid=(b,),
        in_specs=_common_in_specs(spec, f_pads),
        out_specs=pl.BlockSpec(
            (1, spec.l_c, spec.l_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, spec.l_c, spec.l_d), x0.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)
    return out
