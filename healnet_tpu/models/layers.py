"""Flax building blocks for HealNet: PreNorm, Attention, FeedForward.

Each block keeps numerical parity with its reference counterpart
(`/root/reference/healnet/models/healnet.py:306-426`):

- `PreNorm` LayerNorms the query (and context when a context dim is given) before
  the wrapped function (`healnet.py:306-321`), eps 1e-5 (torch default);
- `Attention` projects q from the latent and k/v from a context of *different*
  dimensionality, uses temperature-0.5 softmax, and a Linear+LeakyReLU(1e-2)
  output projection (`healnet.py:369-426`);
- `FeedForward` is Linear(d -> d*mult*2) -> gated SELU/GELU chunk -> Linear(d*mult -> d)
  -> dropout (`healnet.py:339-351`).

Initialisation follows torch ``nn.Linear`` defaults (Kaiming-uniform kernel,
uniform bias in ±1/sqrt(fan_in)) so that training dynamics match the reference.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from healnet_tpu.ops.activations import gated_gelu, gated_selu
from healnet_tpu.ops.attention import multihead_attention, split_heads
from healnet_tpu.ops.fused_project import split_columns


def _symmetric_uniform(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _torch_kernel_init(key, shape, dtype=jnp.float32):
    # torch kaiming_uniform(a=sqrt(5)) on a (out, in) weight == U(±1/sqrt(fan_in));
    # flax kernels are (in, out), so fan_in = shape[0].
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense(
    features: int,
    fan_in: int,
    use_bias: bool = True,
    name: Optional[str] = None,
    dtype: Any = None,
) -> nn.Dense:
    """`nn.Dense` with torch ``nn.Linear`` default initialisation."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=_torch_kernel_init,
        bias_init=_symmetric_uniform(1.0 / math.sqrt(fan_in)),
        name=name,
        dtype=dtype,
    )


class FeedForward(nn.Module):
    """Gated-chunk feed-forward block (`healnet.py:339-351`)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    snn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = torch_dense(self.dim * self.mult * 2, self.dim, name="net_0", dtype=self.dtype)(x)
        h = gated_selu(h) if self.snn else gated_gelu(h)
        h = torch_dense(self.dim, self.dim * self.mult, name="net_2", dtype=self.dtype)(h)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return h


class FoldedKV(nn.Module):
    """``to_kv`` projection that can fold a LayerNorm affine into its weights.

    Param tree is identical to ``nn.Dense(use_bias=False, name="to_kv")``
    (a single ``kernel``), so checkpoints and the Megatron TP rules on
    ``to_kv/kernel`` are unaffected. With ``(scale, bias)`` given, it computes

        LN_out @ W  =  (x_hat * scale + bias) @ W  =  x_hat @ (scale ⊙ W) + bias @ W

    i.e. the per-layer context LayerNorm collapses into a weight rescale. The
    folded kernel is weight-sized (tiny), so each fusion layer stops paying a
    context-sized read+write for its own LayerNorm output — the single shared
    normalized context x_hat is the only context-sized tensor in flight, and
    the LN-parameter gradients become weight-sized reductions.
    """

    features: int
    in_features: int
    dtype: Any = None

    def setup(self):
        self.kernel = self.param(
            "kernel", _torch_kernel_init, (self.in_features, self.features)
        )

    def fold(self, scale, bias):
        """(scale ⊙ W, bias @ W) — weight-sized, fp32."""
        return self.kernel * scale[:, None], bias @ self.kernel

    def __call__(self, x, scale=None, bias=None):
        kernel = self.kernel
        folded_bias = None
        if scale is not None:
            kernel, folded_bias = self.fold(scale, bias)
        if self.dtype is not None:
            x, kernel = x.astype(self.dtype), kernel.astype(self.dtype)
        y = x @ kernel
        if folded_bias is not None:
            y = y + folded_bias.astype(y.dtype)
        return y


class Attention(nn.Module):
    """Cross/self attention with temperature-0.5 softmax (`healnet.py:369-426`).

    ``attention_impl`` selects the score/softmax/value path:
    - ``"xla"``: reference einsum path (always used when weights are requested);
    - ``"flash"``: fused Pallas online-softmax kernel (TPU);
    - ``"auto"``: flash on TPU when profitable, else XLA.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    temperature: float = 0.5
    attention_impl: str = "xla"
    dtype: Any = None
    # a jax.sharding.Mesh with a `seq` axis > 1 switches cross-attention to
    # the explicit sequence-parallel path: KV stays sharded over `seq`, only
    # online-softmax partials cross the interconnect (never the full context)
    mesh: Any = None
    # KV chunk width for return_weights="stats" (streaming inspection):
    # peak attention memory is (b, h, lq, stats_chunk) instead of the full
    # (b, h, lq, lkv) map
    stats_chunk: int = 2048

    def setup(self):
        inner = self.dim_head * self.heads
        ctx_dim = self.context_dim if self.context_dim is not None else self.query_dim
        self.to_q = torch_dense(inner, self.query_dim, use_bias=False, dtype=self.dtype)
        self.to_kv = FoldedKV(inner * 2, in_features=ctx_dim, dtype=self.dtype)
        self.to_out = torch_dense(self.query_dim, inner, dtype=self.dtype)

    def kv_fold(self, scale, bias):
        """Fold a context-LayerNorm affine into this head's KV weights."""
        return self.to_kv.fold(scale, bias)

    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_weights: bool = False,
        ctx_scale: Optional[jnp.ndarray] = None,
        ctx_bias: Optional[jnp.ndarray] = None,
        kv: Optional[jnp.ndarray] = None,
    ):
        """``kv``: precomputed (b, tokens, 2*inner) projection — the merged
        all-layer KV matmul path (one context read for the whole model)."""
        inner = self.dim_head * self.heads
        scale = self.dim_head**-0.5

        q = self.to_q(x)
        if kv is None:
            ctx = x if context is None else context
            kv = self.to_kv(ctx, scale=ctx_scale, bias=ctx_bias)
        # concat-VJP split: jnp.split's backward is two full-width pads +
        # add per layer (see ops/fused_project.split_columns)
        k, v = split_columns(kv, (inner, inner))

        qh, kh, vh = (split_heads(t, self.heads) for t in (q, k, v))

        dropout_rng = None
        dropout_rate = self.dropout if not deterministic else 0.0
        if dropout_rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        # static, declared at construction: cross-attention modules carry a
        # context_dim (shape/mask heuristics misfire when a context happens
        # to have exactly as many tokens as the latent array)
        is_cross = self.context_dim is not None
        if self._should_use_seq_parallel(is_cross, return_weights, kh.shape[2]):
            from healnet_tpu.ops.hash_dropout import seed_from_rng
            from healnet_tpu.parallel.seq_attention import sequence_parallel_attention

            out = sequence_parallel_attention(
                qh, kh, vh, self.mesh,
                scale=scale, temperature=self.temperature, kv_mask=kv_mask,
                dropout_rate=dropout_rate,
                dropout_seed=(
                    seed_from_rng(dropout_rng) if dropout_rate > 0.0 else None
                ),
            )
            return nn.leaky_relu(self.to_out(out), negative_slope=1e-2), None

        if return_weights == "stats":
            # streaming inspection: exact column/std reductions of the
            # probability map without materialising it (WSI-scale capture,
            # see ops/attention.streaming_attention_stats). Dropout replays
            # bit-identically via the coordinate-hash family.
            from healnet_tpu.ops.attention import streaming_attention_stats

            out, stats = streaming_attention_stats(
                qh, kh, vh, scale=scale, temperature=self.temperature,
                kv_mask=kv_mask, chunk=self.stats_chunk,
                dropout_rng=dropout_rng, dropout_rate=dropout_rate,
            )
            return nn.leaky_relu(self.to_out(out), negative_slope=1e-2), stats

        use_flash = self._should_use_flash(
            return_weights, dropout_rate, qh.shape[0], qh.shape[2], kh.shape[2]
        )
        if use_flash:
            from healnet_tpu.ops.flash_attention import flash_cross_attention

            out = flash_cross_attention(
                qh, kh, vh, scale=scale, temperature=self.temperature,
                kv_mask=kv_mask,
                dropout_rate=dropout_rate, dropout_rng=dropout_rng,
            )
            weights = None
        else:
            out, weights = multihead_attention(
                qh,
                kh,
                vh,
                scale=scale,
                temperature=self.temperature,
                kv_mask=kv_mask,
                dropout_rng=dropout_rng,
                dropout_rate=dropout_rate,
                return_weights=return_weights,
            )

        out = nn.leaky_relu(self.to_out(out), negative_slope=1e-2)
        return out, weights

    def _seq_size(self) -> int:
        if self.mesh is None:
            return 1
        from healnet_tpu.parallel.mesh import AXIS_SEQ

        return dict(self.mesh.shape).get(AXIS_SEQ, 1)

    def _should_use_seq_parallel(
        self, is_cross: bool, return_weights: bool, lkv: int
    ) -> bool:
        # only cross-attention benefits (self-attention queries == keys ==
        # tiny replicated latents); weight capture needs the materialised
        # (lq, lkv) matrix, so it takes the GSPMD path. Dropout is supported
        # via the coordinate-hash counter RNG (hash_dropout) — the tuned
        # configs all train with attn_dropout on, so the SPMD training path
        # must survive it.
        seq = self._seq_size()
        return seq > 1 and is_cross and not return_weights and lkv % seq == 0

    def _should_use_flash(
        self, return_weights: bool, dropout_rate: float, b: int, lq: int, lkv: int
    ) -> bool:
        if return_weights:
            return False
        if self.attention_impl == "flash":
            return True
        if self.attention_impl == "auto":
            from healnet_tpu.ops.pallas_utils import on_tpu as _on_tpu

            if not _on_tpu():
                return False
            # Measured on v5e (fwd+bwd; table in BENCH_NOTES.md "Flash
            # cross-attention kernel"): for small latent arrays XLA's einsum
            # attention sits at the HBM roofline and flash only adds
            # overhead; flash wins once the (lq x lkv) weight matrix it never
            # materialises dominates the KV stream — measured from
            # lq >= 2*dim_head at long contexts (1.4-3.0x fp32, 1.3x bf16).
            # With dropout on, BOTH paths hash the keep mask in-register
            # (hash_dropout; no bernoulli tensor in HBM on either side), and
            # the measured break-even does NOT move in flash's favour: the
            # hash-XLA path won every measured dropout cell up to lq=256
            # (0.32-0.97x flash speedup), so dropout earns no relaxation.
            # Always engage when the weights would threaten HBM itself.
            weights_bytes = b * self.heads * lq * lkv * 4
            big_weights = weights_bytes > 2 * 1024**3
            flash_regime = (
                dropout_rate == 0.0 and lq >= 2 * self.dim_head and lkv >= 8192
            )
            return flash_regime or big_weights
        return False


class LayerNormAffine(nn.Module):
    """Owns LayerNorm's ``scale``/``bias`` params without applying them.

    Param tree matches ``nn.LayerNorm`` exactly, so a checkpoint trained on
    either path loads on the other. Used by the pre-normalized-context fast
    path, where the affine is folded into the KV projection weights instead
    of being applied across the full context.
    """

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class PreNormAttention(nn.Module):
    """PreNorm wrapper around Attention (`healnet.py:306-321`).

    ``context_normalized=True`` marks the incoming context as already
    normalized (shared x_hat computed once per step by the caller — LayerNorm
    statistics do not depend on this layer's params); the layer's own
    ``norm_context`` affine is then folded into ``to_kv`` (see
    :class:`FoldedKV`) instead of re-reading the full context.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    temperature: float = 0.5
    attention_impl: str = "xla"
    dtype: Any = None
    mesh: Any = None
    stats_chunk: int = 2048

    def setup(self):
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        if self.context_dim is not None:
            self.norm_context = LayerNormAffine(self.context_dim)
        self.fn = Attention(
            query_dim=self.query_dim,
            context_dim=self.context_dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            temperature=self.temperature,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            mesh=self.mesh,
            stats_chunk=self.stats_chunk,
        )

    def kv_fold(self):
        """This layer's context-KV weights with its LayerNorm affine folded in.

        Lets the model compute ONE merged KV matmul over the shared
        normalized context for all fusion layers (one context read for the
        whole forward, one for the whole backward).
        """
        scale, bias = self.norm_context()
        return self.fn.kv_fold(scale, bias)

    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_weights: bool = False,
        context_normalized: bool = False,
        kv: Optional[jnp.ndarray] = None,
    ):
        normed = self.norm(x)
        normed_ctx = None
        ctx_scale = ctx_bias = None
        if kv is None and context is not None:
            if context_normalized:
                # shared x_hat: fold this layer's affine into to_kv weights
                ctx_scale, ctx_bias = self.norm_context()
                normed_ctx = context
            else:
                scale_p, bias_p = self.norm_context()
                xf = context.astype(jnp.float32)
                mu = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
                xhat = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
                normed_ctx = (xhat * scale_p + bias_p).astype(
                    self.dtype or context.dtype
                )
        return self.fn(
            normed,
            context=normed_ctx,
            kv_mask=kv_mask,
            deterministic=deterministic,
            return_weights=return_weights,
            ctx_scale=ctx_scale,
            ctx_bias=ctx_bias,
            kv=kv,
        )


class PreNormFeedForward(nn.Module):
    """PreNorm wrapper around FeedForward."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    snn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        normed = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        return FeedForward(
            dim=self.dim,
            mult=self.mult,
            dropout=self.dropout,
            snn=self.snn,
            dtype=self.dtype,
            name="fn",
        )(normed, deterministic=deterministic)
