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

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        inner = self.dim_head * self.heads
        ctx_dim = self.context_dim if self.context_dim is not None else self.query_dim
        scale = self.dim_head**-0.5

        q = torch_dense(inner, self.query_dim, use_bias=False, name="to_q", dtype=self.dtype)(x)
        ctx = x if context is None else context
        kv = torch_dense(inner * 2, ctx_dim, use_bias=False, name="to_kv", dtype=self.dtype)(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        qh, kh, vh = (split_heads(t, self.heads) for t in (q, k, v))

        dropout_rng = None
        dropout_rate = self.dropout if not deterministic else 0.0
        if dropout_rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        if self._should_use_seq_parallel(
            context, return_weights, dropout_rate, kh.shape[2]
        ):
            from healnet_tpu.parallel.seq_attention import sequence_parallel_attention

            out = sequence_parallel_attention(
                qh, kh, vh, self.mesh,
                scale=scale, temperature=self.temperature, kv_mask=kv_mask,
            )
            out = torch_dense(self.query_dim, inner, name="to_out", dtype=self.dtype)(out)
            return nn.leaky_relu(out, negative_slope=1e-2), None

        use_flash = self._should_use_flash(
            return_weights, dropout_rate, qh.shape[0], qh.shape[2], kh.shape[2]
        )
        if use_flash:
            from healnet_tpu.ops.flash_attention import flash_cross_attention

            out = flash_cross_attention(
                qh, kh, vh, scale=scale, temperature=self.temperature, kv_mask=kv_mask
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

        out = torch_dense(self.query_dim, inner, name="to_out", dtype=self.dtype)(out)
        out = nn.leaky_relu(out, negative_slope=1e-2)
        return out, weights

    def _seq_size(self) -> int:
        if self.mesh is None:
            return 1
        from healnet_tpu.parallel.mesh import AXIS_SEQ

        return dict(
            zip(self.mesh.axis_names, self.mesh.devices.shape)
        ).get(AXIS_SEQ, 1)

    def _should_use_seq_parallel(
        self, context, return_weights: bool, dropout_rate: float, lkv: int
    ) -> bool:
        # only cross-attention benefits (self-attention queries == keys ==
        # tiny replicated latents); attention-prob dropout and weight capture
        # need the materialised (lq, lkv) matrix, so they take the GSPMD path
        seq = self._seq_size()
        return (
            seq > 1
            and context is not None
            and not return_weights
            and dropout_rate == 0.0
            and lkv % seq == 0
        )

    def _should_use_flash(
        self, return_weights: bool, dropout_rate: float, b: int, lq: int, lkv: int
    ) -> bool:
        if return_weights or dropout_rate > 0.0:
            return False
        if self.attention_impl == "flash":
            return True
        if self.attention_impl == "auto":
            try:
                on_tpu = jax.devices()[0].platform == "tpu"
            except Exception:
                on_tpu = False
            if not on_tpu:
                return False
            # Measured on v5e (fwd+bwd, fp32): for tiny latent arrays
            # (lq << dim_head) XLA's einsum attention already sits at the HBM
            # roofline and flash only adds overhead; once the weight matrix is
            # comparable to the KV stream (lq >= dim_head) at long contexts,
            # flash wins 1.4-2.8x by never materialising the (lq x lkv)
            # weights. Also engage whenever the weights would threaten HBM.
            weights_bytes = b * self.heads * lq * lkv * 4
            big_weights = weights_bytes > 2 * 1024**3
            flash_regime = lq >= self.dim_head and lkv >= 8192
            return flash_regime or big_weights
        return False


class PreNormAttention(nn.Module):
    """PreNorm wrapper around Attention (`healnet.py:306-321`)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    temperature: float = 0.5
    attention_impl: str = "xla"
    dtype: Any = None
    mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        normed = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        normed_ctx = None
        if context is not None:
            normed_ctx = nn.LayerNorm(epsilon=1e-5, name="norm_context", dtype=self.dtype)(context)
        return Attention(
            query_dim=self.query_dim,
            context_dim=self.context_dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            temperature=self.temperature,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            mesh=self.mesh,
            name="fn",
        )(
            normed,
            context=normed_ctx,
            kv_mask=kv_mask,
            deterministic=deterministic,
            return_weights=return_weights,
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
