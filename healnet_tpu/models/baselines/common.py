"""Shared building blocks for baseline model families.

Flax counterparts of the torch blocks the baselines are assembled from
(`/root/reference/healnet/baselines/mcat.py:321-469`):

- :func:`snn_block` — Linear + ELU + AlphaDropout (self-normalising block,
  `mcat.py:388-402`); AlphaDropout is implemented here (flax has none):
  SELU-compatible dropout that preserves the self-normalising property by
  setting dropped units to -alpha' and applying an affine correction
  (Klambauer et al., 2017).
- :class:`AttnNetGated` — gated attention scorer (`mcat.py:422-452`).
- :class:`BilinearFusion` — Kronecker-style gated bilinear late fusion
  (`mcat.py:321-385`).
- :class:`TransformerEncoderLayer` / :class:`TransformerEncoder` — torch
  ``nn.TransformerEncoder`` semantics (post-norm, ReLU FF) used by MCAT/MOTCat.
- :func:`init_max_weights`-style normal initialisation is reproduced with a
  custom initializer (`mcat.py:455-469`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from healnet_tpu.models.layers import torch_dense

# SELU constants (match jax.nn.selu / torch)
_SELU_ALPHA = 1.6732632423543772
_SELU_SCALE = 1.0507009873554805


def max_weights_dense(features: int, fan_in: int, name: Optional[str] = None) -> nn.Dense:
    """Dense with N(0, 1/sqrt(fan_in)) kernel and zero bias (`mcat.py:455-469`)."""
    stdv = 1.0 / math.sqrt(fan_in)
    return nn.Dense(
        features,
        kernel_init=nn.initializers.normal(stddev=stdv),
        bias_init=nn.initializers.zeros,
        name=name,
    )


class AlphaDropout(nn.Module):
    """Self-normalising dropout for SELU networks (torch ``nn.AlphaDropout``)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        alpha_p = -_SELU_ALPHA * _SELU_SCALE
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, x.shape)
        a = (keep + alpha_p**2 * keep * (1 - keep)) ** -0.5
        b = -a * alpha_p * (1 - keep)
        return a * jnp.where(mask, x, alpha_p) + b


class SNNBlock(nn.Module):
    """Linear + ELU + AlphaDropout (`mcat.py:388-402`).

    ``max_init=True`` uses the reference's ``init_max_weights`` scheme
    (N(0, 1/sqrt(fan_in)) kernels, zero bias — `mcat.py:455-469`), which
    the standalone SNN model applies to all of its Linears
    (`mcat.py:297`).
    """

    features: int
    dropout: float = 0.25
    max_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dense = max_weights_dense if self.max_init else torch_dense
        h = dense(self.features, x.shape[-1], name="fc")(x)
        h = jax.nn.elu(h)
        return AlphaDropout(self.dropout)(h, deterministic=deterministic)


class AttnNetGated(nn.Module):
    """Gated attention network: A = W_c(tanh(W_a x) * sigmoid(W_b x))."""

    hidden: int = 256
    n_classes: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        a = jnp.tanh(torch_dense(self.hidden, x.shape[-1], name="attention_a")(x))
        b = jax.nn.sigmoid(torch_dense(self.hidden, x.shape[-1], name="attention_b")(x))
        if self.dropout > 0:
            a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
            b = nn.Dropout(self.dropout)(b, deterministic=deterministic)
        scores = torch_dense(self.n_classes, self.hidden, name="attention_c")(a * b)
        return scores, x


class BilinearFusion(nn.Module):
    """Gated bilinear late-fusion block (`mcat.py:321-385`)."""

    dim1: int = 128
    dim2: int = 128
    scale_dim1: int = 1
    scale_dim2: int = 1
    mmhid: int = 256
    dropout_rate: float = 0.25
    gate1: bool = True
    gate2: bool = True
    skip: bool = False

    @nn.compact
    def __call__(self, vec1: jnp.ndarray, vec2: jnp.ndarray, deterministic: bool = True):
        d1 = self.dim1 // self.scale_dim1
        d2 = self.dim2 // self.scale_dim2

        h1 = jax.nn.relu(torch_dense(d1, self.dim1, name="linear_h1")(vec1))
        if self.gate1:
            z1 = torch_dense(d1, self.dim1 + self.dim2, name="linear_z1")(
                jnp.concatenate([vec1, vec2], axis=1)
            )
            o1 = jax.nn.sigmoid(z1) * h1
        else:
            o1 = h1
        o1 = jax.nn.relu(torch_dense(d1, d1, name="linear_o1")(o1))
        o1 = nn.Dropout(self.dropout_rate)(o1, deterministic=deterministic)

        h2 = jax.nn.relu(torch_dense(d2, self.dim2, name="linear_h2")(vec2))
        if self.gate2:
            z2 = torch_dense(d2, self.dim1 + self.dim2, name="linear_z2")(
                jnp.concatenate([vec1, vec2], axis=1)
            )
            o2 = jax.nn.sigmoid(z2) * h2
        else:
            o2 = h2
        o2 = jax.nn.relu(torch_dense(d2, d2, name="linear_o2")(o2))
        o2 = nn.Dropout(self.dropout_rate)(o2, deterministic=deterministic)

        # append bias-1 column, outer product, flatten (Kronecker fusion)
        ones = jnp.ones((o1.shape[0], 1), o1.dtype)
        o1 = jnp.concatenate([o1, ones], axis=1)
        o2 = jnp.concatenate([o2, ones], axis=1)
        o12 = jnp.einsum("bi,bj->bij", o1, o2).reshape(o1.shape[0], -1)
        out = nn.Dropout(self.dropout_rate)(o12, deterministic=deterministic)
        out = jax.nn.relu(torch_dense(256, (d1 + 1) * (d2 + 1), name="encoder1")(out))
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        if self.skip:
            out = jnp.concatenate([out, vec1, vec2], axis=1)
        out = jax.nn.relu(
            torch_dense(self.mmhid, out.shape[-1], name="encoder2")(out)
        )
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out


class TransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` semantics: post-norm, ReLU FF."""

    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="self_attn",
        )(x, x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ff = torch_dense(self.dim_feedforward, self.d_model, name="linear1")(x)
        ff = jax.nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = torch_dense(self.d_model, self.dim_feedforward, name="linear2")(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(
            x + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        )


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (torch ``nn.TransformerEncoder``)."""

    num_layers: int = 2
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                d_model=self.d_model,
                nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                name=f"layer_{i}",
            )(x, deterministic=deterministic)
        return x

