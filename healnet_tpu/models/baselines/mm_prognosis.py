"""MMPrognosis: pancancer prognosis baseline (gevaertlab port lineage).

Flax re-design of `/root/reference/healnet/baselines/mm_prognosis.py:216-388`:
per-modality encoders project into a shared 256-d embedding, modalities are
fused by masked mean (`mm_prognosis.py:200-213`), passed through BatchNorm ->
dropout -> 10-layer Highway network -> LayerNorm head.

Differences from the reference (deliberate, XLA-required):
- the reference builds ``nn.Linear``/``nn.Conv1d`` encoders dynamically *in
  forward* (`mm_prognosis.py:300-325`) — untrainable layers re-initialised
  every step. Here encoders are proper parameters with static shapes.
- missing modalities use the framework's ``presence`` mask in the masked-mean
  fusion instead of per-source Python branches.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from healnet_tpu.models.layers import torch_dense


class BatchStatNorm(nn.Module):
    """Batch normalisation from current-batch statistics (stateless).

    The reference uses torch BatchNorm1d (`mm_prognosis.py:234-235`); running
    averages are mutable state that would force every caller to thread a
    `batch_stats` collection. Normalising by the live batch statistics with
    learned scale/bias keeps the module pure — identical in training, and at
    eval batch sizes > 1 a close, documented stand-in.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return scale * (x - mean) * jax.lax.rsqrt(var + self.epsilon) + bias


class Highway(nn.Module):
    """Gated highway network (`mm_prognosis.py:368-388`)."""

    size: int = 256
    num_layers: int = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            gate = jax.nn.sigmoid(torch_dense(self.size, self.size, name=f"gate_{i}")(x))
            nonlinear = jax.nn.relu(
                torch_dense(self.size, self.size, name=f"nonlinear_{i}")(x)
            )
            linear = torch_dense(self.size, self.size, name=f"linear_{i}")(x)
            x = gate * nonlinear + (1.0 - gate) * linear
        return x


class MMPrognosis(nn.Module):
    """Multimodal prognosis network over omic + WSI-patch modalities."""

    output_dims: int = 4
    embedding_dims: int = 256
    dropout: float = 0.5
    batch_norm: bool = True
    tokens_layout: bool = False  # True: patch bags arrive (b, patches, dim)

    @nn.compact
    def __call__(
        self,
        tensors: Sequence[jnp.ndarray],
        presence: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        b = tensors[0].shape[0]
        embeddings = []
        for i, t in enumerate(tensors):
            if t.ndim == 3 and t.shape[1] > 1 and t.shape[2] > 1:
                # patch bag: 1D convs over the patch axis, global average
                # pool (`mm_prognosis.py:300-317`)
                h = t if self.tokens_layout else jnp.swapaxes(t, 1, 2)
                h = jax.nn.relu(
                    nn.Conv(512, kernel_size=(5,), strides=(2,), name=f"conv1_m{i}")(h)
                )
                h = jax.nn.relu(
                    nn.Conv(
                        self.embedding_dims, kernel_size=(5,), strides=(2,),
                        name=f"conv2_m{i}",
                    )(h)
                )
                z = jnp.mean(h, axis=1)
            else:
                flat = t.reshape(b, -1)
                z = jnp.tanh(
                    torch_dense(self.embedding_dims, flat.shape[-1], name=f"fc_m{i}")(flat)
                )
            embeddings.append(z)

        stacked = jnp.stack(embeddings, axis=0)  # (M, b, d)
        if presence is None:
            fused = jnp.mean(stacked, axis=0)
        else:
            w = presence.T[:, :, None].astype(stacked.dtype)  # (M, b, 1)
            fused = jnp.sum(stacked * w, axis=0) / jnp.maximum(
                jnp.sum(w, axis=0), 1e-6
            )

        x = fused
        if self.batch_norm:
            # ALWAYS call the norm layers so the parameter tree never
            # depends on the batch size seen at init (a b=1 init would
            # otherwise produce params without bn1/bn2 and fail on any
            # later b>1 apply); with a single sample the batch statistics
            # are degenerate, so the normalized output is bypassed
            normed = BatchStatNorm(name="bn1")(x)
            x = normed if b > 1 else x
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Highway(size=self.embedding_dims, num_layers=10, name="highway")(x)
        if self.batch_norm:
            normed = BatchStatNorm(name="bn2")(x)
            x = normed if b > 1 else x
        x = nn.LayerNorm(epsilon=1e-5, name="final_norm")(x)
        return torch_dense(self.output_dims, self.embedding_dims, name="final_head")(x)
