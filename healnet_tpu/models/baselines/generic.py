"""Generic MLP baselines: FCNN and RegularizedFCNN.

Flax counterparts of `/root/reference/healnet/baselines/generic.py:10-79`:

- :class:`FCNN` — plain MLP with explicit layer sizes;
- :class:`RegularizedFCNN` — the pipeline's "fcnn" baseline
  (`main.py:313-315`): input -> 128 -> 64 -> sigmoid(out), dropout, with l1/l2
  penalty helpers. The reference builds its input layer lazily on first
  forward (`generic.py:57-60`); with static XLA shapes the input width is
  simply inferred at init.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from healnet_tpu.models.layers import torch_dense


def _first_flat(tensors) -> jnp.ndarray:
    x = tensors[0] if isinstance(tensors, (list, tuple)) else tensors
    return x.reshape(x.shape[0], -1)


class FCNN(nn.Module):
    """Plain MLP baseline (`generic.py:10-34`)."""

    hidden_sizes: Sequence[int]
    output_size: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, tensors, presence=None, deterministic: bool = True):
        x = _first_flat(tensors)
        x = jax.nn.relu(torch_dense(self.hidden_sizes[0], x.shape[-1], name="input")(x))
        for i, width in enumerate(self.hidden_sizes[1:]):
            x = torch_dense(width, x.shape[-1], name=f"hidden_{i}")(x)
            x = jax.nn.relu(nn.Dropout(self.dropout)(x, deterministic=deterministic))
        return torch_dense(self.output_size, x.shape[-1], name="output")(x)


class RegularizedFCNN(nn.Module):
    """MLP with sigmoid output and weight-penalty helpers (`generic.py:36-79`)."""

    output_dim: int
    dropout_rate: float = 0.2
    l1_penalty: float = 0.01
    l2_penalty: float = 0.01

    @nn.compact
    def __call__(self, tensors, presence=None, deterministic: bool = True):
        x = _first_flat(tensors)
        x = jax.nn.relu(torch_dense(128, x.shape[-1], name="input")(x))
        x = jax.nn.relu(torch_dense(64, 128, name="hidden")(x))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return jax.nn.sigmoid(torch_dense(self.output_dim, 64, name="output")(x))

    def l1_regularization(self, params) -> jnp.ndarray:
        kernels = [
            leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
            if "kernel" in jax.tree_util.keystr(path)
        ]
        return self.l1_penalty * sum(jnp.sum(jnp.abs(k)) for k in kernels)

    def l2_regularization(self, params) -> jnp.ndarray:
        kernels = [
            leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
            if "kernel" in jax.tree_util.keystr(path)
        ]
        return self.l2_penalty * sum(jnp.linalg.norm(k) for k in kernels)
