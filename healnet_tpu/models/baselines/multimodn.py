"""MultiModN: sequential modular multimodal network with state passing.

Flax re-design of the variant the reference pipeline actually uses
(`/root/reference/healnet/baselines/multimodn/better_multimodn.py:9-69`,
wired at `main.py:317-334`) plus its encoder/decoder zoo
(`multimodn/encoders.py`, `multimodn/decoders.py`):

- a trainable initial state is broadcast per sample; each modality's encoder
  updates the state sequentially; after every encoder, every decoder predicts
  and incurs CE loss plus a state-change penalty; losses are averaged over
  encoders (`better_multimodn.py:42-57`);
- :class:`MLPEncoder` — MLP whose last layer consumes [features, state];
- :class:`PatchEncoder` — recurrence over patch tokens (GRU cell; the
  reference uses an Elman RNN but sums over tokens before the final cell,
  `encoders.py:90-105` — we keep the sum-then-cell structure);
- :class:`ResNetEncoder` — small conv encoder for raw images (torchvision's
  pretrained resnet18 is unavailable on this image; gated flag documents it);
- decoders: :class:`ClassDecoder`, :class:`MLPDecoder`, :class:`LogisticDecoder`.

The reference's full `multimodn.py` torch trainer (its own train/test loops,
torchmetrics history — `multimodn/multimodn.py:97-428`) is superseded by the
framework-wide :class:`healnet_tpu.train.SurvivalTrainer`; its confusion-
matrix history utility is reproduced in :class:`MultiModNHistory`.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from healnet_tpu.models.layers import torch_dense


# ------------------------------------------------------------------ encoders

class MLPEncoder(nn.Module):
    """MLP encoder; state is concatenated into the final layer's input."""

    state_size: int
    hidden_layers: Sequence[int] = (128, 64)
    activation: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, state: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        h = x.reshape(x.shape[0], -1)
        for i, width in enumerate(self.hidden_layers):
            h = self.activation(torch_dense(width, h.shape[-1], name=f"fc_{i}")(h))
        h = jnp.concatenate([h, state], axis=-1)
        return torch_dense(self.state_size, h.shape[-1], name="fc_out")(h)


class PatchEncoder(nn.Module):
    """Recurrent encoder over patch bags; final cell sees [sum(tokens), state]."""

    state_size: int
    hidden_layers: Sequence[int] = (128, 64)
    activation: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, state: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        # x: (b, tokens, feat)
        h = x
        for i, width in enumerate(self.hidden_layers):
            cell = nn.GRUCell(features=width, name=f"rnn_{i}")
            h = nn.RNN(cell, name=f"rnn_scan_{i}")(h)
            h = self.activation(h)
        pooled = jnp.sum(h, axis=1)                   # (`encoders.py:100`)
        joint = jnp.concatenate([pooled, state], axis=-1)
        return torch_dense(self.state_size, joint.shape[-1], name="fc_out")(joint)


class ResNetEncoder(nn.Module):
    """Small residual conv encoder for raw images (b, h, w, c).

    torchvision's pretrained resnet18 (`encoders.py:109-151`) cannot be
    downloaded in this zero-egress environment; this trains from scratch.
    """

    state_size: int
    widths: Sequence[int] = (32, 64, 128)

    @nn.compact
    def __call__(self, state: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.widths[0], (7, 7), strides=(2, 2), name="stem")(x)
        h = jax.nn.relu(h)
        for i, width in enumerate(self.widths):
            res = nn.Conv(width, (3, 3), strides=(2, 2), name=f"down_{i}")(h)
            block = jax.nn.relu(nn.Conv(width, (3, 3), name=f"conv_{i}a")(res))
            block = nn.Conv(width, (3, 3), name=f"conv_{i}b")(block)
            h = jax.nn.relu(res + block)
        pooled = jnp.mean(h, axis=(1, 2))
        joint = jnp.concatenate([pooled, state], axis=-1)
        return torch_dense(self.state_size, joint.shape[-1], name="fc")(joint)


# ------------------------------------------------------------------ decoders

class ClassDecoder(nn.Module):
    """Task head over the state (`decoders.py:22-33`)."""

    n_classes: int
    activation: Callable = jax.nn.sigmoid

    @nn.compact
    def __call__(self, state: jnp.ndarray) -> jnp.ndarray:
        return self.activation(
            torch_dense(self.n_classes, state.shape[-1], name="fc")(state)
        )


class MLPDecoder(nn.Module):
    """MLP task head (`decoders.py:35-63`)."""

    hidden_layers: Sequence[int] = (64,)
    n_classes: int = 2
    hidden_activation: Callable = jax.nn.relu
    output_activation: Callable = jax.nn.sigmoid

    @nn.compact
    def __call__(self, state: jnp.ndarray) -> jnp.ndarray:
        h = state
        for i, width in enumerate(self.hidden_layers):
            h = self.hidden_activation(torch_dense(width, h.shape[-1], name=f"fc_{i}")(h))
        return self.output_activation(
            torch_dense(self.n_classes, h.shape[-1], name="fc_out")(h)
        )


class LogisticDecoder(ClassDecoder):
    """Binary logistic head (`decoders.py:66-71`)."""

    n_classes: int = 2


# ------------------------------------------------------------------- module

class MultiModNModule(nn.Module):
    """Sequential encoder-state network with per-step decoder losses.

    ``__call__(tensors, targets_onehot)`` returns ``(loss, logits)`` like the
    reference (`better_multimodn.py:31-57`); without targets it returns the
    final logits only (inference).
    """

    state_size: int
    encoders: Sequence[nn.Module]
    decoders: Sequence[nn.Module]
    err_penalty: float = 1.0
    state_change_penalty: float = 0.0

    @nn.compact
    def __call__(
        self,
        tensors: Sequence[jnp.ndarray],
        targets: Optional[jnp.ndarray] = None,
        presence: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_stages: bool = False,
        sample_weights: Optional[jnp.ndarray] = None,
    ):
        assert len(tensors) == len(self.encoders), (
            "Number of inputs must match number of encoders"
        )
        b = tensors[0].shape[0]
        init_state = self.param(
            "state", nn.initializers.normal(stddev=1.0), (self.state_size,)
        )
        state = jnp.broadcast_to(init_state, (b, self.state_size))

        # stage 0: decoders predict from the INITIAL state, as in the
        # reference trainer (`multimodn/multimodn.py:148-160`); stage i > 0:
        # after the i-th encoder
        stages = [[decoder(state) for decoder in self.decoders]] if return_stages else []
        state_changes = []
        running_loss = 0.0
        logits = None
        for i, (encoder, x) in enumerate(zip(self.encoders, tensors)):
            old_state = state
            new_state = encoder(state, x)
            if presence is not None:
                pres = presence[:, i][:, None].astype(new_state.dtype)
                new_state = pres * new_state + (1.0 - pres) * old_state
            state = new_state
            state_changes.append(jnp.mean((state - old_state) ** 2))
            stage_logits = []
            for decoder in self.decoders:
                logits = decoder(state)
                stage_logits.append(logits)
                if targets is not None:
                    err = _softmax_ce(logits, targets, sample_weights)
                    running_loss = running_loss + err * self.err_penalty
            if targets is not None:
                # one state-change penalty per ENCODER step (adding it per
                # decoder would scale the regulariser by len(decoders))
                running_loss = running_loss + (
                    state_changes[-1] * self.state_change_penalty
                )
            if return_stages:
                stages.append(stage_logits)
        if return_stages:
            loss = (
                running_loss / len(self.encoders) if targets is not None else None
            )
            return stages, jnp.stack(state_changes), loss
        if targets is None:
            return logits
        return running_loss / len(self.encoders), logits


def _softmax_ce(
    logits: jnp.ndarray,
    targets_onehot: jnp.ndarray,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch ``nn.CrossEntropyLoss`` with soft targets (`better_multimodn.py:63`).

    ``sample_weights`` (0/1 padding mask) excludes padded trailing-batch rows
    from the mean so duplicated pad rows never bias the gradient.
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.sum(targets_onehot * log_probs, axis=-1)
    if sample_weights is None:
        return jnp.mean(per_row)
    w = sample_weights.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


class MultiModNHistory:
    """Per-encoder x decoder metric history with CSV export
    (`multimodn/utils.py:38-193` equivalent, torchmetrics-free)."""

    def __init__(self):
        self._records: List[dict] = []

    def log(self, epoch: int, encoder: int, decoder: int, **metrics) -> None:
        rec = {"epoch": epoch, "encoder": encoder, "decoder": decoder}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._records.append(rec)

    def to_dataframe(self):
        import pandas as pd

        return pd.DataFrame(self._records)

    def save_csv(self, path) -> None:
        self.to_dataframe().to_csv(path, index=False)

    def plot(self, metric: str, path=None):  # pragma: no cover - viz helper
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        df = self.to_dataframe()
        fig, ax = plt.subplots()
        for (enc, dec), group in df.groupby(["encoder", "decoder"]):
            ax.plot(group["epoch"], group[metric], label=f"enc{enc}/dec{dec}")
        ax.set_xlabel("epoch")
        ax.set_ylabel(metric)
        ax.legend()
        if path is not None:
            fig.savefig(path)
        return fig
