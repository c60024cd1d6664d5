"""Batched inference / serving path.

The reference has no serving layer (SURVEY.md §0); this provides the
production inference surface for the framework:

- :class:`Predictor` wraps a trained module + params (live pytree or an
  orbax checkpoint directory) behind ONE compiled program: requests of any
  size are padded to a fixed micro-batch, so serving never recompiles;
- outputs are the full survival head: logits, hazards, survival curves, and
  risk scores (`hazards = sigmoid; S = cumprod(1-h); risk = -sum(S)` —
  the chain of `/root/reference/healnet/main.py:434-437`);
- per-sample missing modalities via the same static presence masks as
  training (pass ``None`` for an absent modality, or a presence matrix);
- optional bf16 compute for throughput (fp32 outputs).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from healnet_tpu.train.losses import hazards_survival_risk


class Predictor:
    """Fixed-shape, jit-once survival predictor."""

    def __init__(
        self,
        module,
        params: Union[Dict, str, Path],
        batch_size: int = 8,
        compute_dtype: Any = None,
    ):
        """
        Args:
            module: a Flax module with the framework call convention.
            params: parameter pytree, or a checkpoint directory containing
                a ``best`` checkpoint written by :class:`Checkpointer`.
            batch_size: compiled micro-batch; requests are padded/split.
        """
        self.module = module
        if isinstance(params, (str, Path)):
            from healnet_tpu.train.checkpoint import Checkpointer

            params = Checkpointer(params).restore_best()
        self.params = params
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype

        def predict(params, tensors, presence, kv_masks):
            kwargs = {} if kv_masks is None else {"kv_masks": kv_masks}
            logits = module.apply(
                {"params": params}, tensors, presence=presence,
                deterministic=True, **kwargs,
            ).astype(jnp.float32)
            hazards, survival, risk = hazards_survival_risk(logits)
            return {
                "logits": logits,
                "hazards": hazards,
                "survival": survival,
                "risk": risk,
            }

        self._predict = jax.jit(predict)

    def __call__(
        self,
        tensors: Sequence[Optional[np.ndarray]],
        presence: Optional[np.ndarray] = None,
        kv_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> Dict[str, np.ndarray]:
        """Predict for n samples; entries of ``tensors`` may be None (missing).

        kv_masks: optional per-modality boolean masks ``(n, tokens_i)`` for
        ragged padded contexts (True = attend) — without them, zero-padded
        patch rows would be attended and inference would diverge from the
        training-time masked semantics.

        Returns numpy arrays of shape (n, ...) for logits/hazards/survival
        and (n,) for risk.
        """
        n_mod = len(tensors)
        n = next(
            (np.asarray(t).shape[0] for t in tensors if t is not None),
            None if presence is None else np.asarray(presence).shape[0],
        )
        assert n is not None, (
            "at least one modality tensor (or a presence matrix) is required"
        )
        if n == 0:  # empty request: empty, well-shaped outputs
            zero = lambda *tail: np.zeros((0, *tail), np.float32)
            nb = self.module.out_dims if hasattr(self.module, "out_dims") else 0
            return {
                "logits": zero(nb), "hazards": zero(nb),
                "survival": zero(nb), "risk": zero(),
            }

        # materialise missing modalities as zeros + presence mask
        full = []
        pres = (
            np.ones((n, n_mod), np.float32)
            if presence is None
            else np.asarray(presence, np.float32).copy()
        )
        shapes = getattr(self.module, "num_spatial_axes", None)
        for i, t in enumerate(tensors):
            if t is None:
                pres[:, i] = 0.0
                axes = shapes[i] if shapes is not None else 1
                chan = self.module.channel_dims[i]
                full.append(np.zeros((n,) + (1,) * axes + (chan,), np.float32))
            else:
                full.append(np.asarray(t, np.float32))

        masks = (
            [None] * n_mod
            if kv_masks is None
            else [None if m is None else np.asarray(m, bool) for m in kv_masks]
        )
        outs: List[Dict[str, np.ndarray]] = []
        bs = self.batch_size
        for start in range(0, n, bs):
            sel = slice(start, min(start + bs, n))
            cur = [t[sel] for t in full]
            cur_pres = pres[sel]
            cur_masks = [None if m is None else m[sel] for m in masks]
            pad = bs - cur[0].shape[0]
            if pad > 0:
                cur = [np.concatenate([t, np.repeat(t[-1:], pad, 0)]) for t in cur]
                cur_pres = np.concatenate([cur_pres, np.repeat(cur_pres[-1:], pad, 0)])
                cur_masks = [
                    None if m is None
                    else np.concatenate([m, np.repeat(m[-1:], pad, 0)])
                    for m in cur_masks
                ]
            dtype = self.compute_dtype or jnp.float32
            batch_tensors = tuple(jnp.asarray(t, dtype) for t in cur)
            jm = (
                None
                if kv_masks is None
                else tuple(None if m is None else jnp.asarray(m) for m in cur_masks)
            )
            result = self._predict(
                self.params, batch_tensors, jnp.asarray(cur_pres), jm
            )
            outs.append(
                {k: np.asarray(v)[: bs - pad if pad else bs] for k, v in result.items()}
            )
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
