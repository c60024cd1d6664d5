"""MultiModN's bespoke trainer, TPU-native.

The reference MultiModN ships its own training/eval harness
(`/root/reference/healnet/baselines/multimodn/multimodn.py:97-500`): per
(encoder-stage x decoder) error-loss and accuracy matrices — including a
stage-0 row where decoders predict from the initial state — a state-change
penalty, binary confusion counts (sensitivity / specificity / balanced
accuracy), a `MultiModNHistory`, and `test` / `predict` entry points.

This re-design keeps that API surface but compiles the whole per-batch
computation (forward through every stage, loss, metric matrices, gradient,
optimizer update) into ONE jitted step — the reference runs a Python loop of
decoder forwards per encoder per batch with host-side metric accumulation.

For the survival pipeline the framework-wide
:class:`healnet_tpu.train.SurvivalTrainer` remains the entry point (it adds
the model's aux loss, `train/loop.py`); this trainer serves MultiModN's own
multi-task classification protocol.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from healnet_tpu.models.baselines.multimodn import MultiModNHistory, _softmax_ce


def _stage_metrics(stages, targets_onehot, sample_mask):
    """(n_stages, n_dec) loss + accuracy (+ binary tp/tn/fp/fn) matrices."""
    n_stage, n_dec = len(stages), len(stages[0])
    target_cls = jnp.argmax(targets_onehot, axis=-1)
    w = sample_mask
    denom = jnp.maximum(jnp.sum(w), 1.0)
    loss_m = jnp.zeros((n_stage, n_dec))
    acc_m = jnp.zeros((n_stage, n_dec))
    tp = jnp.zeros((n_stage, n_dec))
    tn = jnp.zeros((n_stage, n_dec))
    fp = jnp.zeros((n_stage, n_dec))
    fn = jnp.zeros((n_stage, n_dec))
    for s in range(n_stage):
        for d in range(n_dec):
            logits = stages[s][d]
            pred = jnp.argmax(logits, axis=-1)
            loss_m = loss_m.at[s, d].set(_softmax_ce(logits, targets_onehot, w))
            acc_m = acc_m.at[s, d].set(jnp.sum((pred == target_cls) * w) / denom)
            if logits.shape[-1] == 2:  # binary: confusion counts (`multimodn.py:161-175`)
                pos, ppos = target_cls == 1, pred == 1
                tp = tp.at[s, d].set(jnp.sum(pos & ppos, where=w > 0))
                tn = tn.at[s, d].set(jnp.sum(~pos & ~ppos, where=w > 0))
                fp = fp.at[s, d].set(jnp.sum(~pos & ppos, where=w > 0))
                fn = fn.at[s, d].set(jnp.sum(pos & ~ppos, where=w > 0))
    return {"loss": loss_m, "accuracy": acc_m, "tp": tp, "tn": tn, "fp": fp, "fn": fn}


def compute_binary_rates(m: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """sensitivity / specificity / balanced accuracy from confusion counts
    (`multimodn/multimodn.py:55-71` semantics, vectorized)."""
    tp, tn, fp, fn = (np.asarray(m[k], np.float64) for k in ("tp", "tn", "fp", "fn"))
    with np.errstate(divide="ignore", invalid="ignore"):
        sens = np.where(tp + fn > 0, tp / (tp + fn), np.nan)
        spec = np.where(tn + fp > 0, tn / (tn + fp), np.nan)
    return {
        "sensitivity": sens,
        "specificity": spec,
        "balanced_accuracy": (sens + spec) / 2.0,
    }


class MultiModNTrainer:
    """Jitted trainer for :class:`MultiModNModule`'s own protocol.

    ``data`` dicts carry ``tensors`` (one array per encoder) and ``y_disc``
    (int class labels); batches are padded + masked like the survival loop.
    """

    def __init__(
        self,
        module,
        *,
        n_classes: int,
        lr: float = 1e-3,
        batch_size: int = 8,
        seed: int = 0,
    ):
        self.module = module
        self.n_classes = n_classes
        self.batch_size = batch_size
        self.seed = seed
        self._opt = optax.adam(lr)
        self.params = None
        self.opt_state = None
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------- plumbing
    def _batches(self, data: Dict[str, Any], shuffle=False, rng=None):
        from healnet_tpu.train.loop import iterate_batches

        for batch in iterate_batches(data, self.batch_size, shuffle=shuffle, rng=rng):
            yield batch

    def _build(self, example: Dict[str, Any]):
        targets = jax.nn.one_hot(example["y_disc"], self.n_classes)
        if self.params is None:  # keep externally loaded weights
            self.params = self.module.init(
                jax.random.PRNGKey(self.seed), example["tensors"], targets
            )["params"]
        if self.opt_state is None:
            self.opt_state = self._opt.init(self.params)

        def forward_metrics(params, batch):
            targets = jax.nn.one_hot(batch["y_disc"], self.n_classes)
            stages, state_changes, loss = self.module.apply(
                {"params": params}, batch["tensors"], targets, return_stages=True,
                sample_weights=batch["sample_mask"],
            )
            metrics = _stage_metrics(stages, targets, batch["sample_mask"])
            metrics["state_change"] = state_changes
            return loss, metrics

        def train_step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: forward_metrics(p, batch), has_aux=True
            )(params)
            updates, opt_state = self._opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(forward_metrics)

    # ------------------------------------------------------------- protocol
    def train_epoch(
        self,
        data: Dict[str, Any],
        epoch: int = 0,
        history: Optional[MultiModNHistory] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> Dict[str, np.ndarray]:
        if self._train_step is None:
            self._build(next(self._batches(data)))
        sums, count = None, 0
        # per-epoch default rng: a fresh identical seed every call would
        # replay the same batch order each epoch
        rng = rng or np.random.default_rng(self.seed + epoch)
        for batch in self._batches(data, shuffle=True, rng=rng):
            self.params, self.opt_state, loss, metrics = self._train_step(
                self.params, self.opt_state, batch
            )
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            sums = metrics if sums is None else {
                k: sums[k] + metrics[k] for k in sums
            }
            count += 1
        if sums is None:
            raise ValueError("train_epoch received an empty dataset (0 batches)")
        epoch_metrics = {k: v / count for k, v in sums.items()}
        if history is not None:
            self._log_history(history, epoch, epoch_metrics, prefix="train")
        return epoch_metrics

    def test(
        self,
        data: Dict[str, Any],
        epoch: int = 0,
        history: Optional[MultiModNHistory] = None,
    ) -> Dict[str, np.ndarray]:
        if self._eval_step is None:
            self._build(next(self._batches(data)))
        sums, count = None, 0
        for batch in self._batches(data):
            _, metrics = self._eval_step(self.params, batch)
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            sums = metrics if sums is None else {k: sums[k] + metrics[k] for k in sums}
            count += 1
        if sums is None:
            raise ValueError("test received an empty dataset (0 batches)")
        out = {k: v / count for k, v in sums.items()}
        out.update(compute_binary_rates(out))
        if history is not None:
            self._log_history(history, epoch, out, prefix="val")
        return out

    def predict(self, data: Dict[str, Any]) -> np.ndarray:
        """Final-stage class predictions of decoder 0 (`multimodn.py:430-466`)."""
        preds: List[np.ndarray] = []
        for batch in self._batches(data):
            stages, _, _ = self.module.apply(
                {"params": self.params}, batch["tensors"], None, return_stages=True
            )
            logits = stages[-1][0]
            preds.append(np.asarray(jnp.argmax(logits, -1))[batch["sample_mask"] > 0])
        return np.concatenate(preds)

    def fit(
        self,
        train_data: Dict[str, Any],
        val_data: Dict[str, Any],
        epochs: int = 10,
        history: Optional[MultiModNHistory] = None,
    ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        train_m = val_m = None
        for epoch in range(1, epochs + 1):
            train_m = self.train_epoch(train_data, epoch, history, rng=rng)
            val_m = self.test(val_data, epoch, history)
        return train_m, val_m

    @staticmethod
    def _log_history(history, epoch, metrics, prefix):
        loss, acc = metrics["loss"], metrics["accuracy"]
        for s in range(loss.shape[0]):
            for d in range(loss.shape[1]):
                history.log(
                    epoch, s, d,
                    **{f"{prefix}_loss": loss[s, d], f"{prefix}_accuracy": acc[s, d]},
                )
