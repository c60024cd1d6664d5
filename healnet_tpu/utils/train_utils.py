"""Training utilities: L1 regularisation, early stopping, parameter counting.

Parity targets in the reference:
- `calc_reg_loss` L1-norm over all parameters, skipped for `fcnn` and omic-only `mcat`
  (`/root/reference/healnet/utils/train_utils.py:5-14`);
- `EarlyStopping` with min/max modes keeping the best weights in memory and restoring
  them (`train_utils.py:20-84`). Here "weights" are immutable JAX pytrees, so capture
  is a reference copy (device buffers are immutable — no state_dict clone needed).
- `count_parameters` (`train_utils.py:17-18`).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional

import jax
import jax.numpy as jnp


def accepts_kv_masks(module) -> bool:
    """True when ``module.__call__`` takes a ``kv_masks`` kwarg.

    HealNet-family modules mask ragged padded contexts; bag baselines
    (MCAT's bag net, MultiModN's PatchEncoder) pool zero-padded gathered
    tokens without masks — passing ``kv_masks`` to them is a TypeError.
    Shared by the trainer and the serving Predictor so both gate the same
    way.
    """
    import inspect

    try:
        return "kv_masks" in inspect.signature(type(module).__call__).parameters
    except (TypeError, ValueError):
        return True


def l1_norm(params, flat: bool = True) -> jnp.ndarray:
    """Sum of absolute values over every leaf of a parameter pytree.

    ``flat`` computes it as ONE abs-sum over the ravelled vector instead of
    one abs-sum per leaf: the gradient is ``sign(leaf)`` elementwise either
    way (bit-identical for same-dtype trees — no cross-element terms), but
    per-leaf evaluation costs ~2 executed XLA fusions per leaf fwd+bwd,
    which scales with depth for untied configs (~130 leaves at kirp depth
    5). Only the scalar VALUE can differ in the last ulp (summation order).
    """
    leaves = jax.tree_util.tree_leaves(params)
    if not leaves:
        return jnp.asarray(0.0)
    if flat and len(leaves) > 1:
        from jax.flatten_util import ravel_pytree

        return jnp.sum(jnp.abs(ravel_pytree(params)[0]))
    return sum(jnp.sum(jnp.abs(leaf)) for leaf in leaves)


def calc_reg_loss(params, l1: float, model_topo: str, sources: Optional[List[str]] = None):
    """L1 penalty matching reference gating (`train_utils.py:5-14`)."""
    if model_topo == "fcnn":
        return jnp.asarray(0.0)
    if model_topo == "mcat" and sources == ["omic"]:
        return jnp.asarray(0.0)
    return float(l1) * l1_norm(params)


def count_parameters(params) -> int:
    return sum(int(leaf.size) for leaf in jax.tree_util.tree_leaves(params))


class EarlyStopping:
    """Early stopping on a validation metric with in-memory best-params capture."""

    def __init__(self, patience: int = 5, verbose: bool = False, mode: str = "min"):
        assert mode in ("min", "max"), "Mode must be 'min' or 'max'"
        self.patience = patience
        self.verbose = verbose
        self.mode = mode
        self.counter = 0
        self.best_metric = math.inf if mode == "min" else -math.inf
        self.best_params: Any = None
        self.should_stop = False

    def _improved(self, metric: float) -> bool:
        return metric < self.best_metric if self.mode == "min" else metric > self.best_metric

    def step(self, metric: float, params: Any) -> bool:
        """Record a new metric; returns True once patience is exhausted."""
        metric = float(metric)
        if self._improved(metric):
            if self.verbose:
                print(
                    f"Validation metric improved from {self.best_metric:.4f} to "
                    f"{metric:.4f}. Capturing parameters."
                )
            self.best_metric = metric
            self.counter = 0
            # Deep-copy onto fresh device buffers: train steps donate their
            # parameter buffers (donate_argnums), so merely holding the pytree
            # would reference invalidated storage once the next step runs.
            self.best_params = jax.tree_util.tree_map(jnp.copy, params)
        else:
            self.counter += 1
            if self.verbose:
                print(
                    f"Validation metric did not improve. "
                    f"Patience: {self.counter}/{self.patience}."
                )
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop

    def load_best_weights(self, fallback: Any = None) -> Any:
        if self.best_params is None:
            return fallback
        if self.verbose:
            print(f"Restoring best parameters (metric {self.best_metric:.4f}).")
        return self.best_params
