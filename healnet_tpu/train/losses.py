"""Survival losses: discrete-time NLL, CE-survival, Cox PH.

Numerical-parity re-implementations of the reference loss module
(`/root/reference/healnet/models/survival_loss.py`):

- :func:`nll_loss` — discrete-time negative log-likelihood with censoring,
  optional class weights, and the alpha-blend between full and uncensored terms
  (`survival_loss.py:9-43`);
- :func:`nll_loss_from_logits` — the Zadeh & Schmid form taking raw logits
  (`survival_loss.py:45-93`);
- :func:`ce_loss` / :class:`CrossEntropySurvLoss` (`survival_loss.py:96-130`);
- :func:`cox_ph_loss` / :class:`CoxPHSurvLoss` — a *working*, fully vectorised
  Cox partial likelihood. The reference version (`survival_loss.py:133-165`)
  builds the risk-set matrix with an O(n²) Python loop and references an
  undefined ``device`` — it crashes if ever called and is unreachable from the
  pipeline; here the risk set is a single broadcast comparison and the
  normaliser a log-sum-exp, so it jits and differentiates.

All functions are pure jnp and safe under ``jax.jit`` / ``jax.grad``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def hazards_survival_risk(logits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """hazards = sigmoid(logits); survival = cumprod(1 - h); risk = -sum(S).

    The per-batch chain used throughout the reference train loop
    (`/root/reference/healnet/main.py:434-437`).
    """
    hazards = jax.nn.sigmoid(logits)
    survival = jnp.cumprod(1.0 - hazards, axis=1)
    risk = -jnp.sum(survival, axis=1)
    return hazards, survival, risk


def _gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row-wise gather: x (b, k), idx (b, 1) -> (b, 1)."""
    return jnp.take_along_axis(x, idx, axis=1)


def nll_loss(
    hazards: jnp.ndarray,
    survival: Optional[jnp.ndarray],
    y_disc: jnp.ndarray,
    censorship: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    alpha: float = 0.4,
    eps: float = 1e-7,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Discrete-time survival NLL (`survival_loss.py:9-43`).

    Args:
        hazards: (b, n_bins) sigmoid outputs.
        survival: (b, n_bins) cumprod(1 - hazards) or None to compute here.
        y_disc: (b,) int ground-truth time-bin index.
        censorship: (b,) 0/1 censoring indicator (1 = censored).
        weights: optional (n_bins,) class weights (normalised internally).
        alpha: blend factor for the uncensored-only term.
        sample_weights: optional (b,) 0/1 mask for padded batch rows; the mean
            is then taken over real rows only (TPU static-batch support).
    """
    b = hazards.shape[0]
    y = y_disc.reshape(b, 1).astype(jnp.int32)
    c = censorship.reshape(b, 1).astype(hazards.dtype)
    if survival is None:
        survival = jnp.cumprod(1.0 - hazards, axis=1)
    s_padded = jnp.concatenate([jnp.ones_like(c), survival], axis=1)

    uncensored = -(1.0 - c) * (
        jnp.log(jnp.clip(_gather(s_padded, y), min=eps))
        + jnp.log(jnp.clip(_gather(hazards, y), min=eps))
    )
    censored = -c * jnp.log(jnp.clip(_gather(s_padded, y + 1), min=eps))
    neg_l = censored + uncensored
    if weights is not None:
        w = weights / jnp.sum(weights)
        neg_l = neg_l * _gather(jnp.broadcast_to(w.reshape(1, -1), hazards.shape), y)

    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    return _reduce_mean(loss, sample_weights)


def nll_loss_from_logits(
    logits: jnp.ndarray,
    y_disc: jnp.ndarray,
    censorship: jnp.ndarray,
    alpha: float = 0.0,
    eps: float = 1e-7,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Zadeh & Schmid (2020) discrete NLL from raw logits (`survival_loss.py:45-93`)."""
    b = logits.shape[0]
    y = y_disc.reshape(b, 1).astype(jnp.int32)
    c = censorship.reshape(b, 1).astype(logits.dtype)
    hazards = jax.nn.sigmoid(logits)
    survival = jnp.cumprod(1.0 - hazards, axis=1)
    s_padded = jnp.concatenate([jnp.ones_like(c), survival], axis=1)

    s_prev = jnp.clip(_gather(s_padded, y), min=eps)
    h_this = jnp.clip(_gather(hazards, y), min=eps)
    s_this = jnp.clip(_gather(s_padded, y + 1), min=eps)

    uncensored = -(1.0 - c) * (jnp.log(s_prev) + jnp.log(h_this))
    censored = -c * jnp.log(s_this)
    loss = (1.0 - alpha) * (censored + uncensored) + alpha * uncensored
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"Bad input for reduction: {reduction}")


def ce_loss(
    hazards: jnp.ndarray,
    survival: Optional[jnp.ndarray],
    y_disc: jnp.ndarray,
    censorship: jnp.ndarray,
    alpha: float = 0.4,
    eps: float = 1e-7,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross-entropy survival loss (`survival_loss.py:106-130`)."""
    b = hazards.shape[0]
    y = y_disc.reshape(b, 1).astype(jnp.int32)
    c = censorship.reshape(b, 1).astype(hazards.dtype)
    if survival is None:
        survival = jnp.cumprod(1.0 - hazards, axis=1)
    s_padded = jnp.concatenate([jnp.ones_like(c), survival], axis=1)

    # note: first log adds eps (not clamp) — matches the reference exactly
    reg = -(1.0 - c) * (
        jnp.log(_gather(s_padded, y) + eps)
        + jnp.log(jnp.clip(_gather(hazards, y), min=eps))
    )
    # two-sided clip: s_y == 1.0 (hazard underflow for a confident
    # low-risk sample) would make log(1 - s_y) = -inf and NaN the grads
    s_y = jnp.clip(_gather(survival, y), min=eps, max=1.0 - eps)
    ce_l = -c * jnp.log(s_y) - (1.0 - c) * jnp.log(1.0 - s_y)
    loss = (1.0 - alpha) * ce_l + alpha * reg
    return _reduce_mean(loss, sample_weights)


class CrossEntropySurvLoss:
    """Callable wrapper matching the reference class (`survival_loss.py:96-104`)."""

    def __init__(self, alpha: float = 0.15):
        self.alpha = alpha

    def __call__(self, hazards, survival, y_disc, censorship, alpha=None):
        a = self.alpha if alpha is None else alpha
        return ce_loss(hazards, survival, y_disc, censorship, alpha=a)


def cox_ph_loss(
    risk_scores: jnp.ndarray,
    order_values: jnp.ndarray,
    censorship: jnp.ndarray,
    sample_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Vectorised Cox proportional-hazards partial likelihood.

    ``loss = -sum_i((theta_i - log sum_{j in R_i} exp(theta_j)) * event_i)
    / max(n_events, 1)`` — normalised by the EVENT count, not the batch
    size (aggregating per-batch values therefore needs events-per-batch
    weights; see `train/loop.py` evaluate()). Risk set
    ``R_i = {j : order_values[j] >= order_values[i]}`` — the
    broadcast-comparison equivalent of the reference's O(n²) Python loop
    (`survival_loss.py:155-164`), with the normaliser computed as a
    numerically-stable masked log-sum-exp.

    Args:
        risk_scores: (b,) log-risk (theta).
        order_values: (b,) values that order the risk sets — event times if
            available; the reference orders by survival (its proxy for time).
        censorship: (b,) 0/1; events are ``1 - censorship``.
        sample_weights: optional (b,) 0/1 padding mask.
    """
    theta = risk_scores.reshape(-1)
    ov = order_values.reshape(-1)
    events = (1.0 - censorship.reshape(-1)).astype(theta.dtype)

    in_risk_set = ov[None, :] >= ov[:, None]  # (b, b): j in R_i
    if sample_weights is not None:
        in_risk_set = jnp.logical_and(in_risk_set, sample_weights[None, :] > 0)
        events = events * sample_weights

    neg_inf = jnp.finfo(theta.dtype).min / 2
    masked_theta = jnp.where(in_risk_set, theta[None, :], neg_inf)
    log_denom = jax.nn.logsumexp(masked_theta, axis=1)
    per_sample = -(theta - log_denom) * events
    denom = jnp.maximum(jnp.sum(events), 1.0)
    return jnp.sum(per_sample) / denom


class CoxPHSurvLoss:
    """Callable wrapper with the reference signature (`survival_loss.py:133-165`).

    The reference orders risk sets by the survival estimates themselves
    (``R_mat[i, j] = survival[j] >= survival[i]``); we reproduce that ordering
    by using total predicted survival as the ordering value, and use
    ``theta = -sum(survival)`` (the pipeline's risk score, `main.py:437`) as
    the log-risk — a working, differentiable stand-in for the reference's
    broken implementation.
    """

    def __call__(
        self, hazards, survival, censorship, event_time=None,
        sample_weights=None, **_,
    ):
        total_survival = jnp.sum(survival, axis=1)
        theta = -total_survival
        order_values = event_time if event_time is not None else total_survival
        return cox_ph_loss(
            theta, order_values, censorship, sample_weights=sample_weights
        )


def survival_loss(
    logits: jnp.ndarray,
    batch,
    loss_type: str = "nll",
    alpha: float = 0.4,
    class_weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Loss-switch used by the train loops (`main.py:439-448`).

    Args:
        batch: mapping with "y_disc", "censorship", "event_time", and optional
            "sample_mask" (padded-row mask).

    Returns:
        (scalar loss, per-sample risk scores).
    """
    hazards, survival, risk = hazards_survival_risk(logits)
    sw = batch.get("sample_mask")
    if loss_type == "nll":
        loss = nll_loss(
            hazards, survival, batch["y_disc"], batch["censorship"],
            weights=class_weights, alpha=alpha, sample_weights=sw,
        )
    elif loss_type == "ce_survival":
        loss = ce_loss(
            hazards, survival, batch["y_disc"], batch["censorship"],
            alpha=0.15, sample_weights=sw,
        )
    elif loss_type == "cox":
        # theta IS the returned risk score (risk = -sum(survival))
        loss = cox_ph_loss(
            risk, batch["event_time"], batch["censorship"], sample_weights=sw,
        )
    else:
        raise ValueError(f"unknown loss_type {loss_type}")
    return loss, risk


def _reduce_mean(per_sample: jnp.ndarray, sample_weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if sample_weights is None:
        return jnp.mean(per_sample)
    w = sample_weights.reshape(per_sample.shape[0], *([1] * (per_sample.ndim - 1)))
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
