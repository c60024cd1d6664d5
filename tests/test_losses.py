"""Survival-loss parity vs independently-written torch formulations."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from healnet_tpu.train import (
    ce_loss,
    cox_ph_loss,
    hazards_survival_risk,
    nll_loss,
    nll_loss_from_logits,
)


def _torch_nll(hazards, S, Y, c, weights=None, alpha=0.4, eps=1e-7):
    # torch re-statement of the documented math (`survival_loss.py:9-43`)
    b = Y.shape[0]
    Y = Y.view(b, 1).long()
    c = c.view(b, 1).float()
    S_pad = torch.cat([torch.ones_like(c), S], 1)
    unc = -(1 - c) * (
        torch.log(torch.gather(S_pad, 1, Y).clamp(min=eps))
        + torch.log(torch.gather(hazards, 1, Y).clamp(min=eps))
    )
    cen = -c * torch.log(torch.gather(S_pad, 1, Y + 1).clamp(min=eps))
    neg_l = cen + unc
    if weights is not None:
        w = weights / weights.sum()
        neg_l = neg_l * torch.gather(w.view(1, -1).expand_as(hazards), 1, Y)
    return ((1 - alpha) * neg_l + alpha * unc).mean().item()


def _setup(rng, b=6, k=4):
    logits = rng.normal(size=(b, k)).astype(np.float32)
    hazards = 1 / (1 + np.exp(-logits))
    S = np.cumprod(1 - hazards, axis=1)
    y = rng.integers(0, k, size=b)
    c = rng.integers(0, 2, size=b)
    return logits, hazards, S, y, c


def test_hazards_survival_risk(rng):
    logits, hazards, S, _, _ = _setup(rng)
    h, s, r = hazards_survival_risk(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(h), hazards, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), S, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r), -S.sum(1), rtol=1e-5)


def test_nll_loss_parity(rng):
    _, hazards, S, y, c = _setup(rng)
    ours = float(
        nll_loss(jnp.asarray(hazards), jnp.asarray(S), jnp.asarray(y), jnp.asarray(c))
    )
    ref = _torch_nll(
        torch.tensor(hazards), torch.tensor(S), torch.tensor(y), torch.tensor(c)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_nll_loss_with_class_weights(rng):
    _, hazards, S, y, c = _setup(rng)
    w = np.array([1.0, 2.0, 0.5, 4.0], dtype=np.float32)
    ours = float(
        nll_loss(
            jnp.asarray(hazards),
            jnp.asarray(S),
            jnp.asarray(y),
            jnp.asarray(c),
            weights=jnp.asarray(w),
        )
    )
    ref = _torch_nll(
        torch.tensor(hazards),
        torch.tensor(S),
        torch.tensor(y),
        torch.tensor(c),
        weights=torch.tensor(w),
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_nll_survival_none_computed_internally(rng):
    _, hazards, S, y, c = _setup(rng)
    a = float(nll_loss(jnp.asarray(hazards), None, jnp.asarray(y), jnp.asarray(c)))
    b = float(
        nll_loss(jnp.asarray(hazards), jnp.asarray(S), jnp.asarray(y), jnp.asarray(c))
    )
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_nll_from_logits_matches_manual(rng):
    logits, hazards, S, y, c = _setup(rng)
    ours = float(
        nll_loss_from_logits(jnp.asarray(logits), jnp.asarray(y), jnp.asarray(c), alpha=0.0)
    )
    # alpha=0 -> plain censored NLL
    ref = float(
        nll_loss(jnp.asarray(hazards), jnp.asarray(S), jnp.asarray(y), jnp.asarray(c), alpha=0.0)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_ce_loss_parity(rng):
    _, hazards, S, y, c = _setup(rng)
    b = y.shape[0]
    eps = 1e-7
    ht, St = torch.tensor(hazards), torch.tensor(S)
    yt, ct = torch.tensor(y).view(b, 1).long(), torch.tensor(c).view(b, 1).float()
    S_pad = torch.cat([torch.ones_like(ct), St], 1)
    reg = -(1 - ct) * (
        torch.log(torch.gather(S_pad, 1, yt) + eps)
        + torch.log(torch.gather(ht, 1, yt).clamp(min=eps))
    )
    s_y = torch.gather(St, 1, yt).clamp(min=eps)
    ce_l = -ct * torch.log(s_y) - (1 - ct) * torch.log(1 - s_y)
    ref = ((1 - 0.4) * ce_l + 0.4 * reg).mean().item()
    ours = float(
        ce_loss(jnp.asarray(hazards), jnp.asarray(S), jnp.asarray(y), jnp.asarray(c), alpha=0.4)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cox_loss_against_naive(rng):
    b = 8
    theta = rng.normal(size=b).astype(np.float32)
    times = rng.uniform(1, 100, size=b).astype(np.float32)
    c = rng.integers(0, 2, size=b).astype(np.float32)
    ours = float(cox_ph_loss(jnp.asarray(theta), jnp.asarray(times), jnp.asarray(c)))
    # naive partial likelihood
    total, n_events = 0.0, 0
    for i in range(b):
        if c[i] == 1:
            continue
        risk_set = np.exp(theta[times >= times[i]]).sum()
        total += -(theta[i] - np.log(risk_set))
        n_events += 1
    np.testing.assert_allclose(ours, total / n_events, rtol=1e-5)


def test_cox_loss_differentiable(rng):
    b = 8
    theta = jnp.asarray(rng.normal(size=b).astype(np.float32))
    times = jnp.asarray(rng.uniform(1, 100, size=b).astype(np.float32))
    c = jnp.asarray(rng.integers(0, 2, size=b).astype(np.float32))
    g = jax.grad(lambda t: cox_ph_loss(t, times, c))(theta)
    assert np.isfinite(np.asarray(g)).all()


def test_sample_weight_masking(rng):
    """Padded rows with mask 0 must not affect the loss."""
    _, hazards, S, y, c = _setup(rng, b=6)
    full = float(
        nll_loss(
            jnp.asarray(hazards[:4]), jnp.asarray(S[:4]), jnp.asarray(y[:4]), jnp.asarray(c[:4])
        )
    )
    mask = np.array([1, 1, 1, 1, 0, 0], dtype=np.float32)
    masked = float(
        nll_loss(
            jnp.asarray(hazards),
            jnp.asarray(S),
            jnp.asarray(y),
            jnp.asarray(c),
            sample_weights=jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(masked, full, rtol=1e-6)


def test_cox_loss_padded_rows_masked(rng):
    """Padded duplicate rows with mask 0 must not enter risk sets or events."""
    b = 6
    theta = rng.normal(size=b).astype(np.float32)
    times = rng.uniform(1, 100, size=b).astype(np.float32)
    c = rng.integers(0, 2, size=b).astype(np.float32)
    base = float(cox_ph_loss(jnp.asarray(theta), jnp.asarray(times), jnp.asarray(c)))
    # pad with 2 duplicates of the last row, masked out
    pad = lambda x: np.concatenate([x, np.repeat(x[-1:], 2)])
    mask = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)
    padded = float(
        cox_ph_loss(
            jnp.asarray(pad(theta)), jnp.asarray(pad(times)), jnp.asarray(pad(c)),
            sample_weights=jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(padded, base, rtol=1e-6)
