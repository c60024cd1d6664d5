"""Run-for-run training parity vs the Torch reference.

Trains the reference HealNet (Torch, imported from /root/reference) and our
Flax rebuild side by side from IDENTICAL initial weights, with the identical
recipe — fixed batch order, NLL survival loss with the reference's
``surv_loss / 16`` scaling (`/root/reference/healnet/main.py:463`), L1
regularisation, Adam + OneCycleLR stepped per batch with beta1 cycling —
and asserts the loss trajectories and final parameters stay matched.

This substantiates the c-index-parity claim at the training-dynamics level,
which the logits-only parity tests cannot (BASELINE.md target: "match Torch
reference run-for-run").
"""

import importlib.util
import math
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from healnet_tpu.compat import params_from_torch_state_dict
from healnet_tpu.models import HealNetModule
from healnet_tpu.train.losses import nll_loss as jax_nll, hazards_survival_risk
from healnet_tpu.train.schedule import make_optimizer
from healnet_tpu.utils.train_utils import l1_norm

REF_PATH = "/root/reference/healnet/models/healnet.py"

HP = dict(
    n_modalities=2,
    channel_dims=[23, 11],
    num_spatial_axes=[1, 1],
    out_dims=4,
    depth=1,
    l_c=4,
    l_d=16,
    x_heads=1,
    l_heads=2,
    cross_dim_head=8,
    latent_dim_head=8,
    self_per_cross_attn=0,
    snn=True,
)
B, N_STEPS, MAX_LR, L1, GC = 8, 12, 2e-3, 1e-5, 16.0


@pytest.fixture(scope="module")
def ref_healnet():
    spec = importlib.util.spec_from_file_location("ref_healnet_train", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_healnet_train"] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_nll(hazards, S, y, c, alpha=0.4, eps=1e-7):
    b = y.shape[0]
    y = y.view(b, 1).long()
    c = c.view(b, 1).float()
    S_pad = torch.cat([torch.ones_like(c), S], 1)
    unc = -(1 - c) * (
        torch.log(torch.gather(S_pad, 1, y).clamp(min=eps))
        + torch.log(torch.gather(hazards, 1, y).clamp(min=eps))
    )
    cen = -c * torch.log(torch.gather(S_pad, 1, y + 1).clamp(min=eps))
    return ((1 - alpha) * (cen + unc) + alpha * unc).mean()


def test_training_trajectory_parity(ref_healnet, rng):
    # ---- shared data, fixed batch order
    n = B * (N_STEPS // 3)
    tab = rng.normal(size=(n, 1, 23)).astype(np.float32)
    wsi = rng.normal(size=(n, 7, 11)).astype(np.float32)
    y = rng.integers(0, 4, size=n).astype(np.int64)
    c = rng.integers(0, 2, size=n).astype(np.float32)
    order = np.concatenate([rng.permutation(n) for _ in range(3)])
    batches = [order[i * B : (i + 1) * B] for i in range(N_STEPS)]

    # ---- torch side: reference model + reference recipe
    torch.manual_seed(0)
    tm = ref_healnet.HealNet(**HP)
    tm.train()
    topt = torch.optim.Adam(tm.parameters(), lr=MAX_LR / 25)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        topt, max_lr=MAX_LR, total_steps=N_STEPS
    )
    torch_losses = []
    for sel in batches:
        topt.zero_grad()
        logits = tm([torch.tensor(tab[sel]), torch.tensor(wsi[sel])])
        hz = torch.sigmoid(logits)
        S = torch.cumprod(1 - hz, dim=1)
        surv = _torch_nll(hz, S, torch.tensor(y[sel]), torch.tensor(c[sel]))
        l1 = sum(p.abs().sum() for p in tm.parameters())
        (surv / GC + L1 * l1).backward()
        topt.step()
        tsched.step()
        torch_losses.append(float(surv))

    # ---- jax side: identical initial weights + identical recipe
    jm = HealNetModule(
        n_modalities=2,
        channel_dims=(23, 11),
        num_spatial_axes=(1, 1),
        out_dims=4,
        depth=1, l_c=4, l_d=16, x_heads=1, l_heads=2,
        cross_dim_head=8, latent_dim_head=8, self_per_cross_attn=0, snn=True,
    )
    torch.manual_seed(0)
    ref_init = ref_healnet.HealNet(**HP)
    params = jax.tree_util.tree_map(
        jnp.asarray, params_from_torch_state_dict(ref_init.state_dict(), jm)
    )
    opt = make_optimizer(MAX_LR, N_STEPS, cycle_momentum=True)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            logits = jm.apply({"params": p}, batch["tensors"])
            hz, S, _ = hazards_survival_risk(logits)
            surv = jax_nll(hz, S, batch["y"], batch["c"])
            return surv / GC + L1 * l1_norm(p), surv

        (_, surv), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, surv

    jax_losses = []
    for sel in batches:
        batch = {
            "tensors": (jnp.asarray(tab[sel]), jnp.asarray(wsi[sel])),
            "y": jnp.asarray(y[sel]),
            "c": jnp.asarray(c[sel]),
        }
        params, opt_state, surv = step(params, opt_state, batch)
        jax_losses.append(float(surv))

    # step-0 losses identical (same weights, same data)
    np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=1e-5)
    # trajectories track each other closely across all steps
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-2, atol=2e-3)
    # both actually learned
    assert jax_losses[-1] < jax_losses[0]
    assert torch_losses[-1] < torch_losses[0]

    # final parameters stay matched (optimizer-dynamics parity): drift after
    # N steps must stay well under a single step's update magnitude (~max_lr),
    # and the global relative L2 across all parameters under 1%.
    final_torch = params_from_torch_state_dict(tm.state_dict(), jm)
    diffs, ours_all, theirs_all = [], [], []
    for path, ours in jax.tree_util.tree_leaves_with_path(params):
        theirs = final_torch
        for k in path:
            theirs = theirs[k.key]
        diffs.append(np.abs(np.asarray(ours) - theirs).ravel())
        ours_all.append(np.asarray(ours).ravel())
        theirs_all.append(np.asarray(theirs).ravel())
    diffs = np.concatenate(diffs)
    theirs_all = np.concatenate(theirs_all)
    assert diffs.max() < 5e-3, f"max abs param drift {diffs.max():.5f}"
    rel_l2 = np.linalg.norm(diffs) / np.linalg.norm(theirs_all)
    assert rel_l2 < 0.01, f"global relative L2 drift {rel_l2:.5f}"
