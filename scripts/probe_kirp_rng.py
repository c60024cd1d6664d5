"""Quantify the per-site RNG-derivation cost in the kirp-5 train step.

probe_kirp_kernels.py's census attributed ~77% of the depth-5 step's
top-level HLO ops (3,584 of 4,648) to threefry scalar chains — the
add/xor/shift-left/shift-right/or signature of `jax.random.fold_in`
(flax `make_rng` path folding) plus `jax.random.bits` per dropout site,
NOT the latent-chain matmuls the depth probe originally blamed. This
probe isolates that cost: compile the identical step with dropout rates
zeroed (no make_rng calls traced) and compare kernel count + median
step time against the trained configuration.

Usage: python scripts/probe_kirp_rng.py [--depth 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from healnet_tpu.models import HealNetModule
from healnet_tpu.train import make_optimizer
from healnet_tpu.train.losses import survival_loss
from healnet_tpu.utils.train_utils import l1_norm

BATCH, PATCHES, OMIC_D, PATCH_D, OUT_DIMS = 8, 4096, 2000, 2048, 4
KIRP = dict(l_c=17, l_d=62, cross_dim_head=27, latent_dim_head=113)
RATES = dict(attn_dropout=0.31789955176609086, ff_dropout=0.04735283995174411)


def build(depth, dropout):
    rates = RATES if dropout else dict(attn_dropout=0.0, ff_dropout=0.0)
    return HealNetModule(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D), num_spatial_axes=(1, 1),
        out_dims=OUT_DIMS, num_freq_bands=2, max_freq=2.0, x_heads=1, l_heads=8,
        self_per_cross_attn=0, snn=True, dtype=jnp.bfloat16,
        attention_impl="auto", depth=depth, **KIRP, **rates,
    )


def make_loop(module, batch):
    params = module.init(jax.random.PRNGKey(0), batch["tensors"])["params"]
    opt = make_optimizer(8e-3, total_steps=1000)
    opt_state = opt.init(params)

    def train_step(params, opt_state, batch, key):
        def loss_fn(p):
            logits = module.apply(
                {"params": p}, batch["tensors"], deterministic=False,
                rngs={"dropout": key},
            )
            surv, _ = survival_loss(logits.astype(jnp.float32), batch, loss_type="nll")
            return surv / 16.0 + 1e-6 * l1_norm(p)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # bench.py methodology: chain steps inside ONE dispatched fori_loop
    # (block_until_ready does not fence the axon relay; a scalar readback
    # does), and difference the MIN of (1+N)-step vs 1-step dispatches.
    @jax.jit
    def loop(params, opt_state, batch, n):
        def body(i, carry):
            params, opt_state, _ = carry
            return train_step(
                params, opt_state, batch,
                jax.random.fold_in(jax.random.PRNGKey(0), i),
            )
        return jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))

    return loop, params, opt_state


def step_ms(loop, params, opt_state, batch, iters=80, reps=5):
    p, s, loss = loop(params, opt_state, batch, 2)
    float(loss)

    def t_min(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, _, loss = loop(p, s, batch, n)
            float(loss)
            best = min(best, time.perf_counter() - t0)
        return best

    return (t_min(1 + iters) - t_min(1)) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    tensors = (
        jnp.asarray(rng.normal(size=(BATCH, 1, OMIC_D)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(BATCH, PATCHES, PATCH_D)), jnp.bfloat16),
    )
    batch = {
        "tensors": tensors,
        "y_disc": jnp.asarray(rng.integers(0, OUT_DIMS, size=BATCH), jnp.int32),
        "censorship": jnp.asarray(rng.integers(0, 2, size=BATCH), jnp.float32),
        "event_time": jnp.asarray(rng.uniform(1, 100, size=BATCH), jnp.float32),
        "sample_mask": jnp.ones(BATCH, jnp.float32),
    }

    for label, dropout in (("dropout ON (trained rates)", True),
                           ("dropout OFF", False)):
        loop, params, opt_state = make_loop(build(args.depth, dropout), batch)
        ms = step_ms(loop, params, opt_state, batch, args.iters)
        print(f"{label:28s} {ms:.3f} ms/step")


if __name__ == "__main__":
    main()
