"""Same-session A/B: pallas backward kernel vs XLA-ops projection backward.

The axon relay's absolute throughput drifts up to ~50% across sessions
(observed within one afternoon: identical brca code measured 0.719 →
0.831 → 1.070 ms), so old-vs-new comparisons are only valid INSIDE one
process. This probe toggles healnet_tpu.ops.fused_project._BWD_KERNEL at
trace time and measures the full training step for the kirp (depth 5) and
brca (depth 2) rows, interleaved A/B/A/B to cancel slow relay drift.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import healnet_tpu.ops.fused_project as fp
from healnet_tpu.models import HealNetModule
from healnet_tpu.train import make_optimizer
from healnet_tpu.train.losses import survival_loss
from healnet_tpu.utils.train_utils import l1_norm

BATCH, PATCHES, OMIC_D, PATCH_D, OUT_DIMS = 8, 4096, 2000, 2048, 4
ROWS = {
    "kirp": dict(
        depth=5, l_c=17, l_d=62, cross_dim_head=27, latent_dim_head=113,
        attn_dropout=0.31789955176609086, ff_dropout=0.04735283995174411,
    ),
    "brca": dict(
        depth=2, l_c=17, l_d=126, cross_dim_head=63, latent_dim_head=20,
        attn_dropout=0.083, ff_dropout=0.473,
    ),
}


def t_min(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def build(row):
    return HealNetModule(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D), num_spatial_axes=(1, 1),
        out_dims=OUT_DIMS, num_freq_bands=2, max_freq=2.0, x_heads=1, l_heads=8,
        self_per_cross_attn=0, snn=True, dtype=jnp.bfloat16,
        attention_impl="auto", **ROWS[row],
    )


def make_loop(module, batch, bwd_kernel):
    fp._BWD_KERNEL = bwd_kernel  # read at TRACE time
    params = module.init(jax.random.PRNGKey(0), batch["tensors"])["params"]
    opt = make_optimizer(8e-3, total_steps=1000)
    opt_state = opt.init(params)

    def loss_fn(p, key):
        logits = module.apply(
            {"params": p}, batch["tensors"], deterministic=False,
            rngs={"dropout": key},
        )
        surv, _ = survival_loss(logits.astype(jnp.float32), batch, loss_type="nll")
        return surv / 16.0 + 1e-6 * l1_norm(p)

    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def loop(params, opt_state, batch_, n):
        def body(i, carry):
            p, s, _ = carry
            return train_step(p, s, jax.random.fold_in(jax.random.PRNGKey(0), i))
        return jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))

    out = loop(params, opt_state, batch, 2)  # compile + warm with flag set
    [float(x) for x in jax.tree_util.tree_leaves(out) if x.ndim == 0][:1]
    fp._BWD_KERNEL = True
    return loop, (params, opt_state, batch)


def measure(loop, args, iters=60):
    def run(n):
        out = loop(*args, n)
        [float(x) for x in jax.tree_util.tree_leaves(out) if x.ndim == 0][:1]
    base = t_min(lambda: run(1))
    return (t_min(lambda: run(1 + iters)) - base) / iters


def main():
    rng = np.random.default_rng(0)
    batch = {
        "tensors": (
            jnp.asarray(rng.normal(size=(BATCH, 1, OMIC_D)), dtype=jnp.bfloat16),
            jnp.asarray(rng.normal(size=(BATCH, PATCHES, PATCH_D)), dtype=jnp.bfloat16),
        ),
        "y_disc": jnp.asarray(rng.integers(0, OUT_DIMS, size=BATCH), dtype=jnp.int32),
        "censorship": jnp.asarray(rng.integers(0, 2, size=BATCH), dtype=jnp.float32),
        "event_time": jnp.asarray(rng.uniform(1, 100, size=BATCH), dtype=jnp.float32),
        "sample_mask": jnp.ones(BATCH, dtype=jnp.float32),
    }
    results = {}
    for row in ("kirp", "brca"):
        module = build(row)
        loops = {}
        for bwd in (False, True):
            loops[bwd] = make_loop(module, batch, bwd)
        # interleaved rounds: drift shows up as disagreement between rounds
        for rnd in range(2):
            for bwd in (False, True):
                dt = measure(*loops[bwd])
                tag = f"{row}_{'kernel' if bwd else 'xlabwd'}_r{rnd}"
                results[tag + "_ms"] = round(dt * 1e3, 4)
                print(f"{tag}: {dt*1e3:.3f} ms ({BATCH/dt:.0f} samples/s)",
                      flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
