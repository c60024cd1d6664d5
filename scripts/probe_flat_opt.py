"""Flat-parameter optimizer probe: does fusion-count overhead explain kirp?

probe_kirp_breakdown.py found the kirp (depth 5) step compiles to 865
fusions vs 400 at depth 2, while a chained tiny LN+matmul round costs only
~0.3 us — the per-layer cost is op-count overhead, not compute. The largest
op-count producer is per-leaf Adam (~130 param leaves at depth 5, untied).
This probe measures the SAME training step with:

  a. pytree Adam (current make_optimizer)        — baseline
  b. optax.flatten(make_optimizer(...))          — one flat vector for
     mu/nu/updates; concat/unravel at the update boundary

for the kirp row and the flagship brca row, in ONE session (relay drift
cancels within a session), plus HLO fusion counts for each variant.
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


def make_loop(module, batch, flat, flat_l1=False):
    params = module.init(jax.random.PRNGKey(0), batch["tensors"])["params"]
    opt = make_optimizer(8e-3, total_steps=1000, flatten=flat)
    opt_state = opt.init(params)

    if flat_l1:
        # one abs-sum over the ravelled vector: the per-leaf abs/sum fwd ops
        # and per-leaf sign bwd ops collapse to a single fused chain (+ the
        # concat and its slice-cotangents)
        from jax.flatten_util import ravel_pytree

        def l1(p):
            return jnp.sum(jnp.abs(ravel_pytree(p)[0]))
    else:
        l1 = l1_norm

    def loss_fn(p, key):
        logits = module.apply(
            {"params": p}, batch["tensors"], deterministic=False,
            rngs={"dropout": key},
        )
        surv, _ = survival_loss(logits.astype(jnp.float32), batch, loss_type="nll")
        return surv / 16.0 + 1e-6 * l1(p)

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

    return loop, (params, opt_state, batch)


def measure(loop, args, iters=60):
    def run(n):
        out = loop(*args, n)
        [float(x) for x in jax.tree_util.tree_leaves(out) if x.ndim == 0][:1]
    run(2)
    return (t_min(lambda: run(1 + iters)) - t_min(lambda: run(1))) / iters


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
    combos = {
        "kirp": ((False, False), (True, False), (False, True), (True, True)),
        "brca": ((False, False), (True, True)),
    }
    for row in ("kirp", "brca"):
        module = build(row)
        for flat, flat_l1 in combos[row]:
            tag = (f"{row}_{'flat' if flat else 'pytree'}"
                   f"{'_flatl1' if flat_l1 else ''}")
            loop, args = make_loop(module, batch, flat, flat_l1)
            dt = measure(loop, args)
            results[tag + "_ms"] = round(dt * 1e3, 4)
            results[tag + "_sps"] = round(BATCH / dt, 1)
            txt = jax.jit(loop.__wrapped__).lower(*args, 1).compile().as_text()
            results[tag + "_fusions"] = txt.count(" fusion(")
            print(f"{tag}: {dt*1e3:.3f} ms ({BATCH/dt:.0f} samples/s), "
                  f"{results[tag + '_fusions']} fusions", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
