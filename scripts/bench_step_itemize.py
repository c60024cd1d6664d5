"""Itemize the flagship training step: fwd-only vs fwd+bwd vs full step.

Differences of chained-loop timings isolate (a) the forward, (b) the
backward increment, (c) the optimizer increment, at the tuned-BRCA bench
shape (bench.py), dropout ON. Relay-safe methodology: chain iterations
through a carry inside ONE jitted fori_loop, close with a scalar
readback, min over repetitions, difference the mins (BENCH_NOTES.md).
"""

import json
import time

import numpy as np

BATCH, OMIC_D, PATCHES, PATCH_D, OUT_DIMS = 8, 2000, 4096, 2048, 4
WARMUP, ITERS = 3, 64


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from healnet_tpu.models import HealNetModule
    from healnet_tpu.train import make_optimizer
    from healnet_tpu.train.losses import survival_loss
    from healnet_tpu.utils.train_utils import l1_norm

    module = HealNetModule(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D),
        num_spatial_axes=(1, 1), out_dims=OUT_DIMS, depth=2,
        num_freq_bands=2, max_freq=2.0, l_c=17, l_d=126, x_heads=1,
        l_heads=8, cross_dim_head=63, latent_dim_head=20,
        self_per_cross_attn=0, snn=True, attn_dropout=0.083,
        ff_dropout=0.473, dtype=jnp.bfloat16, attention_impl="auto",
    )
    rng = np.random.default_rng(0)
    batch = {
        "tensors": (
            jnp.asarray(rng.normal(size=(BATCH, 1, OMIC_D)), jnp.bfloat16),
            jnp.asarray(
                rng.normal(size=(BATCH, PATCHES, PATCH_D)), jnp.bfloat16
            ),
        ),
        "y_disc": jnp.asarray(
            rng.integers(0, OUT_DIMS, size=BATCH), jnp.int32
        ),
        "censorship": jnp.asarray(
            rng.integers(0, 2, size=BATCH), jnp.float32
        ),
        "event_time": jnp.asarray(
            rng.uniform(1, 100, size=BATCH), jnp.float32
        ),
        "sample_mask": jnp.ones(BATCH, jnp.float32),
    }
    params = module.init(jax.random.PRNGKey(0), batch["tensors"])["params"]
    opt = make_optimizer(8e-3, total_steps=1000)
    opt_state = opt.init(params)

    def loss_fn(p, batch, key):
        logits = module.apply(
            {"params": p}, batch["tensors"], deterministic=False,
            rngs={"dropout": key},
        )
        surv, _ = survival_loss(
            logits.astype(jnp.float32), batch, loss_type="nll"
        )
        return surv / 16.0 + 1e-6 * l1_norm(p)

    # ---- three chained loops; each carries just enough state ----------
    @jax.jit
    def loop_fwd(params, batch, n):
        def body(i, acc):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            # perturb params by the carried scalar so the fwd can't hoist
            p = jax.tree_util.tree_map(lambda x: x + acc * 1e-30, params)
            return loss_fn(p, batch, key)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @jax.jit
    def loop_grad(params, batch, n):
        def body(i, carry):
            params, _ = carry
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            params = jax.tree_util.tree_map(
                lambda p, g: p - 1e-9 * g, params, grads
            )
            return params, loss
        return jax.lax.fori_loop(0, n, body, (params, jnp.float32(0)))

    @jax.jit
    def loop_step(params, opt_state, batch, n):
        def body(i, carry):
            params, opt_state, _ = carry
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0))
        )

    def readback(out):
        leaf = out[-1] if isinstance(out, tuple) else out
        return float(leaf)

    runs = {
        "fwd": lambda n: loop_fwd(params, batch, n),
        "fwd+bwd": lambda n: loop_grad(params, batch, n),
        "full_step": lambda n: loop_step(params, opt_state, batch, n),
    }
    report = {}
    for name, fn in runs.items():
        readback(fn(WARMUP))  # compile + warm

        def t_min(n, reps=5):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                readback(fn(n))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (t_min(1 + ITERS) - t_min(1)) / ITERS
        report[name] = dt * 1e3
        print(f"{name:>10}: {dt*1e3:.3f} ms/iter", flush=True)

    report["bwd_increment_ms"] = report["fwd+bwd"] - report["fwd"]
    report["opt_increment_ms"] = report["full_step"] - report["fwd+bwd"]
    report["samples_per_sec"] = BATCH / (report["full_step"] / 1e3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
