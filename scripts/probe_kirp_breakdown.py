"""Where do kirp's 0.22 ms/fusion-layer go? Ablation probe on the real chip.

Round-4 depth probe pinned kirp (depth 5) at ~0.22 ms per fusion layer of
latent-side work over a ~0.25 ms context base (BENCH_NOTES.md). This probe
decomposes that increment: fwd vs bwd, dropout on/off, FF vs attention,
optimizer, and an op-dispatch floor microbench (N chained tiny matmuls) to
separate per-kernel overhead from actual compute/memory time.

Timing methodology identical to bench.py: steps chained through carried
state inside ONE jitted fori_loop, scalar-readback fence, min over
repetitions of each run length separately, mins differenced.
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
KIRP = dict(
    depth=5, l_c=17, l_d=62, cross_dim_head=27, latent_dim_head=113,
    attn_dropout=0.31789955176609086, ff_dropout=0.04735283995174411,
)


def t_min(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure_loop(loop, args, iters=60, reps=5):
    """Per-iteration seconds of jitted loop(*args, n) with scalar readback."""
    def run(n):
        out = loop(*args, n)
        jax.tree_util.tree_map(
            lambda x: None,
            [float(x) for x in jax.tree_util.tree_leaves(out) if x.ndim == 0][:1],
        )
    # warmup/compile
    run(2)
    return (t_min(lambda: run(1 + iters)) - t_min(lambda: run(1))) / iters


def make_step(module, batch, fwd_only=False, with_opt=True, deterministic=False):
    params = module.init(jax.random.PRNGKey(0), batch["tensors"])["params"]
    opt = make_optimizer(8e-3, total_steps=1000)
    opt_state = opt.init(params)

    def loss_fn(p, key):
        logits = module.apply(
            {"params": p}, batch["tensors"], deterministic=deterministic,
            rngs={"dropout": key} if not deterministic else {},
        )
        surv, _ = survival_loss(logits.astype(jnp.float32), batch, loss_type="nll")
        return surv / 16.0 + 1e-6 * l1_norm(p)

    if fwd_only:
        @jax.jit
        def loop(params, opt_state, batch_, n):
            def body(i, carry):
                p, s, acc = carry
                l = loss_fn(p, jax.random.fold_in(jax.random.PRNGKey(0), i))
                return p, s, acc + l
            return jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))
    else:
        def train_step(params, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, key)
            if with_opt:
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            else:
                params = jax.tree_util.tree_map(
                    lambda p, g: p - 1e-9 * g.astype(p.dtype), params, grads
                )
            return params, opt_state, loss

        @jax.jit
        def loop(params, opt_state, batch_, n):
            def body(i, carry):
                p, s, _ = carry
                return train_step(p, s, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))

    return loop, (params, opt_state, batch)


def build(batch_tensors_extra=None, **overrides):
    kw = dict(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D), num_spatial_axes=(1, 1),
        out_dims=OUT_DIMS, num_freq_bands=2, max_freq=2.0, x_heads=1, l_heads=8,
        self_per_cross_attn=0, snn=True, dtype=jnp.bfloat16, attention_impl="auto",
        **KIRP,
    )
    kw.update(overrides)
    return HealNetModule(**kw)


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

    def probe(name, module, **kw):
        loop, args = make_step(module, batch, **kw)
        dt = measure_loop(loop, args)
        results[name] = round(dt * 1e3, 4)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)

    probe("kirp_full", build())                              # baseline fwd+bwd+opt
    probe("kirp_fwd_only", build(), fwd_only=True)
    probe("kirp_no_opt", build(), with_opt=False)            # fwd+bwd, trivial update
    probe("kirp_no_dropout", build(attn_dropout=0.0, ff_dropout=0.0))
    probe("kirp_det_fwd", build(), fwd_only=True, deterministic=True)
    probe("kirp_depth2", build(depth=2))
    probe("kirp_depth2_fwd", build(depth=2), fwd_only=True)

    # ---- dispatch-floor microbench: N chained LN+matmul rounds over the
    # latent-sized tensor. Each round = LayerNorm + (17x62)@(62x62) matmul +
    # residual; measures the per-tiny-fused-op wall cost when nothing else
    # is in flight.
    x0 = jnp.asarray(rng.normal(size=(BATCH, 17, 62)), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(62, 62)) * 0.01, dtype=jnp.bfloat16)

    def round_fn(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
        xh = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
        return x + xh @ w

    for n_rounds in (16, 64):
        @jax.jit
        def chain_loop(x, n, n_rounds=n_rounds):
            def body(i, x):
                for _ in range(n_rounds):
                    x = round_fn(x)
                return x * (1.0 + 1e-30 * i)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x))

        def runner(n):
            return float(chain_loop(x0, n))
        runner(2)
        dt = (t_min(lambda: runner(61)) - t_min(lambda: runner(1))) / 60
        per_round = dt / n_rounds * 1e6
        results[f"chain_{n_rounds}_per_round_us"] = round(per_round, 3)
        print(f"chain of {n_rounds} LN+matmul rounds: {per_round:.2f} us/round", flush=True)

    # ---- HLO fusion counts for the full kirp step vs depth 2
    for name, module in (("kirp5", build()), ("kirp2", build(depth=2))):
        loop, args = make_step(module, batch)
        txt = jax.jit(loop.__wrapped__).lower(*args, 1).compile().as_text()
        n_fus = txt.count(" fusion(")
        n_call = txt.count(" custom-call(")
        results[f"hlo_{name}_fusions"] = n_fus
        results[f"hlo_{name}_custom_calls"] = n_call
        print(f"{name}: {n_fus} fusions, {n_call} custom-calls", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
