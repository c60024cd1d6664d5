"""Micro-benchmark: flash vs XLA attention WITH dropout on TPU.

VERDICT r2 weak #3: the flash kernel's win regime (lq >= 64) excluded every
tuned config (cross_heads 1, 17-32 latents). With attention-prob dropout the
XLA path additionally materialises the bernoulli keep mask in HBM while the
flash kernel hashes it in-register — this script measures where the
break-even actually sits with dropout on, to calibrate the `auto` heuristic
(`models/layers.py _should_use_flash`) with numbers instead of guesses.

Timing per the relay rules (BENCH_NOTES.md): chained steps inside one jitted
fori_loop closed by a scalar readback; min over repetitions.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from healnet_tpu.ops.attention import multihead_attention
from healnet_tpu.ops.flash_attention import flash_cross_attention
from healnet_tpu.ops.hash_dropout import seed_from_rng

B, H, D = 8, 1, 63
RATE = 0.083
ITERS = 30


def timed(fn, *args):
    @jax.jit
    def loop(n, *a):
        def body(i, acc):
            # Thread the carry into the first operand so XLA cannot hoist the
            # attention call out of the loop (acc*1e-30 is not foldable).
            q = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(q, *a[1:])
            return acc + jnp.sum(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop(2, *args))  # compile + warmup
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(loop(ITERS, *args))
        best = min(best, time.perf_counter() - t0)
    t1 = time.perf_counter()
    float(loop(1, *args))
    one = time.perf_counter() - t1
    return max((best - one) / (ITERS - 1), 1e-9)


def main():
    rows = []
    rng = np.random.default_rng(0)
    seed = seed_from_rng(jax.random.PRNGKey(7))
    for lq in (17, 32, 64):
        for lkv in (4096, 16384, 65536):
            q = jnp.asarray(rng.normal(size=(B, H, lq, D)), jnp.bfloat16)
            k = jnp.asarray(rng.normal(size=(B, H, lkv, D)), jnp.bfloat16)
            v = jnp.asarray(rng.normal(size=(B, H, lkv, D)), jnp.bfloat16)
            scale = D**-0.5
            key = jax.random.PRNGKey(3)

            def flash_fwd_bwd(q, k, v):
                def loss(q, k, v):
                    out = flash_cross_attention(
                        q, k, v, scale=scale, temperature=0.5,
                        dropout_rate=RATE, dropout_seed=seed,
                    )
                    return jnp.sum(out.astype(jnp.float32))

                g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
                return g[0]

            def xla_real(q, k, v):
                def loss(q, k, v):
                    out, _ = multihead_attention(
                        q, k, v, scale=scale, temperature=0.5,
                        dropout_rng=key, dropout_rate=RATE,
                    )
                    return jnp.sum(out.astype(jnp.float32))

                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)[0]

            t_x = timed(xla_real, q, k, v)
            t_f = timed(flash_fwd_bwd, q, k, v)
            rows.append(
                dict(lq=lq, lkv=lkv, xla_ms=round(t_x * 1e3, 2),
                     flash_ms=round(t_f * 1e3, 2),
                     flash_speedup=round(t_x / t_f, 2))
            )
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
