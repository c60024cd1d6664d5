"""Fused (one-pass) vs XLA (two-pass) merged-KV projection at bench scale.

Times fwd-only and fwd+bwd (grads wrt w/bias, the training case) of the
merged folded-KV projection on the flagship WSI context (8 x 4096 x 2048
bf16, ~134 MB): the pallas kernel reads the context once per forward, the
XLA path twice (statistics pass + matmul). Timing per the relay-safe
methodology: chain iterations through a carry inside ONE jitted fori_loop,
close with a scalar readback; min over repetitions of each run length
separately, then difference the mins (BENCH_NOTES.md).
"""

import functools
import json
import time

import numpy as np

B, T, C, E, F = 8, 4096, 2048, 10, 252


def main():
    import jax
    import jax.numpy as jnp

    from healnet_tpu.ops.fused_project import fused_kv_project

    rng = np.random.default_rng(0)
    dat = jnp.asarray(rng.normal(size=(B, T, C)), jnp.bfloat16)
    enc = jnp.asarray(rng.normal(size=(T, E)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(C + E, F)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)

    # int8 quantized context (ops/quantize.py): HALF the context bytes per
    # read; scale applied on the (tile, F) accumulator
    from healnet_tpu.ops.quantize import quantize_context

    qdat = quantize_context(dat.astype(jnp.float32))

    def fwd(impl, dat, w, bias):
        out = fused_kv_project(dat, enc, w, bias, impl=impl,
                               out_dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32))

    def train(impl, dat, w, bias):
        def loss(w, bias):
            out = fused_kv_project(dat, enc, w, bias, impl=impl,
                                   out_dtype=jnp.bfloat16)
            return jnp.sum(out.astype(jnp.float32))

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(w, bias)
        return l + jnp.sum(g[0]) + jnp.sum(g[1])

    def timed(fn, ctx, n_hi=30):
        # Thread the loop carry through the TINY weight operand: perturbing
        # the 134MB context instead would add an elementwise pass that XLA
        # fuses into its own matmul but cannot fuse into a pallas_call,
        # biasing the comparison by ~2 context-passes.
        @jax.jit
        def loop(n):
            def body(i, acc):
                wp = w + (acc * 1e-30).astype(w.dtype)
                return acc + fn(ctx, wp, bias)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(1))  # compile both lengths' program (same program)
        mins = {}
        for n in (1, n_hi):
            best = 1e9
            for _ in range(5):
                t0 = time.perf_counter()
                float(loop(n))
                best = min(best, time.perf_counter() - t0)
            mins[n] = best
        return (mins[n_hi] - mins[1]) / (n_hi - 1)

    res = {}
    for impl in ("xla", "pallas"):
        res[f"{impl}_fwd_ms"] = round(
            timed(functools.partial(fwd, impl), dat) * 1e3, 4
        )
        res[f"{impl}_train_ms"] = round(
            timed(functools.partial(train, impl), dat) * 1e3, 4
        )
        res[f"{impl}_q_fwd_ms"] = round(
            timed(functools.partial(fwd, impl), qdat) * 1e3, 4
        )
        res[f"{impl}_q_train_ms"] = round(
            timed(functools.partial(train, impl), qdat) * 1e3, 4
        )
    ctx_ms = 0.134 / 830 * 1e3  # one 134MB read at 830 GB/s roofline
    res["context_read_ms_at_roofline"] = round(ctx_ms, 4)
    res["fwd_passes"] = {
        k: round(res[f"{k}_fwd_ms"] / ctx_ms, 2) for k in ("xla", "pallas")
    }
    res["train_passes"] = {
        k: round(res[f"{k}_train_ms"] / ctx_ms, 2) for k in ("xla", "pallas")
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
