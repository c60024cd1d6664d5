"""Dump the largest materialized buffers in the kirp-5 train-step HLO.

probe_kirp_bytes.py measured +122.8 MB of HBM traffic per fusion layer —
far more than the latent-side tensors (probs 2.2 MB, kv slices 3.5 MB)
can explain. This dumps every HLO op whose output is >= 1 MB, grouped by
shape, for the depth-5 vs depth-2 kirp step, to name the per-layer
context-sized tensors.
"""

from __future__ import annotations

import re
import sys
from collections import Counter
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
    l_c=17, l_d=62, cross_dim_head=27, latent_dim_head=113,
    attn_dropout=0.31789955176609086, ff_dropout=0.04735283995174411,
)
_DT = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
       "pred": 1, "s64": 8, "u64": 8, "f64": 8}


def build(depth):
    return HealNetModule(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D), num_spatial_axes=(1, 1),
        out_dims=OUT_DIMS, num_freq_bands=2, max_freq=2.0, x_heads=1, l_heads=8,
        self_per_cross_attn=0, snn=True, dtype=jnp.bfloat16,
        attention_impl="auto", depth=depth, **KIRP,
    )


def hlo_for(module, batch):
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

    return (
        jax.jit(train_step)
        .lower(params, opt_state, jax.random.PRNGKey(0))
        .compile()
        .as_text()
    )


def big_buffers(hlo, min_mb=1.0):
    """(shape, op_kind) -> (count, total MB) for top-level op outputs."""
    agg = Counter()
    for line in hlo.splitlines():
        m = re.match(
            r"\s+%?[\w.\-]+ = (\w+)\[([\d,]*)\]\S* (\w[\w\-]*)\(", line
        )
        if not m:
            continue
        dt, dims, kind = m.groups()
        if dt not in _DT or kind in ("parameter", "constant", "get-tuple-element"):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        mb = n * _DT[dt] / 1e6
        if mb >= min_mb:
            agg[(f"{dt}[{dims}]", kind)] += mb
    return agg


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
    aggs = {}
    for depth in (2, 5):
        agg = big_buffers(hlo_for(build(depth), batch))
        aggs[depth] = agg
        print(f"=== depth {depth}: buffers >= 1 MB (count x shape, total MB)")
        for (shape, kind), mb in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {mb:9.1f} MB  {kind:14s} {shape}")
    print("=== delta (d5 - d2), per extra layer (/3):")
    keys = set(aggs[2]) | set(aggs[5])
    deltas = {k: (aggs[5].get(k, 0) - aggs[2].get(k, 0)) / 3 for k in keys}
    for (shape, kind), mb in sorted(deltas.items(), key=lambda kv: -kv[1])[:20]:
        if abs(mb) > 0.3:
            print(f"  {mb:9.2f} MB/layer  {kind:14s} {shape}")


if __name__ == "__main__":
    main()
