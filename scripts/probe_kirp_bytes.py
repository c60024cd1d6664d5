"""Compiled-HLO byte accounting for the kirp depth scaling.

probe_flat_opt.py falsified the Adam-leaf-count theory (flat optimizer:
no change). This probe asks XLA itself where the per-layer cost goes:
``compiled.cost_analysis()`` bytes-accessed and flops for the kirp train
step at depth 2/3/5, plus ``memory_analysis()`` temp sizes. If the
per-layer byte delta × measured HBM bandwidth ≈ the measured 0.185 ms/layer
increment, the depth cost is bandwidth on latent-side intermediates (probs,
saved activations) — attackable by bf16 stores + flash-style recompute —
not kernel-count overhead.
"""

from __future__ import annotations

import json
import sys
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


def build(depth, **over):
    kw = dict(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D), num_spatial_axes=(1, 1),
        out_dims=OUT_DIMS, num_freq_bands=2, max_freq=2.0, x_heads=1, l_heads=8,
        self_per_cross_attn=0, snn=True, dtype=jnp.bfloat16,
        attention_impl="auto", depth=depth, **KIRP,
    )
    kw.update(over)
    return HealNetModule(**kw)


def analyze(module, batch, label, results):
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

    compiled = (
        jax.jit(train_step)
        .lower(params, opt_state, jax.random.PRNGKey(0))
        .compile()
    )
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ma = compiled.memory_analysis()
    rec = {
        "bytes_accessed_mb": round(ca.get("bytes accessed", float("nan")) / 1e6, 2),
        "flops_g": round(ca.get("flops", float("nan")) / 1e9, 3),
        "temp_mb": round(getattr(ma, "temp_size_in_bytes", 0) / 1e6, 2),
        "fusions": compiled.as_text().count(" fusion("),
    }
    # per-operand byte keys if exposed
    for k, v in sorted(ca.items()):
        if k.startswith("bytes accessed") and k != "bytes accessed":
            rec.setdefault("operands", {})[k] = round(v / 1e6, 2)
    results[label] = rec
    print(label, json.dumps(rec), flush=True)


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
    for depth in (2, 3, 5):
        analyze(build(depth), batch, f"kirp_d{depth}", results)
    analyze(
        build(5, attn_dropout=0.0, ff_dropout=0.0), batch, "kirp_d5_nodrop", results
    )
    d2, d5 = results["kirp_d2"], results["kirp_d5"]
    per_layer_mb = (d5["bytes_accessed_mb"] - d2["bytes_accessed_mb"]) / 3
    print(
        json.dumps(
            {
                **results,
                "per_layer_mb": round(per_layer_mb, 2),
                "per_layer_ms_at_819gbps": round(per_layer_mb / 819, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
