"""Kernel census of the kirp-5 train step: which modules own the launches?

probe_kirp_breakdown.py established the depth-5 step is per-kernel
launch/turnaround bound (~1.27 us per executed fusion, 765 kernels after
the concat-VJP split + flat optimizer). This probe attributes every
top-level kernel (fusion / dot / custom-call / rng / reduce) in the
compiled step to its flax module path (HLO op_name metadata), grouped by
(kind, layer-normalised module), so the fused-latent-chain work targets
the actual offenders instead of the theorised ones.

Usage: python scripts/probe_kirp_kernels.py [--depth 5] [--dump FILE]
"""

from __future__ import annotations

import argparse
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

# top-level HLO ops that execute as their own kernel on TPU
KERNEL_KINDS = {
    "fusion", "custom-call", "dot", "convolution", "reduce", "rng",
    "rng-bit-generator", "sort", "scatter", "all-reduce", "copy",
    "transpose", "concatenate", "dynamic-slice", "dynamic-update-slice",
    "pad", "slice", "broadcast", "reshape", "convert", "bitcast-convert",
    "select-and-scatter", "reduce-window", "iota", "add", "multiply",
}
# ops that are pure layout/no-op at the top level (often free)
FREE_KINDS = {"parameter", "constant", "tuple", "get-tuple-element", "bitcast"}


def build(depth):
    return HealNetModule(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D), num_spatial_axes=(1, 1),
        out_dims=OUT_DIMS, num_freq_bands=2, max_freq=2.0, x_heads=1, l_heads=8,
        self_per_cross_attn=0, snn=True, dtype=jnp.bfloat16,
        attention_impl="auto", depth=depth, **KIRP,
    )


def compiled_text(module, batch):
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


LINE = re.compile(r"^\s+(?:ROOT )?%?[\w.\-]+ = \S+ (\S[\w\-]*)\((.*)$")
OPNAME = re.compile(r'op_name="([^"]*)"')


def entry_lines(hlo):
    """Lines of the ENTRY computation only (top-level = kernel candidates)."""
    out, inside = [], False
    for line in hlo.splitlines():
        if line.startswith("ENTRY "):
            inside = True
            continue
        if inside:
            if line.startswith("}"):
                break
            out.append(line)
    return out


def norm_module(op_name):
    """Normalise a jax op_name to (layer_tag, module_tag)."""
    # flax paths look like jit(train_step)/.../layer3_cross_attn_1/to_q/...
    layer = "-"
    m = re.search(r"layer(\d+)_", op_name)
    if m:
        layer = f"L{m.group(1)}"
    # strip the jit prefix and keep the most specific named component
    parts = [p for p in op_name.split("/") if p]
    tag = "?"
    for key in ("cross_attn", "cross_ff", "self_attn", "self_ff", "to_q",
                "to_kv", "to_out", "net_0", "net_2", "norm", "final",
                "adam", "scale_by", "transpose", "remat"):
        if any(key in p for p in parts):
            tag = key
            break
    if tag == "?" and parts:
        tag = parts[-1][:24]
    return layer, tag


def census(hlo):
    lines = entry_lines(hlo)
    kinds = Counter()
    mods = Counter()
    per_layer = Counter()
    n_kernels = 0
    for line in lines:
        m = LINE.match(line)
        if not m:
            continue
        kind = m.group(1)
        if kind in FREE_KINDS:
            continue
        n_kernels += 1
        kinds[kind] += 1
        nm = OPNAME.search(line)
        op_name = nm.group(1) if nm else ""
        layer, tag = norm_module(op_name)
        mods[(kind, layer, tag)] += 1
        per_layer[layer] += 1
    return n_kernels, kinds, mods, per_layer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--also-depth", type=int, default=2)
    ap.add_argument("--dump", default=None)
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

    for depth in (args.also_depth, args.depth):
        hlo = compiled_text(build(depth), batch)
        if args.dump and depth == args.depth:
            Path(args.dump).write_text(hlo)
        n, kinds, mods, per_layer = census(hlo)
        print(f"\n=== depth {depth}: {n} top-level kernels ===")
        print("by kind:", dict(kinds.most_common(12)))
        print("by layer:", dict(sorted(per_layer.items())))
        print("top (kind, layer, module):")
        for (kind, layer, tag), c in mods.most_common(40):
            print(f"  {c:4d}  {kind:14s} {layer:4s} {tag}")


if __name__ == "__main__":
    main()
