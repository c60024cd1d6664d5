"""Torch-reference GPU benchmark: the A100 column of the north-star claim.

BASELINE.json's north star is ">=5x fusion fwd+bwd step throughput vs an A100
Torch baseline on v5e-8". No GPU exists in the build environment, so the
A100 number in BASELINE.md is an analytic HBM-roofline projection; THIS script
is the ready-to-run measurement protocol that replaces the projection with a
measured value the day a GPU host is available. Run it unmodified:

    git clone https://github.com/konst-int-i/healnet /tmp/healnet
    HEALNET_PATH=/tmp/healnet python scripts/bench_torch_gpu.py            # fp32 (reference behaviour)
    HEALNET_PATH=/tmp/healnet python scripts/bench_torch_gpu.py --amp      # autocast bf16 best case
    HEALNET_PATH=/tmp/healnet python scripts/bench_torch_gpu.py --row kirp

It measures the SAME protocol as /root/repo/bench.py: the BRCA-tuned HealNet
fusion model (reference config/best_hyperparams.yml brca dims), omic (1x2000)
+ WSI patch bag (4096x2048) modalities, batch 8, NLL survival loss / 16,
Adam, dropout active — fwd+bwd+optimizer per step. The reference model is
imported from the upstream repo (HEALNET_PATH or an installed `healnet`
package); nothing is reimplemented here, so the measured column is exactly
the upstream code path (healnet/models/healnet.py:190-250 forward,
healnet/models/healnet.py:369-426 eager attention).

Prints ONE JSON line: {"metric": "torch_reference_fusion_step_throughput",
"value": N, "unit": "samples/sec", "device": ..., "step_ms": ...}.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import torch

BATCH, PATCHES, OMIC_D, PATCH_D, OUT_DIMS = 8, 4096, 2000, 2048, 4

# Tuned rows, mirroring /root/repo/bench.py ROWS (reference
# config/best_hyperparams.yml). The flagship row keeps the blca-block dropout
# rates for continuity with the published TPU rows (BENCH_NOTES.md); a
# brca-rates variant is measured alongside by bench.py --row brca_rates.
ROWS = {
    "brca": dict(
        depth=2, l_c=17, l_d=126, cross_dim_head=63, latent_dim_head=20,
        attn_dropout=0.083, ff_dropout=0.473,
    ),
    "brca_rates": dict(
        depth=2, l_c=17, l_d=126, cross_dim_head=63, latent_dim_head=20,
        attn_dropout=0.4551429183430998, ff_dropout=0.36517673072901384,
    ),
    "kirp": dict(
        depth=5, l_c=17, l_d=62, cross_dim_head=27, latent_dim_head=113,
        attn_dropout=0.31789955176609086, ff_dropout=0.04735283995174411,
    ),
}


def load_reference_healnet():
    """Import the upstream HealNet class (installed package or HEALNET_PATH)."""
    try:
        from healnet.models import HealNet  # installed upstream package

        return HealNet
    except ImportError:
        pass
    root = os.environ.get("HEALNET_PATH", "/root/reference")
    path = Path(root) / "healnet" / "models" / "healnet.py"
    if not path.exists():
        raise SystemExit(
            f"upstream healnet not found at {path}; clone "
            "https://github.com/konst-int-i/healnet and set HEALNET_PATH"
        )
    spec = importlib.util.spec_from_file_location("ref_healnet", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_healnet"] = mod
    spec.loader.exec_module(mod)
    return mod.HealNet


def nll_surv_loss(logits, y, c):
    """Discrete-time NLL survival loss (alpha=0.4), /16 as the reference
    train loop does (healnet/main.py:463, survival_loss.py:9-43)."""
    hazards = torch.sigmoid(logits)
    S = torch.cumprod(1 - hazards, dim=1)
    S_pad = torch.cat([torch.ones_like(c).view(-1, 1), S], 1)
    yv, cv = y.view(-1, 1), c.view(-1, 1)
    unc = -(1 - cv) * (
        torch.log(torch.gather(S_pad, 1, yv).clamp(min=1e-7))
        + torch.log(torch.gather(hazards, 1, yv).clamp(min=1e-7))
    )
    cen = -cv * torch.log(torch.gather(S_pad, 1, yv + 1).clamp(min=1e-7))
    return (0.6 * (cen + unc) + 0.4 * unc).mean() / 16.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", default="brca", choices=sorted(ROWS))
    ap.add_argument("--device", default="cuda" if torch.cuda.is_available() else "cpu")
    ap.add_argument("--amp", action="store_true",
                    help="autocast bf16 (NOT reference behaviour; best-case column)")
    ap.add_argument("--compile", action="store_true",
                    help="torch.compile the model (NOT reference behaviour)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    HealNet = load_reference_healnet()
    hp = ROWS[args.row]
    model = HealNet(
        n_modalities=2, channel_dims=[OMIC_D, PATCH_D], num_spatial_axes=[1, 1],
        out_dims=OUT_DIMS, num_freq_bands=2, max_freq=2.0,
        x_heads=1, l_heads=8, self_per_cross_attn=0, snn=True, **hp,
    ).to(args.device)
    model.train()
    if args.compile:
        model = torch.compile(model)
    opt = torch.optim.Adam(model.parameters(), lr=8e-3)

    rng = np.random.default_rng(0)
    dev = torch.device(args.device)
    tab = torch.tensor(rng.normal(size=(BATCH, 1, OMIC_D)).astype(np.float32), device=dev)
    wsi = torch.tensor(rng.normal(size=(BATCH, PATCHES, PATCH_D)).astype(np.float32), device=dev)
    y = torch.tensor(rng.integers(0, OUT_DIMS, size=BATCH), device=dev)
    c = torch.tensor(rng.integers(0, 2, size=BATCH).astype(np.float32), device=dev)

    def step():
        opt.zero_grad(set_to_none=True)
        if args.amp:
            with torch.autocast(device_type=dev.type, dtype=torch.bfloat16):
                logits = model([tab, wsi])
                loss = nll_surv_loss(logits.float(), y, c)
        else:
            logits = model([tab, wsi])
            loss = nll_surv_loss(logits, y, c)
        loss.backward()
        opt.step()

    def sync():
        if dev.type == "cuda":
            torch.cuda.synchronize()

    for _ in range(3):
        step()
    sync()
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            step()
        sync()
        best = min(best, (time.perf_counter() - t0) / args.iters)

    rec = {
        "metric": f"torch_reference_fusion_step_throughput_{args.row}",
        "value": round(BATCH / best, 2),
        "unit": "samples/sec",
        "step_ms": round(best * 1e3, 3),
        "device": str(torch.cuda.get_device_name(0)) if dev.type == "cuda" else args.device,
        "amp": args.amp,
        "compiled": args.compile,
        "dropout_on": True,
        "batch": BATCH,
        "patches": PATCHES,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
