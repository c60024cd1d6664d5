"""Quantify the local sweep engine: kNN-Bayes vs random, regret curves.

The reference delegates `method: bayes` sweeps to the wandb service
(`/root/reference/healnet/main.py:66-71`, objective schema
`/root/reference/config/sweep_bayesian.yaml:2-5`); this repo's
`train/sweep.py` replaces it with a kNN surrogate. This benchmark measures
what that surrogate is actually worth: simple regret (gap between the best
score found so far and the known optimum) vs pure random search on three
analytic response surfaces, 30 trials x 10 seeds each:

- **branin**: the classic 2-D continuous benchmark (3 global minima,
  moderate multimodality) — rescaled to "maximize -f";
- **cindex**: a c-index-shaped surface over the sweep_bayesian.yaml
  parameter types (log-uniform lr, uniform dropout, categorical depth):
  smooth unimodal ridge peaking at ~0.80, plus N(0, 0.02) fold noise —
  the realistic regime where evaluations are expensive and noisy;
- **hartmann3**: 3-D, a sharper multimodal surface (4 local optima).

Writes docs/SWEEP_BENCH.md + docs/sweep_bench.json when --write is passed.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from healnet_tpu.train.sweep import Sweep  # noqa: E402

N_TRIALS = 30
N_SEEDS = 10
CHECKPOINTS = (10, 20, 30)


# ------------------------------------------------------------------ surfaces
def branin(x: float, y: float) -> float:
    a, b, c = 1.0, 5.1 / (4 * math.pi**2), 5 / math.pi
    r, s, t = 6.0, 10.0, 1 / (8 * math.pi)
    return a * (y - b * x**2 + c * x - r) ** 2 + s * (1 - t) * math.cos(x) + s


BRANIN_OPT = 0.397887


def hartmann3(z: np.ndarray) -> float:
    alpha = np.array([1.0, 1.2, 3.0, 3.2])
    A = np.array(
        [[3.0, 10, 30], [0.1, 10, 35], [3.0, 10, 30], [0.1, 10, 35]]
    )
    P = 1e-4 * np.array(
        [[3689, 1170, 2673], [4699, 4387, 7470],
         [1091, 8732, 5547], [381, 5743, 8828]]
    )
    return -float(
        np.sum(alpha * np.exp(-np.sum(A * (z[None, :] - P) ** 2, axis=1)))
    )


HARTMANN3_OPT = -3.86278


def cindex_surface(lr: float, dropout: float, depth: int,
                   rng: np.random.Generator) -> float:
    """Smooth unimodal c-index ridge + fold noise. Peak ~0.80 at
    lr=3e-3, dropout=0.3, depth=3 (verified analytically below)."""
    lr_term = -1.2 * (math.log10(lr) - math.log10(3e-3)) ** 2
    do_term = -0.8 * (dropout - 0.3) ** 2
    depth_term = {1: -0.03, 2: -0.01, 3: 0.0, 4: -0.015, 5: -0.04}[depth]
    clean = 0.80 + 0.08 * lr_term + do_term * 0.1 + depth_term
    return float(np.clip(clean + rng.normal(0, 0.02), 0.0, 1.0))


CINDEX_OPT = 0.80  # noise-free peak


SURFACES = {
    "branin": dict(
        spec_params={
            "x": {"min": -5.0, "max": 10.0, "distribution": "uniform"},
            "y": {"min": 0.0, "max": 15.0, "distribution": "uniform"},
        },
        opt=-BRANIN_OPT,  # maximize -branin
        noisy=False,
    ),
    "cindex": dict(
        spec_params={
            # the sweep_bayesian.yaml parameter types: log-uniform lr,
            # uniform dropout, categorical depth
            "lr": {"min": 1e-5, "max": 1e-1, "distribution": "log_uniform_values"},
            "dropout": {"min": 0.0, "max": 0.9, "distribution": "uniform"},
            "depth": {"values": [1, 2, 3, 4, 5]},
        },
        opt=CINDEX_OPT,
        noisy=True,
    ),
    "hartmann3": dict(
        spec_params={
            "z0": {"min": 0.0, "max": 1.0, "distribution": "uniform"},
            "z1": {"min": 0.0, "max": 1.0, "distribution": "uniform"},
            "z2": {"min": 0.0, "max": 1.0, "distribution": "uniform"},
        },
        opt=-HARTMANN3_OPT,
        noisy=False,
    ),
}


def make_objective(name: str, rng: np.random.Generator):
    """(noisy observation fn, noise-free fn) — regret is INFERENCE regret:
    the incumbent is chosen by observed score, but scored noise-free, else
    noise makes 'regret' negative and ratios meaningless."""
    if name == "branin":
        clean = lambda p: -branin(p["x"], p["y"])
        return clean, clean
    if name == "hartmann3":
        clean = lambda p: -hartmann3(np.array([p["z0"], p["z1"], p["z2"]]))
        return clean, clean
    noisy = lambda p: cindex_surface(p["lr"], p["dropout"], p["depth"], rng)
    clean = lambda p: cindex_surface(
        p["lr"], p["dropout"], p["depth"], _ZeroNoise()
    )
    return noisy, clean


class _ZeroNoise:
    def normal(self, *a, **k):
        return 0.0


def run_surface(name: str) -> dict:
    cfg = SURFACES[name]
    out = {}
    for method in ("random", "bayes"):
        regrets = np.zeros((N_SEEDS, N_TRIALS))
        for seed in range(N_SEEDS):
            spec = {
                "method": method,
                "metric": {"name": "objective", "goal": "maximize"},
                "parameters": cfg["spec_params"],
            }
            sweep = Sweep(spec, seed=seed)
            noise_rng = np.random.default_rng(10_000 + seed)
            observe, clean = make_objective(name, noise_rng)
            best_obs, best_clean = -np.inf, -np.inf
            for t in range(N_TRIALS):
                params = sweep._propose()
                score = float(observe(params))
                sweep.trials.append(
                    {"params": params, "metrics": {"objective": score},
                     "score": score}
                )
                if score > best_obs:  # incumbent by OBSERVED score
                    best_obs, best_clean = score, float(clean(params))
                regrets[seed, t] = cfg["opt"] - best_clean
        out[method] = {
            f"regret@{c}": (
                round(float(regrets[:, c - 1].mean()), 4),
                round(float(regrets[:, c - 1].std()), 4),
            )
            for c in CHECKPOINTS
        }
    for c in CHECKPOINTS:
        r_rand = out["random"][f"regret@{c}"][0]
        r_bayes = out["bayes"][f"regret@{c}"][0]
        # both methods at/below measurement resolution -> tie, not a ratio
        if r_bayes < 1e-4 and r_rand < 1e-4:
            out[f"bayes_vs_random@{c}"] = 1.0
        else:
            out[f"bayes_vs_random@{c}"] = round(r_rand / max(r_bayes, 1e-4), 2)
    return out


def main():
    results = {name: run_surface(name) for name in SURFACES}
    print(json.dumps(results, indent=1))
    if "--write" not in sys.argv:
        return
    (REPO / "docs").mkdir(exist_ok=True)
    (REPO / "docs" / "sweep_bench.json").write_text(json.dumps(results, indent=1))
    lines = [
        "# Sweep engine: kNN-Bayes vs random — measured regret",
        "",
        f"Simple regret (known optimum minus best score found), mean ± std "
        f"over {N_SEEDS} seeds, {N_TRIALS} trials per run "
        f"(scripts/bench_sweep.py). The `bayes` column is `train/sweep.py`'s "
        "kNN surrogate (8-trial random warmup, 32-candidate acquisition); "
        "`random` is the same sampler without the surrogate.",
        "",
        "| surface | trials | random regret | bayes regret | random/bayes |",
        "|---|---|---|---|---|",
    ]
    for name, res in results.items():
        for c in CHECKPOINTS:
            r = res["random"][f"regret@{c}"]
            b = res["bayes"][f"regret@{c}"]
            lines.append(
                f"| {name} | {c} | {r[0]} ± {r[1]} | {b[0]} ± {b[1]} "
                f"| {res[f'bayes_vs_random@{c}']}x |"
            )
    lines += [
        "",
        "Reading: ratios > 1 mean the surrogate finds better optima with the",
        "same budget. The `cindex` surface carries N(0, 0.02) evaluation",
        "noise — the realistic regime for fold-averaged c-index objectives",
        "(reference objective schema:",
        "`/root/reference/config/sweep_bayesian.yaml:2-5`).",
        "",
    ]
    (REPO / "docs" / "SWEEP_BENCH.md").write_text("\n".join(lines))
    print("wrote docs/SWEEP_BENCH.md + docs/sweep_bench.json")


if __name__ == "__main__":
    main()
