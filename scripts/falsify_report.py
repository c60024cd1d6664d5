"""Merge PARITY_FULL (hash family) + PARITY_FALSIFY (threefry family) into
the mask-family verdict table (VERDICT r4 weak #2 / next #4).

The question: PARITY_FULL's tpu side beat torch on the TEST split in 5/5
folds (train-split agreement at the noise floor) — narrative attributed it
to the attention-dropout mask family (coordinate-hash vs torch bernoulli).
PARITY_FALSIFY re-ran the tpu side with torch-family threefry-bernoulli
masks, everything else identical. If the one-sided offset tracks the
family, the narrative is proven; if it persists, the cause is elsewhere.

Usage: python scripts/falsify_report.py [--write]  (writes PARITY_FALSIFY.md
appendix + prints the verdict)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main():
    full = {r["fold"]: r for r in json.loads((REPO / "PARITY_FULL.json").read_text())}
    fals = {r["fold"]: r for r in json.loads((REPO / "PARITY_FALSIFY.json").read_text())}
    folds = sorted(set(full) & set(fals))

    lines = [
        "",
        "## Mask-family verdict (hash vs threefry, torch fixed)",
        "",
        "| fold | torch test | tpu test (hash) | tpu test (threefry) "
        "| hash-torch | threefry-torch |",
        "|---|---|---|---|---|---|",
    ]
    d_hash, d_tf = [], []
    for f in folds:
        t = full[f]["torch"]["test"]
        h = full[f]["tpu"]["test"]
        y = fals[f]["tpu"]["test"]
        d_hash.append(h - t)
        d_tf.append(y - t)
        lines.append(
            f"| {f} | {t:.4f} | {h:.4f} | {y:.4f} | {h - t:+.4f} | {y - t:+.4f} |"
        )
    d_hash, d_tf = np.asarray(d_hash), np.asarray(d_tf)
    one_sided_hash = int((d_hash > 0).sum())
    one_sided_tf = int((d_tf > 0).sum())
    lines += [
        "",
        f"hash family:     tpu beats torch in {one_sided_hash}/{len(folds)} folds, "
        f"mean offset {d_hash.mean():+.4f} (std {d_hash.std():.4f})",
        f"threefry family: tpu beats torch in {one_sided_tf}/{len(folds)} folds, "
        f"mean offset {d_tf.mean():+.4f} (std {d_tf.std():.4f})",
        "",
    ]
    # the verdict, decided by the data
    if one_sided_tf <= len(folds) - 2 or abs(d_tf.mean()) < 0.5 * abs(d_hash.mean()):
        verdict = (
            "VERDICT: the one-sided offset TRACKS the mask family — switching "
            "the tpu side to torch-family threefry-bernoulli masks removes "
            "(or halves) it. The PARITY_FULL narrative ('small generalization "
            "gain from the different dropout-mask family') is confirmed by "
            "experiment: the offset is a stochastic-path property, not a "
            "systematic training-fidelity difference."
        )
    else:
        verdict = (
            "VERDICT: the offset PERSISTS under torch-family threefry masks — "
            "the mask family is NOT the cause. The residual systematic "
            "difference needs a deeper root cause (optimizer numerics, bf16 "
            "accumulation, batch assembly)."
        )
    lines += [verdict, ""]
    report = "\n".join(lines)
    print(report)
    if "--write" in sys.argv:
        with open(REPO / "PARITY_FALSIFY.md", "a") as fh:
            fh.write(report)
        print("appended to PARITY_FALSIFY.md")


if __name__ == "__main__":
    main()
