"""Generate a BRCA-shaped synthetic TCGA tree for the full-scale dress rehearsal.

Matches the real BRCA cohort's shape (reference `main.py:124-170` harness
scale): ~1022 cases, ragged WSI patch bags (1k-8k patches, log-normal like
real slide tissue area), 2000-gene omic profiles, ~30% censoring, and a
survival signal carried by BOTH modalities so a fused model can beat either
alone. Features are stored float16 (`data.feature_dtype: float16`): the
host->device stream, not compute, bounds epoch time at WSI scale.

Usage: python scripts/gen_dress_data.py [--root /tmp/healnet_dress/tcga]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np
import pandas as pd

N_CASES = 1022
N_GENES = 2000
PATCH_DIM = 1024
BAG_MIN, BAG_MAX = 1000, 8192


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/healnet_dress/tcga")
    parser.add_argument("--cases", type=int, default=N_CASES)
    args = parser.parse_args()

    root = Path(args.root)
    patches = root / "wsi" / "brca_preprocessed_level2" / "patches"
    features = root / "wsi" / "brca_preprocessed_level2" / "patch_features"
    (root / "omic").mkdir(parents=True, exist_ok=True)
    patches.mkdir(parents=True, exist_ok=True)
    features.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(20260816)
    n = args.cases
    sids = [f"TCGA-DR-{i:04d}-01Z-00-DX1" for i in range(n)]

    # latent per-patient risk drives both modalities and survival
    risk = rng.normal(size=n).astype(np.float32)

    omic = rng.normal(size=(n, N_GENES)).astype(np.float32)
    omic[:, :25] += 0.8 * risk[:, None]  # 25 "signal genes"

    bag_sizes = np.clip(
        rng.lognormal(mean=np.log(2800), sigma=0.55, size=n), BAG_MIN, BAG_MAX
    ).astype(int)

    import h5py

    t0 = time.time()
    total_bytes = 0
    for i, (sid, bag) in enumerate(zip(sids, bag_sizes)):
        # real CLAM-schema coords (the explainer's heatmap/crop source):
        # a row-major tissue grid of 256px level-0 patches, with the
        # patch_size/patch_level attrs create_patches_fp.py writes
        ncols = max(1, int(np.ceil(np.sqrt(float(bag)))))
        idx = np.arange(int(bag))
        coords = np.stack([idx % ncols, idx // ncols], axis=1).astype(np.int64) * 256
        with h5py.File(patches / f"{sid}.h5", "w") as f:
            dset = f.create_dataset("coords", data=coords)
            dset.attrs["patch_size"] = 256
            dset.attrs["patch_level"] = 0
            dset.attrs["downsample"] = [1.0, 1.0]
        feats = rng.standard_normal((int(bag), PATCH_DIM), dtype=np.float32)
        # a sprinkle of "tumor patches" whose first channels encode risk
        n_tumor = max(1, int(bag) // 20)
        feats[:n_tumor, :16] += 0.5 * risk[i]
        np.save(features / f"{sid}.npy", feats.astype(np.float16))
        total_bytes += int(bag) * PATCH_DIM * 2
        if (i + 1) % 200 == 0:
            print(f"  {i + 1}/{n} slides ({total_bytes / 1e9:.1f} GB, "
                  f"{time.time() - t0:.0f}s)", flush=True)

    survival_months = np.exp(
        3.2 - 0.7 * risk + 0.35 * rng.normal(size=n)
    ).astype(np.float32)
    censorship = (rng.uniform(size=n) < 0.3).astype(np.int64)

    df = pd.DataFrame(omic, columns=[f"gene_{i}" for i in range(N_GENES)])
    df["site"] = "breast"
    df["oncotree_code"] = "IDC"
    df["case_id"] = [s[:12] for s in sids]
    df["slide_id"] = [s + ".svs" for s in sids]
    df["train"] = 1
    df["censorship"] = censorship
    df["survival_months"] = survival_months
    df.to_csv(root / "omic" / "tcga_brca_all_clean.csv.zip", compression="zip")

    print(f"done: {n} cases, bags {bag_sizes.min()}-{bag_sizes.max()} "
          f"(mean {bag_sizes.mean():.0f}), {total_bytes / 1e9:.1f} GB features, "
          f"censoring {censorship.mean():.2f}, {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
