"""Generic multimodal dataset + survival discretisation.

- :class:`MMDataset` is the generic supervised multimodal container
  (reference `/root/reference/healnet/etl/loaders.py:21-41`): a list of
  per-modality arrays indexed per sample, optional target. Arrays are host
  numpy — device transfer happens in batched, double-buffered form via
  :mod:`healnet_tpu.etl.prefetch`, never per-sample.
- :func:`discretize_survival` reproduces the reference's survival binning
  (`loaders.py:327-343`) bit-for-bit: pandas ``qcut`` over the chosen subset
  (all / censored / uncensored) with eps-widened outer edges, then ``cut``
  over all patients. Kept host-side in pandas for c-index parity (SURVEY.md
  §7.3 "hard parts").
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from healnet_tpu.etl.base import Dataset


class MMDataset(Dataset):
    """Generic supervised multimodal dataset."""

    def __init__(self, tensors: Sequence[np.ndarray], target: Optional[np.ndarray] = None):
        """
        Args:
            tensors: one array per modality, each with leading sample axis.
            target: optional per-sample label array.
        """
        self.tensors = [np.asarray(t) for t in tensors]
        n = self.tensors[0].shape[0]
        assert all(t.shape[0] == n for t in self.tensors), (
            "all modalities must share the sample axis length"
        )
        self.target = None if target is None else np.asarray(target)
        if self.target is not None:
            assert self.target.shape[0] == n

    def __getitem__(self, idx):
        sample = [t[idx] for t in self.tensors]
        if self.target is None:
            return sample
        return sample, self.target[idx]

    def __len__(self) -> int:
        return self.tensors[0].shape[0]


def discretize_survival(
    df: pd.DataFrame,
    n_bins: int = 4,
    subset: str = "uncensored",
    label_col: str = "survival_months",
    censorship_col: str = "censorship",
    eps: float = 1e-6,
) -> pd.Series:
    """Discretise survival times into quantile bins (reference semantics).

    subset="all": plain qcut over everyone. Otherwise bin edges come from the
    censored/uncensored subset, outer edges widened by eps to cover the full
    population, then applied to all patients with left-closed intervals.
    """
    valid_subsets = ("all", "uncensored", "censored")
    assert subset in valid_subsets, f"subset must be one of {valid_subsets}"

    if subset == "all":
        y = pd.qcut(df[label_col], q=n_bins, labels=False).values
    else:
        flag = 1 if subset == "censored" else 0
        subset_df = df[df[censorship_col] == flag]
        _, q_bins = pd.qcut(subset_df[label_col], q=n_bins, retbins=True, labels=False)
        q_bins[-1] = df[label_col].max() + eps
        q_bins[0] = df[label_col].min() - eps
        y = pd.cut(
            df[label_col], bins=q_bins, retbins=False, labels=False,
            right=False, include_lowest=True,
        ).values
    return pd.Series(y, index=df.index, name="y_disc").astype(int)


def class_weights(
    y: np.ndarray, scheme: Optional[str] = "inverse", n_bins: Optional[int] = None
) -> Optional[np.ndarray]:
    """Inverse / inverse-root class weights (`main.py:247-259`).

    ``n_bins`` pins the weight-vector length: a small fold whose train split
    misses a survival bin must still produce an ``n_bins``-long vector (the
    loss broadcasts weights against ``(b, n_bins)`` hazards). An absent bin
    gets the maximum weight (it is rarer than any observed bin).
    """
    if scheme in (None, "None"):
        return None
    y = np.asarray(y).astype(np.int64)
    counts = np.bincount(y, minlength=int(n_bins) if n_bins else 0).astype(
        np.float64
    )
    if n_bins is not None:
        counts = counts[: int(n_bins)]
    missing = counts == 0
    if missing.any():
        counts[missing] = max(counts[~missing].min(), 1.0) if (~missing).any() else 1.0
    if scheme == "inverse":
        return 1.0 / counts
    if scheme == "inverse_root":
        return 1.0 / np.sqrt(counts)
    raise ValueError(f"unknown class-weight scheme {scheme}")


def train_val_test_split(
    n: int,
    train: float = 0.7,
    test: float = 0.15,
    val: float = 0.15,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random 70/15/15 index split (reference order train, test, val —
    `main.py:200`)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    n_train = int(round(train * n))
    n_test = int(round(test * n))
    return (
        idx[:n_train],
        idx[n_train : n_train + n_test],
        idx[n_train + n_test :],
    )
