"""GDC manifest utilities (reference `/root/reference/healnet/etl/utils.py:5-21`)."""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional, Union

import pandas as pd


def read_manifest(path: Union[str, Path]) -> pd.DataFrame:
    """Read a GDC download manifest (tab-separated: id, filename, md5, ...)."""
    return pd.read_csv(path, sep="\t")


def filter_manifest(
    manifest: pd.DataFrame,
    keep_filenames: Optional[Iterable[str]] = None,
    contains: Optional[str] = None,
) -> pd.DataFrame:
    """Filter manifest rows by exact filenames and/or a substring pattern."""
    out = manifest
    if keep_filenames is not None:
        keep = set(keep_filenames)
        out = out[out["filename"].isin(keep)]
    if contains is not None:
        out = out[out["filename"].str.contains(contains, regex=False)]
    return out.reset_index(drop=True)


def write_manifest(manifest: pd.DataFrame, path: Union[str, Path]) -> None:
    manifest.to_csv(path, sep="\t", index=False)
