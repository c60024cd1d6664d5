"""Dataset abstractions (reference `/root/reference/healnet/etl/base.py:7-23`)."""

from __future__ import annotations

from abc import ABC, abstractmethod


class Dataset(ABC):
    """Minimal map-style dataset contract (torch-free)."""

    @abstractmethod
    def __getitem__(self, index: int):
        ...

    @abstractmethod
    def __len__(self) -> int:
        ...

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
