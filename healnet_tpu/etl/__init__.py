from healnet_tpu.etl.base import Dataset
from healnet_tpu.etl.datasets import (
    MMDataset,
    class_weights,
    discretize_survival,
    train_val_test_split,
)
from healnet_tpu.etl.tcga import LRUCache, TCGADataset
from healnet_tpu.etl.prefetch import BackgroundIterator, DevicePrefetcher
from healnet_tpu.etl.transforms import (
    Compose,
    RearrangeTransform,
    RepeatTransform,
    ResizeTransform,
    ToFloat,
)
from healnet_tpu.etl.slides import OpenSlide, openslide_available

__all__ = [
    "Dataset",
    "MMDataset",
    "class_weights",
    "discretize_survival",
    "train_val_test_split",
    "LRUCache",
    "TCGADataset",
    "BackgroundIterator",
    "DevicePrefetcher",
    "Compose",
    "RearrangeTransform",
    "RepeatTransform",
    "ResizeTransform",
    "ToFloat",
    "OpenSlide",
    "openslide_available",
]
