"""Shared constants (kept dependency-free: both the data-ops CLI and the
training pipeline import the dataset whitelist from here)."""

VALID_DATASETS = ["blca", "brca", "kirp", "ucec", "hnsc", "paad", "luad", "lusc"]
