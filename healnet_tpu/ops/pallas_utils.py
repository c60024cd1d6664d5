"""Shared helpers for the Pallas kernel dispatch layer.

One home for the platform probe and tile rounding used by the flash
attention kernel (`ops/flash_attention.py`), the fused KV projection
(`ops/fused_project.py`), and the model-level auto dispatch
(`models/layers.py`) — keeping the TPU-detection semantics identical
everywhere a kernel-vs-XLA decision is made.
"""

import jax


def on_tpu() -> bool:
    """True when the default jax backend is a TPU (kernels run compiled;
    anywhere else pallas_call falls back to interpret mode)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``x`` (lane/sublane tile padding)."""
    return ((x + m - 1) // m) * m
