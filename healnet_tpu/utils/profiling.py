"""Tracing / profiling helpers.

The reference has no profiling subsystem (SURVEY.md §5: "Tracing/profiling —
None"); on TPU this is a first-class need. Provides:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory;
- :class:`StepTimer` — wall-clock step statistics with a **readback fence**:
  on this image's axon-tunnelled TPU, ``jax.block_until_ready`` does not
  synchronise, so the timer fences on a caller-provided scalar fetch;
- :func:`log_compile_time` — decorator reporting first-call (compile) vs
  steady-state latency of a jitted function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import numpy as np


def enable_compilation_cache(
    directory: str = "/tmp/healnet_tpu_jax_cache", min_compile_secs: float = 0.5
) -> None:
    """Persist compiled executables across processes (big win for the
    compile-dominated quickstart: first-run compiles of WSI-scale graphs take
    minutes; cached reruns are near-instant)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", create_perfetto_link: bool = False):
    """Profile the enclosed block with the JAX profiler (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates fenced step timings; report percentiles and throughput."""

    def __init__(self, samples_per_step: int = 1):
        self.samples_per_step = samples_per_step
        self._durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, fence=None) -> float:
        """End the step; ``fence`` is a device scalar to fetch (the only
        reliable synchronisation on this image — see module docstring)."""
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() called before start()")
        if fence is not None:
            float(np.asarray(fence).ravel()[0])
        dt = time.perf_counter() - self._t0
        self._durations.append(dt)
        return dt

    def summary(self, skip_warmup: int = 1) -> Dict[str, float]:
        ds = np.asarray(self._durations[skip_warmup:] or self._durations)
        if ds.size == 0:  # no steps recorded: well-defined empty summary
            return {
                "steps": 0, "mean_s": float("nan"), "p50_s": float("nan"),
                "p95_s": float("nan"), "samples_per_sec": float("nan"),
            }
        return {
            "steps": len(ds),
            "mean_s": float(ds.mean()),
            "p50_s": float(np.percentile(ds, 50)),
            "p95_s": float(np.percentile(ds, 95)),
            "samples_per_sec": float(self.samples_per_step / ds.mean()),
        }


def log_compile_time(fn: Callable, name: Optional[str] = None) -> Callable:
    """Wrap a jitted fn; print first-call (compile) vs steady-state latency."""
    label = name or getattr(fn, "__name__", "fn")
    state = {"calls": 0, "first": None}

    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        state["calls"] += 1
        if state["calls"] == 1:
            state["first"] = dt
            print(f"[{label}] first call (incl. compile): {dt:.2f}s")
        elif state["calls"] == 2:
            print(f"[{label}] steady-state dispatch: {dt * 1e3:.2f}ms")
        return out

    return wrapped
