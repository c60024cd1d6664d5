"""ctypes bindings to the native runtime (libhealnet_runtime.so).

See `cpp/healnet_runtime.cc` for what lives on the native side and why.
The library is built on demand (``make -C cpp``) the first time it is needed;
every entry point has a pure-Python fallback, so the package works without a
toolchain — the native path is a performance feature, not a dependency.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent / "libhealnet_runtime.so"
_CPP_DIR = Path(__file__).parent.parent.parent / "cpp"
_LIB: Optional[ctypes.CDLL] = None
_BUILD_TRIED = False


def _build() -> bool:
    global _BUILD_TRIED
    if _BUILD_TRIED:
        return _LIB_PATH.exists()
    _BUILD_TRIED = True
    try:
        subprocess.run(
            ["make", "-C", str(_CPP_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.hn_cache_create.restype = ctypes.c_void_p
    lib.hn_cache_create.argtypes = [ctypes.c_size_t, ctypes.c_int]
    lib.hn_cache_destroy.argtypes = [ctypes.c_void_p]
    lib.hn_cache_ensure.restype = ctypes.c_int64
    lib.hn_cache_ensure.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hn_cache_read.restype = ctypes.c_int
    lib.hn_cache_read.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.hn_cache_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int
    ]
    for fn in ("hn_cache_bytes", "hn_cache_count", "hn_cache_hits", "hn_cache_heals"):
        getattr(lib, fn).restype = ctypes.c_uint64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.hn_concordance_index.restype = ctypes.c_int
    lib.hn_concordance_index.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeFeatureCache:
    """Byte-bounded LRU over decoded .npy feature tensors + prefetch pool."""

    def __init__(self, capacity_mb: int = 2048, n_threads: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native runtime unavailable (g++ build failed or missing)"
            )
        self._lib = lib
        self._handle = lib.hn_cache_create(capacity_mb * 1024 * 1024, n_threads)
        self._warned_thrash = False

    def load(self, path) -> np.ndarray:
        path_b = str(path).encode()
        ndim = ctypes.c_int64()
        shape = (ctypes.c_int64 * 8)()
        count = self._lib.hn_cache_ensure(self._handle, path_b, ctypes.byref(ndim), shape)
        if count < 0:
            raise IOError(f"native cache could not load {path}")
        out = np.empty(count, dtype=np.float32)
        ok = self._lib.hn_cache_read(
            self._handle, path_b,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), count,
        )
        if not ok:
            raise IOError(f"native cache read failed for {path} (IO error)")
        heals = int(self._lib.hn_cache_heals(self._handle))
        if heals >= 64 and not self._warned_thrash:
            hits = int(self._lib.hn_cache_hits(self._handle))
            if heals > max(hits, 1):
                import warnings

                self._warned_thrash = True
                warnings.warn(
                    f"native feature cache is thrashing ({heals} self-healed "
                    f"reads vs {hits} hits): capacity is undersized for the "
                    "working set — every load pays a second disk read. "
                    "Raise native_cache_mb.",
                    stacklevel=2,
                )
        return out.reshape(tuple(shape[i] for i in range(ndim.value)))

    def prefetch(self, paths: Sequence) -> None:
        encoded = [str(p).encode() for p in paths]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self._lib.hn_cache_prefetch(self._handle, arr, len(encoded))

    @property
    def stats(self) -> dict:
        return {
            "bytes": int(self._lib.hn_cache_bytes(self._handle)),
            "entries": int(self._lib.hn_cache_count(self._handle)),
            "hits": int(self._lib.hn_cache_hits(self._handle)),
            # reads that self-healed after an eviction race: persistently
            # high vs hits means capacity_mb is undersized for the working
            # set (every load pays a second disk read)
            "heals": int(self._lib.hn_cache_heals(self._handle)),
        }

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_handle", None):
                self._lib.hn_cache_destroy(self._handle)
                self._handle = None
        except Exception:
            pass


def concordance_index_native(
    event_indicator: np.ndarray,
    event_time: np.ndarray,
    estimate: np.ndarray,
    tied_tol: float = 1e-8,
) -> Tuple[float, int, int, int, int]:
    """Native c-index; numerically identical to the numpy implementation."""
    lib = _load()
    if lib is None:
        from healnet_tpu.train.metrics import concordance_index_censored

        return concordance_index_censored(event_indicator, event_time, estimate, tied_tol)
    event = np.ascontiguousarray(np.asarray(event_indicator, bool).view(np.uint8))
    time = np.ascontiguousarray(event_time, dtype=np.float64)
    est = np.ascontiguousarray(estimate, dtype=np.float64)
    n = time.shape[0]
    if not event.any():
        raise ValueError("All samples are censored — concordance index is undefined")
    con = ctypes.c_int64()
    dis = ctypes.c_int64()
    tr = ctypes.c_int64()
    tt = ctypes.c_int64()
    ci = ctypes.c_double()
    status = lib.hn_concordance_index(
        event.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        time.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        est.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, tied_tol,
        ctypes.byref(con), ctypes.byref(dis), ctypes.byref(tr), ctypes.byref(tt),
        ctypes.byref(ci),
    )
    if status != 0:
        raise ValueError("No comparable pairs available")
    return float(ci.value), con.value, dis.value, tr.value, tt.value
