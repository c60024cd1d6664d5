"""Native C++ runtime tests: feature cache + c-index parity."""

import numpy as np
import pytest

from healnet_tpu.runtime import (
    NativeFeatureCache,
    concordance_index_native,
    native_available,
)
from healnet_tpu.train.metrics import concordance_index_censored

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime unbuildable on this host"
)


def test_cindex_parity_random(rng):
    for trial in range(5):
        n = 200
        time = rng.uniform(1, 100, n)
        if trial % 2:
            time = np.round(time)  # force tied times
        event = rng.uniform(size=n) > 0.4
        event[0] = True
        est = np.round(rng.normal(size=n), 2)  # force tied risks
        ref = concordance_index_censored(event, time, est)
        nat = concordance_index_native(event, time, est)
        assert nat[1:] == ref[1:], (trial, nat, ref)
        np.testing.assert_allclose(nat[0], ref[0], rtol=1e-12)


def test_cindex_native_errors():
    with pytest.raises(ValueError):
        concordance_index_native(np.zeros(4, bool), np.arange(4.0), np.arange(4.0))


def test_cindex_native_speed(rng):
    import time as _time

    n = 3000
    t = rng.uniform(1, 100, n)
    e = rng.uniform(size=n) > 0.4
    est = rng.normal(size=n)
    t0 = _time.perf_counter()
    concordance_index_native(e, t, est)
    native_s = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    concordance_index_censored(e, t, est)
    numpy_s = _time.perf_counter() - t0
    # informational: native should not be slower by more than ~5x even cold
    print(f"native {native_s * 1e3:.1f}ms vs numpy {numpy_s * 1e3:.1f}ms")
    assert native_s < max(numpy_s * 5, 1.0)


def test_feature_cache_roundtrip(tmp_path, rng):
    cache = NativeFeatureCache(capacity_mb=8)
    arrays = {}
    for i in range(4):
        a = rng.normal(size=(10, 16)).astype(np.float32)
        p = tmp_path / f"feat_{i}.npy"
        np.save(p, a)
        arrays[str(p)] = a
    for p, a in arrays.items():
        loaded = cache.load(p)
        np.testing.assert_array_equal(loaded, a)
    # second read is a hit
    before = cache.stats["hits"]
    cache.load(list(arrays)[0])
    assert cache.stats["hits"] == before + 1
    assert cache.stats["entries"] == 4


def test_feature_cache_float64_and_eviction(tmp_path, rng):
    cache = NativeFeatureCache(capacity_mb=1)
    # f8 input downcast to f4
    a64 = rng.normal(size=(8, 4))
    p = tmp_path / "f8.npy"
    np.save(p, a64)
    loaded = cache.load(p)
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, a64.astype(np.float32))
    # overflow the 1MB capacity -> eviction keeps bytes bounded
    for i in range(10):
        q = tmp_path / f"big_{i}.npy"
        np.save(q, rng.normal(size=(200, 256)).astype(np.float32))  # 200KB each
        cache.load(q)
    assert cache.stats["bytes"] <= 1024 * 1024


def test_feature_cache_prefetch(tmp_path, rng):
    import time as _time

    cache = NativeFeatureCache(capacity_mb=8, n_threads=2)
    paths = []
    for i in range(6):
        p = tmp_path / f"pf_{i}.npy"
        np.save(p, rng.normal(size=(64, 64)).astype(np.float32))
        paths.append(p)
    cache.prefetch(paths)
    deadline = _time.time() + 5
    while cache.stats["entries"] < 6 and _time.time() < deadline:
        _time.sleep(0.01)
    assert cache.stats["entries"] == 6
    # loads after prefetch are hits
    before = cache.stats["hits"]
    cache.load(paths[0])
    assert cache.stats["hits"] == before + 1


def test_feature_cache_missing_file(tmp_path):
    cache = NativeFeatureCache(capacity_mb=1)
    with pytest.raises(IOError):
        cache.load(tmp_path / "nope.npy")


def test_feature_cache_concurrent_load_prefetch_stress(tmp_path, rng):
    """Hammer the same paths from prefetch workers and loader threads at a
    capacity that forces constant eviction — guards the double-insert race
    (ADVICE r1: ensure() re-checks after re-locking) and byte accounting."""
    import threading

    from healnet_tpu.runtime import NativeFeatureCache, native_available

    if not native_available():
        pytest.skip("native runtime unavailable")

    paths = []
    arrays = []
    for i in range(12):
        # ~384 KB each: a 1 MB capacity fits only ~2, forcing constant
        # eviction under the concurrent load below
        a = rng.normal(size=(384, 256)).astype(np.float32)
        p = tmp_path / f"f{i}.npy"
        np.save(p, a)
        paths.append(p)
        arrays.append(a)

    cache = NativeFeatureCache(capacity_mb=1, n_threads=4)
    errors = []

    def loader(seed):
        r = np.random.default_rng(seed)
        try:
            for _ in range(100):
                j = int(r.integers(0, len(paths)))
                cache.prefetch([paths[(j + 1) % len(paths)]])
                out = cache.load(paths[j])
                np.testing.assert_array_equal(out, arrays[j], err_msg=f"file {j}")
        except Exception as exc:  # pragma: no cover
            import traceback

            errors.append(traceback.format_exc())

    threads = [threading.Thread(target=loader, args=(s,)) for s in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:1]
    stats = cache.stats
    assert stats["bytes"] <= 1 * 1024 * 1024  # byte bound holds after churn


@pytest.mark.skipif(
    not native_available(), reason="native runtime unbuildable on this host"
)
def test_cindex_native_nan_estimates_match_numpy(rng):
    """NaN risk estimates (a diverged model) count as discordant in BOTH
    implementations — the native path used to credit them 0.5 as tied_risk,
    so hosts with/without a g++ toolchain reported different c-indexes for
    the same run (round-3 review)."""
    n = 64
    time = rng.uniform(1, 100, n)
    event = rng.uniform(size=n) < 0.7
    est = rng.normal(size=n)
    est[rng.choice(n, 9, replace=False)] = np.nan
    ref = concordance_index_censored(event, time, est)
    nat = concordance_index_native(event, time, est)
    assert ref[1:] == nat[1:], (ref, nat)
    np.testing.assert_allclose(nat[0], ref[0], rtol=1e-12)
