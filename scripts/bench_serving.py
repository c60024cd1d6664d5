"""Serving latency at WSI scale: ragged 1k-8k bags, no recompiles.

Measures the Predictor's per-request latency (p50/p95) on the flagship BRCA
configuration with bucket-aware ragged serving and arena-mode serving —
the VERDICT r2 item 8 deliverable for BENCH_NOTES. Each request is one
patient (batch_size 1 micro-batch would under-fill; we serve batch 8).

Latency here includes the axon relay's dispatch+readback round-trip
(~30-500 ms p50 depending on session, measured alongside) — on-pod serving
without the relay removes that constant.
"""

from __future__ import annotations

import json
import time

import numpy as np

BUCKETS = [1024, 2048, 4096, 8192]
OMIC_D, PATCH_D, OUT = 2000, 2048, 4


def main():
    import jax

    from healnet_tpu.models import HealNetModule
    from healnet_tpu.serving import Predictor

    module = HealNetModule(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D), num_spatial_axes=(1, 1),
        out_dims=OUT, depth=2, num_freq_bands=2, max_freq=2.0, l_c=17, l_d=126,
        x_heads=1, l_heads=8, cross_dim_head=63, latent_dim_head=20,
        self_per_cross_attn=0, snn=True,
    )
    rng = np.random.default_rng(0)
    init = (
        np.zeros((1, 1, OMIC_D), np.float32),
        np.zeros((1, BUCKETS[0], PATCH_D), np.float32),
    )
    params = module.init(jax.random.PRNGKey(0), init)["params"]

    # --- ragged serving: requests of 8 patients with log-normal bag sizes
    predictor = Predictor(module, params, batch_size=8, bucket_boundaries=BUCKETS)
    lengths_pool = np.clip(
        rng.lognormal(np.log(2800), 0.55, size=400), 1000, 8192
    ).astype(int)

    def request(i):
        ls = lengths_pool[i * 8 : (i + 1) * 8]
        omic = rng.normal(size=(8, 1, OMIC_D)).astype(np.float32)
        bags = [rng.normal(size=(l, PATCH_D)).astype(np.float32) for l in ls]
        return omic, bags

    # warm every bucket program
    warm_omic = rng.normal(size=(len(BUCKETS), 1, OMIC_D)).astype(np.float32)
    warm_bags = [rng.normal(size=(b, PATCH_D)).astype(np.float32) for b in BUCKETS]
    predictor.predict_ragged([warm_omic, warm_bags])

    lat = []
    for i in range(24):
        omic, bags = request(i)
        t0 = time.perf_counter()
        out = predictor.predict_ragged([omic, bags])
        assert out["risk"].shape == (8,)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    n_programs = predictor._predict._cache_size()

    # --- arena-mode serving: same bags resident in HBM, index-only requests
    total = int(lengths_pool[:192].sum())
    arena = rng.normal(size=(total + 8192, PATCH_D)).astype(np.float32)
    offsets = np.zeros(192, np.int32)
    cursor = 0
    for i, l in enumerate(lengths_pool[:192]):
        offsets[i] = cursor
        cursor += int(l)
    predictor_a = Predictor(
        module, params, batch_size=8, bucket_boundaries=BUCKETS,
        feature_arena=arena,
    )
    omic_all = rng.normal(size=(192, 1, OMIC_D)).astype(np.float32)
    predictor_a.predict_from_arena(  # warm
        [omic_all[:8]], offsets[:8], lengths_pool[:8]
    )
    lat_a = []
    for i in range(1, 24):
        sel = slice(i * 8, (i + 1) * 8)
        t0 = time.perf_counter()
        out = predictor_a.predict_from_arena(
            [omic_all[sel]], offsets[sel], lengths_pool[sel]
        )
        assert out["risk"].shape == (8,)
        lat_a.append(time.perf_counter() - t0)
    lat_a_ms = np.asarray(lat_a) * 1e3

    print(json.dumps({
        "ragged_p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "ragged_p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "arena_p50_ms": round(float(np.percentile(lat_a_ms, 50)), 1),
        "arena_p95_ms": round(float(np.percentile(lat_a_ms, 95)), 1),
        "batch": 8, "compiled_programs": int(n_programs),
        "buckets": BUCKETS,
    }))


if __name__ == "__main__":
    main()
