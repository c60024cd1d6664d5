"""Serving latency at WSI scale: ragged 1k-8k bags, no recompiles.

Measures per-request latency on the flagship BRCA configuration across the
serving modes: dense fixed-shape, bucket-aware ragged, arena-resident
(index-only requests), each on the live Predictor, plus the ragged path on
the ExportedPredictor artifact (live-vs-exported drift check).
Each request is one micro-batch of 8 patients. Writes BENCH_SERVING.json
next to the repo root when --write is passed.

Two latency figures per mode, because this harness runs through the axon
relay tunnel:
- `e2e_*`: wall-clock per request INCLUDING the relay's H2D transfer of the
  feature bags (~4-14 MB/s session-dependent) and dispatch round-trip
  (~30-500 ms). This is the tunnel-bound figure; on-pod serving does not
  pay it.
- `compute_*`: device-side step latency measured by chaining requests
  through a carry inside one jitted loop (the relay-safe methodology of
  BENCH_NOTES.md) — what an on-pod server would see per micro-batch.

Arena mode is the H2D-free design: features stay resident in HBM and
requests carry only (offsets, lengths), so even through the tunnel the
request payload is bytes, not hundreds of MB.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BUCKETS = [1024, 2048, 4096, 8192]
OMIC_D, PATCH_D, OUT = 2000, 2048, 4
N_RAGGED = 8          # ragged e2e requests (each ships ~90MB through the relay)
N_ARENA = 24          # arena e2e requests (payload = indices only)
ARENA_BAGS = 96       # 96 bags x ~2.8k rows x 2048 bf16 ~= 1.1 GB resident


def log(msg):
    print(f"[bench_serving +{time.perf_counter() - T0:.0f}s] {msg}", flush=True)


T0 = time.perf_counter()


def _arena_leg(jax, jnp, module, params, rng, lengths_pool, warm_stats):
    """Arena-mode measurement: resident bags, index-only requests, prewarm
    via Predictor.warmup. Returns the arena record fields (plus the raw
    latencies under '_lat_ms' for the caller's aggregate record)."""
    from healnet_tpu.serving import Predictor

    total = int(lengths_pool[:ARENA_BAGS].sum())
    arena = jnp.asarray(
        rng.normal(size=(total + 8192, PATCH_D)), jnp.bfloat16
    )
    offsets = np.zeros(ARENA_BAGS, np.int32)
    cursor = 0
    for i, l in enumerate(lengths_pool[:ARENA_BAGS]):
        offsets[i] = cursor
        cursor += int(l)
    log(f"uploading {arena.nbytes/1e9:.1f} GB arena (one-time)")
    predictor_a = Predictor(
        module, params, batch_size=8, bucket_boundaries=BUCKETS,
        feature_arena=arena,
    )
    omic_all = rng.normal(size=(ARENA_BAGS, 1, OMIC_D)).astype(np.float32)
    # prewarm ALL bucket widths' arena programs — before this API, widths
    # first hit by a live request compiled inline (the round-4 4.07 s p99)
    warm_a = predictor_a.warmup(
        example_shapes=[(1, OMIC_D), (2048, PATCH_D)], widths=BUCKETS
    )
    log(f"arena resident; warmup {warm_a['programs']} programs in "
        f"{warm_a['seconds']:.1f}s")
    lat_a = []
    for i in range(N_ARENA):
        sel = slice((i * 8) % (ARENA_BAGS - 8), (i * 8) % (ARENA_BAGS - 8) + 8)
        t0 = time.perf_counter()
        out = predictor_a.predict_from_arena(
            [omic_all[sel]], offsets[sel], lengths_pool[sel]
        )
        assert out["risk"].shape == (8,)
        lat_a.append(time.perf_counter() - t0)
        log(f"arena request {i}: {lat_a[-1]*1e3:.0f} ms")
    lat_a_ms = np.asarray(lat_a) * 1e3
    rec = {
        "e2e_arena_p50_ms": round(float(np.percentile(lat_a_ms, 50)), 1),
        "e2e_arena_p95_ms": round(float(np.percentile(lat_a_ms, 95)), 1),
        "e2e_arena_p99_ms": round(float(np.percentile(lat_a_ms, 99)), 1),
        "e2e_arena_samples_per_sec": round(
            8e3 / float(np.percentile(lat_a_ms, 50)), 1
        ),
        "warmup_arena_seconds": round(float(warm_a["seconds"]), 1),
        "warmup_arena_programs": int(warm_a["programs"]),
        "_lat_ms": lat_a_ms,
    }
    if warm_stats is not None:
        rec["warmup_seconds"] = round(float(warm_stats["seconds"]), 1)
    return rec


def main():
    import jax
    import jax.numpy as jnp

    from healnet_tpu.models import HealNetModule
    from healnet_tpu.serving import Predictor

    arena_only = "--arena-only" in sys.argv

    module = HealNetModule(
        n_modalities=2, channel_dims=(OMIC_D, PATCH_D), num_spatial_axes=(1, 1),
        out_dims=OUT, depth=2, num_freq_bands=2, max_freq=2.0, l_c=17, l_d=126,
        x_heads=1, l_heads=8, cross_dim_head=63, latent_dim_head=20,
        self_per_cross_attn=0, snn=True, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    init = (
        np.zeros((1, 1, OMIC_D), np.float32),
        np.zeros((1, BUCKETS[0], PATCH_D), np.float32),
    )
    params = module.init(jax.random.PRNGKey(0), init)["params"]
    log("params initialised")

    lengths_pool = np.clip(
        rng.lognormal(np.log(2800), 0.55, size=400), 1000, 8192
    ).astype(int)

    # --- ragged serving: requests of 8 patients with log-normal bag sizes
    predictor = Predictor(module, params, batch_size=8, bucket_boundaries=BUCKETS)

    if arena_only:
        # re-measure ONLY warmup + the arena mode (the payload-light design;
        # the other modes are relay-H2D-dominated and hours-slow on a slow
        # tunnel) and merge the updated fields into the existing JSON
        record = _arena_leg(jax, jnp, module, params, rng, lengths_pool, None)
        record.pop("_lat_ms")
        record["n_requests_arena"] = N_ARENA
        out_path = Path(__file__).resolve().parent.parent / "BENCH_SERVING.json"
        merged = json.loads(out_path.read_text()) if out_path.exists() else {}
        merged.update(record)
        print(json.dumps(record))
        if "--write" in sys.argv:
            out_path.write_text(json.dumps(merged, indent=1))
            log(f"merged arena fields into {out_path}")
        return

    def request(i):
        ls = lengths_pool[i * 8 : (i + 1) * 8]
        omic = rng.normal(size=(8, 1, OMIC_D)).astype(np.float32)
        # bf16 bags: halves the relay payload; the model computes bf16 anyway
        bags = [
            jnp.asarray(rng.normal(size=(l, PATCH_D)), jnp.bfloat16) for l in ls
        ]
        return omic, bags

    # warm every serving program up-front via the prewarm API (dense at the
    # 2048 example shape + one masked program per bucket width)
    warm_stats = predictor.warmup(
        example_shapes=[(1, OMIC_D), (2048, PATCH_D)], widths=BUCKETS
    )
    log(f"warmup: {warm_stats['programs']} programs in "
        f"{warm_stats['seconds']:.1f}s")
    warm_omic = rng.normal(size=(len(BUCKETS), 1, OMIC_D)).astype(np.float32)
    warm_bags = [
        jnp.asarray(rng.normal(size=(b, PATCH_D)), jnp.bfloat16) for b in BUCKETS
    ]

    lat = []
    for i in range(N_RAGGED):
        omic, bags = request(i)
        t0 = time.perf_counter()
        out = predictor.predict_ragged([omic, bags])
        assert out["risk"].shape == (8,)
        lat.append(time.perf_counter() - t0)
        log(f"ragged request {i}: {lat[-1]*1e3:.0f} ms")
    lat_ms = np.asarray(lat) * 1e3
    n_programs = predictor._predict._cache_size()

    # --- dense fixed-shape serving: every bag already padded to one width
    dense_bags = rng.normal(size=(8, 2048, PATCH_D)).astype(np.float32)
    dense_omic = rng.normal(size=(8, 1, OMIC_D)).astype(np.float32)
    # already compiled by warmup(); first call here is a live request
    lat_d = []
    for i in range(N_RAGGED):
        t0 = time.perf_counter()
        out = predictor([dense_omic, dense_bags])
        assert out["risk"].shape == (8,)
        lat_d.append(time.perf_counter() - t0)
        log(f"dense request {i}: {lat_d[-1]*1e3:.0f} ms")
    lat_d_ms = np.asarray(lat_d) * 1e3

    # --- exported-artifact serving: the same ragged requests through the
    # ExportedPredictor (StableHLO artifact), live-vs-exported drift check
    import tempfile

    from healnet_tpu.serving_export import ExportedPredictor

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/artifact"
        predictor.export(
            path, example_shapes=[(1, OMIC_D), (BUCKETS[0], PATCH_D)],
            widths=BUCKETS,
        )
        exported = ExportedPredictor(path)
        # warm every bucket program
        exported.predict_ragged([warm_omic, warm_bags])
        log("exported artifact loaded; bucket programs warm")
        lat_x = []
        risk_drift = 0.0
        for i in range(N_RAGGED):
            omic, bags = request(i)
            t0 = time.perf_counter()
            out_x = exported.predict_ragged([omic, bags])
            lat_x.append(time.perf_counter() - t0)
            out_l = predictor.predict_ragged([omic, bags])
            risk_drift = max(
                risk_drift,
                float(np.max(np.abs(out_x["risk"] - out_l["risk"]))),
            )
            log(f"exported ragged request {i}: {lat_x[-1]*1e3:.0f} ms")
    lat_x_ms = np.asarray(lat_x) * 1e3
    log(f"live-vs-exported max risk drift: {risk_drift:.2e}")

    # --- device-side compute latency per bucket (relay-free, chained)
    compute_ms = {}
    for bucket in (2048, 8192):
        bags = jnp.asarray(
            rng.normal(size=(8, bucket, PATCH_D)), jnp.bfloat16
        )
        omic = jnp.asarray(rng.normal(size=(8, 1, OMIC_D)), jnp.float32)
        mask = jnp.ones((8, bucket), bool)

        @jax.jit
        def loop(n, omic, bags):
            def body(i, acc):
                o = omic + (acc * 1e-30).astype(omic.dtype)
                logits = module.apply(
                    {"params": params}, [o, bags],
                    kv_masks=[None, mask],
                )
                return acc + jnp.sum(logits.astype(jnp.float32))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(1, omic, bags))
        mins = {}
        for n in (1, 20):
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                float(loop(n, omic, bags))
                best = min(best, time.perf_counter() - t0)
            mins[n] = best
        compute_ms[bucket] = round((mins[20] - mins[1]) / 19 * 1e3, 3)
        log(f"compute latency bucket {bucket}: {compute_ms[bucket]} ms")

    # --- arena-mode serving: bags resident in HBM, index-only requests
    arena_rec = _arena_leg(jax, jnp, module, params, rng, lengths_pool, warm_stats)
    lat_a_ms = arena_rec.pop("_lat_ms")
    warm_a = {"seconds": arena_rec["warmup_arena_seconds"]}

    record = {
        "e2e_dense2048_p50_ms": round(float(np.percentile(lat_d_ms, 50)), 1),
        "e2e_dense2048_p95_ms": round(float(np.percentile(lat_d_ms, 95)), 1),
        "e2e_ragged_p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "e2e_ragged_p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "e2e_ragged_exported_p50_ms": round(float(np.percentile(lat_x_ms, 50)), 1),
        "e2e_ragged_exported_p95_ms": round(float(np.percentile(lat_x_ms, 95)), 1),
        "e2e_arena_p50_ms": round(float(np.percentile(lat_a_ms, 50)), 1),
        "e2e_arena_p95_ms": round(float(np.percentile(lat_a_ms, 95)), 1),
        "e2e_arena_p99_ms": round(float(np.percentile(lat_a_ms, 99)), 1),
        "compute_ms_per_batch8": compute_ms,
        # on-pod throughput ceiling per mode: 8 patients / device-side step
        "compute_samples_per_sec": {
            str(k): round(8e3 / v, 1) for k, v in compute_ms.items()
        },
        # tunnel-bound request rate actually observed (arena mode: the
        # payload-light design; others are relay-H2D-dominated here)
        "e2e_arena_samples_per_sec": round(
            8e3 / float(np.percentile(lat_a_ms, 50)), 1
        ),
        "live_vs_exported_max_risk_drift": float(f"{risk_drift:.3e}"),
        "warmup_seconds": round(float(warm_stats["seconds"]), 1),
        "warmup_arena_seconds": round(float(warm_a["seconds"]), 1),
        "batch": 8, "compiled_programs": int(n_programs),
        "buckets": BUCKETS,
        "n_requests": {
            "dense": N_RAGGED, "ragged": N_RAGGED,
            "exported": N_RAGGED, "arena": N_ARENA,
        },
    }
    print(json.dumps(record))
    if "--write" in sys.argv:
        out_path = Path(__file__).resolve().parent.parent / "BENCH_SERVING.json"
        out_path.write_text(json.dumps(record, indent=1))
        log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
