"""ETL tests: MMDataset, survival binning parity, TCGA loader on synthetic fixtures."""

import io
import zipfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from healnet_tpu.etl import (
    DevicePrefetcher,
    LRUCache,
    MMDataset,
    TCGADataset,
    class_weights,
    discretize_survival,
    train_val_test_split,
)
from healnet_tpu.utils import Box


def test_mmdataset_indexing(rng):
    tab = rng.normal(size=(50, 1, 10)).astype(np.float32)
    img = rng.normal(size=(50, 8, 8, 3)).astype(np.float32)
    target = rng.integers(0, 4, size=50)
    ds = MMDataset([tab, img], target)
    assert len(ds) == 50
    sample, y = ds[7]
    assert sample[0].shape == (1, 10) and sample[1].shape == (8, 8, 3)
    assert y == target[7]
    ds2 = MMDataset([tab, img])
    assert len(ds2[0]) == 2


def test_mmdataset_mismatched_lengths(rng):
    with pytest.raises(AssertionError):
        MMDataset([np.zeros((5, 2)), np.zeros((6, 2))])


def test_discretize_survival_uncensored_subset():
    # bins cut on the uncensored subset, eps-widened, applied to everyone
    df = pd.DataFrame(
        {
            "survival_months": np.r_[np.linspace(1, 100, 40), [0.5, 150.0]],
            "censorship": np.r_[np.zeros(40), [1, 1]],
        }
    )
    y = discretize_survival(df, n_bins=4, subset="uncensored")
    assert set(y.unique()) <= {0, 1, 2, 3}
    # extreme censored samples fall in the outer bins thanks to eps-widening
    assert y.iloc[-2] == 0 and y.iloc[-1] == 3
    # roughly balanced over the uncensored subset
    counts = y.iloc[:40].value_counts()
    assert counts.min() >= 8


def test_discretize_survival_matches_reference_formula():
    """Cross-check against a direct pandas restatement of `loaders.py:327-343`."""
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "survival_months": rng.uniform(1, 120, size=200),
            "censorship": rng.integers(0, 2, size=200),
        }
    )
    ours = discretize_survival(df, n_bins=4, subset="uncensored", eps=1e-6)
    subset_df = df[df["censorship"] == 0]
    _, q_bins = pd.qcut(subset_df["survival_months"], q=4, retbins=True, labels=False)
    q_bins[-1] = df["survival_months"].max() + 1e-6
    q_bins[0] = df["survival_months"].min() - 1e-6
    ref = pd.cut(
        df["survival_months"], bins=q_bins, labels=False, right=False,
        include_lowest=True,
    ).astype(int)
    np.testing.assert_array_equal(ours.values, ref.values)


def test_class_weights():
    y = np.array([0, 0, 0, 1, 2, 2])
    np.testing.assert_allclose(class_weights(y, "inverse"), [1 / 3, 1.0, 0.5])
    np.testing.assert_allclose(
        class_weights(y, "inverse_root"), [1 / np.sqrt(3), 1.0, 1 / np.sqrt(2)]
    )
    assert class_weights(y, "None") is None


def test_split_sizes():
    tr, te, va = train_val_test_split(100, seed=1)
    assert len(tr) == 70 and len(te) == 15 and len(va) == 15
    assert len(set(tr) | set(te) | set(va)) == 100


def test_lru_cache():
    c = LRUCache(capacity=2)
    c.set("a", 1)
    c.set("b", 2)
    assert c.get("a") == 1  # refresh a
    c.set("c", 3)  # evicts b
    assert "b" not in c and "a" in c and "c" in c


# ---------------------------------------------------------------- TCGA fixture

N_SAMPLES = 24
N_FEATS = 10
N_PATCHES = 6
PATCH_DIM = 16


@pytest.fixture
def tcga_root(tmp_path, rng):
    root = tmp_path / "tcga"
    (root / "omic").mkdir(parents=True)
    patches = root / "wsi" / "brca_preprocessed_level2" / "patches"
    features = root / "wsi" / "brca_preprocessed_level2" / "patch_features"
    patches.mkdir(parents=True)
    features.mkdir(parents=True)

    slide_ids = [f"TCGA-XX-{i:04d}" for i in range(N_SAMPLES)]
    for sid in slide_ids:
        (patches / f"{sid}.h5").touch()
        np.save(features / f"{sid}.npy",
                rng.normal(size=(N_PATCHES, PATCH_DIM)).astype(np.float32))

    df = pd.DataFrame(
        rng.normal(size=(N_SAMPLES, N_FEATS)).astype(np.float32),
        columns=[f"gene_{i}" for i in range(N_FEATS)],
    )
    df.loc[3, "gene_1"] = np.nan  # exercise imputation
    df["site"] = "breast"
    df["oncotree_code"] = "IDC"
    df["case_id"] = [f"case_{i}" for i in range(N_SAMPLES)]
    df["slide_id"] = [sid + ".svs" for sid in slide_ids]
    df["train"] = 1
    df["censorship"] = rng.integers(0, 2, size=N_SAMPLES)
    df["survival_months"] = rng.uniform(5, 100, size=N_SAMPLES)
    df.to_csv(root / "omic" / "tcga_brca_all_clean.csv.zip", compression="zip")
    return root


def _config(root, model="healnet", omic_attention=True):
    return Box(
        {
            "tcga_path": str(root),
            "model": model,
            "omic_attention": omic_attention,
            "survival.subset": "uncensored",
        }
    )


def test_tcga_dataset_bimodal(tcga_root):
    ds = TCGADataset("brca", _config(tcga_root), n_bins=4)
    assert len(ds) == N_SAMPLES
    [omic, slide], c, t, y = ds[0]
    assert omic.shape == (1, N_FEATS)          # omic_attention layout
    assert slide.shape == (PATCH_DIM, N_PATCHES)  # transposed (`loaders.py:394`)
    assert np.isfinite(omic).all()             # NaN imputed
    assert y in (0, 1, 2, 3)
    # cache hit second time
    ds[0]
    assert len(ds._cache) >= 1


def test_tcga_dataset_omic_only_and_layout(tcga_root):
    ds = TCGADataset(
        "brca", _config(tcga_root, omic_attention=False), sources=["omic"], n_bins=4
    )
    [omic], *_ = ds[1]
    assert omic.shape == (N_FEATS, 1)


def test_tcga_dataset_early_fusion_concat(tcga_root):
    ds = TCGADataset("brca", _config(tcga_root, model="healnet_early"), n_bins=4)
    [concat], *_ = ds[0]
    assert concat.shape == (1, N_FEATS + N_PATCHES * PATCH_DIM)
    ds_fcnn = TCGADataset("brca", _config(tcga_root, model="fcnn"), n_bins=4)
    [flat], *_ = ds_fcnn[0]
    assert flat.ndim == 1


def test_tcga_iter_batches_and_trainer_format(tcga_root):
    ds = TCGADataset("brca", _config(tcga_root), n_bins=4)
    batches = list(ds.iter_batches(batch_size=8))
    assert len(batches) == 3
    b = batches[0]
    assert b["tensors"][0].shape == (8, 1, N_FEATS)
    assert b["tensors"][1].shape == (8, PATCH_DIM, N_PATCHES)
    assert b["sample_mask"].shape == (8,)
    data = ds.materialize()
    assert data["tensors"][0].shape[0] == N_SAMPLES


def test_trainer_consumes_streaming_tcga(tcga_root):
    """SurvivalTrainer trains straight from the streaming TCGA source."""
    from healnet_tpu.models import HealNetModule
    from healnet_tpu.train import SurvivalTrainer

    ds = TCGADataset("brca", _config(tcga_root), n_bins=4)
    module = HealNetModule(
        n_modalities=2,
        channel_dims=(N_FEATS, N_PATCHES),
        num_spatial_axes=(1, 1),
        out_dims=4,
        depth=1, l_c=4, l_d=8, x_heads=1, l_heads=1,
        cross_dim_head=4, latent_dim_head=4, self_per_cross_attn=0,
    )
    trainer = SurvivalTrainer(module, batch_size=8, epochs=1, early_stopping=False, gc_compat=1)
    res = trainer.fit(ds, ds, verbose=False)
    assert np.isfinite(res["train_loss"])


def test_device_prefetcher_order(tcga_root):
    ds = TCGADataset("brca", _config(tcga_root), n_bins=4)
    direct = [b["y_disc"] for b in ds.iter_batches(batch_size=8)]
    prefetched = [
        np.asarray(b["y_disc"])
        for b in DevicePrefetcher(ds.iter_batches(batch_size=8), depth=2)
    ]
    assert len(direct) == len(prefetched)
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a, b)


@pytest.fixture
def ragged_tcga_root(tmp_path, rng):
    """TCGA tree with VARIABLE patch counts per slide."""
    root = tmp_path / "tcga_ragged"
    (root / "omic").mkdir(parents=True)
    patches = root / "wsi" / "brca_preprocessed_level2" / "patches"
    features = root / "wsi" / "brca_preprocessed_level2" / "patch_features"
    patches.mkdir(parents=True)
    features.mkdir(parents=True)
    counts = [3, 6, 2, 5, 6, 4, 1, 6, 3, 2, 5, 4]
    sids = [f"TCGA-R{i:03d}" for i in range(len(counts))]
    for sid, n in zip(sids, counts):
        (patches / f"{sid}.h5").touch()
        np.save(features / f"{sid}.npy",
                rng.normal(size=(n, PATCH_DIM)).astype(np.float32))
    df = pd.DataFrame(
        rng.normal(size=(len(sids), N_FEATS)).astype(np.float32),
        columns=[f"gene_{i}" for i in range(N_FEATS)],
    )
    df["site"] = "b"; df["oncotree_code"] = "x"
    df["case_id"] = sids
    df["slide_id"] = [s + ".svs" for s in sids]
    df["train"] = 1
    df["censorship"] = rng.integers(0, 2, len(sids))
    df["survival_months"] = rng.uniform(5, 100, len(sids))
    df.to_csv(root / "omic" / "tcga_brca_all_clean.csv.zip", compression="zip")
    return root, counts


def test_ragged_bags_reference_layout(ragged_tcga_root):
    """Parity layout: ragged bags zero-padded as channels to max_patches."""
    root, counts = ragged_tcga_root
    ds = TCGADataset("brca", _config(root), n_bins=4)
    assert ds.max_patches == max(counts)
    [_, slide], *_ = ds[0]
    assert slide.shape == (PATCH_DIM, max(counts))
    batch = next(ds.iter_batches(4))
    assert batch["tensors"][1].shape == (4, PATCH_DIM, max(counts))
    assert "kv_masks" not in batch  # channels need no mask


def test_ragged_bags_patch_attention_layout(ragged_tcga_root):
    """TPU layout: patches as tokens, per-sample KV masks, model consumes them."""
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    ds = TCGADataset("brca", cfg, n_bins=4)
    batch = next(ds.iter_batches(4))
    assert batch["tensors"][1].shape == (4, max(counts), PATCH_DIM)
    mask = batch["kv_masks"][1]
    np.testing.assert_array_equal(mask.sum(1), np.minimum(counts[:4], max(counts)))

    # padded tokens must not influence the model: train one step + compare
    from healnet_tpu.models import HealNetModule
    from healnet_tpu.train import SurvivalTrainer

    module = HealNetModule(
        n_modalities=2, channel_dims=(N_FEATS, PATCH_DIM), num_spatial_axes=(1, 1),
        out_dims=4, depth=1, l_c=4, l_d=8, x_heads=1, l_heads=1,
        cross_dim_head=4, latent_dim_head=4, self_per_cross_attn=0,
    )
    trainer = SurvivalTrainer(module, batch_size=4, epochs=1, early_stopping=False,
                              gc_compat=1, prefetch=0)
    res = trainer.fit(ds, ds, verbose=False)
    assert np.isfinite(res["train_loss"])

    # invariance: garbage in padded region must not change logits
    import jax, jax.numpy as jnp
    params = trainer.params
    b = next(ds.iter_batches(4))
    logits1 = module.apply({"params": params}, b["tensors"], kv_masks=b["kv_masks"])
    poked = list(b["tensors"])
    wsi = np.array(poked[1])
    mask = np.asarray(b["kv_masks"][1])
    wsi[~np.broadcast_to(mask[:, :, None], wsi.shape)] = 999.0
    poked[1] = wsi
    logits2 = module.apply({"params": params}, tuple(poked), kv_masks=b["kv_masks"])
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2), rtol=1e-5)


def test_bucketed_batching(ragged_tcga_root):
    """Length-bucketed batches pad only to their bucket boundary."""
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    ds = TCGADataset("brca", cfg, n_bins=4)
    batches = list(
        ds.iter_batches(batch_size=4, bucket_boundaries=[3, 6], shuffle=True,
                        rng=np.random.default_rng(0))
    )
    # every sample appears exactly once
    total_valid = sum(int(b["sample_mask"].sum()) for b in batches)
    assert total_valid == len(counts)
    widths = {b["tensors"][1].shape[1] for b in batches}
    assert widths <= {3, 6}
    for b in batches:
        width = b["tensors"][1].shape[1]
        mask = b["kv_masks"][1]
        assert mask.shape[1] == width
        # all samples in a bucket fit its boundary
        assert (mask.sum(1) <= width).all()
    # small-bag bucket actually used (padding waste reduced)
    assert 3 in widths


def test_view_indices_not_mutated_by_shuffle(tcga_root):
    ds = TCGADataset("brca", _config(tcga_root), n_bins=4)
    order = np.arange(10)
    view = ds.take(order)
    before = view.indices.copy()
    list(view.iter_batches(4, shuffle=True, rng=np.random.default_rng(0)))
    np.testing.assert_array_equal(view.indices, before)
    np.testing.assert_array_equal(order, before)


def test_shipped_gdc_manifests_parse_and_filter():
    # the repo ships the GDC manifests the download CLI reads
    # (reference /root/reference/data/tcga/gdc_manifests); the filtered set
    # must be reproducible from the full one via etl.manifests.filter_manifest
    from healnet_tpu.etl.manifests import filter_manifest, read_manifest

    root = Path(__file__).parent.parent / "data" / "tcga" / "gdc_manifests"
    filtered_all = sorted((root / "filtered").glob("*_wsi_manifest_filtered.txt"))
    assert len(filtered_all) == 8  # one per VALID_DATASETS entry
    for path in filtered_all:
        man = read_manifest(path)
        assert list(man.columns[:4]) == ["id", "filename", "md5", "size"]
        assert len(man) > 0
    for ds in ("blca", "brca", "kirp", "ucec"):
        full = read_manifest(root / "full" / f"{ds}_wsi_manifest_full.txt")
        filt = read_manifest(root / "filtered" / f"{ds}_wsi_manifest_filtered.txt")
        sub = filter_manifest(full, keep_filenames=list(filt.filename))
        assert set(sub.id) == set(filt.id)
        assert len(sub) == len(filt)


def test_feature_dtype_float16(ragged_tcga_root):
    # data.feature_dtype=float16 keeps patch features half-precision on the
    # host (halving the per-batch H2D stream); labels/omic stay fp32
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    cfg["data.feature_dtype"] = "float16"
    ds = TCGADataset("brca", cfg, n_bins=4)
    batch = next(ds.iter_batches(4))
    assert batch["tensors"][1].dtype == np.float16
    assert batch["tensors"][0].dtype == np.float32
    assert batch["censorship"].dtype == np.float32
    # f32 default unchanged
    ds32 = TCGADataset("brca", _config(root), n_bins=4)
    assert next(ds32.iter_batches(4))["tensors"][1].dtype == np.float32


def test_bucketing_works_with_explicit_max_patches(ragged_tcga_root):
    # review r2: an explicit data.max_patches must not silently disable
    # bucketing (bag sizes are scanned regardless)
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    ds = TCGADataset("brca", cfg, n_bins=4, max_patches=6)
    batches = list(ds.iter_batches(4, bucket_boundaries=[3, 6]))
    widths = {b["tensors"][1].shape[1] for b in batches}
    assert 3 in widths, "small bucket must be used with explicit max_patches"


def test_feature_arena_layout(ragged_tcga_root):
    """device_cache: packed arena rows match the per-slide features; offsets
    and lengths index the pack; the tail zero-pad keeps any fixed-width
    window in bounds."""
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    cfg["data.device_cache"] = True
    ds = TCGADataset("brca", cfg, n_bins=4)
    assert ds.device_cache
    arena, offsets, lengths = ds.feature_arena()
    assert arena.shape[0] == sum(counts) + ds.max_patches
    assert np.all(arena[-ds.max_patches:] == 0)
    for i in range(len(ds)):
        sid = ds.omic_df.iloc[i]["slide_id"].rsplit(".", 1)[0]
        feats = ds.load_patch_features(sid)
        assert lengths[i] == feats.shape[0]
        np.testing.assert_array_equal(
            arena[offsets[i] : offsets[i] + lengths[i]], feats
        )
    # cached: second call returns the same object
    assert ds.feature_arena()[0] is arena


def test_iter_batches_device_cache(ragged_tcga_root):
    """Arena-mode batches carry indices + KV masks, not slide tensors."""
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    cfg["data.device_cache"] = True
    ds = TCGADataset("brca", cfg, n_bins=4)
    _, offsets, lengths = ds.feature_arena()
    seen = 0
    for batch in ds.iter_batches(4, bucket_boundaries=[3, 6]):
        assert len(batch["tensors"]) == 1  # omic only — no slide bytes
        width = batch["kv_masks"][-1].shape[1]
        assert width in (3, 6)
        assert batch["patch_offsets"].dtype == np.int32
        assert np.all(batch["patch_lengths"] <= width)
        np.testing.assert_array_equal(
            batch["kv_masks"][-1],
            np.arange(width)[None, :] < batch["patch_lengths"][:, None],
        )
        seen += int(batch["sample_mask"].sum())
    assert seen == len(ds)


def test_feature_arena_dedupes_duplicate_slide_ids(tmp_path, rng):
    """Omic tables may carry duplicate slide_ids (reference tolerates them);
    the arena stores each unique slide's features ONCE."""
    root = tmp_path / "tcga_dup"
    (root / "omic").mkdir(parents=True)
    patches = root / "wsi" / "brca_preprocessed_level2" / "patches"
    features = root / "wsi" / "brca_preprocessed_level2" / "patch_features"
    patches.mkdir(parents=True)
    features.mkdir(parents=True)
    counts = [3, 5, 2, 4, 6, 1, 3, 5]
    sids = [f"TCGA-D{i:03d}" for i in range(len(counts))]
    for sid, n in zip(sids, counts):
        (patches / f"{sid}.h5").touch()
        np.save(features / f"{sid}.npy",
                rng.normal(size=(n, PATCH_DIM)).astype(np.float32))
    # last omic row re-references slide 0 (dataset length = slide count, so
    # the duplicate must sit within the first len(sids) rows to be reachable)
    rows = sids[:-1] + [sids[0]]
    df = pd.DataFrame(
        rng.normal(size=(len(rows), N_FEATS)).astype(np.float32),
        columns=[f"gene_{i}" for i in range(N_FEATS)],
    )
    df["site"] = "b"; df["oncotree_code"] = "x"
    df["case_id"] = [f"C{i}" for i in range(len(rows))]
    df["slide_id"] = [s + ".svs" for s in rows]
    df["train"] = 1
    df["censorship"] = 0  # all uncensored: qcut needs spread in the subset
    df["survival_months"] = np.linspace(5, 100, len(rows))
    df.to_csv(root / "omic" / "tcga_brca_all_clean.csv.zip", compression="zip")

    cfg = _config(root)
    cfg["patch_attention"] = True
    cfg["data.device_cache"] = True
    ds = TCGADataset("brca", cfg, n_bins=4)
    arena, offsets, lengths = ds.feature_arena()
    # one copy per unique REFERENCED slide (slide 7 is never referenced)
    assert arena.shape[0] == sum(counts[:-1]) + ds.max_patches
    dup_rows = [
        i for i in range(len(ds))
        if ds.omic_df.iloc[i]["slide_id"] == sids[0] + ".svs"
    ]
    assert len(dup_rows) == 2
    assert offsets[dup_rows[0]] == offsets[dup_rows[1]]


def test_device_cache_demotion_warns(ragged_tcga_root):
    """Requesting device_cache without patch_attention must warn, not
    silently stream features every epoch."""
    root, _ = ragged_tcga_root
    cfg = _config(root)
    cfg["data.device_cache"] = True  # patch_attention left False
    with pytest.warns(UserWarning, match="device_cache requested but disabled"):
        ds = TCGADataset("brca", cfg, n_bins=4)
    assert not ds.device_cache


def test_suggest_bucket_boundaries(ragged_tcga_root):
    """Auto boundaries: bag-size quantiles rounded up to the 128 lane width
    and capped at max_patches."""
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    ds = TCGADataset("brca", cfg, n_bins=4)
    bounds = ds.suggest_bucket_boundaries(n_buckets=3, align=2)
    assert bounds == sorted(set(bounds))
    assert bounds[-1] <= ds.max_patches
    assert all(b % 2 == 0 or b == ds.max_patches for b in bounds)
    # every bag fits in the largest bucket
    assert max(counts) <= bounds[-1]
    # default 128 alignment caps at max_patches for tiny bags
    assert ds.suggest_bucket_boundaries() == [ds.max_patches]


def test_bucket_boundaries_clamped_to_max_patches(ragged_tcga_root):
    """Boundaries above max_patches are clamped — in arena mode a wider
    window would clamp its start and gather other slides' rows."""
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    ds = TCGADataset("brca", cfg, n_bins=4)
    for b in ds.iter_batches(4, bucket_boundaries=[10 * max(counts)]):
        assert b["kv_masks"][-1].shape[1] <= ds.max_patches


def test_count_batches_includes_bucket_remainders(ragged_tcga_root):
    """Per-bucket trailing remainders make the true step count exceed
    ceil(n / batch_size); the LR schedule must use the exact count."""
    root, counts = ragged_tcga_root
    cfg = _config(root)
    cfg["patch_attention"] = True
    ds = TCGADataset("brca", cfg, n_bins=4)
    exact = ds.count_batches(None, 4, bucket_boundaries=[3, 6])
    actual = len(list(ds.iter_batches(4, bucket_boundaries=[3, 6])))
    assert exact == actual
    assert exact > int(np.ceil(len(ds) / 4))  # remainder per bucket
    assert ds.count_batches(None, 4) == int(np.ceil(len(ds) / 4))


def test_background_iterator_shutdown_and_sentinel():
    """close() releases an abandoned producer thread; a FULL buffer at
    exhaustion must still deliver StopIteration (the sentinel used to be
    dropped by put_nowait, hanging the consumer)."""
    import itertools
    import time as _time

    from healnet_tpu.etl.prefetch import BackgroundIterator

    # abandoned mid-iteration: producer must exit on close()
    it = BackgroundIterator(itertools.count(), buffer_size=2)
    assert next(it) == 0
    it.close()
    _time.sleep(0.5)
    assert not it._thread.is_alive()

    # tiny buffer, consumer slower than producer: queue is full when the
    # generator ends — iteration must still terminate
    it2 = BackgroundIterator(iter(range(5)), buffer_size=1)
    _time.sleep(0.3)  # let the producer fill the queue and finish
    assert list(it2) == [0, 1, 2, 3, 4]
    it2.close()


def test_class_weights_missing_bin_keeps_length():
    """A train split missing a survival bin must still yield an n_bins-long
    vector (the loss broadcasts weights against (b, n_bins) hazards); the
    absent bin gets the maximum observed weight (round-3 review: np.unique
    returned a short vector that crashed nll_loss at trace time)."""
    y = np.array([0, 0, 1, 1, 1, 3])  # bin 2 absent
    w = class_weights(y, "inverse", n_bins=4)
    assert w.shape == (4,)
    np.testing.assert_allclose(w, [0.5, 1 / 3, 1.0, 1.0])
    w = class_weights(y, "inverse_root", n_bins=4)
    assert w.shape == (4,)
