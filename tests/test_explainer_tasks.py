"""Explainer + data-ops preprocessing tests on synthetic artifacts."""

import numpy as np
import pandas as pd
import pytest

from healnet_tpu.train.pipeline import Pipeline
from healnet_tpu.utils import Box

N_SAMPLES = 24
N_FEATS = 10
N_PATCHES = 6
PATCH_DIM = 8


@pytest.fixture
def run_artifacts(tmp_path, rng):
    """Synthetic TCGA tree + a finished explainer-enabled pipeline run."""
    root = tmp_path / "tcga"
    (root / "omic").mkdir(parents=True)
    patches = root / "wsi" / "brca_preprocessed_level2" / "patches"
    features = root / "wsi" / "brca_preprocessed_level2" / "patch_features"
    patches.mkdir(parents=True)
    features.mkdir(parents=True)
    import h5py

    sids = [f"TCGA-{i:04d}" for i in range(N_SAMPLES)]
    for sid in sids:
        with h5py.File(patches / f"{sid}.h5", "w") as f:
            coords = np.stack(
                [np.arange(N_PATCHES) * 256, np.zeros(N_PATCHES, np.int64)], axis=1
            )
            f.create_dataset("coords", data=coords)
        np.save(features / f"{sid}.npy",
                rng.normal(size=(N_PATCHES, PATCH_DIM)).astype(np.float32))
    df = pd.DataFrame(
        rng.normal(size=(N_SAMPLES, N_FEATS)).astype(np.float32),
        columns=[f"g{i}" for i in range(N_FEATS)],
    )
    df["site"] = "b"
    df["oncotree_code"] = "x"
    df["case_id"] = sids
    df["slide_id"] = [s + ".svs" for s in sids]
    df["train"] = 1
    df["censorship"] = rng.integers(0, 2, N_SAMPLES)
    df["survival_months"] = rng.uniform(5, 100, N_SAMPLES)
    df.to_csv(root / "omic" / "tcga_brca_all_clean.csv.zip", compression="zip")

    # omic_attention=False -> features are context tokens (explainable layout)
    config = Box(
        {
            "tcga_path": str(root),
            "log_path": str(tmp_path / "logs"),
            "dataset": "brca",
            "model": "healnet",
            "explainer": True,
            "missing_ablation": False,
            "omic_attention": False,
            "n_folds": 1,
            "wandb": False,
            "attention_impl": "xla",
            "data": {"wsi_level": 2},
            "sources": ["omic", "slides"],
            "survival": {"loss": "nll", "subset": "uncensored"},
            "train_loop": {
                "batch_size": 8, "epochs": 1, "early_stopping": False,
                "patience": 5, "gc_compat": 1,
            },
            "optimizer": {"max_lr": 0.005, "lr": 0.005},
            "model_params": {
                "output_dims": 4, "class_weights": "None", "l1": 0.0,
                "num_freq_bands": 2, "depth": 1, "max_freq": 2.0,
                "num_latents": 4, "latent_dim": 8, "cross_dim_head": 4,
                "latent_dim_head": 4, "cross_heads": 1, "latent_heads": 1,
                "attn_dropout": 0.0, "ff_dropout": 0.0,
                "fourier_encode_data": True, "self_per_cross_attn": 0,
                "weight_tie_layers": False, "snn": True,
            },
        }
    )
    pipeline = Pipeline(config=config)
    pipeline.main()
    return pipeline.log_dir


def test_explainer_end_to_end(run_artifacts, monkeypatch, tmp_path):
    from healnet_tpu.models.explainer import Explainer

    monkeypatch.chdir(tmp_path)  # explanations/ goes under tmp
    explainer = Explainer(run_artifacts)
    results = explainer.run(n_high=2, n_low=1, run_omic=True, run_slides=True)
    assert len(results) == 3
    r = results[0]
    assert r["logits"].shape == (1, 4)
    # omic ranking produced (feature-token layout) with real feature names
    assert "omic_ranking" in r
    assert r["omic_ranking"]["feature"].iloc[0].startswith("g")
    # coords-space heatmap rendered + arrays saved
    assert "heatmap" in r and r["heatmap"] is not None
    out = list(explainer.expl_dir.glob("high_risk_0_*"))
    names = {p.name.split("high_risk_0_")[1] for p in out}
    assert {"omic_attn.png", "heatmap.png", "heatmap.npy", "attention.npy", "mask.npy"} <= names


def test_explainer_saves_top_patch_crops(run_artifacts, monkeypatch, tmp_path):
    # save_patches extracts the top-k attended crops from the slide image
    # (reference explainer.py:238-262); slide render injected synthetically
    from healnet_tpu.models.explainer import Explainer

    monkeypatch.chdir(tmp_path)
    explainer = Explainer(run_artifacts)
    # synthetic slide: x-coordinate encoded in the red channel so a crop's
    # pixels identify which patch it came from
    w = N_PATCHES * 256
    img = np.zeros((256, w, 3), np.uint8)
    for p in range(N_PATCHES):
        img[:, p * 256 : (p + 1) * 256, 0] = 40 * p
    monkeypatch.setattr(explainer, "_read_slide_image", lambda sid: (img, 1.0))
    results = explainer.run(n_high=1, n_low=0, run_omic=False, heatmap=False,
                            highlight_patches=False, save_patches=True)
    assert results and results[0]["heatmap"] is not None
    crops = sorted(explainer.expl_dir.glob("high_risk_0_patch_*.png"))
    crops = [c for c in crops if "high_res" not in c.name]
    assert len(crops) == min(5, N_PATCHES)
    # crop 0 must be the argmax-attention patch: red channel == 40 * argmax
    import matplotlib.pyplot as plt

    attn = np.load(explainer.expl_dir / "high_risk_0_attention.npy")
    top_patch = int(np.argmax(attn[:N_PATCHES]))
    crop0 = plt.imread(crops[0])
    assert int(round(crop0[0, 0, 0] * 255)) == 40 * top_patch


def test_explainer_patient_selection(run_artifacts, monkeypatch, tmp_path):
    from healnet_tpu.models.explainer import Explainer

    monkeypatch.chdir(tmp_path)
    explainer = Explainer(run_artifacts)
    high = explainer.get_patients(n=3, risk="high")
    low = explainer.get_patients(n=3, risk="low")
    # high-risk = lowest survival bins first; disjoint orderings
    assert len(high) == 3 and len(low) == 3
    df = explainer.omic_df
    high_bins = df[df["slide_id"].str.startswith(high.iloc[0])]["y_disc"]
    low_bins = df[df["slide_id"].str.startswith(low.iloc[0])]["y_disc"]
    assert high_bins.iloc[0] <= low_bins.iloc[0]


def test_tissue_segmentation_and_patching(rng):
    """Native patcher: tissue regions yield coords, background yields none."""
    from healnet_tpu.cli.tasks import segment_tissue

    thumb = np.full((128, 128, 3), 250, np.uint8)        # white background
    thumb[30:90, 40:100] = [160, 60, 160]                 # stained tissue blob
    mask = segment_tissue(thumb)
    assert mask[50, 60] and not mask[5, 5]
    assert 0.1 < mask.mean() < 0.6


def test_resnet50_feature_extractor_shapes(rng):
    from healnet_tpu.ops.resnet import PatchFeatureExtractor

    extractor = PatchFeatureExtractor(batch_size=4)
    patches = (rng.uniform(0, 255, size=(6, 224, 224, 3))).astype(np.uint8)
    feats = extractor(patches)
    assert feats.shape == (6, 2048)
    assert np.isfinite(feats).all()
    # deterministic across calls
    feats2 = extractor(patches)
    np.testing.assert_allclose(feats, feats2, rtol=1e-6)


def test_direct_sample_explanation_names_by_slide_id(run_artifacts, monkeypatch, tmp_path):
    """run_sample_explanation called directly AFTER run() must name its
    artifacts by slide id, not reuse the last run()'s 'low_risk_*' prefix
    (round-3 review: stale save_name clobbered earlier artifacts)."""
    from healnet_tpu.models.explainer import Explainer

    monkeypatch.chdir(tmp_path)
    explainer = Explainer(run_artifacts)
    explainer.run(n_high=1, n_low=0, run_omic=True, run_slides=False)
    before = set(explainer.expl_dir.glob("high_risk_0_*"))
    assert before, "run() produced no artifacts"

    idx = explainer.omic_df.index[0]
    slide_id = explainer.omic_df["slide_id"].iloc[0][:-4]
    explainer.run_sample_explanation(
        idx, slide_id, run_omic=True, run_slides=False,
    )
    assert set(explainer.expl_dir.glob("high_risk_0_*")) == before
    assert list(explainer.expl_dir.glob(f"{slide_id}_omic_attn.png"))


def test_explainer_streaming_matches_dense(run_artifacts, monkeypatch, tmp_path):
    """The streaming (chunk-reduced) capture must reproduce the dense path's
    saved artifacts exactly: same omic ranking, same attention/heatmap
    arrays (VERDICT r4 next #5)."""
    from healnet_tpu.models.explainer import Explainer

    monkeypatch.chdir(tmp_path)
    explainer = Explainer(run_artifacts)
    idx, slide_id = next(
        iter(explainer.get_patients(risk="high", n=1).items())
    )
    r_dense = explainer.run_sample_explanation(
        idx, slide_id, save_name="dense", streaming=False
    )
    r_stream = explainer.run_sample_explanation(
        idx, slide_id, save_name="stream", streaming=True
    )
    pd.testing.assert_frame_equal(
        r_dense["omic_ranking"].reset_index(drop=True),
        r_stream["omic_ranking"].reset_index(drop=True),
        check_exact=False, check_dtype=False, atol=1e-5,
    )
    for suffix in ("attention", "heatmap", "omic_attention"):
        a = np.load(explainer.expl_dir / f"dense_{suffix}.npy")
        b = np.load(explainer.expl_dir / f"stream_{suffix}.npy")
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)


def test_explainer_streams_large_bags_by_default(run_artifacts, monkeypatch, tmp_path):
    """Bags above the auto threshold stream: get_attention_weights (the
    dense capture) must never be called, and the explanation still renders.
    8,192 patches -> peak capture memory bounded by one stats chunk."""
    from healnet_tpu.models.explainer import Explainer

    monkeypatch.chdir(tmp_path)
    explainer = Explainer(run_artifacts)
    idx, slide_id = next(
        iter(explainer.get_patients(risk="high", n=1).items())
    )

    # inflate the sample's bag to 8,192 patches at load time
    orig = explainer.data._sample

    def big_sample(pos):
        tensors, a, b_, c, n_valid = orig(pos)
        rng = np.random.default_rng(0)
        big = rng.normal(size=(8192, tensors[-1].shape[-1])).astype(np.float32)
        return list(tensors[:-1]) + [big], a, b_, c, 8192
    monkeypatch.setattr(explainer.data, "_sample", big_sample)
    monkeypatch.setattr(
        explainer.model, "get_attention_weights",
        lambda: (_ for _ in ()).throw(AssertionError("dense capture used")),
    )
    r = explainer.run_sample_explanation(idx, slide_id, save_name="big")
    attn = np.load(explainer.expl_dir / "big_attention.npy")
    assert attn.shape == (8192,)
    assert np.isfinite(attn).all() and attn.sum() > 0
