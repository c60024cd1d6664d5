"""Fold-for-fold c-index parity: LIVE Torch reference vs healnet_tpu.

Drives the reference's OWN training/eval code — `Pipeline.train_survival_fold`
and `Pipeline.evaluate_survival_epoch` from `/root/reference/healnet/main.py`
(lines 370-628), unmodified — and this framework's `SurvivalTrainer` on the
SAME sub-sampled dress cohort: identical splits, identical survival binning,
identical initial weights (imported from each fold's torch model via
`healnet_tpu.compat`), dropout ON (the BRCA-tuned rates), gc_compat=16,
NLL loss, Adam + OneCycle. Per-fold train/val/test c-indices are published
side by side in PARITY.md (VERDICT r2 item 2 / "What's missing" #1).

Reference deps absent from this image (wandb, box, sksurv, torchvision,
torchmetrics, torchsummary, openslide) are stubbed with inert or
semantics-preserving shims BEFORE import; notably `sksurv.metrics.
concordance_index_censored` maps to this repo's numpy implementation, whose
sksurv-equivalence is covered by tests/test_metrics.py — both frameworks are
therefore scored by the same metric code.

Padding semantics: the reference attends zero-padded patch rows (its saved
feature tensors are zero-padded to max_patches and it applies no KV mask,
`tasks.py:148-192`), so the TPU side here also runs unmasked on identically
padded bags. KV-masked ragged attention is this framework's extension and is
exercised elsewhere.

Usage:
  python scripts/parity_run.py --root /tmp/healnet_dress/tcga \
      --cases 200 --folds 5 --epochs 3 --max-patches 2000 --out PARITY.md
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


# --------------------------------------------------------------------- stubs
def _install_reference_stubs() -> None:
    from healnet_tpu.train.metrics import concordance_index_censored as cic
    from healnet_tpu.utils.boxdict import Box

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    wandb = stub(
        "wandb",
        log=lambda *a, **k: None,
        init=lambda *a, **k: None,
        watch=lambda *a, **k: None,
        finish=lambda *a, **k: None,
    )
    stub("box", Box=Box)
    sksurv = stub("sksurv")
    sksurv.metrics = stub(
        "sksurv.metrics",
        concordance_index_censored=lambda e, t, r, tied_tol=1e-8: cic(
            e, t, r, tied_tol=tied_tol
        ),
    )

    class _OpenSlide:  # loaders.py imports it; patch-feature mode never opens
        def __init__(self, *a, **k):
            raise RuntimeError("OpenSlide unavailable in the parity harness")

    stub("openslide", OpenSlide=_OpenSlide)

    tv = stub("torchvision")
    tv.transforms = stub("torchvision.transforms", Compose=lambda *a, **k: None)
    tv.models = stub(
        "torchvision.models",
        resnet18=lambda *a, **k: None,
        resnet50=lambda *a, **k: None,
        ResNet18_Weights=types.SimpleNamespace(DEFAULT=None),
        ResNet50_Weights=types.SimpleNamespace(DEFAULT=None, IMAGENET1K_V2=None),
    )
    stub(
        "torchmetrics",
        **{
            k: (lambda *a, **k2: None)
            for k in ("ConfusionMatrix", "F1Score", "ROC",
                      "PrecisionRecallCurve", "Accuracy", "AUROC")
        },
    )
    stub("torchsummary", summary=lambda *a, **k: None)


def _import_reference():
    _install_reference_stubs()
    sys.path.insert(0, "/root/reference")
    return importlib.import_module("healnet.main")


# ---------------------------------------------------------------- data prep
def load_cohort(root: str, cases: int, max_patches: int):
    """Sub-sample the dress cohort through this framework's TCGA loader
    (binning/preprocessing bit-parity with the reference is test-covered),
    exporting dense zero-padded arrays both frameworks consume identically."""
    from healnet_tpu.etl import TCGADataset
    from healnet_tpu.utils.boxdict import Box

    config = Box(
        {
            "tcga_path": root,
            "model": "healnet",
            "omic_attention": False,          # omic rides as (1, genes)
            "patch_attention": False,         # reference padding semantics
            "survival.subset": "uncensored",  # reference qcut subset default
            "data.feature_dtype": "float32",
        }
    )
    ds = TCGADataset(
        "brca", config, level=2, n_bins=4, sources=("omic", "slides"),
        max_patches=max_patches,
    )
    n = min(cases, len(ds))
    sample0 = ds._sample(0, pad_to=max_patches)
    omic_dim = np.asarray(sample0[0][0]).reshape(-1).shape[0]
    feat_dim = np.asarray(sample0[0][1]).shape[-1]
    omic = np.zeros((n, 1, omic_dim), np.float32)
    wsi = np.zeros((n, max_patches, feat_dim), np.float32)
    cen = np.zeros(n, np.float32)
    evt = np.zeros(n, np.float32)
    y = np.zeros(n, np.int64)
    for i in range(n):
        tensors, c, t, yd, _ = ds._sample(i, pad_to=max_patches)
        omic[i] = np.asarray(tensors[0], np.float32).reshape(1, -1)
        sl = np.asarray(tensors[1], np.float32)
        wsi[i, : min(sl.shape[0], max_patches)] = sl[:max_patches]
        cen[i], evt[i], y[i] = c, t, yd
    return omic, wsi, cen, evt, y


def make_splits(n: int, folds: int, seed: int = 0):
    """One shared 70/15/15 split per fold, fed verbatim to both frameworks."""
    out = []
    for fold in range(1, folds + 1):
        rng = np.random.default_rng(seed + fold)
        perm = rng.permutation(n)
        n_tr, n_va = int(0.7 * n), int(0.15 * n)
        out.append((perm[:n_tr], perm[n_tr : n_tr + n_va], perm[n_tr + n_va :]))
    return out


BRCA_HP = dict(  # reference config/best_hyperparams.yml:20-39 (brca)
    depth=2, num_latents=17, latent_dim=126, cross_dim_head=63,
    latent_dim_head=20, cross_heads=1, latent_heads=8,
    attn_dropout=0.083, ff_dropout=0.473, self_per_cross_attn=0, snn=True,
    l1=4.43e-5, lr=0.00777, max_lr=0.008, batch_size=8, patience=5,
)


# ---------------------------------------------------------------- torch side
class _Tee:
    """stdout tee: keep live progress AND capture for early-stop parsing."""

    def __init__(self, stream):
        self.stream = stream
        self.captured = []

    def write(self, text):
        self.captured.append(text)
        self.stream.write(text)

    def flush(self):
        self.stream.flush()


def run_torch_fold(ref_main, data, split, fold, epochs, rng_offset=0,
                   ablation=False, init_only=False):
    import torch
    from torch.utils.data import DataLoader, Dataset

    from healnet_tpu.utils.boxdict import Box

    omic, wsi, cen, evt, y = data
    tr, va, te = split

    class Split(Dataset):
        def __init__(self, idx):
            self.idx = np.asarray(idx)

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            j = int(self.idx[i])
            feats = [torch.tensor(omic[j]), torch.tensor(wsi[j])]
            return feats, float(cen[j]), float(evt[j]), int(y[j])

    torch.manual_seed(fold)
    np.random.seed(fold)
    model = ref_main.HealNet(
        n_modalities=2,
        channel_dims=[omic.shape[-1], wsi.shape[-1]],
        num_spatial_axes=[1, 1],
        out_dims=4,
        num_freq_bands=2,
        depth=BRCA_HP["depth"],
        max_freq=2.0,
        l_c=BRCA_HP["num_latents"],
        l_d=BRCA_HP["latent_dim"],
        cross_dim_head=BRCA_HP["cross_dim_head"],
        latent_dim_head=BRCA_HP["latent_dim_head"],
        x_heads=BRCA_HP["cross_heads"],
        l_heads=BRCA_HP["latent_heads"],
        attn_dropout=BRCA_HP["attn_dropout"],
        ff_dropout=BRCA_HP["ff_dropout"],
        weight_tie_layers=False,
        fourier_encode_data=True,
        self_per_cross_attn=BRCA_HP["self_per_cross_attn"],
        snn=BRCA_HP["snn"],
    )
    init_state = {k: v.clone() for k, v in model.state_dict().items()}
    if init_only:
        # torch-cache mode: the fold's results come from a previous run's
        # JSON; only the (manual_seed-deterministic) init weights are needed
        return None, init_state
    # variance-floor mode: identical init, different stochastic path
    # (dropout draws + shuffle order) — the within-framework analogue of the
    # cross-framework comparison's residual noise
    if rng_offset:
        torch.manual_seed(fold + 1000 * rng_offset)

    pipe = ref_main.Pipeline.__new__(ref_main.Pipeline)
    pipe.config = Box(
        {
            "model": "healnet",
            "dataset": "brca",
            "sources": ["omic", "slides"],
            "missing_ablation": bool(ablation),
            "survival.loss": "nll",
            "model_params.l1": BRCA_HP["l1"],
            "optimizer.lr": BRCA_HP["lr"],
            "optimizer.max_lr": BRCA_HP["max_lr"],
            "train_loop.epochs": epochs,
            "train_loop.patience": BRCA_HP["patience"],
            "train_loop.early_stopping": True,
            "train_loop.eval_interval": 1,
        }
    )
    pipe.device = torch.device("cpu")
    pipe.class_weights = None
    pipe.output_dims = 4

    g = torch.Generator().manual_seed(fold + 1000 * rng_offset)
    loaders = {
        "train": DataLoader(
            Split(tr), batch_size=BRCA_HP["batch_size"], shuffle=True, generator=g
        ),
        "val": DataLoader(Split(va), batch_size=BRCA_HP["batch_size"]),
        "test": DataLoader(Split(te), batch_size=BRCA_HP["batch_size"]),
    }
    t0 = time.time()
    # the reference only PRINTS its early-stop epoch (`main.py:497`):
    # tee stdout and parse it so PARITY_FULL can report stop epochs
    # side by side without modifying the torch side
    import re

    tee = _Tee(sys.stdout)
    old_stdout, sys.stdout = sys.stdout, tee
    try:
        (
            model, train_loss, train_c, val_loss, val_c, test_loss, test_c,
            missing_performance,
        ) = pipe.train_survival_fold(
            model, loaders["train"], loaders["test"], loaders["val"], fold=fold
        )
    finally:
        sys.stdout = old_stdout
    stops = re.findall(r"Early stopping at epoch (\d+)", "".join(tee.captured))
    res = dict(
        train=float(train_c), val=float(val_c), test=float(test_c),
        stopped_epoch=int(stops[-1]) if stops else int(epochs),
        seconds=time.time() - t0,
        trained_state={k: v.clone() for k, v in model.state_dict().items()},
    )
    if missing_performance is not None:
        res["ablation"] = {
            m: float(c) for m, c in
            zip(("50", "omic", "wsi"), missing_performance)
        }
    return res, init_state


# ------------------------------------------------------------------ tpu side
def run_tpu_fold(data, split, fold, epochs, init_state, ablation=False):
    import jax

    from healnet_tpu.compat import params_from_torch_state_dict
    from healnet_tpu.models import HealNetModule
    from healnet_tpu.train import SurvivalTrainer

    omic, wsi, cen, evt, y = data
    module = HealNetModule(
        n_modalities=2,
        channel_dims=(omic.shape[-1], wsi.shape[-1]),
        num_spatial_axes=(1, 1),
        out_dims=4,
        depth=BRCA_HP["depth"],
        num_freq_bands=2,
        max_freq=2.0,
        l_c=BRCA_HP["num_latents"],
        l_d=BRCA_HP["latent_dim"],
        x_heads=BRCA_HP["cross_heads"],
        l_heads=BRCA_HP["latent_heads"],
        cross_dim_head=BRCA_HP["cross_dim_head"],
        latent_dim_head=BRCA_HP["latent_dim_head"],
        self_per_cross_attn=BRCA_HP["self_per_cross_attn"],
        snn=BRCA_HP["snn"],
        attn_dropout=BRCA_HP["attn_dropout"],
        ff_dropout=BRCA_HP["ff_dropout"],
    )

    def subset(idx):
        idx = np.asarray(idx)
        return {
            "tensors": (omic[idx], wsi[idx]),
            "y_disc": y[idx].astype(np.int32),
            "censorship": cen[idx],
            "event_time": evt[idx],
        }

    trainer = SurvivalTrainer(
        module,
        loss_type="nll",
        l1=BRCA_HP["l1"],
        batch_size=BRCA_HP["batch_size"],
        epochs=epochs,
        max_lr=BRCA_HP["max_lr"],
        patience=BRCA_HP["patience"],
        early_stopping=True,
        gc_compat=16,
        seed=fold,
        prefetch=0,
    )
    # identical initial weights: import the torch fold's init state
    trainer.params = jax.tree_util.tree_map(
        jax.numpy.asarray, params_from_torch_state_dict(init_state, module)
    )
    t0 = time.time()
    tr, va, te = split
    res = trainer.fit(
        subset(tr), subset(va), subset(te), fold=fold,
        missing_ablation=ablation, missing_semantics="reference",
        verbose=False,
    )
    out = dict(
        train=float(res["train_c_index"]),
        val=float(res["val_c_index"]),
        test=float(res["test_c_index"]),
        stopped_epoch=int(res.get("stopped_epoch", epochs)),
        seconds=time.time() - t0,
        trained_params=jax.tree_util.tree_map(np.asarray, res["params"]),
    )
    if ablation and "missing_performance" in res:
        out["ablation"] = {
            m: float(c) for m, c in
            zip(("50", "omic", "wsi"), res["missing_performance"])
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/healnet_dress/tcga")
    ap.add_argument("--cases", type=int, default=200)
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--max-patches", type=int, default=2000)
    ap.add_argument("--out", default=str(REPO / "PARITY.md"))
    ap.add_argument("--json", default=str(REPO / "PARITY.json"))
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument(
        "--dropout", type=float, default=None,
        help="override BOTH dropout rates (0 isolates the deterministic path)",
    )
    ap.add_argument(
        "--variance-floor", action="store_true",
        help="torch-vs-torch (different stochastic seeds): the within-"
        "framework noise floor the cross-framework deltas compare against",
    )
    ap.add_argument(
        "--floor-offsets", type=int, nargs=2, default=(0, 1),
        metavar=("A", "B"),
        help="rng offsets for the two torch runs in --variance-floor; a "
        "second invocation with fresh offsets (e.g. 2 3) yields five more "
        "independent floor draws to merge with the first batch",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="run the tpu side on the CPU backend (relay-independent smoke)",
    )
    ap.add_argument(
        "--ablation", action="store_true",
        help="also run the reference's missing-modality eval ablations "
        "(50/omic/wsi, `main.py:504-541`) on both sides",
    )
    ap.add_argument(
        "--tpu-mask-family", choices=("hash", "threefry"), default="hash",
        help="attention-dropout mask family for the tpu side: 'threefry' "
        "(torch-family bernoulli draws) isolates the mask-family variable "
        "behind the 5/5 one-sided test-split offset (VERDICT r4 weak #2)",
    )
    ap.add_argument(
        "--fold-start", type=int, default=1,
        help="first fold to run (1-based). With --json pointing at an "
        "existing file, earlier folds' results are loaded from it and the "
        "new folds are appended — lets a multi-fold run proceed one process "
        "per fold (the single-process run leaks host buffers across folds "
        "under the relay and was OOM-killed at fold 3 of 5)",
    )
    ap.add_argument(
        "--torch-cache", default=None,
        help="path to a previous run's PARITY json: reuse its torch fold "
        "results verbatim (init weights are reconstructed from the "
        "manual_seed(fold) determinism) and run only the tpu side",
    )
    ap.add_argument(
        "--save-dir", default=None,
        help="save each fold's trained weights (torch state_dict + tpu "
        "params) and the shared splits, for downstream cross-framework "
        "artifact comparisons (explainer parity)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.dropout is not None:
        BRCA_HP["attn_dropout"] = BRCA_HP["ff_dropout"] = float(args.dropout)

    ref_main = _import_reference()
    print("reference imported:", ref_main.__file__)
    data = load_cohort(args.root, args.cases, args.max_patches)
    n = data[0].shape[0]
    print(f"cohort: {n} cases, bags capped at {args.max_patches}")
    splits = make_splits(n, args.folds)

    if args.variance_floor:
        # within-torch noise floor: identical init + data, different
        # dropout/shuffle seeds — same comparison structure as torch-vs-tpu
        vrows = []
        for fold in range(1, args.folds + 1):
            off_a, off_b = args.floor_offsets
            a, _ = run_torch_fold(
                ref_main, data, splits[fold - 1], fold, args.epochs,
                rng_offset=off_a, ablation=args.ablation,
            )
            b, _ = run_torch_fold(
                ref_main, data, splits[fold - 1], fold, args.epochs,
                rng_offset=off_b, ablation=args.ablation,
            )
            a.pop("trained_state", None)
            b.pop("trained_state", None)
            diffs = {s: abs(a[s] - b[s]) for s in ("train", "val", "test")}
            if "ablation" in a and "ablation" in b:
                for m in ("50", "omic", "wsi"):
                    diffs[f"abl_{m}"] = abs(a["ablation"][m] - b["ablation"][m])
            print(f"fold {fold} torch-vs-torch |d|: {diffs}", flush=True)
            vrows.append({"fold": fold, "a": a, "b": b, "abs_diff": diffs})
        Path(args.json).write_text(json.dumps(vrows, indent=2))
        alld = [d for r in vrows for d in r["abs_diff"].values()]
        print(
            f"within-torch noise floor: mean |d| {np.mean(alld):.4f}, "
            f"max {np.max(alld):.4f} -> {args.json}"
        )
        return

    save_dir = Path(args.save_dir) if args.save_dir else None
    if save_dir:
        save_dir.mkdir(parents=True, exist_ok=True)
        np.savez(
            save_dir / "splits.npz",
            **{
                f"fold{f+1}_{name}": idx
                for f, split in enumerate(splits)
                for name, idx in zip(("train", "val", "test"), split)
            },
        )
    if args.tpu_mask_family != "hash":
        from healnet_tpu.ops.hash_dropout import mask_family

        mask_family(args.tpu_mask_family)
        print(f"tpu attention-dropout mask family: {args.tpu_mask_family}")

    torch_cache = None
    if args.torch_cache:
        cached = json.loads(Path(args.torch_cache).read_text())
        torch_cache = {int(r["fold"]): r["torch"] for r in cached}
        print(f"torch results cached from {args.torch_cache}: "
              f"folds {sorted(torch_cache)}")

    rows = []
    if Path(args.json).exists():
        # resume: every fold NOT being re-run in this invocation is kept
        # from the existing JSON (r5 fix: keeping only folds < fold_start
        # silently dropped out-of-order folds already on disk)
        rerun = set(range(args.fold_start, args.folds + 1))
        prior = json.loads(Path(args.json).read_text())
        rows = [
            (int(r["fold"]), r["torch"], r["tpu"])
            for r in prior
            if int(r["fold"]) not in rerun
        ]
        print(f"resumed folds {[f for f, _, _ in rows]} from {args.json}")
    for fold in range(args.fold_start, args.folds + 1):
        print(f"===== fold {fold} (torch) =====", flush=True)
        if torch_cache is not None:
            _, init_state = run_torch_fold(
                ref_main, data, splits[fold - 1], fold, args.epochs,
                init_only=True,
            )
            t_res = dict(torch_cache[fold])
            if not args.ablation:
                t_res.pop("ablation", None)
            trained_state = None
            print(f"torch fold {fold} (cached): {t_res}", flush=True)
        else:
            t_res, init_state = run_torch_fold(
                ref_main, data, splits[fold - 1], fold, args.epochs,
                ablation=args.ablation,
            )
            trained_state = t_res.pop("trained_state")
        print(f"torch fold {fold}: {t_res}", flush=True)
        print(f"===== fold {fold} (tpu) =====", flush=True)
        j_res = run_tpu_fold(
            data, splits[fold - 1], fold, args.epochs, init_state,
            ablation=args.ablation,
        )
        trained_params = j_res.pop("trained_params")
        print(f"tpu fold {fold}: {j_res}", flush=True)
        if save_dir:
            import torch

            from healnet_tpu.utils.io import pickle_obj

            torch.save(trained_state, save_dir / f"fold{fold}_torch.pt")
            torch.save(init_state, save_dir / f"fold{fold}_torch_init.pt")
            pickle_obj(trained_params, save_dir / f"fold{fold}_tpu_params.pkl")
        rows.append((fold, t_res, j_res))
        _write(args, rows, n)


def _write(args, rows, n):
    rows = sorted(rows, key=lambda r: r[0])
    lines = [
        "# PARITY — fold-for-fold c-index vs the live Torch reference",
        "",
        f"Cohort: {n} dress-rehearsal cases (BRCA-shaped synthetic; real TCGA",
        "CSVs are git-lfs stubs in this environment), bags zero-padded to",
        f"{args.max_patches} patches (the reference's own padding semantics,",
        "no KV masks on either side). Identical per-fold 70/15/15 splits,",
        "identical survival binning (this repo's loader, bit-parity tested),",
        "identical initial weights (each fold's torch init imported via",
        "`healnet_tpu.compat`), dropout ON (attn 0.083 / ff 0.473), NLL loss,",
        "l1, Adam + OneCycle, gc=16 — the torch side runs the reference's",
        "unmodified `train_survival_fold`/`evaluate_survival_epoch`",
        "(`/root/reference/healnet/main.py:370-628`); both sides are scored",
        "by the same c-index code (sksurv semantics, tests/test_metrics.py).",
        f"Epochs: {args.epochs}. Generated by scripts/parity_run.py.",
        *(
            [
                "",
                f"TPU attention-dropout mask family: {args.tpu_mask_family}",
                "(falsification run for the 5/5 one-sided test-split offset:",
                "'threefry' = torch-family bernoulli masks instead of the",
                "coordinate-hash family; see ops/hash_dropout.mask_family).",
            ]
            if args.tpu_mask_family != "hash"
            else []
        ),
        "",
        "| fold | split | torch c-index | tpu c-index | abs diff |",
        "|---|---|---|---|---|",
    ]
    diffs = []
    for fold, t_res, j_res in rows:
        for split in ("train", "val", "test"):
            d = abs(t_res[split] - j_res[split])
            diffs.append(d)
            lines.append(
                f"| {fold} | {split} | {t_res[split]:.4f} | "
                f"{j_res[split]:.4f} | {d:.4f} |"
            )
    if any("stopped_epoch" in t for _, t, _ in rows):
        lines += [
            "",
            "Early stopping (patience-5 on val loss, full OneCycle horizon),",
            "stop epoch side by side:",
            "",
            "| fold | torch stop epoch | tpu stop epoch |",
            "|---|---|---|",
        ]
        for fold, t_res, j_res in rows:
            lines.append(
                f"| {fold} | {t_res.get('stopped_epoch', '?')} | "
                f"{j_res.get('stopped_epoch', '?')} |"
            )
    if any("ablation" in t for _, t, _ in rows):
        lines += [
            "",
            "Missing-modality eval ablation on the trained fold models",
            "(test split). Both sides execute the reference's ACTUAL",
            "`_sample_missing` semantics (`main.py:526-541`): every mode",
            "returns a one-element feature list, so the kept tensor is",
            "preprocessed and cross-attended as modality 0 (towers >= 1 hit",
            "IndexErrors swallowed by `healnet.py:235-239`'s except:pass) —",
            "the tpu side via `evaluate(missing_semantics='reference')`,",
            "whose function-level equivalence to the live Torch model is",
            "unit-tested in tests/test_torch_parity.py. The framework's own",
            "documented ablation (each modality dropped via its presence",
            "mask, the kept one in its OWN tower) is the default",
            "`missing_semantics='semantic'`.",
            "",
            "| fold | mode | torch c-index | tpu c-index | abs diff |",
            "|---|---|---|---|---|",
        ]
        for fold, t_res, j_res in rows:
            if "ablation" not in t_res or "ablation" not in j_res:
                continue
            for m in ("50", "omic", "wsi"):
                d = abs(t_res["ablation"][m] - j_res["ablation"][m])
                lines.append(
                    f"| {fold} | {m} | {t_res['ablation'][m]:.4f} | "
                    f"{j_res['ablation'][m]:.4f} | {d:.4f} |"
                )
    test_t = [t[1]["test"] for t in rows]
    test_j = [t[2]["test"] for t in rows]
    lines += [
        "",
        f"Cross-fold test c-index: torch {np.mean(test_t):.4f}±{np.std(test_t):.4f}"
        f" | tpu {np.mean(test_j):.4f}±{np.std(test_j):.4f}"
        f" | mean |Δ| over all cells {np.mean(diffs):.4f}, max {np.max(diffs):.4f}",
        "",
        "Residual differences are stochastic-path effects (framework-specific",
        "dropout mask realisations and shuffle orders at identical",
        "distributions) — the deterministic-path equivalence (identical",
        "weights, dropout off) is covered separately by",
        "tests/test_training_parity.py (12-step trajectory + final-weight",
        "drift < 1%).",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")
    Path(args.json).write_text(
        json.dumps(
            [
                {"fold": f, "torch": t, "tpu": j}
                for f, t, j in rows
            ],
            indent=2,
        )
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
