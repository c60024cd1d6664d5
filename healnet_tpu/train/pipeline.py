"""Experiment pipeline: config validation, k-fold training, model factory.

TPU-native counterpart of the reference `Pipeline`
(`/root/reference/healnet/main.py:33-367`):

- config whitelisting (`main.py:78-104`), dotted-key flattening, per-dataset
  hyperparameter splicing (`main.py:653-654`);
- k-fold loop with per-fold seeds (`main.py:124-141`), cross-fold mean/std
  aggregation (`main.py:144-149`), missing-ablation aggregation
  (`main.py:156-160`);
- model factory with shape inference from the first batch (`main.py:261-367`)
  covering healnet / healnet_early / fcnn / multimodn / mm_prognosis / mcat
  (SNN, MILAttention by source count) plus the working motcat;
- explainer artifacts: best-fold params + config + test indices saved
  durably (`main.py:163-168`), via orbax + pickle;
- logging through :class:`healnet_tpu.utils.Tracker` (wandb if present,
  local JSONL otherwise).
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from healnet_tpu.constants import VALID_DATASETS  # shared with cli/tasks.py
from healnet_tpu.etl import TCGADataset, class_weights, train_val_test_split
from healnet_tpu.models import HealNetModule
from healnet_tpu.models.baselines import (
    MCAT,
    MILAttentionNet,
    MLPEncoder,
    MMPrognosis,
    MOTCAT,
    MultiModNModule,
    ClassDecoder,
    PatchEncoder,
    RegularizedFCNN,
    SNN,
)
from healnet_tpu.train.checkpoint import Checkpointer
from healnet_tpu.train.loop import SurvivalTrainer, iterate_batches
from healnet_tpu.utils import Box, Tracker, flatten_config, pickle_obj

# Cross-run dataset cache: hyperparameter sweeps construct a fresh Pipeline
# per trial, but the dataset (omics join, survival binning, bag-size scan,
# and — critically — the device_cache feature arena with its one-time HBM
# upload) depends only on the DATA-side config. Keyed on exactly those
# fields; holds the single most recent dataset. Disable per-run with
# `data.cache_dataset: false`.
_DATASET_CACHE: Dict[str, Any] = {"key": None, "dataset": None, "arena_device": None}

VALID_SOURCES = ["omic", "slides"]
VALID_LOSSES = ["nll", "ce_survival", "cox"]
VALID_MODELS = [
    "healnet", "fcnn", "healnet_early", "mcat", "mm_prognosis", "multimodn", "motcat",
]
VALID_CLASS_WEIGHTS = ["inverse", "inverse_root", "None"]


class Pipeline:
    """Main experimental pipeline for training/evaluating models."""

    def __init__(self, config: Box, args=None, wandb_name: Optional[str] = None):
        self.config = flatten_config(config)
        self.dataset = self.config["dataset"]
        self.args = args
        self._check_config()
        self.output_dims = int(self.config["model_params.output_dims"])
        self.sources = list(self.config["sources"])
        self.local_run_id = datetime.now().strftime("%d-%m-%Y_%H-%M-%S")

        if self.config.get("compilation_cache", True):
            from healnet_tpu.utils.profiling import enable_compilation_cache

            enable_compilation_cache()  # WSI-scale graphs compile for minutes

        self.tracker = Tracker(
            project="healnet_tpu",
            # `run_name` pins the log/checkpoint dir so a re-launched process
            # can find per-fold checkpoints (train_loop.resume across crashes)
            name=wandb_name or self.config.get("run_name"),
            config=dict(self.config),
            log_dir=self.config.get("log_path", "logs"),
            use_wandb=bool(self.config.get("wandb", False)),
        )
        self.log_dir = self.tracker.log_dir if self.config.get("explainer") else None
        # the dataset is fold-independent (only split indices differ), so
        # build it once per run: the omics join/binning and — crucially — the
        # device_cache feature arena (host pack + one HBM upload) are shared
        # across all folds
        self._dataset = None
        self._arena_device = None
        self._arena_sharded_key = None
        self._arena_sharded_device = None
        self._trainer = None

    def _check_config(self) -> None:
        """Whitelist validation (`main.py:78-104`)."""
        assert all(s in VALID_SOURCES for s in self.config["sources"]), (
            f"Invalid source specified. Valid sources are {VALID_SOURCES}"
        )
        assert self.config["survival.loss"] in VALID_LOSSES, (
            f"Invalid survival loss specified. Valid losses are {VALID_LOSSES}"
        )
        assert self.config["dataset"] in VALID_DATASETS, (
            f"Invalid dataset specified. Valid datasets are {VALID_DATASETS}"
        )
        assert self.config["model"] in VALID_MODELS, (
            f"Invalid model specified. Valid models are {VALID_MODELS}"
        )
        assert str(self.config["model_params.class_weights"]) in VALID_CLASS_WEIGHTS, (
            f"Invalid class weight specified. Valid weights are {VALID_CLASS_WEIGHTS}"
        )

    # -------------------------------------------------------------- running
    def main(self, sweep_overrides: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        if sweep_overrides:
            for key, value in sweep_overrides.items():
                # apply EVERY override — silently dropping an absent key
                # would run the baseline config while the sweep table records
                # the varied value; creating it is correct (consumers read
                # config.get) but worth surfacing in case of a typo'd key
                if key not in self.config:
                    print(f"sweep override creates new config key: {key!r}")
                self.config[key] = value
            # keep the tracker's captured config truthful (it was built
            # from the pre-override config in __init__)
            self.tracker.config.update(sweep_overrides)
            # the cached trainer was built from the PREVIOUS hyperparameters;
            # a reused Pipeline must rebuild it (and, if the overrides touch
            # the data config, the dataset/arena too)
            self._trainer = None
            if any(
                k == "dataset" or k == "sources" or k == "model"
                or k.startswith("data.") or k.startswith("survival.")
                or k in ("patch_attention", "omic_attention", "tcga_path")
                for k in sweep_overrides
            ):
                self._dataset = None
                self._arena_device = None
                self._arena_sharded_key = None
                self._arena_sharded_device = None

        fold_metrics: Dict[str, List[float]] = {
            "train_c_index": [], "val_c_index": [], "test_c_index": [],
        }
        missing_perfs, fold_params, test_indices = [], [], []

        for fold in range(1, int(self.config["n_folds"]) + 1):
            print(f"*****FOLD {fold}*****")
            np.random.seed(fold)

            train_view, val_view, test_view, cw = self.load_data(fold=fold)
            test_indices.append(np.asarray(test_view.indices))
            trainer = self.make_trainer(train_view, fold=fold, cw=cw)
            res = trainer.fit(
                train_view, val_view, test_view, fold=fold,
                missing_ablation=bool(self.config.get("missing_ablation", False)),
                # "semantic" (default): dropped modality absent via presence
                # mask; "reference": the reference harness's one-element-list
                # routing, for like-for-like comparisons (loop.py:evaluate)
                missing_semantics=str(
                    self.config.get("train_loop.missing_semantics", "semantic")
                ),
            )
            for key in fold_metrics:
                fold_metrics[key].append(res[key])
            if res.get("missing_performance") is not None:
                missing_perfs.append(res["missing_performance"])
            fold_params.append(res["params"])

        summary = {}
        for key, values in fold_metrics.items():
            # tiny all-censored eval splits yield undefined (NaN) c-index;
            # filter them out explicitly so an all-NaN column summarises to
            # NaN without numpy's "Mean of empty slice" RuntimeWarning
            finite = [v for v in values if np.isfinite(v)]
            summary[f"mean_{key}"] = float(np.mean(finite)) if finite else float("nan")
            summary[f"std_{key}"] = float(np.std(finite)) if finite else float("nan")
        self.tracker.log(summary)

        test_c = np.asarray(fold_metrics["test_c_index"], dtype=float)
        best_fold = int(np.nanargmax(test_c)) if np.isfinite(test_c).any() else 0
        if missing_perfs:
            m50, momic, mwsi = np.mean(missing_perfs, axis=0)
            self.tracker.log(
                {
                    "missing_50_c_index": float(m50),
                    "missing_omic_c_index": float(momic),
                    "missing_wsi_c_index": float(mwsi),
                }
            )

        if self.config.get("explainer"):
            ckpt = Checkpointer(Path(self.log_dir) / "checkpoints")
            ckpt.save_best(fold_params[best_fold], metrics=summary)
            pickle_obj(dict(self.config), Path(self.log_dir) / "config.pkl")
            pickle_obj(test_indices[best_fold], Path(self.log_dir) / "test_data_indices.pkl")

        self.tracker.finish()
        summary["best_fold"] = best_fold
        return summary

    # ----------------------------------------------------------------- data
    def _dataset_cache_key(self) -> str:
        """Every config field the dataset's contents depend on."""
        fields = sorted(
            (k, str(v))
            for k, v in self.config.items()
            if k == "dataset" or k == "sources" or k == "model"
            or k == "omic_attention" or k == "patch_attention"
            or k == "tcga_path" or k.startswith("data.")
            or k.startswith("survival.")
        )
        return repr(fields) + f"|bins={self.output_dims}"

    def load_data(self, fold: int = 1):
        if self._dataset is None:
            key = self._dataset_cache_key()
            # explainer runs write per-run dataset artifacts (the omic
            # overlap csv) into THIS run's log dir at construction — a
            # cache hit would silently skip them, so build fresh
            use_cache = bool(
                self.config.get("data.cache_dataset", True)
            ) and not self.config.get("explainer")
            if use_cache and _DATASET_CACHE["key"] == key:
                self._dataset = _DATASET_CACHE["dataset"]
                self._arena_device = _DATASET_CACHE["arena_device"]
            else:
                max_patches = self.config.get("data.max_patches")
                self._dataset = TCGADataset(
                    self.config["dataset"],
                    self.config,
                    level=int(self.config["data.wsi_level"]),
                    survival_analysis=True,
                    sources=self.sources,
                    n_bins=self.output_dims,
                    log_dir=self.log_dir,
                    max_patches=None if max_patches in (None, "None", "null") else int(max_patches),
                )
                if use_cache:
                    _DATASET_CACHE.update(
                        key=key, dataset=self._dataset, arena_device=None
                    )
        data = self._dataset
        train_idx, test_idx, val_idx = train_val_test_split(len(data), seed=fold)
        print(
            f"Train samples: {len(train_idx)}, Val samples: {len(val_idx)}, "
            f"Test samples: {len(test_idx)}"
        )
        scheme = str(self.config["model_params.class_weights"])
        cw = class_weights(data.y_disc[train_idx], scheme, n_bins=self.output_dims)
        return data.take(train_idx), data.take(val_idx), data.take(test_idx), cw

    def _compute_dtype(self):
        """`precision: bf16` halves context HBM traffic (params stay fp32)."""
        import jax.numpy as jnp

        precision = str(self.config.get("precision", "fp32")).lower()
        return {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(precision)

    # ---------------------------------------------------------------- model
    def make_model(self, example_batch: Dict[str, Any], mesh=None):
        """Instantiate the configured model, shape-inferred from a batch."""
        feat = example_batch["tensors"]
        model_name = self.config["model"]
        mp = lambda key: self.config[f"model_params.{key}"]

        # arena-mode batches carry indices instead of the slide tensor; the
        # feature dim comes from the arena itself (always the LAST modality)
        slide_dim = example_batch.get("arena_dim")
        if slide_dim is None and len(feat) > 1:
            slide_dim = feat[1].shape[2]
        if model_name in ("healnet", "healnet_early"):
            if model_name == "healnet" and len(self.sources) == 2:
                input_channels = (feat[0].shape[2], slide_dim)
                input_axes, modalities = (1, 1), 2
            else:  # single source, or early fusion concat (one modality);
                # slides-only arena batches carry no tensors at all — the
                # modality is the arena
                input_channels = (feat[0].shape[2] if len(feat) > 0 else slide_dim,)
                input_axes, modalities = (1,), 1
            return HealNetModule(
                n_modalities=modalities,
                channel_dims=input_channels,
                num_spatial_axes=input_axes,
                out_dims=self.output_dims,
                num_freq_bands=int(mp("num_freq_bands")),
                depth=int(mp("depth")),
                max_freq=float(mp("max_freq")),
                l_c=int(mp("num_latents")),
                l_d=int(mp("latent_dim")),
                cross_dim_head=int(mp("cross_dim_head")),
                latent_dim_head=int(mp("latent_dim_head")),
                x_heads=int(mp("cross_heads")),
                l_heads=int(mp("latent_heads")),
                attn_dropout=float(mp("attn_dropout")),
                ff_dropout=float(mp("ff_dropout")),
                weight_tie_layers=bool(mp("weight_tie_layers")),
                fourier_encode_data=bool(mp("fourier_encode_data")),
                self_per_cross_attn=int(mp("self_per_cross_attn")),
                final_classifier_head=True,
                snn=bool(mp("snn")),
                attention_impl=str(self.config.get("attention_impl", "auto")),
                projection_impl=str(self.config.get("projection_impl", "auto")),
                dtype=self._compute_dtype(),
                mesh=mesh,
            )

        if model_name == "fcnn":
            return RegularizedFCNN(output_dim=self.output_dims)

        if model_name == "multimodn":
            state_size = 2000
            tab_features = int(np.prod(feat[0].shape[1:]))
            patch_dims = slide_dim
            return MultiModNModule(
                state_size=state_size,
                encoders=[
                    MLPEncoder(
                        state_size=state_size,
                        hidden_layers=(1024, 256, 128, 64),
                    ),
                    PatchEncoder(
                        state_size=state_size, hidden_layers=(512, 256, 128, 64)
                    ),
                ],
                decoders=[
                    ClassDecoder(n_classes=self.output_dims, activation=jax.nn.sigmoid)
                ],
            )

        # patch_attention feeds bags as (b, patches, dim) tokens (the
        # TPU-native / arena layout); the reference-parity default is the
        # transposed (b, dim, patches). The bag baselines must be told which
        # they are getting, or their FC stacks run over the wrong axis.
        tokens = bool(self.config.get("patch_attention", False))

        if model_name == "mm_prognosis":
            return MMPrognosis(output_dims=self.output_dims, tokens_layout=tokens)

        if model_name == "motcat":
            return MOTCAT(n_classes=self.output_dims, tokens_layout=tokens)

        if model_name == "mcat":
            if len(self.sources) == 2:
                return MCAT(n_classes=self.output_dims, tokens_layout=tokens)
            if self.sources[0] == "omic":
                return SNN(n_classes=self.output_dims)
            return MILAttentionNet(n_classes=self.output_dims, tokens_layout=tokens)

        raise ValueError(f"unknown model {model_name}")

    def make_trainer(self, train_view, fold: int, cw) -> SurvivalTrainer:
        # reuse ONE trainer across folds: the module/loss config is
        # fold-independent and class weights are a traced argument, so the
        # compiled (and traced) step functions carry over — fold 2+ skips
        # the expensive WSI-scale re-trace. Hoisted before any per-fold
        # batch/mesh/arena work, none of which the reuse path needs.
        if self._trainer is not None:
            self._trainer.set_fold(
                seed=fold,
                class_weights=cw,
                checkpoint_dir=self._fold_checkpoint_dir(fold),
            )
            return self._trainer

        example_batch = next(
            iterate_batches(train_view, int(self.config["train_loop.batch_size"]))
        )
        mesh = None
        if self.config.get("spmd", False):
            from healnet_tpu.parallel import make_mesh

            mesh = make_mesh()  # all visible devices, (data, seq, model)

        # data.device_cache: pack ALL patch features into one host arena;
        # the trainer uploads it to HBM once and every epoch streams only
        # indices (k-fold views share the parent dataset's single arena)
        feature_arena = None
        arena_sharded = False
        arena_device = None  # pre-built device arena (sharded mode)
        parent = getattr(train_view, "parent", train_view)
        if getattr(parent, "device_cache", False):
            from healnet_tpu.ops.quantize import (
                QuantizedContext,
                quantize_context_host,
            )

            arena, offsets, lengths = parent.feature_arena()
            # data.quantize_arena: store the arena as per-token int8 values
            # + f32 scales (ops/quantize.py) — half the HBM footprint and
            # half the context bytes each step streams; the fused KV
            # projection rescales on the accumulator. HealNet-family only
            # (other models consume the gathered slide as a raw tensor).
            quantize_arena = bool(self.config.get("data.quantize_arena", False))
            if quantize_arena and self.config["model"] not in (
                "healnet", "healnet_early"
            ):
                print(
                    "data.quantize_arena ignored: model "
                    f"{self.config['model']!r} does not route QuantizedContext"
                )
                quantize_arena = False
            if quantize_arena and not isinstance(arena, QuantizedContext):
                q, s = quantize_context_host(np.asarray(arena))
                arena = QuantizedContext(q, s)
                parent.adopt_device_arena(arena)  # release the fp32 pack
            # data.shard_arena: shard arena rows over the mesh's seq axis
            # (cohorts beyond one chip's HBM — parallel/arena.py). The host
            # pack stays resident (the trainer builds the halo'd shards from
            # it once); the replicated-upload path below is skipped.
            arena_sharded = bool(self.config.get("data.shard_arena", False)) and (
                mesh is not None
            )
            if arena_sharded:
                # build the halo'd device shards ONCE per run (and reuse
                # across sweep trials via _DATASET_CACHE) — rebuilding the
                # multi-GB pack + HBM upload inside every fold's trainer
                # would multiply host churn and upload time by n_folds
                boundaries = self._resolve_buckets(parent)
                # the halo must cover every gather width the batch builder
                # can emit: bucket boundaries when bucketed, max_patches when
                # not (etl/tcga.py _build_batch pads KV masks to max_patches)
                halo_cands = [int(b) for b in (boundaries or [])]
                if getattr(parent, "max_patches", None):
                    halo_cands.append(int(parent.max_patches))
                halo_cands.append(int(np.max(lengths)))
                halo = max(halo_cands)
                skey = (
                    self._dataset_cache_key(),
                    tuple(sorted(dict(mesh.shape).items())),
                    halo,
                    isinstance(arena, QuantizedContext),
                )
                if getattr(self, "_arena_sharded_key", None) == skey:
                    arena_device = self._arena_sharded_device
                elif _DATASET_CACHE.get("arena_sharded_key") == skey:
                    arena_device = _DATASET_CACHE["arena_sharded"]
                else:
                    from healnet_tpu.parallel.arena import build_device_arena

                    arena_device = build_device_arena(arena, mesh, halo=halo)
                self._arena_sharded_key = skey
                self._arena_sharded_device = arena_device
                if _DATASET_CACHE["dataset"] is parent:
                    _DATASET_CACHE["arena_sharded_key"] = skey
                    _DATASET_CACHE["arena_sharded"] = arena_device
                # the HOST pack still rides in feature_arena[0]: init-time
                # shape inference slices it (`loop.init_params`)
                feature_arena = (
                    arena if isinstance(arena, QuantizedContext)
                    else np.asarray(arena),
                    offsets,
                    lengths,
                )
            elif self._arena_device is None:
                # one HBM upload per RUN — every fold's trainer receives the
                # already-resident device array (device_put no-ops on it)
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec

                    self._arena_device = jax.device_put(
                        arena, NamedSharding(mesh, PartitionSpec())
                    )
                else:
                    self._arena_device = jax.device_put(arena)
                # release the multi-GB host pack; the device copy serves
                # all remaining host-side probes (shape/init slicing)
                parent.adopt_device_arena(self._arena_device)
                if _DATASET_CACHE["dataset"] is parent:
                    # later Pipelines (sweep trials) reuse the HBM upload too
                    _DATASET_CACHE["arena_device"] = self._arena_device
            if not arena_sharded:
                feature_arena = (self._arena_device, offsets, lengths)
            example_batch = dict(
                example_batch, arena_dim=int(arena.shape[1])
            )

        model = self.make_model(example_batch, mesh=mesh)
        model_name = self.config["model"]
        self._trainer = SurvivalTrainer(
            model,
            loss_type=self.config["survival.loss"],
            mesh=mesh,
            l1=float(self.config["model_params.l1"]),
            class_weights=cw,
            batch_size=int(self.config["train_loop.batch_size"]),
            epochs=int(self.config["train_loop.epochs"]),
            max_lr=float(self.config["optimizer.max_lr"]),
            patience=int(self.config["train_loop.patience"]),
            early_stopping=bool(self.config["train_loop.early_stopping"]),
            eval_interval=int(self.config.get("train_loop.eval_interval", 1)),
            gc_compat=int(self.config.get("train_loop.gc_compat", 16)),
            seed=fold,
            tracker=self.tracker,
            reg_topo=model_name,
            sources=self.sources,
            aux_loss=model_name == "multimodn",
            n_bins=self.output_dims,
            bucket_boundaries=self._resolve_buckets(parent),
            checkpoint_dir=self._fold_checkpoint_dir(fold),
            resume=bool(self.config.get("train_loop.resume", False)),
            keep_checkpoints=self.config.get("train_loop.keep_checkpoints", 3),
            feature_arena=feature_arena,
            fused_epochs=bool(self.config.get("train_loop.fused_epochs", False)),
            arena_sharded=arena_sharded,
            arena_device=arena_device,
        )
        return self._trainer

    def _resolve_buckets(self, parent):
        """train_loop.bucket_boundaries: list, "auto", or absent.

        "auto" derives boundaries from the dataset's bag-size quantiles,
        rounded up to multiples of the 128-wide TPU lane
        (:meth:`TCGADataset.suggest_bucket_boundaries`).
        """
        boundaries = self.config.get("train_loop.bucket_boundaries")
        if isinstance(boundaries, str) and boundaries.lower() == "auto":
            boundaries = (
                parent.suggest_bucket_boundaries()
                if hasattr(parent, "suggest_bucket_boundaries")
                else None
            )
            if boundaries:
                print(f"auto bucket boundaries: {boundaries}")
        return boundaries

    def _fold_checkpoint_dir(self, fold: int):
        """Durable per-fold checkpoints (train_loop.checkpoint: true).

        With train_loop.resume also set, a re-launched run restores the last
        finished epoch of the interrupted fold and continues — the
        upgrade over the reference's in-memory-only best weights
        (`main.py:397-399`, lost on any crash mid-plan).
        """
        if not self.config.get("train_loop.checkpoint", False):
            return None
        base = Path(self.tracker.log_dir if self.tracker is not None else "logs")
        return str(base / f"fold_{fold}_checkpoints")
