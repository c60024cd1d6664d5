"""Explainability: omics feature rankings and WSI patch-attention heatmaps.

Counterpart of the reference Explainer
(`/root/reference/healnet/models/explainer.py:22-475`): reload a finished
run's artifacts (config, test indices, best parameters — saved by the
Pipeline when ``explainer: true``), rebuild the dataset and model, run
forwards on high-/low-risk test patients, and turn the stored attention maps
into:

- a top-k omics feature bar chart (layer chosen by max attention std,
  `explainer.py:147-199`) — requires the ``omic_attention: false`` token
  layout where each feature is a context token;
- a WSI patch-attention heatmap + top-patch highlights over the slide image
  (`explainer.py:201-349`). When the raw ``.svs`` slides / libopenslide are
  unavailable, the heatmap is rendered in patch-coordinate space from the
  CLAM-schema h5 coords instead, and raw attention/heatmap arrays are always
  saved as ``.npy`` for downstream tooling.

Model restore uses the orbax checkpoint written by the Pipeline
(`healnet_tpu/train/pipeline.py`), replacing the reference's
``torch.load(best_model.pt)`` (`explainer.py:358-402`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from healnet_tpu.etl import TCGADataset
from healnet_tpu.models.healnet import HealNet
from healnet_tpu.train.checkpoint import Checkpointer
from healnet_tpu.utils import Box, unpickle


class Explainer:
    def __init__(self, log_dir, show: bool = False):
        self.log_dir = Path(log_dir)
        self.show = show
        self.expl_dir = Path("explanations") / self.log_dir.name
        self.expl_dir.mkdir(parents=True, exist_ok=True)

        self.config = Box(unpickle(self.log_dir / "config.pkl"))
        self.test_data_indices = np.asarray(
            unpickle(self.log_dir / "test_data_indices.pkl")
        )
        self.dataset = self.config["dataset"]
        self.level = int(self.config["data.wsi_level"])
        self.prep_path = (
            Path(self.config["tcga_path"])
            / "wsi"
            / f"{self.dataset}_preprocessed_level{self.level}"
        )
        self.raw_path = Path(self.config["tcga_path"]) / "wsi" / self.dataset

        print("Initializing dataset...")
        max_patches = self.config.get("data.max_patches")
        self.data = TCGADataset(
            dataset=self.dataset,
            config=self.config,
            level=self.level,
            sources=list(self.config["sources"]),
            n_bins=int(self.config["model_params.output_dims"]),
            log_dir=None,
            # the run's static bag width MUST be reproduced: auto-scanning a
            # larger cohort maximum would rebuild slide tensors wider than
            # the checkpointed projections
            max_patches=(
                None if max_patches in (None, "None", "null") else int(max_patches)
            ),
        )
        self.omic_df = self.data.omic_df
        print("Loading model...")
        self.model = self.load_model()

    # ------------------------------------------------------------- restore
    def load_model(self) -> HealNet:
        feat = self.data[0][0]
        num_sources = len(self.config["sources"])
        if num_sources == 1:
            channels = [feat[0].shape[-1]]
            axes, modalities = [1], 1
        else:
            channels = [feat[0].shape[-1], feat[1].shape[-1]]
            axes, modalities = [1, 1], 2

        mp = lambda key: self.config[f"model_params.{key}"]
        model = HealNet(
            n_modalities=modalities,
            channel_dims=channels,
            num_spatial_axes=axes,
            out_dims=int(mp("output_dims")),
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
            snn=bool(mp("snn")),
        )
        params = Checkpointer(self.log_dir / "checkpoints").restore_best()
        import jax

        model.params = jax.tree_util.tree_map(np.asarray, params)
        return model

    # --------------------------------------------------------------- select
    def get_patients(self, n: int = 5, risk: str = "high"):
        """Highest/lowest-risk test patients by (y_disc, survival_months)."""
        assert risk in ("high", "low"), "Invalid risk type"
        filtered = self.omic_df.iloc[self.test_data_indices]
        ascending = risk == "high"
        filtered = filtered.sort_values(
            by=["y_disc", "survival_months"], ascending=ascending
        )
        return filtered.iloc[:n]["slide_id"].apply(lambda x: x[:-4])

    # ------------------------------------------------------------------ run
    def run(
        self,
        n_high: int = 3,
        n_low: int = 0,
        downsample: Optional[float] = None,
        run_omic: bool = True,
        run_slides: bool = True,
        heatmap: bool = True,
        highlight_patches: bool = True,
        save_patches: bool = True,
        streaming: Optional[bool] = None,
    ) -> List[Dict]:
        results = []
        high = self.get_patients(risk="high", n=n_high)
        low = self.get_patients(risk="low", n=n_low)
        for label, series in (("high_risk", high), ("low_risk", low)):
            for rank, (idx, slide_id) in enumerate(series.items()):
                results.append(
                    self.run_sample_explanation(
                        idx, slide_id, run_omic=run_omic, run_slides=run_slides,
                        heatmap=heatmap, highlight_patches=highlight_patches,
                        save_patches=save_patches, downsample=downsample,
                        save_name=f"{label}_{rank}", streaming=streaming,
                    )
                )
        return results

    def run_sample_explanation(
        self,
        idx: int,
        slide_id: str,
        run_omic: bool = True,
        run_slides: bool = True,
        heatmap: bool = True,
        highlight_patches: bool = True,
        save_patches: bool = True,
        downsample: Optional[float] = None,
        save_name: Optional[str] = None,
        streaming: Optional[bool] = None,
    ) -> Dict:
        """``streaming``: use the chunked attention-stats capture
        (:meth:`HealNet.get_attention_stats`) instead of materialising the
        full probability maps — identical scores (tests/test_streaming_stats
        + test_explainer_tasks), peak capture memory one KV chunk per site.
        Default (None) auto-streams once any modality exceeds 4,096 tokens;
        the dense maps at that size start at hundreds of MB and reach
        gigabytes at the 50k-token contexts the reference explainer targets
        (`/root/reference/healnet/models/explainer.py:201-349`)."""
        # run_sample_explanation is also a public entry point: artifacts are
        # named per call (run() passes the high/low-risk rank; direct calls
        # default to the slide id) — a persistent attribute here would make
        # a later direct call silently clobber the previous sample's files
        self.save_name = str(slide_id) if save_name is None else save_name
        # duplicate index labels are tolerated by the loader; get_loc would
        # return a slice/mask for them
        hits = np.flatnonzero(self.omic_df.index == idx)
        if hits.size == 0:
            raise KeyError(f"sample {idx!r} not found in the omic index")
        pos = int(hits[0])
        tensors, _, _, _, n_valid = self.data._sample(pos)
        batched = [np.asarray(t)[None] for t in tensors]
        # reproduce the training-time KV mask: padded patch rows must not
        # receive attention mass in the maps being explained
        mask = None
        if self.data.patch_attention and n_valid is not None:
            width = batched[-1].shape[1]
            mask = [None] * len(batched)
            mask[-1] = (np.arange(width) < n_valid)[None, :]
        logits = np.asarray(self.model(batched, mask=mask))

        n_omic_tokens = batched[0].shape[1]
        n_patch_tokens = batched[1].shape[1] if len(batched) > 1 else -1
        result: Dict = {"slide_id": slide_id, "logits": logits}
        if streaming is None:
            streaming = max(t.shape[1] for t in batched) > 4096
        omic_wanted = (
            run_omic and n_omic_tokens == len(self.data.features.columns)
        )

        if streaming:
            stats = self.model.get_attention_stats()
            omic_scores = slide_scores = None
            omic_stats = [s for s in stats if s["tokens"] == n_omic_tokens]
            if omic_stats:
                # max-std layer selection, identical statistic to the dense
                # path's np.std over the full map (`explainer.py:147-199`)
                layer = int(np.argmax([s["std"] for s in omic_stats]))
                omic_scores = omic_stats[layer]["col_mean"].mean(axis=0)
            slide_stats = [s for s in stats if s["tokens"] == n_patch_tokens]
            if slide_stats:
                slide_scores = np.mean(
                    [s["col_mean"].mean(axis=0) for s in slide_stats], axis=0
                )
        else:
            weights = self.model.get_attention_weights()
            omic_attn = [w for w in weights if w.shape[2] == n_omic_tokens]
            slide_attn = [w for w in weights if w.shape[2] == n_patch_tokens]
            omic_scores = slide_scores = None
            if omic_attn:
                layer = int(np.argmax([np.std(w) for w in omic_attn]))
                omic_scores = omic_attn[layer].mean(axis=(0, 1))
            if slide_attn:
                slide_scores = np.stack(slide_attn).mean(axis=(0, 1, 2)).squeeze()

        if omic_wanted and omic_scores is not None:
            result["omic_ranking"] = self._plot_omic_scores(omic_scores)
        if run_slides and slide_scores is not None:
            coords = self.load_patch_coords(slide_id)
            result["heatmap"] = self._plot_slide_scores(
                slide_id, slide_scores, coords, heatmap=heatmap,
                highlight_patches=highlight_patches, save_patches=save_patches,
                downsample=downsample,
            )
        return result

    # ------------------------------------------------------------ omic plot
    def plot_omic_attn(self, omic_attn: List[np.ndarray], k: int = 20):
        """Top-k feature bar chart from the max-std layer (`explainer.py:147-199`)."""
        layer = int(np.argmax([np.std(w) for w in omic_attn]))
        scores = omic_attn[layer].mean(axis=(0, 1))  # mean over heads+latents
        return self._plot_omic_scores(scores, k=k)

    def _plot_omic_scores(self, scores: np.ndarray, k: int = 20):
        """Bar chart + .npy from a per-feature score vector — shared by the
        dense (full-map) and streaming (chunk-reduced) capture paths."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import pandas as pd

        # raw per-feature attention rides along as .npy (the slide path does
        # the same): downstream tooling and the cross-framework explainer
        # comparison need the full vector, not just the plotted top-k
        np.save(self.expl_dir / f"{self.save_name}_omic_attention.npy", scores)
        feats = self.data.features.columns.tolist()
        plot_df = (
            pd.DataFrame({"feature": feats, "attention": scores})
            .sort_values("attention", ascending=False)
        )
        plot_df = plot_df[~plot_df["feature"].str.contains("age|is_female")]
        lo, hi = plot_df["attention"].min(), plot_df["attention"].max()
        plot_df = plot_df.iloc[:k]
        plot_df["attention_scaled"] = (plot_df["attention"] - lo) / max(hi - lo, 1e-12) / k

        fig, ax = plt.subplots(figsize=(6, 10))
        ax.barh(plot_df["feature"][::-1], plot_df["attention_scaled"][::-1])
        ax.set_xlabel("Attention Scaled")
        ax.set_ylabel("Feature")
        fig.tight_layout()
        fig.savefig(self.expl_dir / f"{self.save_name}_omic_attn.png")
        plt.close(fig)
        return plot_df

    # ----------------------------------------------------------- slide plot
    def load_patch_coords(self, slide_id: str) -> Optional[np.ndarray]:
        import h5py

        path = self.prep_path / "patches" / f"{slide_id}.h5"
        if not path.exists():
            return None
        with h5py.File(path, "r") as f:
            if "coords" in f:
                return f["coords"][:]
        return None

    def plot_slide_attn(
        self,
        slide_id: str,
        slide_attn: List[np.ndarray],
        coords: Optional[np.ndarray],
        patch_size: Tuple[int, int] = (256, 256),
        heatmap: bool = True,
        highlight_patches: bool = True,
        save_patches: bool = True,
        downsample: Optional[float] = None,
    ) -> Optional[np.ndarray]:
        """Attention heatmap over the slide (or coords-space fallback)."""
        # mean across layers and heads (`explainer.py:207-212`)
        attn = np.stack(slide_attn).mean(axis=(0, 1, 2)).squeeze()
        return self._plot_slide_scores(
            slide_id, attn, coords, patch_size=patch_size, heatmap=heatmap,
            highlight_patches=highlight_patches, save_patches=save_patches,
            downsample=downsample,
        )

    def _plot_slide_scores(
        self,
        slide_id: str,
        attn: np.ndarray,
        coords: Optional[np.ndarray],
        patch_size: Tuple[int, int] = (256, 256),
        heatmap: bool = True,
        highlight_patches: bool = True,
        save_patches: bool = True,
        downsample: Optional[float] = None,
    ) -> Optional[np.ndarray]:
        """Heatmap pipeline from a per-patch score vector — shared by the
        dense and streaming capture paths."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        np.save(self.expl_dir / f"{self.save_name}_attention.npy", attn)
        if coords is None or len(coords) == 0:
            print(f"No patch coords for {slide_id}; saved raw attention only.")
            return None
        attn = attn[: len(coords)]
        scaled = (attn - attn.min()) / max(attn.max() - attn.min(), 1e-12)

        slide_img, scale_factor = self._read_slide_image(slide_id)
        if slide_img is not None:
            canvas_h, canvas_w = slide_img.shape[:2]
            # coords are level-0 (CLAM schema) -> divide by the level's
            # downsample; patch_size is defined AT the pyramid level
            # (cli/tasks.py grid step), so the extent needs no rescaling
            xs = (coords[:, 0] / scale_factor).astype(int)
            ys = (coords[:, 1] / scale_factor).astype(int)
            ph = pw = int(patch_size[0])
        else:  # coords-space canvas fallback
            cell = 16
            xs = ((coords[:, 0] - coords[:, 0].min()) // patch_size[0]).astype(int) * cell
            ys = ((coords[:, 1] - coords[:, 1].min()) // patch_size[1]).astype(int) * cell
            canvas_w, canvas_h = xs.max() + cell, ys.max() + cell
            ph = pw = cell

        heat = np.zeros((canvas_h, canvas_w), np.float32)
        # painted is tracked separately: the argmin patch scales to exactly
        # 0.0, so `heat <= 0` would misclassify a real patch as background
        painted = np.zeros((canvas_h, canvas_w), bool)
        for x, y, a in zip(xs, ys, scaled):
            heat[y : y + ph, x : x + pw] = a
            painted[y : y + ph, x : x + pw] = True
        np.save(self.expl_dir / f"{self.save_name}_heatmap.npy", heat)
        np.save(self.expl_dir / f"{self.save_name}_mask.npy", ~painted)

        if heatmap:
            fig, ax = plt.subplots(figsize=(10, 10))
            if slide_img is not None:
                ax.imshow(slide_img)
                ax.imshow(heat, cmap="Blues", alpha=0.7)
            else:
                im = ax.imshow(heat, cmap="Blues")
                fig.colorbar(im, ax=ax, shrink=0.5, label="Attention")
            ax.axis("off")
            fig.savefig(self.expl_dir / f"{self.save_name}_heatmap.png", dpi=150)
            plt.close(fig)
        if highlight_patches and slide_img is not None:
            import matplotlib.patches as patches

            top = np.argsort(scaled)[::-1][:5]
            fig, ax = plt.subplots(figsize=(10, 10))
            ax.imshow(slide_img)
            for i in top:
                ax.add_patch(
                    patches.Rectangle(
                        (xs[i], ys[i]), pw, ph, linewidth=2,
                        edgecolor="lime", facecolor="none",
                    )
                )
            ax.axis("off")
            fig.savefig(self.expl_dir / f"{self.save_name}_patch_highlights.png", dpi=150)
            plt.close(fig)
        if save_patches and slide_img is not None:
            # extract + save the top-5 attended patch crops themselves
            # (`explainer.py:238-262`): level-res crop from the rendered
            # slide, plus a native-resolution read_region when the raw slide
            # is openable
            top = np.argsort(scaled)[::-1][:5]
            for rank, i in enumerate(top):
                x, y = int(xs[i]), int(ys[i])
                crop = slide_img[y : y + ph, x : x + pw]
                if crop.size == 0:
                    continue
                plt.imsave(
                    self.expl_dir / f"{self.save_name}_patch_{rank}.png",
                    np.ascontiguousarray(crop.astype(np.uint8)),
                )
            self._save_high_res_patches(
                slide_id, coords[top], patch_size, scale_factor
            )
        return heat

    def _save_high_res_patches(
        self,
        slide_id: str,
        level0_coords: np.ndarray,
        patch_size: Tuple[int, int],
        scale_factor: float,
    ) -> None:
        """Native-resolution crops of the top patches (`explainer.py:252-262`)."""
        from healnet_tpu.etl.slides import OpenSlide, openslide_available

        if not openslide_available():
            return
        path = self.raw_path / f"{slide_id}.svs"
        if not path.exists():
            return
        import matplotlib.pyplot as plt

        slide = OpenSlide(path)
        try:
            size0 = (
                int(patch_size[0] * scale_factor),
                int(patch_size[1] * scale_factor),
            )
            for rank, (x, y) in enumerate(np.asarray(level0_coords, dtype=int)):
                crop = slide.read_region((int(x), int(y)), 0, size0)[:, :, :3]
                plt.imsave(
                    self.expl_dir / f"{self.save_name}_patch_{rank}_high_res.png",
                    crop.astype(np.uint8),
                )
        finally:
            slide.close()

    def _read_slide_image(self, slide_id: str):
        """(slide RGB at self.level, level0->level scale) or (None, 1)."""
        try:
            from healnet_tpu.etl.slides import OpenSlide, openslide_available

            if not openslide_available():
                return None, 1.0
            path = self.raw_path / f"{slide_id}.svs"
            if not path.exists():
                return None, 1.0
            slide = OpenSlide(path)
            level = min(self.level, slide.level_count - 1)
            size = slide.level_dimensions[level]
            img = slide.read_region((0, 0), level, size)[:, :, :3]
            scale = slide.dimensions[0] / size[0]
            return img, scale
        except Exception as exc:  # pragma: no cover
            print(f"slide render unavailable ({exc}); using coords-space fallback")
            return None, 1.0
