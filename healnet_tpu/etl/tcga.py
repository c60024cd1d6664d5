"""TCGA multimodal survival dataset: omics tables + WSI patch features.

Re-implementation of the reference loader semantics
(`/root/reference/healnet/etl/loaders.py:44-395`) on a torch-free, host-side
stack designed to feed a TPU input pipeline:

- omics CSV (``omic/tcga_<ds>_all_clean.csv.zip``) with NaN -> column-mean
  imputation (`loaders.py:303-306`), modality-overlap filtering
  (`loaders.py:309-325`), and survival discretisation via pandas qcut on the
  configured subset (`loaders.py:327-343`, bit-identical — see
  :func:`healnet_tpu.etl.datasets.discretize_survival`);
- omic tensor layout per ``omic_attention``: ``(n, 1, feat)`` (features as
  channels of one token) vs ``(n, feat, 1)`` (`loaders.py:112-117`);
- per-slide patch features from ``patch_features/<slide_id>.pt`` (torch) or
  ``.npy``, transposed to ``(feat_dim, n_patches)`` exactly as the reference
  (`loaders.py:382-395`);
- ``__getitem__`` returns ``([tensors], censorship, event_time, y_disc)``
  with per-source branches and early-fusion concat for ``fcnn`` /
  ``healnet_early`` (`loaders.py:133-176`);
- the multiprocessing Manager-dict patch cache (`loaders.py:127-128`) — an
  anti-pattern on a TPU host — is replaced by a plain in-process LRU plus
  the streaming batch iterator in :func:`iter_batches`, which is what the
  double-buffered device prefetcher consumes.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from healnet_tpu.etl.base import Dataset
from healnet_tpu.etl.datasets import discretize_survival
from healnet_tpu.utils.config import flatten_config

_NON_FEATURE_COLS = [
    "site", "oncotree_code", "case_id", "slide_id", "train",
    "censorship", "survival_months", "y_disc",
]


class LRUCache:
    """Single-process LRU for decoded patch-feature tensors."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self._store: "OrderedDict[Any, np.ndarray]" = OrderedDict()

    def get(self, key):
        if key in self._store:
            self._store.move_to_end(key)
            return self._store[key]
        return None

    def set(self, key, value) -> None:
        if key in self._store:
            self._store.move_to_end(key)
        self._store[key] = value
        while len(self._store) > self.capacity:
            self._store.popitem(last=False)

    def __contains__(self, key) -> bool:
        return key in self._store

    def __len__(self) -> int:
        return len(self._store)


class DatasetView:
    """Index-subset view over a dataset exposing the streaming batch API."""

    def __init__(self, parent, indices: np.ndarray):
        self.parent = parent
        self.indices = np.asarray(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.parent[int(self.indices[i])]

    def iter_batches(self, batch_size: int, shuffle: bool = False, rng=None, **kw):
        return self.parent.iter_batches(
            batch_size, indices=self.indices, shuffle=shuffle, rng=rng, **kw
        )

    def materialize(self):
        return self.parent.materialize(self.indices)


class TCGADataset(Dataset):
    """TCGA omics + WSI-patch survival dataset."""

    def __init__(
        self,
        dataset: str,
        config,
        level: int = 2,
        filter_overlap: bool = True,
        survival_analysis: bool = True,
        num_classes: int = 2,
        n_bins: int = 4,
        sources: Sequence[str] = ("omic", "slides"),
        log_dir=None,
        cache_capacity: int = 256,
        native_cache_mb: Optional[int] = 2048,
        max_patches: Optional[int] = None,
    ):
        # max_patches: pad/truncate ragged patch bags to this static length
        # and emit per-sample KV masks (XLA needs static shapes; SURVEY §7.3).
        # None = "auto": scan the feature files once and use the largest bag.
        valid_sources = ("omic", "slides")
        assert all(s in valid_sources for s in sources), (
            f"Invalid source specified. Valid sources are {list(valid_sources)}"
        )
        self.config = config
        # one schema normalization at construction: callers hand configs in
        # either nested ({"survival": {"subset": ...}}) or dotted
        # ("survival.subset") form — flatten once and read dotted keys
        # everywhere below (flatten_config is idempotent on dotted input)
        cfg = flatten_config(config) if hasattr(config, "items") else flatten_config({})
        self.dataset = dataset
        self.level = level
        self.sources = list(sources)
        self.filter_overlap = filter_overlap
        self.survival_analysis = survival_analysis
        self.num_classes = num_classes
        self.n_bins = n_bins
        self.log_dir = log_dir
        self.subset = cfg.get("survival.subset", "uncensored")

        tcga_path = Path(config["tcga_path"])
        self.raw_path = tcga_path / "wsi" / dataset
        self.prep_path = tcga_path / "wsi" / f"{dataset}_preprocessed_level{level}"
        (self.prep_path / "patch_features").mkdir(parents=True, exist_ok=True)

        patches_dir = self.prep_path / "patches"
        self.slide_ids = [
            p.rsplit(".", 1)[0] for p in sorted(os.listdir(patches_dir))
        ] if patches_dir.exists() else []

        model = cfg.get("model", "healnet")
        self.concat = model in ("fcnn", "healnet_early") and len(self.sources) > 1
        self.model = model
        self.omic_attention = bool(cfg.get("omic_attention", True))
        # patch_attention=True: patches are context TOKENS (n_patches, dim)
        # with per-sample KV masks for ragged bags — the TPU-native layout.
        # False (reference parity): (dim, n_patches), patches as channels
        # zero-padded to a static width (`tasks.py:148-192` offline padding).
        self.patch_attention = bool(cfg.get("patch_attention", False))
        # device_cache=True: batches carry (patch_offsets, patch_lengths)
        # into a device-resident feature arena instead of the slide tensors
        # themselves — the trainer uploads ALL patch features to HBM once per
        # run and gathers each batch's bags on-device, so the per-epoch
        # host->device stream shrinks from the full feature volume to a few
        # KB of indices (requires patch_attention; see
        # :meth:`feature_arena`).
        _dc_requested = bool(cfg.get("data.device_cache", False))
        self.device_cache = (
            _dc_requested
            and self.patch_attention
            and "slides" in self.sources
            and not self.concat
        )
        if _dc_requested and not self.device_cache:
            import warnings

            warnings.warn(
                "data.device_cache requested but disabled: it requires "
                "patch_attention=true, a 'slides' source, and a non-concat "
                "model — this run will stream features host->device every "
                "epoch",
                stacklevel=2,
            )

        self.omic_df = self.load_omic()
        self.features = self.omic_df.drop(
            columns=[c for c in _NON_FEATURE_COLS if c in self.omic_df.columns]
        )
        omic = self.features.values.astype(np.float32)
        if model in ("healnet", "healnet_early"):
            # (n, 1, feat) vs (n, feat, 1) (`loaders.py:112-117`)
            self.omic_tensor = (
                omic[:, None, :] if self.omic_attention else omic[:, :, None]
            )
        else:
            self.omic_tensor = omic

        self.censorship = self.omic_df["censorship"].values.astype(np.float32)
        self.survival_months = self.omic_df["survival_months"].values.astype(np.float32)
        self.y_disc = self.omic_df["y_disc"].values.astype(np.int32)
        self._cache = LRUCache(cache_capacity)
        fd = cfg.get("data.feature_dtype", "float32")
        self.feature_dtype = np.dtype(str(fd or "float32"))
        self.max_patches = max_patches
        if "slides" in self.sources:
            # always scan: it reads only npy headers and populates the
            # per-slide _bag_sizes that length-bucketed batching keys on —
            # an explicit max_patches must not silently disable bucketing
            scanned = self._scan_max_patches()
            if self.max_patches is None:
                self.max_patches = scanned
            if self.patch_attention and self.max_patches is None:
                raise ValueError(
                    "patch_attention needs a static bag width, but no .npy "
                    "patch features were found to scan (a .pt-only tree?). "
                    "Either set data.max_patches explicitly or convert the "
                    "features to .npy (np.save(torch.load(f).numpy()))."
                )
        # native C++ cache for .npy feature files: byte-bounded LRU with a
        # background prefetch thread pool (cpp/healnet_runtime.cc)
        self._native = None
        if native_cache_mb:
            try:
                from healnet_tpu.runtime import NativeFeatureCache, native_available

                if native_available():
                    self._native = NativeFeatureCache(capacity_mb=native_cache_mb)
            except Exception:
                self._native = None

    # ----------------------------------------------------------------- omic
    def load_omic(self, eps: float = 1e-6) -> pd.DataFrame:
        """Load the omics table, impute, overlap-filter, and discretise."""
        data_path = (
            Path(self.config["tcga_path"]) / "omic" / f"tcga_{self.dataset}_all_clean.csv.zip"
        )
        df = pd.read_csv(
            data_path, compression="zip", header=0, index_col=0, low_memory=False
        )
        df = df.fillna(df.mean(numeric_only=True))

        if self.filter_overlap and "slide_id" in df.columns:
            # row-count comparison like the reference (`loaders.py:311-323`):
            # omic_available is the LIST of rows, not a deduped set — duplicate
            # slide_ids in the omics table count as rows to filter
            slides_available = self.slide_ids
            omic_available = [sid[:-4] for sid in df["slide_id"]]
            overlap = set(slides_available) & set(omic_available)
            if len(slides_available) < len(omic_available):
                keep = {sid + ".svs" for sid in overlap}
                df = df[df["slide_id"].isin(keep)]
            elif len(slides_available) > len(omic_available):
                self.slide_ids = sorted(overlap)

        df["y_disc"] = discretize_survival(
            df, n_bins=self.n_bins, subset=self.subset, eps=eps
        )
        if self.log_dir is not None:
            df.to_csv(
                Path(self.log_dir) / f"{self.dataset}_omic_overlap.csv.zip",
                compression="zip",
            )
        return df

    # --------------------------------------------------------------- slides
    def _npy_path(self, slide_id: str) -> Path:
        return self.prep_path / "patch_features" / f"{slide_id}.npy"

    @property
    def _row_sids(self) -> np.ndarray:
        """Per-row stripped slide ids, cached as a numpy object array.

        The arena build is O(n) rows and the prefetch hook runs per batch
        every epoch; pandas scalar ``iloc`` is ~100x a numpy array read, so
        those loops index this array instead.
        """
        cached = getattr(self, "_row_sids_arr", None)
        if cached is None or len(cached) != len(self.omic_df):
            cached = np.asarray(
                [s.rsplit(".", 1)[0] for s in self.omic_df["slide_id"].tolist()],
                dtype=object,
            )
            self._row_sids_arr = cached
        return cached

    def _scan_max_patches(self) -> Optional[int]:
        """Largest bag length across the dataset (reads only npy headers).

        Also records per-slide bag sizes for length-bucketed batching.
        """
        largest = 0
        base = self.prep_path / "patch_features"
        self._bag_sizes: Dict[str, int] = {}
        for sid in self.slide_ids:
            npy = base / f"{sid}.npy"
            if not npy.exists():
                # .pt(-mixed) layout: reference pads offline. Clear the
                # partial size map — a truthy partial dict would silently
                # enable bucketing on a biased subset of bag sizes
                self._bag_sizes = {}
                return None
            with open(npy, "rb") as f:
                version = np.lib.format.read_magic(f)
                reader = (
                    np.lib.format.read_array_header_1_0
                    if version == (1, 0)
                    else np.lib.format.read_array_header_2_0
                )
                shape, _, _ = reader(f)
            self._bag_sizes[sid] = int(shape[0])
            self._feature_dim = int(shape[1])  # arena width, no data read
            largest = max(largest, shape[0])
        return largest or None

    def _resolve_bucket_boundaries(self, bucket_boundaries) -> List[int]:
        """Sorted, deduped boundaries clamped to ``max_patches``.

        Clamping matters beyond wasted padding: in arena mode a KV width
        wider than the arena's trailing zero-pad would make the fixed-width
        gather window clamp its start and silently read other slides' rows.
        """
        boundaries = sorted(set(int(b) for b in bucket_boundaries))
        if self.max_patches is not None:
            boundaries = sorted({min(b, int(self.max_patches)) for b in boundaries})
            if not boundaries or boundaries[-1] < self.max_patches:
                boundaries.append(int(self.max_patches))
        return boundaries

    def _assign_buckets(
        self, idx: np.ndarray, boundaries: List[int], batch_size: int
    ) -> List[Tuple[int, List[int]]]:
        """(boundary, member-chunk) pairs; oversize bags land in the largest
        bucket (and are truncated to it by ``_slide_tensor``)."""
        buckets: Dict[int, List[int]] = {b: [] for b in boundaries}
        for i in idx:
            size = self.bag_size(int(i)) or boundaries[-1]
            boundary = next((b for b in boundaries if size <= b), boundaries[-1])
            buckets[boundary].append(int(i))
        chunks: List[Tuple[int, List[int]]] = []
        for boundary, members in buckets.items():
            for start in range(0, len(members), batch_size):
                chunks.append((boundary, members[start : start + batch_size]))
        return chunks

    def count_batches(
        self,
        indices: Optional[np.ndarray],
        batch_size: int,
        bucket_boundaries: Optional[Sequence[int]] = None,
    ) -> int:
        """Exact batches per epoch — each bucket pads its OWN trailing
        remainder, so the count exceeds ceil(n / batch_size) under
        bucketing (the LR schedule must use this, not the naive count)."""
        idx = np.arange(len(self)) if indices is None else np.asarray(indices)
        if (
            bucket_boundaries
            and self.patch_attention
            and getattr(self, "_bag_sizes", None)
        ):
            boundaries = self._resolve_bucket_boundaries(bucket_boundaries)
            return len(self._assign_buckets(idx, boundaries, batch_size))
        return int(np.ceil(len(idx) / batch_size))

    def _prefetch_feature_files(self, ids) -> None:
        """Queue feature-file reads on the native cache's thread pool.

        Only when the load path will actually CONSUME the native cache:
        it decodes to f32, so for float16 hosts (or arena mode, which does
        no per-batch IO) prefetching would double-read every file.
        """
        if (
            self._native is None
            or self.device_cache
            or "slides" not in self.sources
            or self.feature_dtype != np.float32
            or len(ids) == 0
        ):
            return
        paths = [
            self._npy_path(self._row_sids[int(i)])
            for i in ids
        ]
        paths = [p for p in paths if p.exists()]
        if paths:
            self._native.prefetch(paths)

    def suggest_bucket_boundaries(
        self, n_buckets: int = 4, align: int = 128
    ) -> Optional[List[int]]:
        """TPU-friendly bucket boundaries from the bag-size histogram.

        Quantiles of the scanned bag sizes, rounded UP to multiples of
        ``align`` (the TPU lane width — aligned KV widths tile cleanly onto
        the MXU/VPU) and capped at ``max_patches``. Returns None when bag
        sizes are unknown (.pt-only layout) or patch_attention is off.
        """
        sizes = getattr(self, "_bag_sizes", None)
        if not sizes or not self.patch_attention:
            return None
        arr = np.asarray(sorted(sizes.values()))
        qs = np.quantile(arr, np.linspace(0, 1, n_buckets + 1)[1:])
        cap = self.max_patches or int(arr[-1])
        boundaries = sorted(
            {min(int(np.ceil(q / align)) * align, cap) for q in qs}
        )
        return boundaries

    def bag_size(self, index: int) -> Optional[int]:
        sizes = getattr(self, "_bag_sizes", None)
        if not sizes:
            return None
        return sizes.get(self._row_sids[index])

    def load_patch_features(self, slide_id: str) -> np.ndarray:
        """Raw per-slide patch features, (n_patches, feat_dim).

        Features keep ``feature_dtype`` (config ``data.feature_dtype``,
        default float32) on the host: with float16 the per-batch host->device
        transfer halves — at WSI scale the H2D stream, not compute, bounds
        epoch time. The model casts to its compute dtype on device.
        """
        base = self.prep_path / "patch_features"
        npy = base / f"{slide_id}.npy"
        if npy.exists():
            # the native cache decodes to f32; use it only when f32 is wanted
            if self._native is not None and self.feature_dtype == np.float32:
                try:
                    feats = self._native.load(npy)
                except IOError:
                    # the minimal C++ parser only accepts little-endian
                    # f4/f8 C-order arrays — fall back rather than abort
                    feats = np.load(npy)
            else:
                feats = np.load(npy)
        else:
            import torch  # torch-cpu: only for decoding reference .pt artifacts

            with open(base / f"{slide_id}.pt", "rb") as f:
                feats = torch.load(f, weights_only=True).numpy()
        return np.asarray(feats, dtype=self.feature_dtype)

    # ---------------------------------------------------- device-side arena
    def _arena_index(self) -> Tuple[np.ndarray, np.ndarray]:
        """(offsets, lengths) int32 per dataset index — no feature IO.

        Derived from the npy-header bag-size scan; lengths are capped at
        ``max_patches`` exactly as :meth:`_slide_tensor` truncates.
        """
        if getattr(self, "_arena_offsets", None) is not None:
            return self._arena_offsets, self._arena_lengths
        sizes = getattr(self, "_bag_sizes", None)
        assert sizes, (
            "device_cache needs .npy patch features (bag sizes scanned from "
            "headers); the .pt-only layout is not supported"
        )
        # duplicate slide_ids (tolerated by load_omic) share ONE arena
        # segment — each unique slide's features live in HBM exactly once
        lengths = np.empty(len(self), dtype=np.int32)
        offsets = np.empty(len(self), dtype=np.int32)
        seg_offset: Dict[str, int] = {}
        cursor = 0
        row_sids = self._row_sids
        for i in range(len(self)):
            sid = row_sids[i]
            assert sid in sizes, (
                f"device_cache: no .npy patch features for slide {sid} "
                "(mixed .npy/.pt trees are not supported)"
            )
            n = int(sizes[sid])
            lengths[i] = min(n, self.max_patches) if self.max_patches else n
            if sid not in seg_offset:
                seg_offset[sid] = cursor
                cursor += int(lengths[i])
            offsets[i] = seg_offset[sid]
        self._arena_rows = cursor
        self._arena_offsets, self._arena_lengths = offsets, lengths
        return offsets, lengths

    def feature_arena(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(arena, offsets, lengths): every slide's patch features, packed.

        ``arena`` is ``(sum(lengths) + max_patches, feature_dim)`` in
        ``feature_dtype`` — the trailing ``max_patches`` zero rows guarantee a
        fixed-width ``dynamic_slice`` window starting at any offset stays in
        bounds (out-of-bag rows are masked by the per-sample KV masks). The
        trainer uploads it to HBM once; epochs then stream only indices.
        Built lazily and cached on the dataset, so k-fold views share one copy.
        """
        if getattr(self, "_arena", None) is not None:
            return self._arena, self._arena_offsets, self._arena_lengths
        offsets, lengths = self._arena_index()
        pad = int(self.max_patches or 0)
        total = self._arena_rows + pad
        dim = int(self._feature_dim)  # recorded by the npy-header scan
        arena = np.zeros((total, dim), dtype=self.feature_dtype)
        written = set()
        row_sids = self._row_sids
        for i in range(len(self)):
            sid = row_sids[i]
            if sid in written:
                continue  # duplicate omic rows share the segment
            written.add(sid)
            feats = self.load_patch_features(sid)[: lengths[i]]
            arena[offsets[i] : offsets[i] + lengths[i]] = feats
        self._arena = arena
        return arena, offsets, lengths

    def adopt_device_arena(self, device_arena) -> None:
        """Swap the cached host arena for its device-resident copy.

        Called by the Pipeline right after the one-time HBM upload: the host
        numpy pack (gigabytes at WSI scale) is released, and later
        ``feature_arena()`` calls hand back the device array (numpy-style
        slicing on it still works for host-side shape/init probes).
        """
        self._arena = device_arena

    def _slide_tensor(self, index: int, pad_to: Optional[int] = None) -> Tuple[np.ndarray, int]:
        """(static-shape slide tensor, n_valid_patches) — ragged bags padded.

        pad_to overrides the global max (length-bucketed batching pads each
        batch only to its bucket's boundary). The LRU caches the RAW features
        keyed by index only — padding/transposing is a cheap memset per emit,
        while caching padded copies would multiply host RAM by the padding
        ratio and duplicate slides across bucket widths.
        """
        pad_to = pad_to if pad_to is not None else self.max_patches
        feats = self._cache.get(index)
        if feats is None:
            slide_id = self.omic_df.iloc[index]["slide_id"].rsplit(".", 1)[0]
            feats = self.load_patch_features(slide_id)  # (n_patches, dim)
            self._cache.set(index, feats)
        n_valid = feats.shape[0]
        if pad_to is not None:
            if n_valid > pad_to:
                feats = feats[:pad_to]
                n_valid = pad_to
            elif n_valid < pad_to:
                feats = np.pad(feats, ((0, pad_to - n_valid), (0, 0)))
        if self.patch_attention:
            tensor = np.ascontiguousarray(feats)      # (tokens, channels)
        else:
            tensor = np.ascontiguousarray(feats.T)    # (dim, n_patches) parity
        return tensor, n_valid

    # ------------------------------------------------------------- indexing
    def __len__(self) -> int:
        if self.sources == ["omic"]:
            return self.omic_df.shape[0]
        return len(self.slide_ids)

    def __getitem__(self, index: int):
        tensors, censorship, event_time, y_disc, _ = self._sample(index)
        return tensors, censorship, event_time, y_disc

    def _sample(self, index: int, pad_to: Optional[int] = None):
        """([tensors], censorship, event_time, y_disc, n_valid_patches|None)."""
        y_disc = self.y_disc[index]
        censorship = self.censorship[index]
        event_time = self.survival_months[index]

        if self.sources == ["omic"]:
            return [self.omic_tensor[index]], censorship, event_time, y_disc, None

        if self.sources == ["slides"]:
            slide, n_valid = self._slide_tensor(index, pad_to)
            if self.model == "fcnn":
                slide = slide.reshape(-1)
            return [slide], censorship, event_time, y_disc, n_valid

        omic = self.omic_tensor[index]
        slide, n_valid = self._slide_tensor(index, pad_to)
        if self.concat:  # early fusion (`loaders.py:168-174`)
            concat = np.concatenate([omic.reshape(-1), slide.reshape(-1)])
            if self.model == "healnet_early":
                concat = concat[None, :]
            return [concat], censorship, event_time, y_disc, None
        return [omic, slide], censorship, event_time, y_disc, n_valid

    # ------------------------------------------------------------- batching
    def iter_batches(
        self,
        batch_size: int,
        indices: Optional[np.ndarray] = None,
        shuffle: bool = False,
        rng: Optional[np.random.Generator] = None,
        drop_remainder: bool = False,
        bucket_boundaries: Optional[Sequence[int]] = None,
    ) -> Iterator[Dict[str, Any]]:
        """Static-shape trainer batches (pad + mask), streaming from disk.

        bucket_boundaries (patch_attention only): length-bucketed batching —
        samples are grouped by bag size and each batch pads only to its
        bucket's boundary, cutting padded-token compute when bag sizes vary
        widely. XLA compiles at most one program per boundary.
        """
        # copy: shuffling must never mutate the caller's indices in place
        # (DatasetView passes its own .indices array here)
        idx = np.arange(len(self)) if indices is None else np.array(indices)
        rng = rng or np.random.default_rng()
        if shuffle:
            rng.shuffle(idx)

        if bucket_boundaries and self.patch_attention and getattr(self, "_bag_sizes", None):
            boundaries = self._resolve_bucket_boundaries(bucket_boundaries)
            chunks = self._assign_buckets(idx, boundaries, batch_size)
            if shuffle:
                rng.shuffle(chunks)
            for j, (boundary, sel) in enumerate(chunks):
                if drop_remainder and len(sel) < batch_size:
                    continue
                # overlap the NEXT chunk's feature-file IO with this one
                if j + 1 < len(chunks):
                    self._prefetch_feature_files(chunks[j + 1][1])
                yield self._build_batch(np.asarray(sel), batch_size, pad_to=boundary)
            return

        for start in range(0, len(idx), batch_size):
            sel = idx[start : start + batch_size]
            if drop_remainder and sel.shape[0] < batch_size:
                return
            # overlap next batch's feature-file IO with this batch's compute
            self._prefetch_feature_files(idx[start + batch_size : start + 2 * batch_size])
            yield self._build_batch(sel, batch_size, pad_to=None)

    def _build_batch(
        self, sel: np.ndarray, batch_size: int, pad_to: Optional[int]
    ) -> Dict[str, Any]:
        pad = batch_size - sel.shape[0]
        mask = np.ones(batch_size, dtype=np.float32)
        if pad > 0:
            sel = np.concatenate([sel, np.repeat(sel[-1:], pad)])
            mask[batch_size - pad :] = 0.0

        if self.device_cache:
            # arena mode: no feature IO — the batch carries indices into the
            # device-resident arena; the trainer gathers on-device. The KV
            # mask's width is the bucket boundary, so jit still specialises
            # one program per bucket exactly as in the host-tensor path.
            offsets, lengths = self._arena_index()  # asserts .npy layout first
            width = int(pad_to if pad_to is not None else self.max_patches)
            n_valid = np.minimum(lengths[sel], width).astype(np.int32)
            batch = {
                "tensors": (
                    (np.stack([self.omic_tensor[int(i)] for i in sel]),)
                    if "omic" in self.sources
                    else ()
                ),
                "censorship": self.censorship[sel].astype(np.float32),
                "event_time": self.survival_months[sel].astype(np.float32),
                "y_disc": self.y_disc[sel].astype(np.int32),
                "sample_mask": mask,
                "patch_offsets": offsets[sel].astype(np.int32),
                "patch_lengths": n_valid,
            }
            kv_masks: List[Optional[np.ndarray]] = [None] * (
                len(batch["tensors"]) + 1
            )
            kv_masks[-1] = np.arange(width)[None, :] < n_valid[:, None]
            batch["kv_masks"] = tuple(kv_masks)
            return batch

        samples = [self._sample(int(i), pad_to=pad_to) for i in sel]
        n_mod = len(samples[0][0])
        batch = {
            "tensors": tuple(
                np.stack([s[0][m] for s in samples]) for m in range(n_mod)
            ),
            "censorship": np.asarray([s[1] for s in samples], np.float32),
            "event_time": np.asarray([s[2] for s in samples], np.float32),
            "y_disc": np.asarray([s[3] for s in samples], np.int32),
            "sample_mask": mask,
        }
        if self.patch_attention and samples[0][4] is not None:
            # ragged bags: per-sample token masks over the patch axis
            width = pad_to if pad_to is not None else self.max_patches
            n_valid = np.asarray([s[4] for s in samples])
            patch_mask = np.arange(width)[None, :] < n_valid[:, None]
            kv_masks = [None] * n_mod
            kv_masks[-1] = patch_mask
            batch["kv_masks"] = tuple(kv_masks)
        return batch

    def materialize(self, indices: Optional[np.ndarray] = None) -> Dict[str, Any]:
        """Whole-split arrays for in-memory training (small datasets only)."""
        idx = np.arange(len(self)) if indices is None else np.asarray(indices)
        samples = [self._sample(int(i)) for i in idx]
        n_mod = len(samples[0][0])
        out = {
            "tensors": tuple(
                np.stack([s[0][m] for s in samples]) for m in range(n_mod)
            ),
            "censorship": np.asarray([s[1] for s in samples], np.float32),
            "event_time": np.asarray([s[2] for s in samples], np.float32),
            "y_disc": np.asarray([s[3] for s in samples], np.int32),
        }
        if self.patch_attention and samples[0][4] is not None:
            n_valid = np.asarray([s[4] for s in samples])
            patch_mask = np.arange(self.max_patches)[None, :] < n_valid[:, None]
            kv_masks = [None] * n_mod
            kv_masks[-1] = patch_mask
            out["kv_masks"] = tuple(kv_masks)
        return out

    def take(self, indices: np.ndarray) -> "DatasetView":
        """Lightweight split view sharing this dataset's cache (fold splits)."""
        return DatasetView(self, np.asarray(indices))

    # ------------------------------------------------------------- raw WSIs
    def get_slide_paths(self) -> Dict[str, Path]:
        """{slide filename: path} over the gdc download tree (`loaders.py:204-215`)."""
        return {p.name: p for p in self.raw_path.glob("**/*.svs")}

    def get_resize_dims(
        self, level: int, patch_height: int = 128, patch_width: int = 128,
        override: bool = False, slide=None,
    ):
        """Level dims rounded to patch multiples (`loaders.py:178-189`)."""
        if override:
            return (
                int(self.config["data.resize_width"]),
                int(self.config["data.resize_height"]),
            )
        if slide is None:
            from healnet_tpu.etl.slides import OpenSlide

            slide = OpenSlide(next(iter(self.get_slide_paths().values())))
        w, h = slide.level_dimensions[min(level, slide.level_count - 1)]
        return (
            round(w / patch_width) * patch_width,
            round(h / patch_height) * patch_height,
        )

    def load_wsi(self, slide_id: str, level: Optional[int] = None):
        """Read a whole slide at a pyramid level, resized to patch multiples.

        Returns (slide handle, (h, w, 3) float array) — the raw-WSI input
        path (`loaders.py:350-380`). Requires libopenslide.
        """
        import cv2

        from healnet_tpu.etl.slides import OpenSlide

        slide = OpenSlide(self.raw_path / f"{slide_id}.svs")
        if level is None or level > slide.level_count - 1:
            level = slide.level_count - 1
        size = slide.level_dimensions[level]
        region = slide.read_region((0, 0), level, size)[:, :, :3]
        width, height = self.get_resize_dims(
            level, override=bool(self.config.get("data.resize", False)), slide=slide
        )
        resized = cv2.resize(region, (width, height), interpolation=cv2.INTER_LINEAR)
        return slide, resized.astype(np.float32) / 255.0

    # ---------------------------------------------------------------- info
    def get_info(self, full_detail: bool = False) -> Dict[str, Any]:
        """Dataset summary (reference prints; we return a dict and print)."""
        info = {
            "dataset": self.dataset.upper(),
            "molecular_shape": tuple(self.omic_df.shape),
            "n_slides": len(self.slide_ids),
            "sources": self.sources,
            "censored_share": float(
                np.round((self.omic_df["censorship"] == 1).mean(), 3)
            ),
            "survival_bin_sizes": dict(
                self.omic_df["y_disc"].value_counts().sort_index()
            ),
        }
        for key, value in info.items():
            print(f"{key}: {value}")
        return info
