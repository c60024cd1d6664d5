"""Batched inference / serving path.

The reference has no serving layer (SURVEY.md §0); this provides the
production inference surface for the framework:

- :class:`Predictor` wraps a trained module + params (live pytree or an
  orbax checkpoint directory) behind ONE compiled program: requests of any
  size are padded to a fixed micro-batch, so serving never recompiles;
- outputs are the full survival head: logits, hazards, survival curves, and
  risk scores (`hazards = sigmoid; S = cumprod(1-h); risk = -sum(S)` —
  the chain of `/root/reference/healnet/main.py:434-437`);
- per-sample missing modalities via the same static presence masks as
  training (pass ``None`` for an absent modality, or a presence matrix);
- optional bf16 compute for throughput (fp32 outputs);
- WSI-scale serving: ragged patch bags (a list of per-sample ``(tokens_i,
  d)`` arrays) are padded to length buckets — at most one compiled program
  per bucket boundary, never one per observed length — with KV masks built
  automatically; and arena mode serves from the training-time device-resident
  feature arena (``patch_offsets``/``patch_lengths`` instead of feature
  tensors: no per-request feature H2D at all).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from healnet_tpu.train.losses import hazards_survival_risk


class Predictor:
    """Fixed-shape, jit-once survival predictor."""

    def __init__(
        self,
        module,
        params: Union[Dict, str, Path],
        batch_size: int = 8,
        compute_dtype: Any = None,
        bucket_boundaries: Optional[Sequence[int]] = None,
        feature_arena: Optional[Any] = None,  # np.ndarray | QuantizedContext
        mod_shapes: Optional[Dict[int, Sequence[int]]] = None,
    ):
        """
        Args:
            module: a Flax module with the framework call convention.
            params: parameter pytree, or a checkpoint directory containing
                a ``best`` checkpoint written by :class:`Checkpointer`.
            batch_size: compiled micro-batch; requests are padded/split.
            bucket_boundaries: sorted token-length boundaries for ragged
                patch bags (same values as ``train_loop.bucket_boundaries``);
                each ragged sample pads to the smallest boundary >= its
                length, so at most one program compiles per boundary.
            feature_arena: the training-time packed feature arena — enables
                arena-mode prediction (``patch_offsets``/``patch_lengths``
                instead of the slide feature tensor; zero per-request feature
                upload). Uploaded to HBM once.
            mod_shapes: per-modality trailing shapes, e.g.
                ``{1: (512, 2048)}`` — required to zero-fill a ``None``
                (missing) modality when the module declares no
                ``channel_dims`` (the bag baselines). Declared up front so
                identical requests behave identically regardless of what
                was served before.
        """
        self.module = module
        if isinstance(params, (str, Path)):
            from healnet_tpu.train.checkpoint import Checkpointer

            params = Checkpointer(params).restore_best()
        self.params = params
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self.bucket_boundaries = (
            sorted(int(b) for b in bucket_boundaries) if bucket_boundaries else None
        )
        self._arena = (
            None if feature_arena is None else jax.device_put(feature_arena)
        )
        # declared per-modality trailing shapes — lets _materialize
        # zero-fill a missing modality for modules that do not declare
        # channel_dims (the bag baselines). Construction-time only: learning
        # shapes from request history would make identical requests behave
        # differently over the server's lifetime
        self._mod_shapes: Dict[int, tuple] = (
            {} if mod_shapes is None
            else {int(k): tuple(int(d) for d in v) for k, v in mod_shapes.items()}
        )
        # bag baselines (MCAT, MultiModN, MMPrognosis) take no kv_masks —
        # they pool the zero-padded tokens; same gating as the trainer
        from healnet_tpu.utils.train_utils import accepts_kv_masks

        self._accepts_kv_masks = accepts_kv_masks(module)
        accepts_kv = self._accepts_kv_masks

        def predict(params, tensors, presence, kv_masks):
            kwargs = (
                {} if (kv_masks is None or not accepts_kv)
                else {"kv_masks": kv_masks}
            )
            logits = module.apply(
                {"params": params}, tensors, presence=presence,
                deterministic=True, **kwargs,
            ).astype(jnp.float32)
            hazards, survival, risk = hazards_survival_risk(logits)
            return {
                "logits": logits,
                "hazards": hazards,
                "survival": survival,
                "risk": risk,
            }

        self._predict = jax.jit(predict)

        def predict_arena(params, tensors, presence, kv_masks, arena, offsets):
            # the trainer's on-device bag gather, SHARED code path
            # (`parallel/arena.py` gather_bag) so the out-of-bag-row
            # contract cannot drift between training and serving
            from healnet_tpu.parallel.arena import gather_bag

            slide = gather_bag(arena, offsets, kv_masks[-1])
            full = tuple(tensors) + (slide,)
            return predict(params, full, presence, kv_masks)

        self._predict_arena = jax.jit(predict_arena)

    def __call__(
        self,
        tensors: Sequence[Optional[np.ndarray]],
        presence: Optional[np.ndarray] = None,
        kv_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> Dict[str, np.ndarray]:
        """Predict for n samples; entries of ``tensors`` may be None (missing).

        kv_masks: optional per-modality boolean masks ``(n, tokens_i)`` for
        ragged padded contexts (True = attend) — without them, zero-padded
        patch rows would be attended and inference would diverge from the
        training-time masked semantics.

        Returns numpy arrays of shape (n, ...) for logits/hazards/survival
        and (n,) for risk.
        """
        n_mod = len(tensors)
        n = next(
            (np.asarray(t).shape[0] for t in tensors if t is not None),
            None if presence is None else np.asarray(presence).shape[0],
        )
        assert n is not None, (
            "at least one modality tensor (or a presence matrix) is required"
        )
        if n == 0:  # empty request: empty, well-shaped outputs
            zero = lambda *tail: np.zeros((0, *tail), np.float32)
            # modules name their class count differently: HealNet uses
            # out_dims, MMPrognosis output_dims, MCAT/MOTCat n_classes
            nb = next(
                (
                    int(getattr(self.module, attr))
                    for attr in ("out_dims", "output_dims", "n_classes")
                    if getattr(self.module, attr, None) is not None
                ),
                0,
            )
            return {
                "logits": zero(nb), "hazards": zero(nb),
                "survival": zero(nb), "risk": zero(),
            }

        # materialise missing modalities as zeros + presence mask
        pres = (
            np.ones((n, n_mod), np.float32)
            if presence is None
            else np.asarray(presence, np.float32).copy()
        )
        full = self._materialize(tensors, n, pres)

        masks = (
            [None] * n_mod
            if kv_masks is None
            else [None if m is None else np.asarray(m, bool) for m in kv_masks]
        )
        return self._microbatched(n, full, pres, masks, kv_masks is None)

    def _materialize(self, tensors, n: int, pres: np.ndarray) -> List[np.ndarray]:
        """None entries (missing modalities) -> zero-filled arrays, with the
        matching presence column zeroed — the documented ``__call__``
        contract, shared by the ragged/arena entry points (``np.asarray(None)``
        would otherwise produce a 0-d NaN)."""
        shapes = getattr(self.module, "num_spatial_axes", None)
        chans = getattr(self.module, "channel_dims", None)
        full = []
        for i, t in enumerate(tensors):
            if t is None:
                pres[:, i] = 0.0
                if chans is not None:
                    axes = shapes[i] if shapes is not None else 1
                    tail = (1,) * axes + (int(chans[i]),)
                elif i in self._mod_shapes:
                    # bag baselines declare no channel_dims: use the shape
                    # declared at construction (mod_shapes)
                    tail = self._mod_shapes[i]
                else:
                    raise ValueError(
                        f"modality {i} is None but its shape is unknown: the "
                        "module declares no channel_dims — declare it via "
                        "Predictor(mod_shapes={...}) or pass explicit zeros "
                        "with a presence mask instead"
                    )
                full.append(np.zeros((n,) + tail, np.float32))
            else:
                full.append(np.asarray(t, np.float32))
        return full

    # ---------------------------------------------------------- WSI serving
    def _bucket_width(self, length: int) -> int:
        """Smallest boundary >= length (overlong bags truncate to the cap);
        128-lane-aligned free widths when no boundaries are configured."""
        if self.bucket_boundaries:
            for b in self.bucket_boundaries:
                if length <= b:
                    return b
            return self.bucket_boundaries[-1]
        return max(128, -(-int(length) // 128) * 128)

    def predict_ragged(
        self,
        tensors: Sequence[Any],
        presence: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Predict for ragged patch bags without caller-side padding.

        ``tensors[-1]`` is a LIST of per-sample ``(tokens_i, d)`` arrays (or
        ``None`` for a missing bag); earlier entries are stacked arrays as in
        ``__call__``. Samples are grouped by bucket width (one compiled
        program per boundary), padded, KV-masked, and results reassembled in
        request order.
        """
        bags = list(tensors[-1])
        n = len(bags)
        pres = (
            np.ones((n, len(tensors)), np.float32)
            if presence is None
            else np.asarray(presence, np.float32).copy()
        )
        lead = self._materialize(tensors[:-1], n, pres)
        dim = next(
            (np.asarray(b).shape[-1] for b in bags if b is not None), None
        )
        assert dim is not None, "at least one sample must carry a patch bag"

        groups: Dict[int, List[int]] = {}
        for i, b in enumerate(bags):
            width = self._bucket_width(0 if b is None else len(b))
            groups.setdefault(width, []).append(i)

        slot_outs: Dict[int, Dict[str, np.ndarray]] = {}
        for width, idxs in groups.items():
            m = len(idxs)
            padded = np.zeros((m, width, dim), np.float32)
            mask = np.zeros((m, width), bool)
            grp_pres = pres[idxs].copy()
            for j, i in enumerate(idxs):
                if bags[i] is None:
                    grp_pres[j, -1] = 0.0
                    continue
                bag = np.asarray(bags[i], np.float32)
                ln = min(len(bag), width)
                padded[j, :ln] = bag[:ln]
                mask[j, :ln] = True
            grp_tensors = [t[idxs] for t in lead] + [padded]
            kv = [None] * len(lead) + [mask]
            res = self._microbatched(m, grp_tensors, grp_pres, kv, False)
            for j, i in enumerate(idxs):
                slot_outs[i] = {k: v[j] for k, v in res.items()}
        return {
            k: np.stack([slot_outs[i][k] for i in range(n)])
            for k in next(iter(slot_outs.values()))
        }

    def predict_from_arena(
        self,
        tensors: Sequence[Optional[np.ndarray]],
        patch_offsets: np.ndarray,
        patch_lengths: np.ndarray,
        presence: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Arena-mode prediction: zero per-request feature upload.

        ``tensors`` carries the non-slide modalities (as in training's arena
        batches); each sample's bag is gathered ON DEVICE from the resident
        feature arena by (offset, length). Requires ``feature_arena`` at
        construction. One compiled program per bucket width.
        """
        assert self._arena is not None, "Predictor(feature_arena=...) required"
        offsets = np.asarray(patch_offsets, np.int32)
        lengths = np.asarray(patch_lengths, np.int32)
        n = offsets.shape[0]
        n_mod = len(tensors) + 1
        pres = (
            np.ones((n, n_mod), np.float32)
            if presence is None
            else np.asarray(presence, np.float32).copy()
        )
        lead = self._materialize(list(tensors), n, pres)

        groups: Dict[int, List[int]] = {}
        for i, ln in enumerate(lengths):
            groups.setdefault(self._bucket_width(int(ln)), []).append(i)

        bs = self.batch_size
        slot_outs: Dict[int, Dict[str, np.ndarray]] = {}
        for width, idxs in groups.items():
            for start in range(0, len(idxs), bs):
                sel = idxs[start : start + bs]
                m = len(sel)
                pad = bs - m
                rows = sel + [sel[-1]] * pad
                mask = (
                    np.arange(width)[None, :]
                    < np.minimum(lengths[rows], width)[:, None]
                )
                cur = tuple(
                    jnp.asarray(
                        np.concatenate([t[sel], np.repeat(t[sel][-1:], pad, 0)])
                        if pad
                        else t[sel],
                        self.compute_dtype or jnp.float32,
                    )
                    for t in lead
                )
                kv = tuple([None] * len(lead) + [jnp.asarray(mask)])
                res = self._predict_arena(
                    self.params, cur, jnp.asarray(pres[rows]), kv,
                    self._arena, jnp.asarray(offsets[rows]),
                )
                for j, i in enumerate(sel):
                    slot_outs[i] = {k: np.asarray(v)[j] for k, v in res.items()}
        return {
            k: np.stack([slot_outs[i][k] for i in range(n)])
            for k in next(iter(slot_outs.values()))
        }

    def warmup(
        self,
        example_shapes: Sequence[Sequence[int]],
        widths: Optional[Sequence[int]] = None,
        arena: Optional[bool] = None,
    ) -> Dict[str, float]:
        """Compile every serving program before the first live request.

        Without this, a cold deployment pays program compilation (seconds)
        on whichever LIVE request first hits each bucket width — measured
        at 4.07 s p99 vs 313 ms p50 on the arena path before this API
        existed (BENCH_SERVING.json, round 4). Call once at server start.

        Compiles, per bucket width: the masked (ragged) program, and the
        arena-gather program when a ``feature_arena`` was given; plus the
        mask-free dense program at the declared last-modality shape. All
        programs execute once on zeros, synchronously, so the XLA
        compilation cache is hot before traffic arrives.

        Args:
            example_shapes: per-sample trailing shapes, one per modality —
                the same convention as :meth:`export`, e.g.
                ``[(1, 2000), (4096, 2048)]``. The last modality's token
                dim is re-padded to each bucket width; earlier modalities
                warm at their declared shapes.
            widths: bucket widths to compile; defaults to
                ``bucket_boundaries`` (or the declared last-modality token
                dim when no buckets are configured).
            arena: force the arena path on/off; default warms it iff a
                ``feature_arena`` was given at construction.

        Returns:
            ``{"programs": <compiled program count>, "seconds": <wall>}``.
        """
        t0 = time.perf_counter()
        bs = self.batch_size
        shapes = [tuple(int(d) for d in s) for s in example_shapes]
        n_mod = len(shapes)
        lead = [np.zeros((bs,) + s, np.float32) for s in shapes[:-1]]
        pres = np.ones((bs, n_mod), np.float32)
        if widths is not None:
            widths = [int(w) for w in widths]
        elif self.bucket_boundaries:
            widths = list(self.bucket_boundaries)
        else:
            widths = [shapes[-1][0]]
        dim = shapes[-1][-1]

        # mask-free dense program at the declared shape
        dense = np.zeros((bs,) + shapes[-1], np.float32)
        self._microbatched(bs, lead + [dense], pres, [None] * n_mod, True)
        # one masked program per bucket width (the ragged path)
        for w in widths:
            bag = np.zeros((bs, w, dim), np.float32)
            masks = [None] * (n_mod - 1) + [np.ones((bs, w), bool)]
            self._microbatched(bs, lead + [bag], pres, masks, False)
        warm_arena = (self._arena is not None) if arena is None else arena
        if warm_arena:
            offsets = np.zeros(bs, np.int32)
            for w in widths:
                self.predict_from_arena(
                    lead, offsets, np.full(bs, w, np.int32), presence=pres
                )
        n = self._predict._cache_size() + self._predict_arena._cache_size()
        return {"programs": int(n), "seconds": time.perf_counter() - t0}

    def export(
        self,
        path: Union[str, Path],
        example_shapes: Sequence[Sequence[int]],
        widths: Optional[Sequence[int]] = None,
        platforms: Optional[Sequence[str]] = None,
    ):
        """Write a self-contained deployment artifact (StableHLO + params).

        See :func:`healnet_tpu.serving_export.export_predictor`.
        ``example_shapes`` are per-sample trailing shapes, one per modality,
        e.g. ``[(1, 2000), (4096, 2048)]``.
        """
        from healnet_tpu.serving_export import export_predictor

        return export_predictor(
            self, path, example_shapes, widths=widths, platforms=platforms
        )

    def _microbatched(self, n, full, pres, masks, masks_absent):
        return serve_microbatched(
            self._predict, self.params, n, full, pres, masks, masks_absent,
            self.batch_size, self.compute_dtype,
        )


def serve_microbatched(
    predict_fn, params, n, full, pres, masks, masks_absent, batch_size,
    compute_dtype,
):
    """Pad/split n requests into fixed micro-batches and reassemble outputs.

    Shared by the live :class:`Predictor` and the deployment-artifact
    :class:`healnet_tpu.serving_export.ExportedPredictor` so padding
    semantics cannot drift between them.
    """
    outs: List[Dict[str, np.ndarray]] = []
    bs = batch_size
    for start in range(0, n, bs):
        sel = slice(start, min(start + bs, n))
        cur = [t[sel] for t in full]
        cur_pres = pres[sel]
        cur_masks = [None if m is None else m[sel] for m in masks]
        pad = bs - cur[0].shape[0]
        if pad > 0:
            cur = [np.concatenate([t, np.repeat(t[-1:], pad, 0)]) for t in cur]
            cur_pres = np.concatenate([cur_pres, np.repeat(cur_pres[-1:], pad, 0)])
            cur_masks = [
                None if m is None
                else np.concatenate([m, np.repeat(m[-1:], pad, 0)])
                for m in cur_masks
            ]
        dtype = compute_dtype or jnp.float32
        batch_tensors = tuple(jnp.asarray(t, dtype) for t in cur)
        jm = (
            None
            if masks_absent
            else tuple(None if m is None else jnp.asarray(m) for m in cur_masks)
        )
        result = predict_fn(params, batch_tensors, jnp.asarray(cur_pres), jm)
        outs.append(
            {k: np.asarray(v)[: bs - pad if pad else bs] for k, v in result.items()}
        )
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
