"""Deployment artifacts for the serving layer.

:func:`export_predictor` lowers a :class:`healnet_tpu.serving.Predictor`'s
compiled predict program to versioned StableHLO via ``jax.export`` and
writes a self-contained artifact directory — program bytes, parameters, and
a manifest. :class:`ExportedPredictor` then serves that directory WITHOUT
the model's Python class: a deployment host needs jax and this module, not
the framework's model zoo, flax, or the training stack.

The reference has no serving layer at all (SURVEY.md §0 names this the
rebuild's gap to fill); this is the packaging half of the serving path in
``healnet_tpu/serving.py``. Artifact layout::

    <path>/manifest.json       shapes, dtypes, bucket widths, out_dims
    <path>/params.npz          flattened parameter tree
    <path>/predict.bin         dense program (fixed per-modality shapes)
    <path>/predict_w<W>.bin    one ragged-bag program per bucket width W

TPU Pallas kernels inside the program serialize as ``tpu_custom_call``
custom calls, which jax.export only guarantees across matching jaxlib
versions — the manifest records the exporting jax version so a serving
host can refuse a mismatch. Export with ``platforms=("tpu", "cpu")`` for
artifacts that also run on CPU hosts (the auto dispatch never lowers
Pallas on CPU).
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from healnet_tpu.serving import serve_microbatched

_SEP = "::"
_FORMAT_VERSION = 1


def _flatten_params(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def _aval(shape, dtype):
    return jax.ShapeDtypeStruct(tuple(int(d) for d in shape), dtype)


def export_predictor(
    predictor,
    path,
    example_shapes: Sequence[Sequence[int]],
    widths: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Serialize ``predictor``'s compiled predict program + params to ``path``.

    Args:
        predictor: a live :class:`healnet_tpu.serving.Predictor`.
        example_shapes: per-sample trailing shape for each modality (no
            batch dim), e.g. ``[(1, 2000), (4096, 2048)]`` — fixes the
            dense program's signature.
        widths: optional ragged-bag bucket widths; one extra program is
            exported per width, with the LAST modality reshaped to
            ``(width, d)`` and KV-masked (mirrors ``predict_ragged``).
        platforms: lowering targets, e.g. ``("tpu", "cpu")``; defaults to
            the current default backend only.
    """
    from jax import export as jexport

    # the npz stores a '::'-joined flat map reconstructed as nested plain
    # dicts: any pytree that won't survive that round-trip (list/tuple
    # nodes, FrozenDict containers, '::' inside a key) would surface at
    # SERVE time as an opaque Exported.call structure mismatch — fail
    # loudly here at export instead, before any tracing
    flat = _flatten_params(predictor.params)
    rt = jax.tree_util.tree_structure(_unflatten_params(flat))
    orig = jax.tree_util.tree_structure(predictor.params)
    if rt != orig:
        raise ValueError(
            "params pytree does not survive the artifact's flatten/"
            "unflatten round-trip (only nested plain dicts with keys free"
            f" of '{_SEP}' are supported): exported structure would be"
            f" {rt}, live structure is {orig}"
        )

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tails = [tuple(int(d) for d in s) for s in example_shapes]
    bs = int(predictor.batch_size)
    dtype = predictor.compute_dtype or jnp.float32
    uses_masks = bool(predictor._accepts_kv_masks)

    params_avals = jax.tree_util.tree_map(
        lambda a: _aval(a.shape, a.dtype), predictor.params
    )
    pres_aval = _aval((bs, len(tails)), jnp.float32)

    def arg_avals(last_width: Optional[int] = None):
        cur = list(tails)
        if last_width is not None:
            cur[-1] = (int(last_width), cur[-1][-1])
        tens = tuple(_aval((bs, *t), dtype) for t in cur)
        if not uses_masks:
            return tens, None
        masks = tuple(
            _aval((bs, math.prod(t[:-1])), jnp.bool_) for t in cur
        )
        return tens, masks

    # Pallas kernels lower to tpu_custom_call, which jax.export flags as
    # non-stable across jaxlib versions; the manifest pins the version
    # instead, so serving hosts can enforce the match explicitly.
    disabled = [
        jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jexport.DisabledSafetyCheck.custom_call("Sharding"),
    ]
    exp_fn = jexport.export(
        predictor._predict,
        platforms=list(platforms) if platforms else None,
        disabled_checks=disabled,
    )

    tens, masks = arg_avals()
    dense = exp_fn(params_avals, tens, pres_aval, masks)
    (path / "predict.bin").write_bytes(dense.serialize())
    out_avals = jax.eval_shape(
        predictor._predict, params_avals, tens, pres_aval, masks
    )
    out_dims = int(out_avals["logits"].shape[-1])

    width_list = sorted(int(w) for w in widths) if widths else []
    for w in width_list:
        tens, masks = arg_avals(last_width=w)
        blob = exp_fn(params_avals, tens, pres_aval, masks)
        (path / f"predict_w{w}.bin").write_bytes(blob.serialize())

    param_dtypes = {k: str(v.dtype) for k, v in flat.items()}
    # npz holds only numpy-native dtypes; bf16 params round-trip via f32
    # (exact: every bf16 value is representable in f32)
    np.savez(
        path / "params.npz",
        **{
            k: v.astype(np.float32) if v.dtype.name == "bfloat16" else v
            for k, v in flat.items()
        },
    )
    manifest = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(dense.platforms),
        "batch_size": bs,
        "n_mod": len(tails),
        "compute_dtype": jnp.dtype(dtype).name,
        "mod_tails": [list(t) for t in tails],
        "uses_masks": uses_masks,
        "widths": width_list,
        "out_dims": out_dims,
        "param_dtypes": param_dtypes,
    }
    (path / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return path


class ExportedPredictor:
    """Serve an :func:`export_predictor` artifact without model code.

    Mirrors the :class:`healnet_tpu.serving.Predictor` call surface —
    ``__call__`` for dense fixed-shape requests (entries may be ``None``
    for missing modalities) and ``predict_ragged`` for ragged patch bags
    when the artifact was exported with ``widths``.
    """

    def __init__(self, path, strict_versions: bool = False):
        self.path = Path(path)
        self.manifest = json.loads((self.path / "manifest.json").read_text())
        if self.manifest["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} != "
                f"supported {_FORMAT_VERSION}"
            )
        # export disables jax.export's tpu_custom_call stability check and
        # pins versions in the manifest instead — enforce the pin here:
        # a mismatched jaxlib can crash or silently miscompute Pallas
        # custom calls. strict_versions=True turns the warnings into errors.
        problems = []
        if self.manifest["jax_version"] != jax.__version__:
            problems.append(
                f"artifact exported under jax {self.manifest['jax_version']}"
                f" but this host runs {jax.__version__} (Pallas"
                " tpu_custom_call stability is only guaranteed across"
                " matching jaxlib versions)"
            )
        backend = jax.default_backend()
        if backend not in self.manifest["platforms"]:
            problems.append(
                f"default backend '{backend}' not among the artifact's"
                f" lowering platforms {self.manifest['platforms']}"
            )
        if problems:
            if strict_versions:
                raise ValueError("; ".join(problems))
            import warnings

            for p in problems:
                warnings.warn(p, RuntimeWarning, stacklevel=2)
        with np.load(self.path / "params.npz") as z:
            flat = {
                k: z[k].astype(self.manifest["param_dtypes"][k])
                for k in z.files
            }
        self.params = _unflatten_params(flat)
        self.batch_size = int(self.manifest["batch_size"])
        self.compute_dtype = jnp.dtype(self.manifest["compute_dtype"])
        self._tails = [tuple(t) for t in self.manifest["mod_tails"]]
        self._uses_masks = bool(self.manifest["uses_masks"])
        self._widths = [int(w) for w in self.manifest["widths"]]
        self._fns: Dict[str, Any] = {}  # lazily deserialized programs

    def _fn(self, name: str):
        if name not in self._fns:
            from jax import export as jexport

            blob = (self.path / f"{name}.bin").read_bytes()
            exported = jexport.deserialize(blob)

            def call(params, tensors, presence, kv_masks, _e=exported):
                if self._uses_masks and kv_masks is not None:
                    # the exported signature takes every mask: fill the
                    # per-modality None slots with all-True
                    kv_masks = tuple(
                        jnp.ones((t.shape[0], math.prod(t.shape[1:-1])), bool)
                        if m is None else m
                        for m, t in zip(kv_masks, tensors)
                    )
                return _e.call(params, tensors, presence, kv_masks)

            self._fns[name] = call
        return self._fns[name]

    def warmup(self) -> Dict[str, float]:
        """Deserialize + execute every exported program once on zeros.

        Mirrors :meth:`healnet_tpu.serving.Predictor.warmup`: without it, a
        cold deployment pays program deserialization + XLA compilation on
        whichever LIVE request first hits each bucket width. All shapes come
        from the manifest, so no arguments are needed.

        Returns ``{"programs": n, "seconds": wall}``.
        """
        import time

        t0 = time.perf_counter()
        bs = self.batch_size
        zeros = [np.zeros((bs, *t), np.float32) for t in self._tails]
        self(zeros)  # the dense program
        dim = self._tails[-1][-1]
        for w in self._widths:
            bags = [np.zeros((w, dim), np.float32) for _ in range(bs)]
            self.predict_ragged(list(zeros[:-1]) + [bags])
        return {
            "programs": 1 + len(self._widths),
            "seconds": time.perf_counter() - t0,
        }

    def _zeros_out(self, n: int) -> Dict[str, np.ndarray]:
        nb = int(self.manifest["out_dims"])
        return {
            "logits": np.zeros((n, nb), np.float32),
            "hazards": np.zeros((n, nb), np.float32),
            "survival": np.zeros((n, nb), np.float32),
            "risk": np.zeros((n,), np.float32),
        }

    def _materialize(self, tensors, n, pres) -> List[np.ndarray]:
        full = []
        for i, t in enumerate(tensors):
            if t is None:
                pres[:, i] = 0.0
                full.append(np.zeros((n, *self._tails[i]), np.float32))
            else:
                full.append(np.asarray(t, np.float32))
        return full

    def __call__(
        self,
        tensors: Sequence[Optional[np.ndarray]],
        presence: Optional[np.ndarray] = None,
        kv_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> Dict[str, np.ndarray]:
        n_mod = len(tensors)
        n = next(
            (np.asarray(t).shape[0] for t in tensors if t is not None),
            None if presence is None else np.asarray(presence).shape[0],
        )
        assert n is not None, "at least one modality tensor is required"
        if n == 0:
            return self._zeros_out(0)
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
        # uses_masks artifacts bake masks into the signature (None slots
        # fill with all-True inside _fn); mask-free modules exported with
        # a static None
        return serve_microbatched(
            self._fn("predict"), self.params, n, full, pres, masks,
            not self._uses_masks, self.batch_size, self.compute_dtype,
        )

    def _bucket_width(self, length: int) -> int:
        for w in self._widths:
            if length <= w:
                return w
        return self._widths[-1]

    def predict_ragged(
        self,
        tensors: Sequence[Any],
        presence: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Ragged-bag serving from the per-width exported programs.

        Mirrors ``Predictor.predict_ragged`` (grouping, padding, KV masks,
        request-order reassembly); requires ``widths`` at export time.
        """
        if not self._widths:
            raise ValueError(
                "artifact has no ragged programs: export with widths=[...]"
            )
        bags = list(tensors[-1])
        n = len(bags)
        pres = (
            np.ones((n, len(tensors)), np.float32)
            if presence is None
            else np.asarray(presence, np.float32).copy()
        )
        lead = self._materialize(list(tensors[:-1]), n, pres)
        dim = self._tails[-1][-1]

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
            # mask-free artifacts (bag baselines) were traced with
            # kv_masks=None: drop the mask list (masks_absent=True) exactly
            # as the live Predictor drops masks for accepts_kv_masks=False
            # modules — padded rows are pooled, matching live semantics
            res = serve_microbatched(
                self._fn(f"predict_w{width}"), self.params, m, grp_tensors,
                grp_pres, kv, not self._uses_masks, self.batch_size,
                self.compute_dtype,
            )
            for j, i in enumerate(idxs):
                slot_outs[i] = {k: v[j] for k, v in res.items()}
        return {
            k: np.stack([slot_outs[i][k] for i in range(n)])
            for k in next(iter(slot_outs.values()))
        }
