"""Jitted survival training loop.

TPU-native counterpart of the reference train/eval loops
(`/root/reference/healnet/main.py:370-628`):

- one jitted, donated ``train_step`` (forward + loss + L1 reg + Adam/OneCycle
  update) instead of per-batch Python autograd;
- static batch shapes: the trailing partial batch is padded and masked via
  per-sample weights, so XLA compiles exactly one training program;
- per-epoch censored concordance index computed host-side from accumulated
  risk scores (`main.py:472-478`);
- early stopping on validation loss with in-memory best-params capture and
  restore (`main.py:397-399,492-495`);
- missing-modality ablation modes "50" / "omic" / "wsi" (`main.py:504-541`),
  implemented with presence masks rather than the reference's accidental
  pass-the-wrong-tensor mechanism (`main.py:526-541` feeds the remaining
  modality through the *other* modality's projections, which silently fails
  into a no-op via the model's blanket try/except — here the semantics
  "evaluate with modality m absent" are explicit);
- the reference's ``surv_loss / gc`` (gc=16) scaling oddity (`main.py:463`)
  is reproduced behind ``gc_compat`` (default on, for run-for-run c-index
  parity); set ``gc_compat=1`` for the un-scaled loss.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from healnet_tpu.train.losses import (
    CoxPHSurvLoss,
    ce_loss,
    hazards_survival_risk,
    nll_loss,
)
from healnet_tpu.parallel.data import local_batch_rows
from healnet_tpu.runtime import concordance_index_native as concordance_index_censored
from healnet_tpu.train.schedule import make_optimizer  # noqa: F401 (re-export)
from healnet_tpu.utils.train_utils import EarlyStopping, l1_norm


def iterate_batches(
    data,
    batch_size: int,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
    bucket_boundaries: Optional[Sequence[int]] = None,
) -> Iterator[Dict[str, Any]]:
    """Yield static-shape batches; the trailing batch is padded and masked.

    ``data`` is either a dict of whole-split arrays, or a streaming source
    exposing ``iter_batches(batch_size, shuffle=..., rng=...)`` (e.g.
    :class:`healnet_tpu.etl.TCGADataset`), letting the same trainer consume
    in-memory and disk-streaming datasets. ``bucket_boundaries`` enables
    length-bucketed batching on streaming ragged-bag datasets (ignored for
    in-memory dicts, whose shapes are already static).
    """
    if hasattr(data, "iter_batches"):
        kw = {"bucket_boundaries": bucket_boundaries} if bucket_boundaries else {}
        yield from data.iter_batches(batch_size, shuffle=shuffle, rng=rng, **kw)
        return
    n = data["y_disc"].shape[0]
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    for start in range(0, n, batch_size):
        sel = idx[start : start + batch_size]
        pad = batch_size - sel.shape[0]
        mask = np.ones(batch_size, dtype=np.float32)
        if pad > 0:
            sel = np.concatenate([sel, np.repeat(sel[-1:], pad)])
            mask[batch_size - pad :] = 0.0
        batch = {
            "tensors": tuple(np.asarray(t)[sel] for t in data["tensors"]),
            "y_disc": np.asarray(data["y_disc"])[sel].astype(np.int32),
            "censorship": np.asarray(data["censorship"])[sel].astype(np.float32),
            "event_time": np.asarray(data["event_time"])[sel].astype(np.float32),
            "sample_mask": mask,
        }
        if "presence" in data and data["presence"] is not None:
            batch["presence"] = np.asarray(data["presence"])[sel].astype(np.float32)
        if "kv_masks" in data and data["kv_masks"] is not None:
            batch["kv_masks"] = tuple(
                None if m is None else np.asarray(m)[sel] for m in data["kv_masks"]
            )
        for key in ("patch_offsets", "patch_lengths"):  # arena-indexed data
            if key in data:
                batch[key] = np.asarray(data[key])[sel].astype(np.int32)
        yield batch


class SurvivalTrainer:
    """Trains a HealNet-style Flax module for discrete-time survival analysis.

    Args:
        module: a Flax module whose ``__call__(tensors, presence=..., ...)``
            returns (b, n_bins) logits (e.g. :class:`HealNetModule` or any
            baseline with the same signature).
        loss_type: "nll" | "ce_survival" | "cox" (`main.py:439-448`).
        l1: L1 regularisation weight (`main.py:452`).
        gc_compat: divisor applied to the survival loss before backward,
            matching the reference's gradient-accumulation oddity.
    """

    def __init__(
        self,
        module,
        *,
        loss_type: str = "nll",
        alpha: float = 0.4,
        l1: float = 0.0,
        class_weights: Optional[np.ndarray] = None,
        gc_compat: int = 16,
        batch_size: int = 4,
        epochs: int = 50,
        max_lr: float = 8e-3,
        patience: int = 5,
        early_stopping: bool = True,
        eval_interval: int = 1,
        cycle_momentum: bool = True,
        seed: int = 0,
        tracker=None,
        reg_topo: str = "healnet",
        sources: Optional[List[str]] = None,
        aux_loss: bool = False,
        n_bins: Optional[int] = None,
        checkpoint_dir=None,
        resume: bool = False,
        keep_checkpoints: Optional[int] = 3,
        mesh=None,
        tensor_parallel: bool = True,
        accum_steps: int = 1,
        prefetch: int = 2,
        bucket_boundaries: Optional[Sequence[int]] = None,
        feature_arena: Optional[Any] = None,
        fused_epochs: bool = False,
        arena_sharded: bool = False,
        arena_halo: Optional[int] = None,
        arena_quant: bool = False,
        arena_device: Optional[Any] = None,
    ):
        # arena_device: a pre-built device-resident arena (replicated array,
        # ShardedArena, or QuantizedContext of either) — the Pipeline builds
        # the sharded shards ONCE per run and hands every fold's trainer the
        # same object, instead of re-packing + re-uploading per fold.
        # arena_sharded (mesh mode only): shard the feature arena's rows over
        # the mesh's `seq` axis instead of replicating it per chip — cohorts
        # up to ~seq x one chip's HBM (parallel/arena.py). Bit-equal to the
        # replicated gather. arena_halo must cover the widest gather window;
        # defaults to max(bucket boundaries) or the longest bag.
        # fused_epochs (arena mode only): run each epoch as one jitted
        # lax.scan per bucket width instead of one dispatch per batch.
        # Arena batches are tiny (indices + labels), so a whole epoch's
        # batches upload in one transfer and the per-step host->device
        # dispatch latency disappears (~#buckets dispatches per epoch).
        # Batch ORDER becomes per-bucket-contiguous (still shuffled within
        # a bucket), so trajectories differ from the unfused path by
        # reordering only — enable for throughput, disable for run-for-run
        # parity with the reference.
        # feature_arena: (arena, offsets, lengths) from
        # TCGADataset.feature_arena() (or the bare arena array) — uploaded to
        # HBM ONCE; batches then carry (patch_offsets, patch_lengths) and the
        # jitted step gathers each bag with vmap(dynamic_slice). Kills the
        # per-epoch feature H2D stream (the dominant cost at WSI scale when
        # the host link is slow); HBM cost = the full feature volume.
        # mesh: a jax.sharding.Mesh -> the train/eval steps run SPMD over it
        # (batch over 'data', patch tokens over 'seq', Megatron TP over
        # 'model' when tensor_parallel). None = single-device jit.
        # accum_steps: true gradient accumulation — each global batch is
        # split into accum_steps micro-batches scanned inside the jitted
        # step (memory ~ 1/accum_steps). The reference's "gc" is a loss
        # scale only (`main.py:463-467`, optimizer steps every batch);
        # that quirk stays separately available via gc_compat.
        # prefetch: host batches decoded ahead on a background thread.
        # bucket_boundaries: streaming ragged-bag datasets only — train
        # batches are length-bucketed so each pads to its bucket's width
        # (at most one compiled program per boundary).
        # aux_loss: MultiModN-style modules whose __call__(tensors, targets)
        # returns (model_loss, logits); the model loss is added to the
        # survival loss as in the reference train loop (`main.py:428-463`).
        assert loss_type in ("nll", "ce_survival", "cox")
        self.module = module
        self.loss_type = loss_type
        self.alpha = alpha
        self.l1 = float(l1)
        self.class_weights = self._normalize_class_weights(class_weights)
        self.gc_compat = gc_compat
        self.batch_size = batch_size
        self.epochs = epochs
        self.max_lr = max_lr
        self.patience = patience
        self.early_stopping = early_stopping
        # evaluate val every N epochs (always on the final epoch): at WSI
        # scale a full val pass can rival a train epoch, and the reference's
        # every-epoch cadence (main.py:487) is the eval_interval=1 default
        self.eval_interval = max(1, int(eval_interval))
        self.cycle_momentum = cycle_momentum
        self.seed = seed
        self.tracker = tracker
        self.reg_topo = reg_topo
        self.sources = sources
        self.aux_loss = aux_loss
        # bag models (MCAT's bag net, MultiModN's PatchEncoder) pool the
        # zero-padded gathered tokens without masks — only pass kv_masks to
        # modules whose __call__ takes them (HealNet family)
        from healnet_tpu.utils.train_utils import accepts_kv_masks

        self._accepts_kv_masks = accepts_kv_masks(module)
        self.n_bins = n_bins
        self.checkpoint_dir = checkpoint_dir
        self.resume = resume
        self.keep_checkpoints = keep_checkpoints  # None = keep every epoch
        self.mesh = mesh
        self.tensor_parallel = tensor_parallel
        assert accum_steps >= 1 and batch_size % accum_steps == 0, (
            "batch_size must be divisible by accum_steps"
        )
        self.accum_steps = accum_steps
        self.prefetch = prefetch
        self.bucket_boundaries = (
            tuple(int(b) for b in bucket_boundaries) if bucket_boundaries else None
        )
        # arena_quant: store the arena as per-token int8 + f32 scales
        # (ops/quantize.py) — half the HBM footprint (2x cohort capacity) and
        # half the context bytes each step streams; the fused KV projection
        # rescales on the accumulator. HealNet-family modules only (they
        # route QuantizedContext through the merged projection).
        if feature_arena is not None and not isinstance(feature_arena, (tuple, list)):
            feature_arena = (feature_arena, None, None)
        self._arena_host = None if feature_arena is None else feature_arena[0]
        self._arena = arena_device  # pre-built, or placed lazily when None
        from healnet_tpu.ops.quantize import QuantizedContext

        self.arena_quant = bool(arena_quant) or isinstance(
            self._arena_host, QuantizedContext
        )
        self.arena_sharded = bool(arena_sharded) and mesh is not None
        if arena_halo is None:
            candidates = list(bucket_boundaries or [])
            if feature_arena is not None and feature_arena[2] is not None:
                candidates.append(int(np.max(feature_arena[2])))
            arena_halo = max(candidates) if candidates else None
        self.arena_halo = arena_halo
        # fused epochs compose with SPMD: the stacked (steps, ...) scan axis
        # stays unsharded (lax.scan slices it) and the INNER batch/token dims
        # carry the data/seq shardings (batch_shardings(scan_axis=True)).
        # Multi-process fused placement is not built; single-process meshes
        # (the axon/ICI case) are fully supported.
        self.fused_epochs = bool(fused_epochs) and self._arena_host is not None
        if self.fused_epochs and mesh is not None and jax.process_count() > 1:
            raise ValueError(
                "fused_epochs + multi-process mesh is unsupported (the "
                "stacked scan upload is single-host); use stepwise SPMD"
            )
        self._scan_train = None
        self._scan_eval = None
        self.params = None
        self.opt_state = None
        self._opt = None
        self._train_step = None
        self._eval_step = None

    @staticmethod
    def _normalize_class_weights(class_weights):
        return (
            None
            if class_weights is None
            else jnp.asarray(class_weights, jnp.float32)
        )

    def set_fold(self, *, seed: int, class_weights=None, checkpoint_dir=None):
        """Re-point a trainer at a new fold, keeping its traced/compiled
        steps (class weights are a traced argument, so only per-fold state
        resets: seed, weights, checkpoint dir, params, optimizer state)."""
        self.seed = seed
        self.class_weights = self._normalize_class_weights(class_weights)
        self.checkpoint_dir = checkpoint_dir
        self.params = None
        self.opt_state = None
        return self

    def _device_arena(self):
        """Upload the feature arena to HBM once.

        Replicated per chip by default; with ``arena_sharded`` the rows shard
        over the mesh's ``seq`` axis (halo'd — see ``parallel/arena.py``) so
        the cohort can exceed one chip's HBM.
        """
        if self._arena_host is None:
            return None
        if self._arena is None:
            from healnet_tpu.ops.quantize import (
                QuantizedContext,
                quantize_context_host,
            )

            host = self._arena_host
            if self.arena_quant and not isinstance(host, QuantizedContext):
                q, s = quantize_context_host(np.asarray(host))
                host = QuantizedContext(q, s)
            if self.mesh is not None and self.arena_sharded:
                from healnet_tpu.parallel.arena import build_device_arena

                assert self.arena_halo is not None, (
                    "arena_sharded needs arena_halo (widest gather window); "
                    "pass bucket_boundaries or the arena lengths"
                )
                self._arena = build_device_arena(
                    host, self.mesh, halo=self.arena_halo
                )
            elif self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                self._arena = jax.device_put(
                    host, NamedSharding(self.mesh, PartitionSpec())
                )
            else:
                self._arena = jax.device_put(host)
        return self._arena

    # ------------------------------------------------------------- building
    def _surv_loss(self, logits, batch, class_weights=None):
        # class_weights rides through the jitted step as a traced ARGUMENT,
        # not a closure constant: compiled steps stay valid when per-fold
        # weights change (enables cross-fold executable reuse)
        hazards, survival, risk = hazards_survival_risk(logits)
        sw = batch["sample_mask"]
        if self.loss_type == "nll":
            loss = nll_loss(
                hazards,
                survival,
                batch["y_disc"],
                batch["censorship"],
                weights=class_weights,
                alpha=self.alpha,
                sample_weights=sw,
            )
        elif self.loss_type == "ce_survival":
            loss = ce_loss(
                hazards,
                survival,
                batch["y_disc"],
                batch["censorship"],
                alpha=0.15,
                sample_weights=sw,
            )
        else:  # cox
            loss = CoxPHSurvLoss()(
                hazards, survival, batch["censorship"],
                event_time=batch["event_time"], sample_weights=sw,
            )
        return loss, risk

    def _place(self, batch):
        """Host batch -> device(s).

        With a mesh, route through :func:`global_batch_from_host_local` so
        multi-process hosts each contribute their local slice (degenerates to
        ``put_batch`` at process_count == 1). Single-chip, an explicit async
        ``device_put`` lets the prefetcher overlap H2D with compute instead of
        paying the transfer inside the jitted call.
        """
        if self.mesh is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        from healnet_tpu.parallel.data import global_batch_from_host_local

        return global_batch_from_host_local(batch, self.mesh)

    def _place_stacked(self, stacked):
        """Fused-epoch stacks -> device(s): scan axis unsharded, inner batch
        over ``data`` / tokens over ``seq`` (single-process meshes)."""
        if self.mesh is None:
            return jax.tree_util.tree_map(jax.device_put, stacked)
        from healnet_tpu.parallel.train import batch_shardings

        shardings = batch_shardings(stacked, self.mesh, scan_axis=True)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(jnp.asarray(x), s), stacked, shardings
        )

    def _reg_skip(self) -> bool:
        # reference gating (`train_utils.py:5-14`)
        if self.reg_topo == "fcnn":
            return True
        if self.reg_topo == "mcat" and self.sources == ["omic"]:
            return True
        return False

    @staticmethod
    def _stack_batches(blist: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Stack same-shape host batches along a new leading scan axis."""
        out: Dict[str, Any] = {}
        for k in blist[0]:
            v0 = blist[0][k]
            if k == "tensors":
                out[k] = tuple(
                    np.stack([b[k][m] for b in blist]) for m in range(len(v0))
                )
            elif k == "kv_masks":
                out[k] = tuple(
                    None if m is None else np.stack([b[k][i] for b in blist])
                    for i, m in enumerate(v0)
                )
            else:
                out[k] = np.stack([b[k] for b in blist])
        return out

    def _bucket_groups(self, batches) -> Dict[int, List[Dict[str, Any]]]:
        """Group host batches by their static KV width (bucket boundary)."""
        groups: Dict[int, List[Dict[str, Any]]] = {}
        for hb in batches:
            width = hb["kv_masks"][-1].shape[1]
            groups.setdefault(width, []).append(hb)
        return groups

    #: fused-epoch scan lengths round UP to this quantum. Scan programs are
    #: keyed on (bucket width, scan length); per-fold splits shift a
    #: bucket's step count by a few, which would recompile the ~40s scan
    #: program every fold. Quantized lengths collapse those onto one
    #: program; padding steps are skipped via lax.cond (no optimizer
    #: advance, no compute).
    SCAN_QUANTUM = 8

    def _stack_for_scan(self, blist: List[Dict[str, Any]]):
        """(stacked batches, valid mask, n_real) padded to the quantum."""
        n_real = len(blist)
        q = self.SCAN_QUANTUM
        target = max(int(np.ceil(n_real / q)) * q, q)
        padded = blist + [blist[-1]] * (target - n_real)
        valid = np.zeros(target, np.float32)
        valid[:n_real] = 1.0
        return self._stack_batches(padded), valid, n_real

    def _gather_arena(self, arena, batch):
        """On-device bag gather: arena rows -> (b, width, dim) slide tensor.

        ``width`` is static (the KV mask's trailing dim = the bucket
        boundary), so each bucket keeps exactly one compiled program; the
        arena's trailing zero-pad rows make every fixed-width window
        in-bounds. Out-of-bag rows are zeroed (attention KV-masks them
        anyway, but models that pool all tokens unmasked — MultiModN's
        PatchEncoder, MCAT's bag net — need the host path's zero padding).
        The gather itself is :func:`healnet_tpu.parallel.arena.gather_bag`,
        shared with the serving Predictor's arena path.
        """
        from healnet_tpu.parallel.arena import gather_bag

        slide = gather_bag(
            arena,
            batch["patch_offsets"],
            batch["kv_masks"][-1],
            mesh=self.mesh,
        )
        return tuple(batch["tensors"]) + (slide,)

    def _forward(self, params, batch, deterministic, rng=None, arena=None):
        """Apply the module; returns (logits, model_loss) for aux-loss models."""
        if arena is not None and batch.get("patch_offsets") is not None:
            batch = dict(batch, tensors=self._gather_arena(arena, batch))
        rngs = {"dropout": rng} if rng is not None else {}
        if self.aux_loss:
            n_bins = self.n_bins
            assert n_bins is not None, "aux_loss models need n_bins"
            targets = jax.nn.one_hot(batch["y_disc"], n_bins)
            model_loss, logits = self.module.apply(
                {"params": params},
                batch["tensors"],
                targets=targets,
                presence=batch.get("presence"),
                # padded trailing-batch rows must not count in the model's
                # internal CE/state losses either
                sample_weights=batch.get("sample_mask"),
                deterministic=deterministic,
                rngs=rngs,
            )
            return logits, model_loss
        kwargs = {}
        if batch.get("kv_masks") is not None and self._accepts_kv_masks:
            kwargs["kv_masks"] = batch["kv_masks"]  # ragged-context token masks
        logits = self.module.apply(
            {"params": params},
            batch["tensors"],
            presence=batch.get("presence"),
            deterministic=deterministic,
            rngs=rngs,
            **kwargs,
        )
        return logits, 0.0

    def _build_steps(self):
        # horizon-free: the OneCycle schedules are evaluated from the
        # progress fraction count/horizon inside the compiled step, with the
        # horizon a TRACED scalar — fold-to-fold drift in bucket batch
        # counts (hence total_steps) no longer re-traces anything
        from healnet_tpu.train.schedule import (
            make_progress_optimizer,
            progress_hyperparams,
        )

        # flat (ravelled) Adam/L1 are bit-identical per element and collapse
        # the per-leaf fusion sprawl (material for deep untied configs), but
        # a ravelled vector cannot follow tensor-parallel param shardings —
        # it would gather every shard per step. Replicated-param meshes (DP/
        # SP) keep the flat path.
        flat = self.mesh is None or not self.tensor_parallel
        self._opt = make_progress_optimizer(self.cycle_momentum, flatten=flat)
        l1 = 0.0 if self._reg_skip() else self.l1
        gc = float(self.gc_compat)

        def loss_and_grads(params, batch, rng, arena, cw):
            def loss_fn(p):
                logits, model_loss = self._forward(
                    p, batch, deterministic=False, rng=rng, arena=arena
                )
                surv_loss, risk = self._surv_loss(logits, batch, cw)
                reg = l1 * l1_norm(p, flat=flat) if l1 > 0 else 0.0
                total = surv_loss / gc + reg + model_loss
                return total, (surv_loss, risk)

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, aux

        def grad_stats(grads):
            # wandb.watch parity (`main.py:135`): per-top-level-module and
            # global gradient L2 norms, computed inside the compiled step
            # (weight-sized reductions — negligible) and read back once per
            # epoch by the tracker
            stats = {k: optax.global_norm(grads[k]) for k in grads}
            stats["global"] = optax.global_norm(grads)
            return stats

        def train_step(params, opt_state, batch, rng, arena=None, cw=None, horizon=None):
            if self.accum_steps == 1:
                grads, (surv_loss, risk) = loss_and_grads(params, batch, rng, arena, cw)
            else:
                # split the batch into micro-batches and scan: grads are
                # averaged, activations live one micro-batch at a time.
                # note: micro-batches are weighted equally, so a padded final
                # batch skews the average slightly vs the full-batch mean
                # (exact when batch_size % accum_steps == 0 with no padding);
                # Cox risk sets are also per-micro-batch by construction
                a = self.accum_steps

                def split(x):
                    return x.reshape((a, x.shape[0] // a) + x.shape[1:])

                micro = jax.tree_util.tree_map(split, batch)

                def body(carry, mb_and_rng):
                    grads_acc, loss_acc = carry
                    mb, key = mb_and_rng
                    # arena rides outside the scan carry/xs: it is identical
                    # for every micro-batch (never split)
                    grads, (surv_loss, risk) = loss_and_grads(params, mb, key, arena, cw)
                    grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                    return (grads_acc, loss_acc + surv_loss), risk

                zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
                keys = jax.random.split(rng, a)
                (grads, loss_sum), risks = jax.lax.scan(
                    body, (zero_grads, jnp.float32(0)), (micro, keys)
                )
                grads = jax.tree_util.tree_map(lambda g: g / a, grads)
                surv_loss = loss_sum / a
                risk = risks.reshape(-1)

            gstats = grad_stats(grads)
            opt_state = progress_hyperparams(
                opt_state,
                horizon if horizon is not None else jnp.float32(1.0),
                self.max_lr,
                cycle_momentum=self.cycle_momentum,
            )
            updates, opt_state = self._opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, surv_loss, risk, gstats

        def eval_step(params, batch, arena=None, cw=None):
            logits, model_loss = self._forward(
                params, batch, deterministic=True, arena=arena
            )
            surv_loss, risk = self._surv_loss(logits, batch, cw)
            return surv_loss + model_loss, risk, logits

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)

        # fused-epoch scans: one dispatch covers every step of a bucket.
        # Compiled once per (bucket width, steps) pair — bucket membership is
        # static (bag sizes don't change), so exactly one program per bucket.
        def scan_train(params, opt_state, batches, rngs, valid, arena, cw, horizon):
            # `valid` marks real steps; the scan length is rounded up to a
            # quantum so every fold's bucket shares one compiled program —
            # padding steps are skipped entirely via lax.cond (no optimizer
            # state advance, no wasted compute beyond the branch)
            def body(carry, xs):
                p, o = carry
                b, k, v = xs

                def real(_):
                    p2, o2, loss, risk, gs = train_step(p, o, b, k, arena, cw, horizon)
                    # canonical f32 outputs: under bf16 compute the model's
                    # risk is bfloat16, and cond branches must type-match
                    return (
                        p2, o2, loss.astype(jnp.float32),
                        risk.astype(jnp.float32),
                        {k2: s.astype(jnp.float32) for k2, s in gs.items()},
                    )

                def skip(_):
                    bs = b["sample_mask"].shape[0]
                    zstats = {k2: jnp.float32(0) for k2 in list(p) + ["global"]}
                    return p, o, jnp.float32(0), jnp.zeros(bs, jnp.float32), zstats

                p, o, loss, risk, gs = jax.lax.cond(v > 0, real, skip, None)
                return (p, o), (loss, risk, gs)

            (params, opt_state), (losses, risks, gstats) = jax.lax.scan(
                body, (params, opt_state), (batches, rngs, valid)
            )
            return params, opt_state, losses, risks, gstats

        def scan_eval(params, batches, valid, arena, cw):
            def body(_, xs):
                b, v = xs

                def real(_):
                    loss, risk, _lg = eval_step(params, b, arena, cw)
                    return loss.astype(jnp.float32), risk.astype(jnp.float32)

                def skip(_):
                    bs = b["sample_mask"].shape[0]
                    return jnp.float32(0), jnp.zeros(bs, jnp.float32)

                return None, jax.lax.cond(v > 0, real, skip, None)

            _, (losses, risks) = jax.lax.scan(body, None, (batches, valid))
            return losses, risks

        self._scan_train = jax.jit(scan_train, donate_argnums=(0, 1))
        self._scan_eval = jax.jit(scan_eval)

    # ------------------------------------------------------------- training
    def init_params(self, data: Dict[str, Any]):
        batch = next(iterate_batches(data, self.batch_size))
        tensors = batch["tensors"]
        if self._arena_host is not None and batch.get("patch_offsets") is not None:
            # arena mode: reconstruct the slide tensor host-side for shape
            # inference at init (one batch; training gathers on-device)
            from healnet_tpu.ops.quantize import QuantizedContext

            width = batch["kv_masks"][-1].shape[1]
            if (
                self.arena_sharded
                and self._arena is None
                and (self.arena_halo is None or width > self.arena_halo)
            ):
                # direct-trainer hole: without bucket boundaries the batch
                # builder pads every gather to max_patches, which the halo
                # candidates (boundaries + bag lengths) may undershoot —
                # widen before the halo'd shards are built
                self.arena_halo = int(width)
            host = self._arena_host
            if isinstance(host, QuantizedContext):
                # init only infers shapes; dequantize just the sliced
                # windows — a full-arena dequant would transiently
                # materialize rows x dim f32 on host (multi-GB at WSI scale)
                slide = np.stack(
                    [
                        np.asarray(host.data[off : off + width], np.float32)
                        * np.asarray(
                            host.scale[off : off + width], np.float32
                        )[:, None]
                        for off in batch["patch_offsets"]
                    ]
                )
            else:
                slide = np.stack(
                    [
                        np.asarray(host[off : off + width])
                        for off in batch["patch_offsets"]
                    ]
                )
            slide = slide * np.asarray(batch["kv_masks"][-1])[..., None].astype(
                slide.dtype
            )
            tensors = tuple(tensors) + (slide,)
        key = jax.random.PRNGKey(self.seed)
        variables = self.module.init(
            {"params": key, "dropout": key},
            tuple(jnp.asarray(t) for t in tensors),
            presence=(
                jnp.asarray(batch["presence"]) if "presence" in batch else None
            ),
            deterministic=True,
        )
        self.params = variables["params"]
        return self.params

    def fit(
        self,
        train_data: Dict[str, Any],
        val_data: Dict[str, Any],
        test_data: Optional[Dict[str, Any]] = None,
        fold: int = 1,
        missing_ablation: bool = False,
        missing_semantics: str = "semantic",
        verbose: bool = True,
    ) -> Dict[str, Any]:
        n_train = (
            len(train_data)
            if hasattr(train_data, "iter_batches")
            else train_data["y_disc"].shape[0]
        )
        # exact per-epoch step count: each bucket pads its OWN trailing
        # remainder, so bucketed epochs run more optimizer steps than
        # ceil(n/bs) — undercounting would exhaust the OneCycle schedule
        # early and flatline the tail at min LR
        if hasattr(train_data, "parent") and hasattr(train_data.parent, "count_batches"):
            steps_per_epoch = train_data.parent.count_batches(
                train_data.indices, self.batch_size, self.bucket_boundaries
            )
        elif hasattr(train_data, "count_batches"):
            steps_per_epoch = train_data.count_batches(
                None, self.batch_size, self.bucket_boundaries
            )
        else:
            steps_per_epoch = int(np.ceil(n_train / self.batch_size))
        total_steps = steps_per_epoch * self.epochs
        # the horizon is a TRACED argument of the compiled steps (schedule
        # evaluated from count/horizon — schedule.progress_hyperparams), so
        # per-fold drift in bucket batch counts never re-traces: k-fold runs
        # compile each program exactly once
        self._schedule_horizon = jnp.float32(total_steps)
        if self._train_step is None:
            self._build_steps()
        if self.params is None:
            self.init_params(train_data)
        if self.mesh is not None:
            from healnet_tpu.parallel.mesh import shard_params

            self.params = shard_params(self.params, self.mesh, self.tensor_parallel)
        self.opt_state = self._opt.init(self.params)

        stopper = EarlyStopping(patience=self.patience, mode="min", verbose=verbose)
        # per-EPOCH derived streams (not carried across epochs): a resumed
        # run's epoch k gets exactly the shuffle order and dropout keys an
        # uninterrupted run would have used, so crash+resume is bit-equal to
        # never crashing (cf. the checkpoint/resume contract)
        base_rng = jax.random.PRNGKey(self.seed + 1000 * fold)

        # durable checkpoint/resume (the upgrade over the reference's
        # in-memory-only best weights, SURVEY.md §5)
        ckpt = None
        start_epoch = 1
        if self.checkpoint_dir is not None:
            from healnet_tpu.train.checkpoint import Checkpointer

            ckpt = Checkpointer(self.checkpoint_dir)
            latest = ckpt.latest_step() if self.resume else None
            if latest is not None:
                restored = ckpt.restore(
                    step=latest,
                    target={"params": self.params, "opt_state": self.opt_state},
                )
                self.params = restored["params"]
                self.opt_state = restored["opt_state"]
                start_epoch = latest + 1
                if verbose:
                    print(f"Resumed from checkpoint epoch {latest}")

        history = []
        train_loss = train_c = val_loss = val_c = float("nan")
        if start_epoch > self.epochs:
            # the fold already finished in a previous run: don't return NaN
            # metrics from an empty epoch loop — re-evaluate the restored
            # params so the fold summary stays real
            if verbose:
                print(
                    f"Fold already complete at epoch {start_epoch - 1}; "
                    "re-evaluating restored checkpoint"
                )
            train_loss, train_c = self.evaluate(train_data)
            val_loss, val_c = self.evaluate(val_data)
            history.append(
                dict(epoch=start_epoch - 1, train_loss=train_loss,
                     train_c_index=train_c, val_loss=val_loss,
                     val_c_index=val_c, seconds=0.0, resumed_complete=True)
            )
        epoch = start_epoch - 1  # stays if the loop body never runs (resume-complete)
        for epoch in range(start_epoch, self.epochs + 1):
            t0 = time.time()
            rng = jax.random.fold_in(base_rng, epoch)
            np_rng = np.random.default_rng(self.seed + fold + 977 * epoch)
            losses, risks, cens, times, masks = [], [], [], [], []
            last_gstats = None  # epoch-final gradient norms (wandb.watch parity)
            batches = iterate_batches(
                train_data, self.batch_size, shuffle=True, rng=np_rng,
                bucket_boundaries=self.bucket_boundaries,
            )

            # keep the small host-side survival metadata out of the device
            # pytree consumers: the c-index is computed host-side per epoch
            def _put(host_batch):
                meta = {
                    k: host_batch[k]
                    for k in ("censorship", "event_time", "sample_mask")
                }
                return self._place(host_batch), meta

            if self.fused_epochs:
                # one lax.scan dispatch per bucket width: the whole epoch's
                # (tiny, index-only) batches upload in one transfer and the
                # per-step dispatch latency disappears
                for blist in self._bucket_groups(batches).values():
                    stacked, valid, n_real = self._stack_for_scan(blist)
                    rng, sub = jax.random.split(rng)
                    keys = jax.random.split(sub, len(valid))
                    self.params, self.opt_state, ls, rs, gs = self._scan_train(
                        self.params, self.opt_state, self._place_stacked(stacked),
                        keys, jnp.asarray(valid), self._device_arena(),
                        self.class_weights, self._schedule_horizon,
                    )
                    losses.extend(np.asarray(ls)[:n_real])
                    risks.extend(np.asarray(rs)[:n_real])  # (steps, b) rows
                    last_gstats = {k: v[n_real - 1] for k, v in gs.items()}
                    for hb in blist:
                        cens.append(hb["censorship"])
                        times.append(hb["event_time"])
                        masks.append(hb["sample_mask"])
            else:
                if self.prefetch > 0:
                    # background decode thread + double-buffered async H2D:
                    # the next batch's transfer overlaps the current step's
                    # compute (replaces the reference's synchronous per-batch
                    # `.to(device)`, main.py:214-240)
                    from healnet_tpu.etl.prefetch import DevicePrefetcher

                    placed = DevicePrefetcher(
                        batches, depth=2, put_fn=_put, buffer_size=self.prefetch
                    )
                else:
                    placed = (_put(b) for b in batches)
                try:
                    for device_batch, meta in placed:
                        rng, step_rng = jax.random.split(rng)
                        (
                            self.params, self.opt_state, loss, risk, last_gstats,
                        ) = self._train_step(
                            self.params, self.opt_state, device_batch, step_rng,
                            self._device_arena(), self.class_weights,
                            self._schedule_horizon,
                        )
                        losses.append(loss)
                        # on a multi-process mesh only the local rows are
                        # addressable — they match this host's local metadata
                        risks.append(local_batch_rows(risk))
                        cens.append(meta["censorship"])
                        times.append(meta["event_time"])
                        masks.append(meta["sample_mask"])
                finally:
                    # a failed step must not leave the prefetch producer
                    # thread pinned on its queue holding WSI-sized batches
                    if hasattr(placed, "close"):
                        placed.close()

            mask = np.concatenate(masks) > 0
            # weight each batch's loss by the count its own normalizer used:
            # event count for cox, valid-row count otherwise (so a padded
            # trailing batch doesn't get outsized weight) — same rule as
            # evaluate()
            if self.loss_type == "cox":
                valid = np.asarray(
                    [((1.0 - c) * m).sum() for c, m in zip(cens, masks)]
                )
            else:
                valid = np.asarray([m.sum() for m in masks])
            batch_losses = np.asarray([np.asarray(l) for l in losses])
            train_loss = float(
                (batch_losses * valid).sum() / max(float(valid.sum()), 1.0)
            )
            try:
                train_c = concordance_index_censored(
                    (1 - np.concatenate(cens)[mask]).astype(bool),
                    np.concatenate(times)[mask],
                    np.concatenate(risks)[mask],
                    tied_tol=1e-8,
                )[0]
            except ValueError as exc:
                print(f"train c-index undefined this epoch: {exc}")
                train_c = float("nan")

            do_eval = (epoch % self.eval_interval == 0) or epoch == self.epochs
            if do_eval:
                val_loss, val_c = self.evaluate(val_data)
            else:  # skipped interval: explicit NaNs, never stale values
                val_loss, val_c = float("nan"), float("nan")
            history.append(
                dict(epoch=epoch, train_loss=train_loss, train_c_index=train_c,
                     val_loss=val_loss, val_c_index=val_c, seconds=time.time() - t0)
            )
            if verbose:
                val_str = (
                    f"val_loss {val_loss:.4f} c {val_c:.4f}" if do_eval
                    else "val skipped"
                )
                print(
                    f"Epoch {epoch}: train_loss {train_loss:.4f} c {train_c:.4f} | "
                    f"{val_str} | {history[-1]['seconds']:.1f}s"
                )
            if self.tracker is not None:
                metrics_log = {
                    f"fold_{fold}_train_loss": train_loss,
                    f"fold_{fold}_train_c_index": train_c,
                }
                if do_eval:
                    metrics_log[f"fold_{fold}_val_loss"] = val_loss
                    metrics_log[f"fold_{fold}_val_c_index"] = val_c
                self.tracker.log(metrics_log, step=epoch if fold == 1 else None)
                # gradient/parameter observability (reference wandb.watch,
                # `main.py:135`): epoch-final grad norms from the compiled
                # step + per-module param norms — one host readback per epoch
                # same step key as the metrics log above — a stepless wandb
                # log here would advance wandb's internal step past the epoch
                # index and misalign every later epoch row
                self.tracker.watch(
                    params=jax.device_get(self.params),
                    grad_stats=(
                        None
                        if last_gstats is None
                        else jax.device_get(last_gstats)
                    ),
                    step=epoch if fold == 1 else None,
                    prefix=f"fold_{fold}_",
                )
            if ckpt is not None:
                ckpt.save(
                    step=epoch,
                    params=self.params,
                    opt_state=self.opt_state,
                    metrics=(
                        {"val_loss": val_loss, "val_c_index": val_c}
                        if do_eval else None
                    ),
                    keep_last=self.keep_checkpoints,
                )
            # early stopping only sees evaluated epochs: patience counts
            # evaluations, matching the reference cadence at interval 1
            if do_eval and self.early_stopping and stopper.step(val_loss, self.params):
                if verbose:
                    print(f"Early stopping at epoch {epoch}")
                self.params = stopper.load_best_weights(self.params)
                break

        results: Dict[str, Any] = {
            "params": self.params,
            "train_loss": train_loss,
            "train_c_index": train_c,
            "val_loss": val_loss,
            "val_c_index": val_c,
            # last epoch actually run (== the early-stop epoch when the
            # patience break fired; the reference only prints this,
            # `main.py:497`, so parity harnesses need it surfaced)
            "stopped_epoch": epoch,
            "history": history,
        }
        if test_data is not None:
            test_loss, test_c = self.evaluate(test_data)
            results.update(test_loss=test_loss, test_c_index=test_c)
            if self.tracker is not None:
                self.tracker.log(
                    {f"fold_{fold}_test_loss": test_loss, f"fold_{fold}_test_c_index": test_c}
                )
            if missing_ablation:
                results["missing_performance"] = tuple(
                    self.evaluate(
                        test_data, missing_mode=m,
                        missing_semantics=missing_semantics,
                    )[1]
                    for m in ("50", "omic", "wsi")
                )
        return results

    def evaluate(
        self,
        data: Dict[str, Any],
        missing_mode: Optional[str] = None,
        missing_semantics: str = "semantic",
    ) -> Tuple[float, float]:
        """Eval loss + c-index; optional missing-modality ablation.

        missing_mode (cf. `main.py:526-541`): "50" alternates which modality is
        dropped per batch; "omic" drops the omic modality; "wsi" drops the WSI
        modality.

        missing_semantics picks which function the ablation computes:

        - "semantic" (default, the framework's documented behavior): the
          dropped modality is absent via its presence mask; the kept modality
          flows through its OWN tower — what the reference's README describes.
        - "reference": bit-faithful emulation of what the reference's eval
          harness actually executes. `_sample_missing` (`main.py:526-541`)
          returns a ONE-element feature list, so the kept tensor is
          preprocessed and cross-attended as **modality 0** regardless of
          which modality it is (towers >= 1 hit `tensors[i]` IndexErrors
          swallowed by the blanket `except: pass`, `healnet.py:235-239`).
          That is shape-valid only when the kept tensor's channel count
          equals modality 0's; otherwise tower 0 raises too and the latent
          is never updated — constant logits for the whole split. Both
          outcomes are reproduced here (kept tensor routed through tower 0
          with presence (1, 0, ...), or presence all-zero on channel
          mismatch). Use this mode for parity comparisons against the live
          Torch reference.
        """
        assert missing_mode in (None, "50", "omic", "wsi")
        assert missing_semantics in ("semantic", "reference")
        if self._eval_step is None:
            self._build_steps()
        losses, risks, cens, times, masks = [], [], [], [], []
        use_omic = True
        # buckets apply at eval too: c-index and the loss aggregation are
        # order-independent (per-batch metadata rides along), and padding
        # every eval batch to the global max would multiply its H2D stream
        batches = iterate_batches(
            data, self.batch_size, bucket_boundaries=self.bucket_boundaries
        )
        if self.fused_epochs and missing_mode is None:
            # peek ONE batch to confirm arena form before materializing:
            # fused eval needs the whole (index-only, tiny) split host-side,
            # but a non-arena stream must stay a stream — its batches carry
            # full feature tensors
            import itertools

            first = next(batches, None)
            if first is not None and first.get("patch_offsets") is not None:
                # fused eval: one scan dispatch per bucket (order-independent)
                all_batches = [first, *batches]
                for blist in self._bucket_groups(all_batches).values():
                    stacked, valid, n_real = self._stack_for_scan(blist)
                    ls, rs = self._scan_eval(
                        self.params, self._place_stacked(stacked),
                        jnp.asarray(valid), self._device_arena(),
                        self.class_weights,
                    )
                    losses.extend(np.asarray(ls)[:n_real])
                    risks.extend(np.asarray(rs)[:n_real])
                    for hb in blist:
                        cens.append(hb["censorship"])
                        times.append(hb["event_time"])
                        masks.append(hb["sample_mask"])
                batches = iter(())
            else:
                batches = itertools.chain(
                    [] if first is None else [first], batches
                )
        for batch in batches:
            # arena batches carry the slide modality as indices, not a tensor
            n_mod = len(batch["tensors"]) + (
                1 if batch.get("patch_offsets") is not None else 0
            )
            if missing_mode is not None and n_mod >= 2:
                if missing_mode == "50":
                    drop = 1 if use_omic else 0
                    use_omic = not use_omic
                elif missing_mode == "omic":
                    drop = 0
                else:  # "wsi"
                    drop = 1
                presence = np.ones((self.batch_size, n_mod), dtype=np.float32)
                if missing_semantics == "reference":
                    assert batch.get("patch_offsets") is None, (
                        "reference ablation semantics are defined on dense "
                        "tensor batches (the reference has no arena mode)"
                    )
                    keep = 1 - drop
                    kept = np.asarray(batch["tensors"][keep])
                    dims = self.module.channel_dims
                    axes = self.module.num_spatial_axes
                    if (
                        kept.shape[-1] == dims[0]
                        and kept.ndim - 2 == axes[0]
                    ):
                        # kept tensor rides as modality 0 (the reference's
                        # one-element-list routing); remaining slots carry
                        # single-token dummies that presence zeroes out
                        b = kept.shape[0]
                        tensors = [kept] + [
                            np.zeros(
                                (b,) + (1,) * axes[i] + (dims[i],),
                                dtype=kept.dtype,
                            )
                            for i in range(1, len(dims))
                        ]
                        batch = dict(batch, tensors=tuple(tensors))
                        presence[:, 1:] = 0.0
                    else:
                        # the reference's tower 0 would raise on this shape
                        # and the except:pass leaves the latent untouched —
                        # constant logits, reproduced via all-absent masks
                        presence[:] = 0.0
                else:
                    presence[:, drop] = 0.0
                batch["presence"] = presence
            loss, risk, _ = self._eval_step(
                self.params, self._place(batch), self._device_arena(),
                self.class_weights,
            )
            losses.append(np.asarray(loss))
            risks.append(local_batch_rows(risk))
            cens.append(batch["censorship"])
            times.append(batch["event_time"])
            masks.append(batch["sample_mask"])
        mask = np.concatenate(masks) > 0
        try:
            c_index = concordance_index_censored(
                (1 - np.concatenate(cens)[mask]).astype(bool),
                np.concatenate(times)[mask],
                np.concatenate(risks)[mask],
                tied_tol=1e-8,
            )[0]
        except ValueError as exc:
            # tiny eval splits can be all-censored / pair-free; don't kill the
            # fold (the reference would crash inside sksurv here)
            print(f"c-index undefined for this split: {exc}")
            c_index = float("nan")
        if self.loss_type == "cox":
            # cox_ph_loss normalizes by the batch's EVENT count, so the correct
            # aggregation weight is events-per-batch, not valid-row count
            valid = np.asarray(
                [((1.0 - c) * m).sum() for c, m in zip(cens, masks)]
            )
        else:
            valid = np.asarray([m.sum() for m in masks])
        denom = max(float(valid.sum()), 1.0)
        weighted_loss = float((np.asarray(losses) * valid).sum() / denom)
        return weighted_loss, c_index
