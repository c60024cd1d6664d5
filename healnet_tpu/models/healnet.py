"""HealNet: TPU-native hybrid early-fusion attention network.

Re-implementation (not a translation) of the reference architecture
(`/root/reference/healnet/models/healnet.py:14-262`) as a Flax module designed
for XLA:

- shared latent bottleneck array, per-modality cross-attention + feed-forward
  with residuals, optional latent self-attention blocks, Fourier positional
  encodings over N spatial axes, mean-pool -> LayerNorm -> Linear head;
- **static-mask missing modalities**: instead of the reference's Python-level
  ``None`` skipping (`healnet.py:197-239`, which relies on an accidental
  try/except), a per-sample ``presence`` vector gates each modality's
  cross-attention and feed-forward residual updates to zero via ``jnp.where``
  semantics. XLA traces ONE program per set of input shapes — availability
  patterns never trigger recompilation;
- **weight-tying parity**: reproduces the reference ``cache_fn`` semantics
  (`healnet.py:161,278-290`) exactly: with ``weight_tie_layers=True`` layer 0
  keeps distinct modules while layers >= 1 share — cross-attention tied per
  modality, the cross feed-forward tied into a single module across modalities
  and layers, self-attention tied per block index;
- self-attention blocks run once per modality iteration, matching the
  reference's actual (verbose=False) control flow (`healnet.py:241-245`);
- attention-weight inspection via Flax ``sow`` when ``store_attention=True``,
  reconstructed into the reference's ``get_attention_weights()`` module-order
  list (`healnet.py:252-262`).

The public stateful wrapper :class:`HealNet` keeps the reference constructor
and call signature (`healnet.py:16-38,190-195`) so Torch-reference users can
switch with no code changes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from healnet_tpu.ops.fourier import positional_encoding
from healnet_tpu.ops.fused_project import fused_kv_project, split_columns
from healnet_tpu.ops.quantize import QuantizedContext
from healnet_tpu.models.layers import (
    PreNormAttention,
    PreNormFeedForward,
    torch_dense,
)


def _tie_key(layer: int, weight_tie_layers: bool) -> int:
    """Module-sharing group for a fusion layer (cache_fn semantics).

    Layer 0 is always distinct (the reference caches nothing at ``_cache=False``);
    layers >= 1 collapse into one shared group when tying is enabled
    (`healnet.py:161,278-290` — note the docstring there describes the flag
    backwards; this follows the code).
    """
    if layer == 0:
        return 0
    return 1 if weight_tie_layers else layer


def attention_module_order(
    depth: int,
    n_modalities: int,
    self_per_cross_attn: int,
    weight_tie_layers: bool,
) -> List[Tuple[str, int, int, int]]:
    """Reference ``get_attention_weights`` ordering.

    Torch's ``Module.modules()`` yields each module once in first-registration
    order, and each stores the weights of its *last* invocation
    (`healnet.py:252-262,420`). Returns tuples
    ``(kind, index, first_layer, last_layer)`` where ``kind`` is ``cross`` or
    ``self``, ``index`` the modality/block, and ``last_layer`` the layer whose
    sown weights reproduce the torch-visible value.
    """
    order: List[Tuple[str, int, int, int]] = []
    seen: Dict[Tuple[str, int, int], int] = {}
    for layer in range(depth):
        key = _tie_key(layer, weight_tie_layers)
        for m in range(n_modalities):
            mod_id = ("cross", m, key)
            if mod_id not in seen:
                seen[mod_id] = len(order)
                order.append(("cross", m, layer, layer))
            else:
                kind, idx, first, _ = order[seen[mod_id]]
                order[seen[mod_id]] = (kind, idx, first, layer)
        for blk in range(self_per_cross_attn):
            mod_id = ("self", blk, key)
            if mod_id not in seen:
                seen[mod_id] = len(order)
                order.append(("self", blk, layer, layer))
            else:
                kind, idx, first, _ = order[seen[mod_id]]
                order[seen[mod_id]] = (kind, idx, first, layer)
    return order


class HealNetModule(nn.Module):
    """Functional HealNet core (see module docstring).

    Inputs to ``__call__``:
        tensors: one array per modality, shape ``(b, *spatial_i, channels_i)``
            with ``len(spatial_i) == num_spatial_axes[i]``.
        presence: optional ``(b, n_modalities)`` float/bool — 1 where the
            modality exists for the sample. Missing modalities contribute no
            latent update (documented reference semantics, `README.md:16`).
        kv_masks: optional per-modality boolean masks ``(b, tokens_i)`` for
            padded/ragged contexts (True = attend).
    """

    n_modalities: int
    channel_dims: Tuple[int, ...]
    num_spatial_axes: Tuple[int, ...]
    out_dims: int
    depth: int = 3
    num_freq_bands: int = 2
    max_freq: float = 10.0
    l_c: int = 128
    l_d: int = 128
    x_heads: int = 8
    l_heads: int = 8
    cross_dim_head: int = 64
    latent_dim_head: int = 64
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    weight_tie_layers: bool = False
    fourier_encode_data: bool = True
    self_per_cross_attn: int = 1
    final_classifier_head: bool = True
    snn: bool = True
    attention_impl: str = "xla"
    # merged-KV projection dispatch: 'auto' (one-pass pallas kernel on TPU
    # for HBM-bound contexts — measured 1.43x fwd over XLA's schedule at
    # WSI scale; xla elsewhere and under meshes), 'xla', 'pallas'
    projection_impl: str = "auto"
    dtype: Any = None
    # a jax.sharding.Mesh whose `seq` axis > 1 routes cross-attention through
    # the explicit sequence-parallel path (KV sharded over `seq`, only
    # online-softmax partials cross ICI) instead of GSPMD inference
    mesh: Any = None
    # rematerialise each attention/FF block in the backward pass: activation
    # memory drops from O(depth * modalities * tokens) to O(tokens) at the
    # cost of one extra forward — the jax.checkpoint trade for deep configs
    # (e.g. KIRP depth 5) or giant contexts
    remat: bool = False
    # KV chunk width for store_attention="stats" (streaming WSI-scale
    # inspection): peak capture memory is (b, h, l_c, stats_chunk) per site
    # instead of the full (b, h, l_c, tokens) probability map
    stats_chunk: int = 2048

    def input_dims(self) -> List[int]:
        """Per-modality context dims after Fourier concat (`healnet.py:134-139`)."""
        dims = []
        for axis, channels in zip(self.num_spatial_axes, self.channel_dims):
            f_channels = axis * (2 * self.num_freq_bands + 1) if self.fourier_encode_data else 0
            dims.append(f_channels + channels)
        return dims

    @nn.compact
    def __call__(
        self,
        tensors: Sequence[jnp.ndarray],
        presence: Optional[jnp.ndarray] = None,
        kv_masks: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        deterministic: bool = True,
        return_embeddings: bool = False,
        store_attention: bool = False,
    ) -> jnp.ndarray:
        assert len(tensors) == self.n_modalities, (
            f"expected {self.n_modalities} modalities, got {len(tensors)}"
        )
        input_dims = self.input_dims()
        b = tensors[0].shape[0]

        # ---- per-modality preprocessing: Fourier encode + flatten spatial
        # axes. The raw data and the (batch-shared) positional encoding are
        # kept as SEPARATE parts: the merged-KV path projects the raw context
        # directly and applies normalization on the projection output, so the
        # concatenated context never materializes in HBM. A modality may
        # arrive as a QuantizedContext (per-token int8 + f32 scales,
        # ops/quantize.py): the merged projection then streams HALF the
        # context bytes and rescales on the accumulator.
        compute_dt = self.dtype if self.dtype is not None else jnp.float32
        context_parts: List[Tuple[Any, Optional[jnp.ndarray]]] = []
        for i, data in enumerate(tensors):
            quantized = isinstance(data, QuantizedContext)
            spatial = data.shape[1:-1]
            assert len(spatial) == self.num_spatial_axes[i], (
                f"input data for modality {i + 1} must have the same number of "
                f"axes as the num_spatial_axes parameter"
            )
            if self.dtype is not None and not quantized:
                # cast once here: the context bytes dominate the step's HBM
                # traffic — bf16 halves it
                data = data.astype(self.dtype)
            enc_flat = None
            if self.fourier_encode_data:
                enc = positional_encoding(
                    spatial, self.max_freq, self.num_freq_bands,
                    dtype=compute_dt if quantized else data.dtype,
                )
                enc_flat = enc.reshape(-1, enc.shape[-1])        # (tokens, E)
            if quantized:
                flat = QuantizedContext(
                    data.data.reshape(b, -1, data.data.shape[-1]),
                    data.scale.reshape(b, -1),
                )
            else:
                flat = data.reshape(b, -1, data.shape[-1])
            context_parts.append((flat, enc_flat))

        # remat path only: materialized, normalized concat contexts (shared
        # x_hat; each layer's LayerNorm affine folds into its to_kv weights).
        # LayerNorm statistics are layer-independent, so one normalization
        # serves every fusion layer.
        contexts: List[jnp.ndarray] = []
        if self.remat:
            for dat, enc_flat in context_parts:
                if isinstance(dat, QuantizedContext):
                    # remat recomputes per block from the materialized
                    # context anyway; dequantize once up front
                    dat = dat.dequantize(compute_dt)
                ctx = dat
                if enc_flat is not None:
                    ctx = jnp.concatenate(
                        [dat, jnp.broadcast_to(enc_flat, (b, *enc_flat.shape))],
                        axis=-1,
                    )
                xf = ctx.astype(jnp.float32)
                mu = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
                xhat = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
                contexts.append(xhat.astype(ctx.dtype))

        first = context_parts[0][0]
        cdt = compute_dt if isinstance(first, QuantizedContext) else first.dtype
        if presence is None:
            presence = jnp.ones((b, self.n_modalities), dtype=cdt)
        presence = presence.astype(cdt)
        if kv_masks is None:
            kv_masks = [None] * self.n_modalities

        # ---- module construction honouring cache_fn tying semantics
        if self.remat:
            attn_cls = nn.remat(PreNormAttention, static_argnums=(4, 5, 6))
            ff_cls = nn.remat(PreNormFeedForward, static_argnums=(2,))
        else:
            attn_cls, ff_cls = PreNormAttention, PreNormFeedForward

        groups: Dict[int, Dict[str, Any]] = {}
        for layer in range(self.depth):
            key = _tie_key(layer, self.weight_tie_layers)
            if key in groups:
                continue
            cross_attns = [
                attn_cls(
                    query_dim=self.l_d,
                    context_dim=input_dims[m],
                    heads=self.x_heads,
                    dim_head=self.cross_dim_head,
                    dropout=self.attn_dropout,
                    attention_impl=self.attention_impl,
                    dtype=self.dtype,
                    mesh=self.mesh,
                    stats_chunk=self.stats_chunk,
                    name=f"layer{key}_cross_attn_m{m}",
                )
                for m in range(self.n_modalities)
            ]
            if key >= 1 and self.weight_tie_layers:
                # cache_fn key=None: one FF shared across modalities AND layers >= 1
                shared_ff = ff_cls(
                    dim=self.l_d,
                    dropout=self.ff_dropout,
                    snn=self.snn,
                    dtype=self.dtype,
                    name=f"layer{key}_cross_ff_shared",
                )
                cross_ffs = [shared_ff] * self.n_modalities
            else:
                cross_ffs = [
                    ff_cls(
                        dim=self.l_d,
                        dropout=self.ff_dropout,
                        snn=self.snn,
                        dtype=self.dtype,
                        name=f"layer{key}_cross_ff_m{m}",
                    )
                    for m in range(self.n_modalities)
                ]
            self_attns = [
                attn_cls(
                    query_dim=self.l_d,
                    heads=self.l_heads,
                    dim_head=self.latent_dim_head,
                    dropout=self.attn_dropout,
                    attention_impl=self.attention_impl,
                    dtype=self.dtype,
                    stats_chunk=self.stats_chunk,
                    name=f"layer{key}_self_attn_b{blk}",
                )
                for blk in range(self.self_per_cross_attn)
            ]
            self_ffs = [
                ff_cls(
                    dim=self.l_d,
                    dropout=self.ff_dropout,
                    snn=self.snn,
                    dtype=self.dtype,
                    name=f"layer{key}_self_ff_b{blk}",
                )
                for blk in range(self.self_per_cross_attn)
            ]
            groups[key] = {
                "cross_attns": cross_attns,
                "cross_ffs": cross_ffs,
                "self_attns": self_attns,
                "self_ffs": self_ffs,
            }

        # ---- merged KV projections over the RAW context: every fusion
        # layer's KV depends only on the context, so all unique layer groups
        # project in ONE matmul per modality with their LayerNorm affines
        # folded into the concatenated weights. The per-token LayerNorm
        # commutes with the projection:
        #
        #   x_hat @ W = (1/σ) (ctx @ W_c + enc @ W_e − μ · colsum(W))
        #
        # so the normalization applies on the TINY projection output
        # (tokens x Σfeatures) instead of the 2k-channel context. Per step
        # the context is read exactly twice in the forward (fused sum/sum-sq
        # statistics pass + the MXU matmul) and once in the backward (dW) —
        # no context-sized concat, x_hat, or LN output ever hits HBM.
        # Disabled under remat (whose point is recomputing per block).
        kv_cache = {}
        if not self.remat:
            group_keys = list(groups.keys())
            for i, (dat, enc_flat) in enumerate(context_parts):
                folds = [groups[key]["cross_attns"][i].kv_fold() for key in group_keys]
                w_all = jnp.concatenate([w for w, _ in folds], axis=1)  # (D, F) f32
                b_all = jnp.concatenate([fb for _, fb in folds])        # (F,)
                # statistics + matmul + folded normalization; the pallas
                # impl reads the context ONCE for all three (the xla impl
                # needs a separate statistics pass). Under a device mesh the
                # context is GSPMD-sharded and a pallas_call would force a
                # gather — auto falls back to the partitionable xla path.
                proj_impl = self.projection_impl
                if proj_impl == "auto" and self.mesh is not None:
                    proj_impl = "xla"
                kv_all = fused_kv_project(
                    dat, enc_flat, w_all, b_all, eps=1e-5, impl=proj_impl,
                    out_dtype=(
                        compute_dt if isinstance(dat, QuantizedContext) else None
                    ),
                    keep_pad=True,
                )
                # slice per layer group via the concat-VJP split: XLA's
                # default slice backward pads each layer's dKV to the full
                # buffer width and accumulates — ~120 MB of HBM traffic per
                # fusion layer at the kirp-5 shape (probe_kirp_hlo.py);
                # the disjoint-column gradient is one concat instead.
                # keep_pad: the pallas projection's output keeps its lane
                # padding and group slices come straight out of it (a final
                # zero-width or pad-width chunk absorbs the remainder)
                widths = [w.shape[1] for w, _ in folds]
                rem = kv_all.shape[-1] - sum(widths)
                slices = split_columns(kv_all, widths + ([rem] if rem else []))
                for key, sl in zip(group_keys, slices):
                    kv_cache[(key, i)] = sl

        # ---- shared latent bottleneck (`healnet.py:143`)
        latents = self.param(
            "latents", nn.initializers.normal(stddev=1.0), (self.l_c, self.l_d)
        )
        x = jnp.broadcast_to(latents.astype(cdt), (b, self.l_c, self.l_d))

        # ---- iterative fusion (`healnet.py:227-245`)
        for layer in range(self.depth):
            key = _tie_key(layer, self.weight_tie_layers)
            mods = groups[key]
            for i in range(self.n_modalities):
                pres = presence[:, i][:, None, None]
                # positional args: remat-transformed modules resolve their
                # static_argnums positionally
                if (key, i) in kv_cache:
                    update, weights = mods["cross_attns"][i](
                        x, None, kv_masks[i], deterministic, store_attention,
                        False, kv_cache[(key, i)],
                    )
                else:  # remat path: shared x_hat, per-layer folded projection
                    update, weights = mods["cross_attns"][i](
                        x, contexts[i], kv_masks[i], deterministic, store_attention,
                        True,
                    )
                if store_attention:
                    self.sow("intermediates", f"attn_l{layer}_cross_m{i}", weights)
                x = pres * update + x
                x = pres * mods["cross_ffs"][i](x, deterministic) + x
                # self-attention runs per modality iteration, matching the
                # reference's actual control flow (`healnet.py:241-245`)
                for blk in range(self.self_per_cross_attn):
                    update, weights = mods["self_attns"][blk](
                        x, None, None, deterministic, store_attention, False
                    )
                    if store_attention:
                        self.sow("intermediates", f"attn_l{layer}_self_b{blk}", weights)
                    x = update + x
                    x = mods["self_ffs"][blk](x, deterministic) + x

        if return_embeddings or not self.final_classifier_head:
            return x

        # mean-pool over latent tokens -> LayerNorm -> Linear (`healnet.py:181-185`)
        pooled = jnp.mean(x, axis=1)
        pooled = nn.LayerNorm(epsilon=1e-5, name="final_norm", dtype=self.dtype)(pooled)
        return torch_dense(self.out_dims, self.l_d, name="final_head", dtype=self.dtype)(pooled)


class HealNet:
    """Stateful API-parity wrapper around :class:`HealNetModule`.

    Keeps the reference constructor and call signature
    (`/root/reference/healnet/models/healnet.py:16-38,190-195`): pass a list of
    per-modality arrays (entries may be ``None`` for missing modalities) and
    read logits back; ``get_attention_weights()`` exposes the per-layer,
    per-modality attention maps of the last forward pass.
    """

    def __init__(
        self,
        *,
        n_modalities: int,
        channel_dims: Sequence[int],
        num_spatial_axes: Sequence[int],
        out_dims: int,
        depth: int = 3,
        num_freq_bands: int = 2,
        max_freq: float = 10.0,
        l_c: int = 128,
        l_d: int = 128,
        x_heads: int = 8,
        l_heads: int = 8,
        cross_dim_head: int = 64,
        latent_dim_head: int = 64,
        attn_dropout: float = 0.0,
        ff_dropout: float = 0.0,
        weight_tie_layers: bool = False,
        fourier_encode_data: bool = True,
        self_per_cross_attn: int = 1,
        final_classifier_head: bool = True,
        snn: bool = True,
        seed: int = 0,
        store_attention: str = "lazy",
        attention_impl: str = "xla",
        projection_impl: str = "auto",
        dtype: Any = None,
        stats_chunk: int = 2048,
    ):
        assert len(channel_dims) == len(num_spatial_axes), (
            "input channels and input axis must be of the same length"
        )
        assert len(num_spatial_axes) == n_modalities, (
            "input axis must be of the same length as the number of modalities"
        )
        self.module = HealNetModule(
            n_modalities=n_modalities,
            channel_dims=tuple(channel_dims),
            num_spatial_axes=tuple(num_spatial_axes),
            out_dims=out_dims,
            depth=depth,
            num_freq_bands=num_freq_bands,
            max_freq=max_freq,
            l_c=l_c,
            l_d=l_d,
            x_heads=x_heads,
            l_heads=l_heads,
            cross_dim_head=cross_dim_head,
            latent_dim_head=latent_dim_head,
            attn_dropout=attn_dropout,
            ff_dropout=ff_dropout,
            weight_tie_layers=weight_tie_layers,
            fourier_encode_data=fourier_encode_data,
            self_per_cross_attn=self_per_cross_attn,
            final_classifier_head=final_classifier_head,
            snn=snn,
            attention_impl=attention_impl,
            projection_impl=projection_impl,
            dtype=dtype,
            stats_chunk=stats_chunk,
        )
        # Attention-weight capture policy. The reference stores weights on every
        # forward (`healnet.py:420`), but for WSI-scale contexts that means
        # materialising (b, h, l_c, ~50k-token) tensors — gigabytes per step.
        #   - "lazy" (default): hot path stores nothing; get_attention_weights()
        #     re-runs a capture forward on the cached inputs on demand.
        #   - True / "eager": capture on every forward (reference behaviour).
        #   - False: never capture.
        if store_attention is True:
            store_attention = "eager"
        elif store_attention is False:
            store_attention = "off"
        assert store_attention in ("lazy", "eager", "off")
        self.store_attention = store_attention
        self._rng = jax.random.PRNGKey(seed)
        self.params: Optional[FrozenDict] = None
        self._attn_weights: Optional[List[np.ndarray]] = None
        self._last_inputs = None
        self._apply = jax.jit(
            self._apply_impl,
            static_argnames=("deterministic", "return_embeddings", "store_attention"),
        )

    # ------------------------------------------------------------------ utils
    def _apply_impl(
        self,
        params,
        tensors,
        presence,
        kv_masks,
        rng,
        deterministic: bool,
        return_embeddings: bool,
        store_attention: bool,
    ):
        rngs = {"dropout": rng} if not deterministic else {}
        out, state = self.module.apply(
            {"params": params},
            tensors,
            presence=presence,
            kv_masks=kv_masks,
            deterministic=deterministic,
            return_embeddings=return_embeddings,
            store_attention=store_attention,
            rngs=rngs,
            mutable=["intermediates"] if store_attention else [],
        )
        return out, state

    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _prepare_inputs(
        self,
        tensors: Sequence[Optional[jnp.ndarray]],
        mask,
    ):
        """Convert a reference-style tensor list (None = missing) to static form."""
        assert len(tensors) == self.module.n_modalities, (
            f"expected {self.module.n_modalities} modalities, got {len(tensors)}"
        )
        batch = None
        for t in tensors:
            if t is not None:
                batch = t.shape[0] if isinstance(t, QuantizedContext) else (
                    np.asarray(t).shape[0]
                )
                break
        assert batch is not None, "at least one modality must be present"

        prepared: List[jnp.ndarray] = []
        presence = np.ones((batch, self.module.n_modalities), dtype=np.float32)
        for i, t in enumerate(tensors):
            if t is None:
                presence[:, i] = 0.0
                shape = (batch,) + (1,) * self.module.num_spatial_axes[i] + (
                    self.module.channel_dims[i],
                )
                prepared.append(jnp.zeros(shape, dtype=jnp.float32))
            elif isinstance(t, QuantizedContext):
                # int8 context (ops/quantize.py): pass through — the module's
                # merged KV projection consumes it without dequantizing
                prepared.append(
                    QuantizedContext(jnp.asarray(t.data), jnp.asarray(t.scale))
                )
            else:
                prepared.append(jnp.asarray(t, dtype=jnp.float32))

        kv_masks: List[Optional[jnp.ndarray]] = [None] * self.module.n_modalities
        if mask is not None:
            if isinstance(mask, (list, tuple)):
                kv_masks = [None if m is None else jnp.asarray(m, bool) for m in mask]
            else:
                # single-array form: the reference broadcasts one mask to
                # every modality's cross-attention (healnet.py:236), which
                # only type-checks when token counts match — mirror that by
                # applying it to every width-matching modality, and fail
                # loudly instead of silently ignoring a mask that matches
                # nothing (e.g. built for the unpadded bag)
                mask = jnp.asarray(mask, bool).reshape(batch, -1)
                matched = False
                for i, t in enumerate(prepared):
                    tokens = int(np.prod(t.shape[1:-1]))
                    if tokens == mask.shape[1]:
                        kv_masks[i] = mask
                        matched = True
                if not matched:
                    raise ValueError(
                        f"mask has {mask.shape[1]} tokens but no modality's "
                        "flattened token count matches — pass a per-modality "
                        "tuple/list of masks (None for unmasked modalities)"
                    )
        return tuple(prepared), jnp.asarray(presence), tuple(kv_masks)

    # ------------------------------------------------------------------ API
    def init(self, tensors: Sequence[Optional[jnp.ndarray]]) -> FrozenDict:
        prepared, presence, kv_masks = self._prepare_inputs(list(tensors), None)
        variables = self.module.init(
            {"params": self._next_rng(), "dropout": self._next_rng()},
            prepared,
            presence=presence,
            kv_masks=kv_masks,
            deterministic=True,
        )
        self.params = variables["params"]
        return self.params

    def __call__(
        self,
        tensors: Sequence[Optional[jnp.ndarray]],
        mask=None,
        return_embeddings: bool = False,
        train: bool = False,
        verbose: bool = False,
    ) -> jnp.ndarray:
        tensors = list(tensors)
        if verbose:
            missing = [i for i, t in enumerate(tensors) if t is None]
            print(f"Missing modalities indices: {missing}")
        prepared, presence, kv_masks = self._prepare_inputs(tensors, mask)
        if self.params is None:
            self.init(tensors)
        eager = self.store_attention == "eager"
        rng = self._next_rng() if train else jax.random.PRNGKey(0)
        out, state = self._apply(
            self.params,
            prepared,
            presence,
            kv_masks,
            rng,
            deterministic=not train,
            return_embeddings=return_embeddings,
            store_attention=eager,
        )
        if eager:
            self._attn_weights = self._collect_attention(state.get("intermediates", {}))
        else:
            self._attn_weights = None
        # the lazy capture must replay THIS pass (same rng + deterministic
        # flag), so a train=True forward's dropout shapes the returned maps
        # exactly as it shaped the forward — reference semantics: 'weights
        # of the last forward pass' (healnet.py:420)
        self._last_inputs = (prepared, presence, kv_masks, rng, not train)
        return out

    forward = __call__

    def _collect_attention(self, intermediates) -> List[np.ndarray]:
        order = attention_module_order(
            self.module.depth,
            self.module.n_modalities,
            self.module.self_per_cross_attn,
            self.module.weight_tie_layers,
        )
        weights: List[np.ndarray] = []
        for kind, idx, _first, last in order:
            tag = (
                f"attn_l{last}_cross_m{idx}" if kind == "cross" else f"attn_l{last}_self_b{idx}"
            )
            if tag in intermediates:
                # sow appends one entry per invocation; self-attention runs once
                # per modality iteration and torch keeps the LAST invocation's
                # weights (`healnet.py:420`), so read the final sown entry.
                w = np.asarray(intermediates[tag][-1])  # (b, h, lq, lkv)
                b, h, lq, lkv = w.shape
                # reference stores (b*h, lq, lkv) (`healnet.py:407,420`)
                weights.append(w.reshape(b * h, lq, lkv))
        return weights

    def get_attention_weights(self) -> List[np.ndarray]:
        """Attention maps of the last forward pass, reference module order.

        Under the default "lazy" policy this re-runs a capture forward on the
        cached inputs — the hot path never materialises the (b, h, l_c, tokens)
        maps, so inspection costs nothing unless used.
        """
        if self._attn_weights is not None:
            return self._attn_weights
        if self.store_attention == "off" or self._last_inputs is None:
            return []
        prepared, presence, kv_masks, rng, deterministic = self._last_inputs
        _, state = self._apply(
            self.params,
            prepared,
            presence,
            kv_masks,
            rng,
            deterministic=deterministic,
            return_embeddings=False,
            store_attention=True,
        )
        self._attn_weights = self._collect_attention(state.get("intermediates", {}))
        return self._attn_weights

    def get_attention_stats(self) -> List[Dict[str, Any]]:
        """Streaming attention statistics of the last forward pass.

        The WSI-scale alternative to :meth:`get_attention_weights`: replays
        the pass with ``store_attention="stats"``, where every attention
        site computes exact column/std reductions of its probability map in
        KV chunks (``ops/attention.streaming_attention_stats``) — peak
        capture memory is ``(b, h, l_c, stats_chunk)`` per site instead of
        the full ``(b, h, l_c, tokens)`` map (gigabytes at the 50k-token
        contexts the Explainer targets,
        `/root/reference/healnet/models/explainer.py:201-349`).

        Returns one dict per module in the reference
        ``get_attention_weights`` order, each with:
            ``col_mean``: (b, tokens) — per-key column mean over heads and
                latent queries (what heatmaps/rankings consume; equals
                ``weights.mean(axis=(0, 1))`` of the dense map for b=1);
            ``mean``, ``std``: scalars over the dense-map elements (the
                reference's ``np.std(w)`` layer-selection statistic);
            ``kind``, ``index``, ``tokens``.
        """
        if self.store_attention == "off" or self._last_inputs is None:
            return []
        prepared, presence, kv_masks, rng, deterministic = self._last_inputs
        _, state = self._apply(
            self.params,
            prepared,
            presence,
            kv_masks,
            rng,
            deterministic=deterministic,
            return_embeddings=False,
            store_attention="stats",
        )
        intermediates = state.get("intermediates", {})
        order = attention_module_order(
            self.module.depth,
            self.module.n_modalities,
            self.module.self_per_cross_attn,
            self.module.weight_tie_layers,
        )
        out: List[Dict[str, Any]] = []
        for kind, idx, _first, last in order:
            tag = (
                f"attn_l{last}_cross_m{idx}" if kind == "cross"
                else f"attn_l{last}_self_b{idx}"
            )
            if tag not in intermediates:
                continue
            s = intermediates[tag][-1]  # torch keeps the LAST invocation
            heads = (
                self.module.x_heads if kind == "cross" else self.module.l_heads
            )
            colsum = np.asarray(s["colsum"], np.float64)
            count = float(s["count"])
            mean = float(s["psum"]) / count
            var = max(float(s["psumsq"]) / count - mean * mean, 0.0)
            out.append(
                {
                    "kind": kind,
                    "index": idx,
                    "tokens": colsum.shape[-1],
                    "col_mean": colsum / (heads * self.module.l_c),
                    "mean": mean,
                    "std": float(np.sqrt(var)),
                }
            )
        return out

    def count_parameters(self) -> int:
        from healnet_tpu.utils.train_utils import count_parameters

        return 0 if self.params is None else count_parameters(self.params)

    # ------------------------------------------------------------ persistence
    def save(self, path) -> None:
        """Durably save the wrapper's parameters (orbax)."""
        from healnet_tpu.train.checkpoint import Checkpointer

        assert self.params is not None, "no parameters to save (run a forward first)"
        Checkpointer(path).save_best(self.params)

    def load(self, path) -> "HealNet":
        """Restore parameters saved with :meth:`save` (or a Pipeline best)."""
        from healnet_tpu.train.checkpoint import Checkpointer

        self.params = jax.tree_util.tree_map(
            jnp.asarray, Checkpointer(path).restore_best()
        )
        return self

    def load_torch_state_dict(self, state_dict) -> "HealNet":
        """Import weights from a reference (Torch) HealNet checkpoint."""
        from healnet_tpu.compat import params_from_torch_state_dict

        self.params = jax.tree_util.tree_map(
            jnp.asarray, params_from_torch_state_dict(state_dict, self.module)
        )
        return self
