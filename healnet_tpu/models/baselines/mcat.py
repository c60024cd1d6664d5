"""MCAT family baselines: MCAT, MILAttentionNet, SNN.

Flax re-implementations of the genomic-guided co-attention transformer family
consumed via the pipeline's model factory
(`/root/reference/healnet/main.py:347-365`; reference models at
`/root/reference/healnet/baselines/mcat.py:33-318`, themselves a port of
mahmoodlab/MCAT):

- :class:`MCAT` — WSI bag FC net, per-omic-signature SNN tower, single-head
  genomic-guided co-attention (queries = omic embeddings, keys/values = patch
  embeddings), two 2-layer transformer encoders, gated-attention pooling
  heads, concat or bilinear fusion, linear classifier. Unlike the reference —
  which vendors a 470-line copy of torch's MultiheadAttention just to expose
  raw weights (`mcat.py:471-943`) — the co-attention here is a small
  functional einsum that *returns* its weights.
- :class:`MILAttentionNet` — attention-MIL over patch bags with gated
  attention pooling (`mcat.py:198-276`).
- :class:`SNN` — self-normalising genomic MLP (`mcat.py:284-306`).

Call convention matches the framework: ``model.apply(vars, tensors,
presence=None, deterministic=...) -> logits`` with ``tensors`` =
``[omic (b, feat) or (b, 1, feat), wsi (b, dim, patches)]``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from healnet_tpu.models.layers import torch_dense
from healnet_tpu.models.baselines.common import (
    AttnNetGated,
    BilinearFusion,
    SNNBlock,
    TransformerEncoder,
)

_SIZE_WSI = {"small": (1024, 256, 256), "big": (1024, 512, 384)}
_SIZE_OMIC = {"small": (256, 256), "big": (1024, 1024, 1024, 256)}


def _flatten_leading(x: jnp.ndarray) -> jnp.ndarray:
    """(b, feat) from (b, 1, feat) / (b, feat, 1) layouts."""
    if x.ndim == 3:
        return x.reshape(x.shape[0], -1)
    return x


class MCAT(nn.Module):
    """Multimodal Co-Attention Transformer."""

    n_classes: int = 4
    fusion: str = "concat"  # "concat" | "bilinear"
    model_size_wsi: str = "small"
    model_size_omic: str = "small"
    dropout: float = 0.25
    # reference parity layout is (b, dim, patches) (`loaders.py:382-395`
    # permute). Under `patch_attention` / arena mode the pipeline feeds
    # (b, patches, dim) tokens — set tokens_layout=True (the factory does)
    # or the FC stack would silently run over the PATCH axis.
    tokens_layout: bool = False

    @nn.compact
    def __call__(
        self,
        tensors: Sequence[jnp.ndarray],
        presence=None,
        deterministic: bool = True,
        return_attention: bool = False,
    ):
        # tensors[0] may be a single omic tensor (the pipeline's layout) or a
        # list/tuple of per-signature tensors — one SNN tower each, like the
        # reference's `sig_networks` ModuleList (`mcat.py:64-71`), whose
        # embeddings stack into the omic token axis for co-attention.
        raw_omic = tensors[0]
        signatures = (
            [_flatten_leading(s) for s in raw_omic]
            if isinstance(raw_omic, (list, tuple))
            else [_flatten_leading(raw_omic)]
        )
        wsi = tensors[1]
        if not self.tokens_layout:                    # (b, dim, patches) in
            wsi = jnp.swapaxes(wsi, 1, 2)             # (b, patches, dim)
        if presence is not None:
            # zero-imputation missing-modality convention: the trainer's
            # ablation harness drives presence; these nets have no native
            # skip, so an absent modality contributes zero features
            signatures = [s * presence[:, 0][:, None] for s in signatures]
            wsi = wsi * presence[:, 1][:, None, None]
        size = _SIZE_WSI[self.model_size_wsi]
        hidden = _SIZE_OMIC[self.model_size_omic]

        # WSI bag FC net
        h_path = torch_dense(size[1], wsi.shape[-1], name="wsi_fc")(wsi)
        h_path = jax.nn.relu(h_path)
        h_path = nn.Dropout(0.25)(h_path, deterministic=deterministic)

        # genomic SNN towers -> one omic token per signature
        # (single-signature keeps the round-1 param names `sig_{i}`)
        tokens = []
        for j, sig in enumerate(signatures):
            h = sig
            prefix = f"sig_{j}_" if len(signatures) > 1 else "sig_"
            for i, width in enumerate(hidden):
                # SNN_Block's default dropout (0.25) applies to EVERY block,
                # including the first (`mcat.py:67,388`)
                h = SNNBlock(width, dropout=0.25, name=f"{prefix}{i}")(
                    h, deterministic=deterministic
                )
            tokens.append(h)
        h_omic = jnp.stack(tokens, axis=1)            # (b, n_sig, 256)

        # genomic-guided co-attention: omic queries attend over patch tokens
        scale = size[1] ** -0.5   # = the q/k projection width ('big' included)
        q = torch_dense(size[1], h_omic.shape[-1], name="coattn_q")(h_omic)
        k = torch_dense(size[1], size[1], name="coattn_k")(h_path)
        v = torch_dense(size[1], size[1], name="coattn_v")(h_path)
        attn = jax.nn.softmax(
            jnp.einsum("bqd,bkd->bqk", q, k) * scale, axis=-1
        )                                             # (b, 1, patches)
        h_coattn = jnp.einsum("bqk,bkd->bqd", attn, v)

        # transformer towers + gated-attention pooling
        h_path_trans = TransformerEncoder(
            d_model=size[1], dropout=self.dropout, name="path_transformer"
        )(h_coattn, deterministic=deterministic)
        a_path, h_path_pool = AttnNetGated(
            hidden=size[2], dropout=self.dropout, name="path_attention_head"
        )(h_path_trans, deterministic=deterministic)
        h_p = jnp.sum(jax.nn.softmax(a_path, axis=1) * h_path_pool, axis=1)
        h_p = jax.nn.relu(torch_dense(size[2], size[1], name="path_rho")(h_p))
        h_p = nn.Dropout(self.dropout)(h_p, deterministic=deterministic)

        h_omic_trans = TransformerEncoder(
            d_model=size[1], dropout=self.dropout, name="omic_transformer"
        )(h_omic, deterministic=deterministic)
        a_omic, h_omic_pool = AttnNetGated(
            hidden=size[2], dropout=self.dropout, name="omic_attention_head"
        )(h_omic_trans, deterministic=deterministic)
        h_o = jnp.sum(jax.nn.softmax(a_omic, axis=1) * h_omic_pool, axis=1)
        h_o = jax.nn.relu(torch_dense(size[2], size[1], name="omic_rho")(h_o))
        h_o = nn.Dropout(self.dropout)(h_o, deterministic=deterministic)

        # h_p / h_o are size[2]-wide after the rho projections, so the fusion
        # fan-ins are size[2]-based (identical to size[1] for 'small', but
        # 'big' = (1024, 512, 384) diverges — declaring size[1] there would
        # skew the torch-style bias-init bound vs the reference contract)
        if self.fusion == "bilinear":
            h = BilinearFusion(
                dim1=size[2], dim2=size[2], scale_dim1=8, scale_dim2=8,
                mmhid=size[2], name="mm",
            )(h_p, h_o, deterministic=deterministic)
        else:
            h = jnp.concatenate([h_p, h_o], axis=1)
            h = jax.nn.relu(torch_dense(size[2], size[2] * 2, name="mm_0")(h))
            h = jax.nn.relu(torch_dense(size[2], size[2], name="mm_1")(h))

        logits = torch_dense(self.n_classes, size[2], name="classifier")(h)
        if return_attention:
            return logits, {"coattn": attn, "path": a_path, "omic": a_omic}
        return logits


class MILAttentionNet(nn.Module):
    """Attention-MIL over patch bags (`mcat.py:198-276`)."""

    n_classes: int = 4
    size_arg: str = "small"
    dropout: float = 0.25
    tokens_layout: bool = False  # True: input already (b, patches, dim)

    @nn.compact
    def __call__(
        self,
        tensors: Sequence[jnp.ndarray],
        presence=None,
        deterministic: bool = True,
    ):
        wsi = tensors[0]
        if not self.tokens_layout:
            wsi = jnp.swapaxes(wsi, 1, 2)             # (b, patches, dim)
        if presence is not None:
            wsi = wsi * presence[:, -1][:, None, None]
        sizes = {"small": (1024, 512, 256), "big": (1024, 512, 384)}[self.size_arg]

        h = jax.nn.relu(torch_dense(sizes[1], wsi.shape[-1], name="fc")(wsi))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        a, h = AttnNetGated(hidden=sizes[2], dropout=self.dropout, name="attention_net")(
            h, deterministic=deterministic
        )
        pooled = jnp.sum(jax.nn.softmax(a, axis=1) * h, axis=1)
        pooled = jax.nn.relu(torch_dense(sizes[2], sizes[1], name="rho")(pooled))
        pooled = nn.Dropout(self.dropout)(pooled, deterministic=deterministic)
        return torch_dense(self.n_classes, sizes[2], name="classifier")(pooled)


class SNN(nn.Module):
    """Self-normalising genomic MLP (`mcat.py:284-306`)."""

    n_classes: int = 4
    model_size_omic: str = "small"

    @nn.compact
    def __call__(
        self,
        tensors: Sequence[jnp.ndarray],
        presence=None,
        deterministic: bool = True,
    ):
        x = _flatten_leading(tensors[0])
        if presence is not None:
            x = x * presence[:, 0][:, None]
        hidden = {"small": (256, 256, 256, 256), "big": (1024, 1024, 1024, 256)}[
            self.model_size_omic
        ]
        # the reference applies init_max_weights to ALL of SNN's Linears
        # (`mcat.py:297`), and SNN_Block's default dropout covers block 0 too
        for i, width in enumerate(hidden):
            x = SNNBlock(width, dropout=0.25, max_init=True, name=f"fc_omic_{i}")(
                x, deterministic=deterministic
            )
        from healnet_tpu.models.baselines.common import max_weights_dense

        return max_weights_dense(self.n_classes, hidden[-1], name="classifier")(x)
