"""MOTCat: optimal-transport co-attention survival baseline.

The reference file (`/root/reference/healnet/baselines/motcat.py`) imports a
non-existent module and is not wired into the pipeline (SURVEY.md §2.4: "not
importable as-is"). This is a *working* JAX version: the torch+POT Sinkhorn
(`motcat.py:11-78`) becomes a `lax.scan` Sinkhorn in log-space (entropic OT,
optionally unbalanced via KL soft marginals), and the MCAT scaffold
(`motcat.py:84-173`) is shared with :class:`healnet_tpu.models.baselines.mcat`.

Micro-batched OT over the patch axis (the reference's ``bs_micro`` chunking)
is unnecessary on TPU: the cost matrix is computed in one einsum and the scan
is compiler-friendly static control flow.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from healnet_tpu.models.layers import torch_dense
from healnet_tpu.models.baselines.common import (
    AttnNetGated,
    SNNBlock,
    TransformerEncoder,
)


def sinkhorn_log(
    cost: jnp.ndarray,
    reg: float = 0.1,
    n_iters: int = 50,
    unbalanced_tau: Optional[float] = None,
) -> jnp.ndarray:
    """Entropic-OT transport plan in log space.

    Args:
        cost: (..., n, m) cost matrix.
        reg: entropic regularisation epsilon.
        n_iters: fixed Sinkhorn iterations (static for XLA).
        unbalanced_tau: if set, KL-relaxed marginals (unbalanced OT) with
            scaling factor tau/(tau+reg) on the dual updates.

    Returns:
        transport plan of the same shape, rows/cols ~ uniform marginals.
    """
    n, m = cost.shape[-2], cost.shape[-1]
    log_mu = -jnp.log(n)
    log_nu = -jnp.log(m)
    scale = 1.0 if unbalanced_tau is None else unbalanced_tau / (unbalanced_tau + reg)
    neg_c = -cost / reg

    def body(carry, _):
        f, g = carry
        # f update: f = scale * (log_mu - logsumexp(neg_c + g))
        f = scale * (log_mu - jax.nn.logsumexp(neg_c + g[..., None, :], axis=-1))
        g = scale * (log_nu - jax.nn.logsumexp(neg_c + f[..., :, None], axis=-2))
        return (f, g), None

    f0 = jnp.zeros(cost.shape[:-1], cost.dtype)
    g0 = jnp.zeros(cost.shape[:-2] + (m,), cost.dtype)
    (f, g), _ = jax.lax.scan(body, (f0, g0), None, length=n_iters)
    return jnp.exp(neg_c + f[..., :, None] + g[..., None, :])


class OTAttention(nn.Module):
    """OT-based co-attention: transport plan from omic tokens to patch tokens."""

    reg: float = 0.1
    n_iters: int = 50
    unbalanced_tau: Optional[float] = None  # None = balanced ("ot" mode)

    @nn.compact
    def __call__(self, queries: jnp.ndarray, keys: jnp.ndarray):
        """queries (b, n, d), keys (b, m, d) -> (plan (b, n, m), cost)."""
        # squared-Euclidean cost, normalised per batch for conditioning
        sq_q = jnp.sum(queries**2, axis=-1, keepdims=True)
        sq_k = jnp.sum(keys**2, axis=-1, keepdims=True)
        cost = sq_q + jnp.swapaxes(sq_k, -1, -2) - 2.0 * jnp.einsum(
            "bnd,bmd->bnm", queries, keys
        )
        cost = cost / (jnp.max(jnp.abs(cost), axis=(-2, -1), keepdims=True) + 1e-8)
        plan = sinkhorn_log(
            cost, reg=self.reg, n_iters=self.n_iters,
            unbalanced_tau=self.unbalanced_tau,
        )
        return plan, cost


class MOTCAT(nn.Module):
    """OT co-attention survival model (working MOTCat)."""

    n_classes: int = 4
    fusion: str = "concat"
    dropout: float = 0.25
    ot_reg: float = 0.1
    ot_iters: int = 50
    ot_tau: Optional[float] = None  # set (e.g. 0.5) for unbalanced OT
    tokens_layout: bool = False  # True: wsi input already (b, patches, dim)

    @nn.compact
    def __call__(
        self,
        tensors: Sequence[jnp.ndarray],
        presence=None,
        deterministic: bool = True,
        return_attention: bool = False,
    ):
        omic = tensors[0].reshape(tensors[0].shape[0], -1)
        wsi = (
            tensors[1]
            if self.tokens_layout                     # already (b, patches, dim)
            else jnp.swapaxes(tensors[1], 1, 2)
        )
        if presence is not None:
            # zero-imputation missing-modality convention (the trainer's
            # ablation harness drives this; these nets have no native skip)
            omic = omic * presence[:, 0][:, None]
            wsi = wsi * presence[:, 1][:, None, None]

        h_path = jax.nn.relu(torch_dense(256, wsi.shape[-1], name="wsi_fc")(wsi))
        h_path = nn.Dropout(0.25)(h_path, deterministic=deterministic)

        h_omic = omic
        for i, width in enumerate((256, 256)):
            # reference SNN_Block keeps its default AlphaDropout p=0.25 on
            # EVERY block, including the first (`mcat.py:388,293`)
            h_omic = SNNBlock(width, dropout=0.25, name=f"sig_{i}")(
                h_omic, deterministic=deterministic
            )
        h_omic = h_omic[:, None, :]                   # (b, 1, 256)

        # OT co-attention: transport mass from the omic token onto patches,
        # then pull patch features back along the (scaled) plan
        plan, _ = OTAttention(
            reg=self.ot_reg, n_iters=self.ot_iters, unbalanced_tau=self.ot_tau,
            name="ot_attn",
        )(h_omic, h_path)
        # reference semantics: the plan is computed on a DETACHED cost
        # (POT on cost.detach(), ref motcat.py:44-51) and used as constant
        # attention weights — stop_gradient reproduces that and frees the
        # 50-iteration Sinkhorn backprop memory. The single omic query row
        # already carries the full unit mass, so the raw plan IS the
        # weighted average (scaling by n_patches inflated features with
        # bag size).
        plan = jax.lax.stop_gradient(plan)
        h_coattn = jnp.einsum("bnm,bmd->bnd", plan, h_path)

        h_path_trans = TransformerEncoder(
            d_model=256, dropout=self.dropout, name="path_transformer"
        )(h_coattn, deterministic=deterministic)
        a_path, hp = AttnNetGated(hidden=256, dropout=self.dropout, name="path_head")(
            h_path_trans, deterministic=deterministic
        )
        h_p = jnp.sum(jax.nn.softmax(a_path, axis=1) * hp, axis=1)
        h_p = jax.nn.relu(torch_dense(256, 256, name="path_rho")(h_p))
        h_p = nn.Dropout(self.dropout)(h_p, deterministic=deterministic)

        h_omic_trans = TransformerEncoder(
            d_model=256, dropout=self.dropout, name="omic_transformer"
        )(h_omic, deterministic=deterministic)
        a_omic, ho = AttnNetGated(hidden=256, dropout=self.dropout, name="omic_head")(
            h_omic_trans, deterministic=deterministic
        )
        h_o = jnp.sum(jax.nn.softmax(a_omic, axis=1) * ho, axis=1)
        h_o = jax.nn.relu(torch_dense(256, 256, name="omic_rho")(h_o))
        h_o = nn.Dropout(self.dropout)(h_o, deterministic=deterministic)

        h = jnp.concatenate([h_p, h_o], axis=1)
        h = jax.nn.relu(torch_dense(256, 512, name="mm_0")(h))
        h = jax.nn.relu(torch_dense(256, 256, name="mm_1")(h))
        logits = torch_dense(self.n_classes, 256, name="classifier")(h)
        if return_attention:
            return logits, {"ot_plan": plan, "path": a_path, "omic": a_omic}
        return logits
