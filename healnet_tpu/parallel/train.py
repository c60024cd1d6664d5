"""SPMD training step over a device mesh.

Builds the jitted training step with GSPMD sharding annotations:

- batch leaves sharded over ``data`` (DP), WSI/patch token axes additionally
  over ``seq`` (SP — the long-context axis of this model family);
- parameters sharded with Megatron-style TP rules over ``model``
  (column-parallel q/kv/FF-in, row-parallel out/FF-out), or replicated;
- XLA inserts all collectives (psum for row-parallel matmuls and the DP
  gradient reduction) — no hand-written communication backend, which is the
  TPU-native replacement for what the reference never had (SURVEY.md §2.6).

The same step function serves single-chip (1-device mesh: all shardings
degenerate) and multi-chip execution.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from healnet_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_SEQ,
    param_shardings,
)
from healnet_tpu.train.losses import survival_loss
from healnet_tpu.utils.train_utils import l1_norm


def batch_shardings(
    batch: Dict[str, Any],
    mesh: Mesh,
    batch_axis_factor: int = 1,
    scan_axis: bool = False,
):
    """Sharding pytree for a survival batch.

    Leading axis over ``data`` everywhere; for rank>=3 modality tensors the
    token axis is additionally sharded over ``seq`` when it divides evenly.

    ``batch_axis_factor``: multi-host assembly passes process-LOCAL slices,
    so divisibility of the leading axis must be judged on the GLOBAL length
    (local * process_count) — a local slice smaller than the data axis would
    otherwise silently drop the data spec while the assembled global batch
    divides fine.

    ``scan_axis``: fused-epoch stacks carry an extra leading (steps, ...)
    axis that stays UNSHARDED (lax.scan slices it); every rule shifts one
    dimension right, so fused epochs and mesh sharding compose.
    """
    sizes = dict(mesh.shape)
    off = 1 if scan_axis else 0

    def shard_leaf(leaf):
        ndim = np.ndim(leaf)       # no-copy introspection (device arrays stay put)
        shape = np.shape(leaf)
        spec = [None] * ndim
        b_dim, tok_dim = off, off + 1
        if ndim >= b_dim + 1 and (
            shape[b_dim] * batch_axis_factor
        ) % sizes[AXIS_DATA] == 0:
            spec[b_dim] = AXIS_DATA
        if (
            ndim >= tok_dim + 2
            and shape[tok_dim] % sizes[AXIS_SEQ] == 0
            and shape[tok_dim] > 1
        ):
            spec[tok_dim] = AXIS_SEQ
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(shard_leaf, batch)


def put_batch(batch: Dict[str, Any], mesh: Mesh):
    shardings = batch_shardings(batch, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), batch, shardings
    )


def make_sharded_train_step(
    module,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    loss_type: str = "nll",
    alpha: float = 0.4,
    l1: float = 0.0,
    gc_compat: float = 16.0,
    class_weights: Optional[jnp.ndarray] = None,
    tensor_parallel: bool = True,
) -> Callable:
    """Build a jitted SPMD train step: (params, opt_state, batch, rng) -> ...

    Callers place inputs with :func:`put_batch` /
    :func:`healnet_tpu.parallel.mesh.shard_params`; the step additionally
    CONSTRAINS the parameters to the mesh's layout (TP rules, or replicated
    when ``tensor_parallel=False``), so params restored from a checkpoint
    or placed inconsistently are re-laid-out instead of silently running
    with whatever sharding they arrived in.
    """
    from healnet_tpu.parallel.mesh import param_shardings

    def train_step(params, opt_state, batch, rng):
        params = jax.lax.with_sharding_constraint(
            params, param_shardings(params, mesh, tensor_parallel)
        )

        def loss_fn(p):
            logits = module.apply(
                {"params": p},
                batch["tensors"],
                presence=batch.get("presence"),
                deterministic=False,
                rngs={"dropout": rng},
            )
            surv, risk = survival_loss(
                logits, batch, loss_type=loss_type, alpha=alpha,
                class_weights=class_weights,
            )
            # flat=False: ravelling TP-sharded params into one vector would
            # insert an all-gather per step; per-leaf abs-sums reduce shard-
            # locally and psum the scalars instead
            reg = l1 * l1_norm(p, flat=False) if l1 > 0 else 0.0
            return surv / gc_compat + reg, (surv, risk)

        (_, (surv, risk)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, surv, risk

    return jax.jit(train_step, donate_argnums=(0, 1))


def init_sharded_state(
    module,
    optimizer: optax.GradientTransformation,
    example_batch: Dict[str, Any],
    mesh: Mesh,
    seed: int = 0,
    tensor_parallel: bool = True,
) -> Tuple[Any, Any]:
    """Init params + opt state and place them according to the TP rules."""
    key = jax.random.PRNGKey(seed)
    sharded_batch = put_batch(example_batch, mesh)
    variables = module.init(
        {"params": key, "dropout": key},
        sharded_batch["tensors"],
        presence=sharded_batch.get("presence"),
        deterministic=True,
    )
    params = variables["params"]
    shardings = param_shardings(params, mesh, tensor_parallel)
    params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    opt_state = optimizer.init(params)
    return params, opt_state
