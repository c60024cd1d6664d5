"""Device-mesh construction and sharding helpers.

The reference has **no** parallelism framework (SURVEY.md §2.6): its only
multi-GPU artifact is one independent process per GPU (`run_plan.sh:17-21`).
This module supplies the TPU-native substrate: a `jax.sharding.Mesh` over ICI
with named axes

- ``data``  — batch (data parallel),
- ``seq``   — context/patch tokens (sequence parallel for WSI-scale bags),
- ``model`` — attention heads / FF hidden (tensor parallel),

and GSPMD sharding annotations; XLA inserts the collectives (psum /
all-gather / reduce-scatter) that ride the interconnect. Pipeline and expert
parallelism are intentionally absent: HealNet is <=5 fusion layers with no
MoE (SURVEY.md §2.6 — "not required").
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_MODEL = "model"


def _factor(n: int, max_model: int, max_seq: int) -> Tuple[int, int, int]:
    """Split n devices into (data, seq, model) with power-of-two model/seq."""
    model = 1
    while model * 2 <= max_model and n % (model * 2) == 0:
        model *= 2
    rest = n // model
    seq = 1
    while seq * 2 <= max_seq and rest % (seq * 2) == 0:
        seq *= 2
    data = rest // seq
    return data, seq, model


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    max_model: int = 2,
    max_seq: int = 2,
    require: bool = False,
) -> Mesh:
    """Build a (data, seq, model) mesh over the available devices.

    On a v5e-8 this defaults to data=2, seq=2, model=2; with 1 device all axes
    are 1 and every sharding degenerates to single-chip (no code changes).

    With ``require=True`` the mesh MUST have exactly ``n_devices`` devices;
    fewer available devices raise instead of silently degenerating (a 1-device
    mesh otherwise passes every downstream "multichip" check vacuously).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if require and len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh(require=True): asked for {n_devices} devices but only "
                f"{len(devices)} exist ({[d.platform for d in devices[:4]]}...). "
                "Force more virtual devices via "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N before "
                "backend init, or drop `require`."
            )
        devices = devices[:n_devices]
    n = len(devices)
    data, seq, model = _factor(n, max_model=max_model, max_seq=max_seq)
    dev_array = np.asarray(devices).reshape(data, seq, model)
    return Mesh(dev_array, (AXIS_DATA, AXIS_SEQ, AXIS_MODEL))


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devices).reshape(len(devices), 1, 1), (AXIS_DATA, AXIS_SEQ, AXIS_MODEL))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, extra_axes: int = 0) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; rest replicated."""
    return NamedSharding(mesh, P(AXIS_DATA, *([None] * extra_axes)))


def context_sharding(mesh: Mesh, ndim: int, token_axis: int = 1) -> NamedSharding:
    """Batch over ``data`` and the token axis over ``seq`` (sequence parallel)."""
    spec = [None] * ndim
    spec[0] = AXIS_DATA
    spec[token_axis] = AXIS_SEQ
    return NamedSharding(mesh, P(*spec))


# ---------------------------------------------------------------- parameters

# Megatron-style tensor-parallel rules for HealNet parameter leaves: column-
# parallel projections split their OUTPUT features over `model`; the following
# row-parallel projections split their INPUT features, and XLA inserts the
# psum on their output.
_COL_PARALLEL_SUFFIXES = ("to_q/kernel", "to_kv/kernel", "net_0/kernel")
_ROW_PARALLEL_SUFFIXES = ("to_out/kernel", "net_2/kernel")


def param_spec(path: str) -> P:
    for suffix in _COL_PARALLEL_SUFFIXES:
        if path.endswith(suffix):
            return P(None, AXIS_MODEL)
    for suffix in _ROW_PARALLEL_SUFFIXES:
        if path.endswith(suffix):
            return P(AXIS_MODEL, None)
    return P()


def _leaf_path(keypath) -> str:
    parts = []
    for k in keypath:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding pytree for a HealNet param tree (TP rules or replicated)."""

    def leaf_sharding(keypath, leaf):
        if not tensor_parallel:
            return NamedSharding(mesh, P())
        spec = param_spec(_leaf_path(keypath))
        # guard: only shard dims that divide evenly
        sizes = dict(mesh.shape)
        ok = True
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % sizes[axis] != 0:
                ok = False
        return NamedSharding(mesh, spec if ok else P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
