"""Multi-host data placement.

On a multi-host pod slice every process loads only its shard of the global
batch; :func:`global_batch_from_host_local` assembles the global sharded
arrays with ``jax.make_array_from_process_local_data`` (the TPU-native
replacement for the reference's per-GPU independent processes,
`run_plan.sh:17-21` / SURVEY.md §2.6). On a single host it degrades to the
plain mesh placement of :func:`healnet_tpu.parallel.train.put_batch`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh

from healnet_tpu.parallel.train import batch_shardings, put_batch


def global_batch_from_host_local(batch: Dict[str, Any], mesh: Mesh):
    """Per-process local batch shards -> global sharded device arrays.

    Each process passes its LOCAL slice of the batch (leading axis =
    global_batch / process_count); the returned arrays are global views
    sharded per :func:`batch_shardings`.
    """
    if jax.process_count() == 1:
        return put_batch(batch, mesh)
    shardings = batch_shardings(batch, mesh, batch_axis_factor=jax.process_count())

    def assemble(local, sharding):
        local = np.asarray(local)
        global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
        return jax.make_array_from_process_local_data(sharding, local, global_shape)

    return jax.tree_util.tree_map(assemble, batch, shardings)


def local_batch_rows(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in global order.

    The inverse of :func:`global_batch_from_host_local` for step OUTPUTS
    (per-sample risk scores): on a multi-process mesh ``np.asarray`` on a
    non-fully-addressable array raises, but each process only needs the rows
    matching its local batch metadata for the host-side c-index. Replicated
    secondary mesh axes produce duplicate shards — dedupe by row start.
    """
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    rows = {}
    for shard in arr.addressable_shards:
        start = shard.index[0].start or 0
        if start not in rows:
            rows[start] = np.asarray(shard.data)
    return np.concatenate([rows[k] for k in sorted(rows)])
