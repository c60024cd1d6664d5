"""Mesh-sharded feature arena: WSI patch features beyond one chip's HBM.

The device-resident feature arena (`healnet_tpu.etl.TCGADataset.feature_arena`)
packs every slide's patch features into one (rows, dim) array uploaded to HBM
once; the jitted step gathers each bag with ``vmap(dynamic_slice)``
(`train/loop.py` ``_gather_arena``). Replicated per chip, the cohort is
limited to ONE chip's HBM (VERDICT r2 missing #3). This module shards the
arena's row axis over the mesh's ``seq`` axis — the KV-sharding design of
SURVEY.md §2.6 applied to the feature store — so an N-chip mesh holds an
~N x larger cohort.

Layout: rows pad to ``S * shard_rows``; each shard additionally carries a
``halo`` copy of the next shard's first ``halo`` rows (host-built, uploaded
with the arena — a one-time cost of ``S * halo * dim`` elements). Any
fixed-width gather window (width <= halo, guaranteed by the arena's
max_patches trailing pad) then lies entirely inside exactly ONE extended
shard. The gather is a ``shard_map``: the owner shard slices its local
extended block, non-owners contribute zeros, and a ``psum`` over ``seq``
(b x width x dim per batch — the gathered bag, never the arena) assembles
the full window. Bit-equal to the replicated gather: the same rows are
sliced, exactly one shard contributes, and adding zeros is exact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from healnet_tpu.parallel.mesh import AXIS_DATA, AXIS_SEQ


@jax.tree_util.register_pytree_node_class
class ShardedArena:
    """Row-sharded feature arena with per-shard halo.

    ``ext``: (S, shard_rows + halo, dim), sharded ``P(axis, None, None)``.
    Rides through jitted steps as a pytree (ext is the only array leaf).
    """

    def __init__(self, ext, shard_rows: int, halo: int, axis: str = AXIS_SEQ):
        self.ext = ext
        self.shard_rows = int(shard_rows)
        self.halo = int(halo)
        self.axis = axis

    def tree_flatten(self):
        return (self.ext,), (self.shard_rows, self.halo, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], *aux)

    @property
    def shape(self):  # (logical rows, dim) — mirrors the replicated arena
        s = self.ext.shape[0]
        return (s * self.shard_rows, self.ext.shape[2])


def build_sharded_arena(
    arena_host: np.ndarray,
    mesh: Mesh,
    halo: int,
    axis: str = AXIS_SEQ,
) -> ShardedArena:
    """Shard a host arena's rows over ``mesh[axis]`` with a halo per shard.

    ``halo`` must be >= the widest gather window (the dataset guarantees
    window width <= max_patches; pass that). Upload volume is
    ``rows + S * halo`` rows — the halo is marginal at WSI scale.
    """
    n_shards = int(dict(mesh.shape).get(axis, 1))
    rows, dim = arena_host.shape
    halo = int(halo)
    shard_rows = int(np.ceil(rows / n_shards))
    ext = np.zeros((n_shards, shard_rows + halo, dim), dtype=arena_host.dtype)
    for s in range(n_shards):
        lo = s * shard_rows
        hi = min(lo + shard_rows + halo, rows)
        if hi > lo:
            ext[s, : hi - lo] = arena_host[lo:hi]
    dev = jax.device_put(ext, NamedSharding(mesh, P(axis, None, None)))
    return ShardedArena(dev, shard_rows=shard_rows, halo=halo, axis=axis)


def build_device_arena(host, mesh: Mesh, halo: int, axis: str = AXIS_SEQ):
    """Halo'd row shards for a plain OR int8-quantized host arena.

    The one shared builder for the Pipeline's build-once path and the
    trainer's lazy path (drift between the two silently breaks gather
    parity). A ``QuantizedContext`` shards values and scales identically —
    the scales ride as a dim-1 column so the SAME halo'd gather applies to
    both (`ops/quantize.py`).
    """
    from healnet_tpu.ops.quantize import QuantizedContext

    if isinstance(host, QuantizedContext):
        return QuantizedContext(
            build_sharded_arena(np.asarray(host.data), mesh, halo=halo, axis=axis),
            build_sharded_arena(
                np.asarray(host.scale)[:, None], mesh, halo=halo, axis=axis
            ),
        )
    return build_sharded_arena(np.asarray(host), mesh, halo=halo, axis=axis)


def gather_sharded(
    arena: ShardedArena,
    offsets: jnp.ndarray,
    width: int,
    mesh: Mesh,
    data_axis: Any = AXIS_DATA,
) -> jnp.ndarray:
    """(b,) row offsets -> (b, width, dim) bag windows from the sharded arena.

    ``width`` is static (the bucket boundary); ``offsets`` is sharded over
    ``data_axis`` like the rest of the batch. Only the gathered windows cross
    the interconnect (psum over ``axis``), never arena rows.
    """
    if width > arena.halo:
        raise ValueError(
            f"gather width {width} exceeds the arena halo {arena.halo}; "
            "build the sharded arena with halo >= the widest bucket"
        )
    n_shards = arena.ext.shape[0]
    shard_rows = arena.shard_rows
    dim = arena.ext.shape[2]
    sizes = dict(mesh.shape)
    b_axis = (
        data_axis
        if offsets.shape[0] % max(sizes.get(data_axis, 1), 1) == 0
        else None
    )

    def local_fn(ext_local, offs):
        s = jax.lax.axis_index(arena.axis)
        block = ext_local[0]  # (shard_rows + halo, dim)

        def one(off):
            off = off.astype(jnp.int32)
            owner = jnp.minimum(off // shard_rows, n_shards - 1)
            # local offset is only meaningful on the owner shard (there it is
            # in [0, shard_rows) by construction); clip keeps non-owners legal
            lo = jnp.clip(off - s * shard_rows, 0, shard_rows - 1)
            win = jax.lax.dynamic_slice(block, (lo, 0), (width, dim))
            return win * (owner == s).astype(win.dtype)

        out = jax.vmap(one)(offs)
        if jnp.issubdtype(out.dtype, jnp.integer):
            # int8 arenas (quantized features): accumulate the psum in i32
            # — exactly one shard contributes so values stay in range, but
            # narrow-int all-reduce support varies by backend
            return jax.lax.psum(out.astype(jnp.int32), arena.axis).astype(
                out.dtype
            )
        return jax.lax.psum(out, arena.axis)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(arena.axis, None, None), P(b_axis)),
        out_specs=P(b_axis, None, None),
        check_vma=False,
    )(arena.ext, offsets)


def gather_bag(arena, offsets: jnp.ndarray, mask: jnp.ndarray, mesh=None):
    """(b,) row offsets -> (b, width, dim) zero-masked bag windows.

    The ONE definition of the on-device bag gather, shared by the trainer
    (`train/loop.py` arena mode) and the serving Predictor's arena path so
    the out-of-bag-row contract cannot drift between them. Handles every
    arena flavour:

    - plain array (replicated) -> ``vmap(dynamic_slice)``;
    - :class:`ShardedArena` -> :func:`gather_sharded` over ``mesh``;
    - ``QuantizedContext`` (`ops/quantize.py`) of either -> gathers int8
      values + f32 scales, zeroing out-of-bag rows via the width-sized SCALE
      (a zero-scale row dequantizes to exactly zero).

    ``mask`` is the (b, width) KV mask whose static trailing dim fixes the
    gather width; fp windows multiply by it so bag models that pool tokens
    unmasked (MCAT's bag net, MultiModN's PatchEncoder) see the host path's
    zero padding.
    """
    from healnet_tpu.ops.quantize import QuantizedContext

    width = mask.shape[1]
    offs = offsets.astype(jnp.int32)

    if isinstance(arena, QuantizedContext):
        if isinstance(arena.data, ShardedArena):
            q = gather_sharded(arena.data, offs, width, mesh)
            s = gather_sharded(arena.scale, offs, width, mesh)[..., 0]
        else:
            dim = arena.data.shape[1]

            def slice_q(off):
                return (
                    jax.lax.dynamic_slice(arena.data, (off, 0), (width, dim)),
                    jax.lax.dynamic_slice(arena.scale, (off,), (width,)),
                )

            q, s = jax.vmap(slice_q)(offs)
        return QuantizedContext(q, s * mask.astype(s.dtype))

    if isinstance(arena, ShardedArena):
        slide = gather_sharded(arena, offs, width, mesh)
    else:
        dim = arena.shape[1]

        def slice_one(off):
            return jax.lax.dynamic_slice(arena, (off, 0), (width, dim))

        slide = jax.vmap(slice_one)(offs)
    return slide * mask[..., None].astype(slide.dtype)
