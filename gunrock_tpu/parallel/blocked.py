"""Per-shard blocked kernel layouts for multi-chip execution.

Round 2's sharded pull/value steps were XLA edge-scale gathers — on real
TPUs those run ~110M elem/s, so an 8-chip run would lose to one chip on
the blocked Pallas kernels. This module builds the SAME blocked layouts
(graph/device.build_blocked_rect) per shard, stacked on a leading shard
axis so ``shard_map`` splits them across the mesh and every shard runs
the single-chip kernels (ops/pallas_kernels) over its local edges.

Reference parity: the multi-GPU path uses the same optimized kernels per
GPU (``enactor_loop.cuh:748`` FullQueue_Core ->
``oprtr/advance/kernel.cuh``); this is that property on TPU.

Two source-space flavors:
  * ``global``: table ids are global relabeled vertex ids (0..p*S) — the
    consumer all-gathers a global bitmask/value vector (DO-BFS pull,
    where the frontier ships as packed words anyway).
  * ghost-compact (table ids from ``PartitionedGraph.csc_local``): the
    table is ``[own 0..S | ghost slots]`` and fills from boundary-only
    exchanges (PR SpMV) — O(boundary) comm preserved.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.device import build_blocked_rect

__all__ = ["ShardedBlocked", "build_sharded_blocked",
           "build_sharded_blocked_from_lists", "blocked_from_partition",
           "local_layout"]

_EDGE_KEYS = ("bcsc_src", "bcsc_dst", "bcsc_val", "bcsc_csrc", "bcsc_cdst")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bcsc_src", "bcsc_dst", "bcsc_group_of_block",
                 "bcsc_sample_pos", "bcsc_sample_valid", "bcsc_wcell_pos",
                 "bcsc_csrc", "bcsc_cdst", "bcsc_cellword", "bcsc_val",
                 "bcsc_vsample_pos", "bcsc_vsample_valid"],
    meta_fields=["bcsc_groups", "bcsc_rows_per_group", "bcsc_block_rows",
                 "src_pad", "dst_pad"],
)
@dataclasses.dataclass(frozen=True)
class ShardedBlocked:
    """Stacked per-shard blocked layout. Field names mirror DeviceGraph's
    ``bcsc_*`` so the Pallas kernels duck-type over either; every data
    leaf carries a leading shard axis (strip it with
    :func:`local_layout` inside ``shard_map``)."""

    bcsc_src: jax.Array
    bcsc_dst: jax.Array
    bcsc_group_of_block: jax.Array
    bcsc_sample_pos: jax.Array
    bcsc_sample_valid: jax.Array
    bcsc_wcell_pos: jax.Array
    bcsc_csrc: Optional[jax.Array]
    bcsc_cdst: Optional[jax.Array]
    bcsc_cellword: Optional[jax.Array]
    bcsc_val: Optional[jax.Array]
    bcsc_vsample_pos: Optional[jax.Array]
    bcsc_vsample_valid: Optional[jax.Array]
    bcsc_groups: int
    bcsc_rows_per_group: int
    bcsc_block_rows: int
    src_pad: int          # table id space per shard (global or compact)
    dst_pad: int          # S — local result space

    @property
    def has_blocked_values(self) -> bool:
        return self.bcsc_vsample_pos is not None

    def specs(self, axis: str):
        """PartitionSpec pytree for shard_map in_specs."""
        from jax.sharding import PartitionSpec as P
        return jax.tree.map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), self)


def local_layout(blk: "ShardedBlocked") -> "ShardedBlocked":
    """Strip the leading shard axis inside shard_map (each shard sees a
    size-1 leading slice)."""
    return jax.tree.map(lambda x: x.reshape(x.shape[1:]), blk)


def build_sharded_blocked(src_new: np.ndarray, dst_new: np.ndarray,
                          vals: Optional[np.ndarray], num_shards: int,
                          S: int, *, src_pad: int,
                          block_rows: int = 1024, K: int = 32,
                          with_vertex_samples: bool = False
                          ) -> ShardedBlocked:
    """Build + stack per-shard layouts from the relabeled COO
    (global-src flavor). ``src_new/dst_new`` are global relabeled
    endpoints; shard i takes the edges with ``dst_new // S == i`` and
    reduces into local dst ``dst_new - i*S``."""
    owner = dst_new // S
    per_shard = []
    for i in range(num_shards):
        sel = owner == i
        per_shard.append((
            np.asarray(src_new[sel], np.int64),
            np.asarray(dst_new[sel] - i * S, np.int64),
            None if vals is None else np.asarray(vals[sel], np.float32)))
    return build_sharded_blocked_from_lists(
        per_shard, S, src_pad=src_pad, block_rows=block_rows, K=K,
        with_vertex_samples=with_vertex_samples)


def blocked_from_partition(pg, *, compact: bool = False,
                           edge_weight=None, block_rows: int = 256,
                           K: int = 8, with_vertex_samples: bool = False
                           ) -> ShardedBlocked:
    """Per-shard blocked layouts from a ``PartitionedGraph``'s CSC.

    ``compact=False`` (global flavor): table ids are global relabeled
    sources from ``csc_indices`` — the consumer all-gathers a global
    packed bitmask (DO-BFS pull). ``compact=True``: table ids come from
    ``csc_local`` (``[own | ghost slots]``) so the table fills from
    boundary-only exchanges (PR SpMV); requires
    ``partition(with_ghosts=True)``.

    ``edge_weight``: optional ``(src_global, dst_local, shard) -> f32``
    vectorized callable for per-edge values (e.g. PR's 1/outdeg(src) —
    static per graph, folded into the layout so the exchanged table
    holds plain ranks), or the string ``"csc"`` to take the partition's
    ``csc_edge_values`` (SSSP pull-relax weights).

    Defaults (block_rows=256, K=8) suit per-shard subgraphs, which are
    p× smaller than the single-chip graph; each group is padded to one
    block minimum, so oversized K wastes K*block_rows*128 edge slots.
    """
    if pg.csc_offsets is None:
        raise ValueError("blocked layouts need partition(with_csc=True)")
    if compact and not pg.has_ghosts:
        raise ValueError("compact layouts need partition(with_ghosts=True)")
    p, S = pg.num_shards, pg.shard_size
    csc_row = np.asarray(pg.csc_offsets)
    ids = np.asarray(pg.csc_local if compact else pg.csc_indices)
    gsrc = np.asarray(pg.csc_indices)
    if edge_weight == "csc":
        if pg.csc_edge_values is None:
            raise ValueError("edge_weight='csc' needs "
                             "partition(with_edge_values=True, with_csc)")
        cev = np.asarray(pg.csc_edge_values)
    if compact:
        src_pad = S + p * pg.ghost_cap
    else:
        src_pad = p * S
    per_shard = []
    for i in range(p):
        E = int(csc_row[i, -1])
        dst_local = np.repeat(np.arange(S, dtype=np.int64),
                              np.diff(csc_row[i]).astype(np.int64))
        ev = None
        if edge_weight == "csc":
            ev = cev[i, :E].astype(np.float32)
        elif edge_weight is not None:
            ev = np.asarray(edge_weight(gsrc[i, :E].astype(np.int64),
                                        dst_local, i), np.float32)
        per_shard.append((ids[i, :E].astype(np.int64), dst_local, ev))
    return build_sharded_blocked_from_lists(
        per_shard, S, src_pad=src_pad, block_rows=block_rows, K=K,
        with_vertex_samples=with_vertex_samples)


def build_sharded_blocked_from_lists(per_shard, S: int, *, src_pad: int,
                                     block_rows: int = 1024, K: int = 32,
                                     with_vertex_samples: bool = False
                                     ) -> ShardedBlocked:
    """Build + stack from explicit per-shard ``(src_ids, dst_local, ev)``
    triplets — the ghost-compact flavor passes table ids from
    ``PartitionedGraph.csc_local`` here."""
    num_shards = len(per_shard)
    builds = []
    for src_ids, dst_local, ev in per_shard:
        b = build_blocked_rect(
            src_ids, dst_local, ev, src_pad, S, block_rows,
            with_vertex_samples=with_vertex_samples, K=K)
        builds.append({k: (np.asarray(v) if hasattr(v, "shape") else v)
                       for k, v in b.items()})

    K_ = builds[0]["bcsc_groups"]
    rpg = builds[0]["bcsc_rows_per_group"]
    br = builds[0]["bcsc_block_rows"]
    assert all(b["bcsc_groups"] == K_ and b["bcsc_rows_per_group"] == rpg
               for b in builds), "shard layouts must agree on grouping"
    R = rpg * K_
    SENT = R * 128 * 32
    nwords = builds[0]["bcsc_sample_pos"].shape[1]
    pad_word_dst = (nwords - 1) * 32 + 31
    emax = max(b["bcsc_src"].shape[0] for b in builds)
    block_edges = br * 128
    emax = -(-emax // block_edges) * block_edges
    bmax = emax // block_edges

    def pad_edge(arr, fill):
        out = np.full(emax, fill, arr.dtype)
        out[: arr.shape[0]] = arr
        return out

    stacked = {}
    for key, fill in (("bcsc_src", SENT), ("bcsc_dst", pad_word_dst),
                      ("bcsc_csrc", SENT), ("bcsc_cdst", pad_word_dst),
                      ("bcsc_val", 0.0)):
        if key not in builds[0]:
            stacked[key] = None
            continue
        stacked[key] = jnp.asarray(np.stack(
            [pad_edge(b[key], fill) for b in builds]))
    if "bcsc_cellword" in builds[0]:
        def pad_cell(arr):
            out = np.full(emax // 32, nwords - 1, arr.dtype)
            out[: arr.shape[0]] = arr
            return out
        stacked["bcsc_cellword"] = jnp.asarray(np.stack(
            [pad_cell(b["bcsc_cellword"]) for b in builds]))
    else:
        stacked["bcsc_cellword"] = None
    gob = np.full((num_shards, bmax), K_ - 1, np.int32)
    for i, b in enumerate(builds):
        g = b["bcsc_group_of_block"]
        gob[i, : g.shape[0]] = g
    stacked["bcsc_group_of_block"] = jnp.asarray(gob)
    for key in ("bcsc_sample_pos", "bcsc_sample_valid", "bcsc_wcell_pos",
                "bcsc_vsample_pos", "bcsc_vsample_valid"):
        if key in builds[0]:
            stacked[key] = jnp.asarray(np.stack([b[key] for b in builds]))
        else:
            stacked[key] = None

    return ShardedBlocked(
        bcsc_groups=K_, bcsc_rows_per_group=rpg, bcsc_block_rows=br,
        src_pad=src_pad, dst_pad=S, **stacked)
