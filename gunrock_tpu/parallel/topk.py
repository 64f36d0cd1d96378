"""Multi-chip TopK degree centrality.

Per-shard local ``top_k`` over owned degrees, one k-sized all_gather,
global ``top_k`` of the p*k candidates — the classic distributed top-k
reduction (the reference's single-GPU CUB sort, ``topk_enactor.cuh:133``,
has no multi-GPU analogue; comm is O(p*k), not O(V)).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..enactor import Timer
from ..graph.csr import CsrGraph
from ..utils.info import make_info
from .mesh import AXIS, make_mesh
from .partition import partition

__all__ = ["topk_sharded", "ShardedTopkResult"]


@dataclasses.dataclass
class ShardedTopkResult:
    node_ids: np.ndarray      # (k,) int32, original vertex ids
    centralities: np.ndarray  # (k,) int32 (out_deg + in_deg)
    info: dict


def topk_sharded(graph: CsrGraph, k: int = 10, *, num_shards: int = None,
                 partition_method: str = "random", seed: int = 0,
                 mesh: Optional[Mesh] = None) -> ShardedTopkResult:
    timer = Timer()
    if mesh is None:
        mesh = make_mesh(num_shards)
    num_shards = mesh.devices.size
    k = min(k, graph.num_nodes)

    with timer.time("partition_ms"):
        pg, perm = partition(graph, num_shards, method=partition_method,
                             seed=seed, with_csc=True)
        vmask_new = np.zeros(pg.v_global_pad, bool)
        vmask_new[perm] = True

    S = pg.shard_size
    p = pg.num_shards
    kk = min(k, S)

    def shard_fn(row, csc_row, vmask_local):
        row = row.reshape(-1)
        csc_row = csc_row.reshape(-1)
        vmask_local = vmask_local.reshape(-1)
        deg = (row[1:] - row[:-1]) + (csc_row[1:] - csc_row[:-1])
        cent = jnp.where(vmask_local, deg.astype(jnp.int32), -1)
        vals, ids = jax.lax.top_k(cent, kk)
        base = jax.lax.axis_index(AXIS) * S
        gids = jnp.where(vals >= 0, ids + base, -1)
        # (p*kk,) candidate pool on every shard, global top-k of it.
        av = jax.lax.all_gather(vals, AXIS).reshape(-1)
        ai = jax.lax.all_gather(gids, AXIS).reshape(-1)
        gv, gpos = jax.lax.top_k(av, k)
        return ai[gpos], gv

    # check_vma=False: the outputs ARE replicated (each shard computes
    # the same global top-k from the all_gathered pool), but the
    # varying-manual-axes analysis can't infer it through top_k.
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=(P(), P()), check_vma=False))
    with timer.time("process_ms"):
        ids_new, vals = jax.block_until_ready(fn(
            pg.row_offsets, pg.csc_offsets,
            jnp.asarray(vmask_new).reshape(p, S)))

    # Stitch back to original ids (inverse of the relabeling perm).
    inv = np.empty(pg.v_global_pad, np.int64)
    inv[:] = -1
    inv[perm] = np.arange(graph.num_nodes)
    ids_np = np.asarray(ids_new)
    ids_orig = np.where(ids_np >= 0, inv[np.clip(ids_np, 0, None)], -1)
    info = make_info(
        primitive="topk_sharded", graph=graph, timer=timer,
        edges_visited=graph.num_edges,
        extra={"num_shards": int(num_shards), "top_nodes": int(k),
               "partition_method": partition_method,
               "comm_bytes_per_superstep": int(p * kk * 8)},
    )
    return ShardedTopkResult(node_ids=ids_orig.astype(np.int32),
                             centralities=np.asarray(vals), info=info)
