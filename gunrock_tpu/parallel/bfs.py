"""Multi-chip BFS: vertex-sharded BSP supersteps over a device mesh.

The TPU rebuild of the reference's multi-GPU BFS
(``gunrock/app/bfs/bfs_enactor.cuh`` BFSThread per GPU +
``enactor_loop.cuh`` stage machine): each superstep is

    local advance  ->  bucket by owner  ->  all-to-all  ->  merge

run under ``jax.shard_map`` with the whole traversal in one
``lax.while_loop`` — termination is a ``psum`` of frontier lengths
(the reference's ``All_Done`` quiescence check,
``enactor_helper.cuh:36-79``). One compiled program, no host round-trips,
no per-peer event machinery: XLA overlaps the all-to-all with local work.
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
from ..ops.advance import _expand_csr
from ..ops.segment import compact, dedup_winners, scatter_set
from ..utils.info import make_info
from .comm import bucket_by_owner, exchange, recv_mask
from .mesh import AXIS, make_mesh, pvary
from .partition import PartitionedGraph, partition

__all__ = ["bfs_sharded", "bfs_sharded_device", "ShardedBfsResult"]


@dataclasses.dataclass
class ShardedBfsResult:
    labels: np.ndarray
    preds: Optional[np.ndarray]
    info: dict


def _make_step(pg: PartitionedGraph, *, fcap: int, out_cap: int,
               per_peer_cap: int, mark_preds: bool, axis: str):
    S = pg.shard_size
    p = pg.num_shards

    def step(row, col, state):
        labels, preds, frontier, n, depth = state
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        my_base = my * S

        # --- local advance (SubQueue_Core analogue)
        ex = _expand_csr(row, col, frontier, n, out_cap)

        # --- Make_Output: bucket boundary candidates by owner shard
        owner = ex.dst // S
        payloads = [ex.dst]
        if mark_preds:
            payloads.append(my_base + ex.src)  # global pred ids
        bufs, counts, send_ovf = bucket_by_owner(
            owner, ex.mask, payloads, num_shards=p,
            per_peer_cap=per_peer_cap)

        # --- PushNeighbor: the all-to-all over ICI
        recv, rcounts = exchange(axis, bufs, counts)
        rmask = recv_mask(rcounts, per_peer_cap).reshape(-1)
        rdst = recv[0].reshape(-1)
        rsrc = recv[1].reshape(-1) if mark_preds else None

        # --- Expand_Incoming: merge into local labels
        lid = rdst - my_base
        safe = jnp.where(rmask, lid, 0)
        is_new = rmask & (labels[safe] == -1)
        keep = dedup_winners(safe, is_new, S)
        labels = scatter_set(labels, safe, depth, mask=keep)
        if mark_preds:
            preds = scatter_set(preds, safe, rsrc, mask=keep)
        frontier, n_local = compact(safe, keep, fcap)

        n_global = jax.lax.psum(n_local, axis)
        edges_global = jax.lax.psum(ex.total, axis)
        overflow = jax.lax.psum(
            (send_ovf | (ex.total > out_cap)).astype(jnp.int32), axis) > 0
        return (labels, preds, frontier, n_local, depth + 1), \
            n_global, edges_global, overflow

    return step


def _make_bfs_fn(pg: PartitionedGraph, *, fcap: int, out_cap: int,
                 per_peer_cap: int, mark_preds: bool, axis: str,
                 mesh: Mesh):
    S = pg.shard_size
    step = _make_step(pg, fcap=fcap, out_cap=out_cap,
                      per_peer_cap=per_peer_cap, mark_preds=mark_preds,
                      axis=axis)

    def shard_fn(row, col, src_new, max_iters):
        row = row.reshape(-1)          # (S+1,)
        col = col.reshape(-1)          # (E_shard,)
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        my_base = my * S
        owns_src = (src_new >= my_base) & (src_new < my_base + S)
        lsrc = jnp.where(owns_src, src_new - my_base, 0)

        lane = jnp.arange(S, dtype=jnp.int32)
        labels = jnp.where(owns_src & (lane == lsrc), 0, -1).astype(jnp.int32)
        preds = (jnp.full((S,), -1, jnp.int32) if mark_preds
                 else jnp.zeros((1,), jnp.int32))
        # Constant-initialized carries must be marked device-varying for
        # the while_loop VMA check under shard_map.
        preds = pvary(preds, axis)
        frontier = jnp.zeros((fcap,), jnp.int32).at[0].set(lsrc)
        n = jnp.where(owns_src, 1, 0).astype(jnp.int32)

        def cond(carry):
            state, n_global, it, edges, ovf = carry
            return (n_global > 0) & (it < max_iters) & (~ovf)

        def body(carry):
            state, _, it, edges, ovf = carry
            new_state, n_global, e_it, overflow = step(row, col, state)
            return (new_state, n_global, it + 1,
                    edges + e_it.astype(jnp.float32), ovf | overflow)

        state0 = (labels, preds, frontier, n, jnp.int32(1))
        init = (state0, jnp.int32(1), jnp.int32(0), jnp.float32(0),
                jnp.bool_(False))
        (final, _, iters, edges, ovf) = jax.lax.while_loop(cond, body, init)
        labels, preds, _, _, _ = final
        return labels, preds, iters, edges, ovf

    in_specs = (P(AXIS, None), P(AXIS, None), P(), P())
    out_specs = (P(AXIS), P(AXIS) if mark_preds else P(AXIS), P(), P(), P())
    return jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))


def bfs_sharded_device(pg: PartitionedGraph, src_new: int, *,
                       mesh: Optional[Mesh] = None,
                       mark_preds: bool = False,
                       queue_sizing: float = 1.0,
                       in_sizing: float = 1.0,
                       max_iters: Optional[int] = None):
    """Run sharded BFS in relabeled id space; returns device arrays
    (labels over p*S relabeled vertices, preds, iters, edges, overflow)."""
    if mesh is None:
        mesh = make_mesh(pg.num_shards)
    fcap = max(128, int(pg.shard_size * min(queue_sizing, 1.0)))
    out_cap = max(128, int(pg.e_shard_pad * min(queue_sizing, 1.0)))
    per_peer_cap = max(128, int(out_cap * min(in_sizing, 1.0)))
    if max_iters is None:
        max_iters = pg.num_nodes + 1
    fn = _make_bfs_fn(pg, fcap=fcap, out_cap=out_cap,
                      per_peer_cap=per_peer_cap, mark_preds=mark_preds,
                      axis=AXIS, mesh=mesh)
    return fn(pg.row_offsets, pg.col_indices, jnp.int32(src_new),
              jnp.int32(max_iters))


def bfs_sharded(graph: CsrGraph, src: int = 0, *, num_shards: int = None,
                partition_method: str = "random", seed: int = 0,
                mark_preds: bool = False, mesh: Optional[Mesh] = None,
                queue_sizing: float = 1.0, in_sizing: float = 1.0,
                max_iters: Optional[int] = None) -> ShardedBfsResult:
    """Partition ``graph`` and run BFS across the mesh; returns results in
    original vertex ids (the reference's Extract stitches sub-GPU results
    via ``original_vertex`` tables, ``bfs_problem.cuh:518``)."""
    timer = Timer()
    if mesh is None:
        mesh = make_mesh(num_shards)
    num_shards = mesh.devices.size
    if not 0 <= int(src) < graph.num_nodes:
        raise ValueError(f"src {src} out of range [0, {graph.num_nodes})")

    with timer.time("partition_ms"):
        pg, perm = partition(graph, num_shards, method=partition_method,
                             seed=seed)
    with timer.time("process_ms"):
        labels, preds, iters, edges, ovf = jax.block_until_ready(
            bfs_sharded_device(pg, int(perm[src]), mesh=mesh,
                               mark_preds=mark_preds,
                               queue_sizing=queue_sizing,
                               in_sizing=in_sizing, max_iters=max_iters))

    labels_new = np.asarray(labels)
    labels_old = labels_new[perm]
    preds_old = None
    if mark_preds:
        inv = np.full(pg.v_global_pad, -1, np.int64)
        inv[perm] = np.arange(graph.num_nodes)
        preds_new = np.asarray(preds)[perm]
        preds_old = np.where(preds_new >= 0, inv[np.maximum(preds_new, 0)],
                             -1).astype(np.int32)

    degs = np.diff(graph.row_offsets).astype(np.int64)
    info = make_info(
        primitive="bfs_sharded", graph=graph, timer=timer,
        edges_visited=int(degs[labels_old >= 0].sum()),
        extra={"src": int(src), "num_shards": int(num_shards),
               "partition_method": partition_method,
               "num_iterations": int(iters),
               "frontier_overflow": bool(ovf),
               "search_depth": int(labels_old.max(initial=0))},
    )
    return ShardedBfsResult(labels=labels_old, preds=preds_old, info=info)
