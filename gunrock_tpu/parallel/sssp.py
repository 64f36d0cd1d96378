"""Multi-chip SSSP: sharded Bellman-Ford rounds with distance associates.

Mirrors the reference's multi-GPU SSSP which exchanges distances as
value-associates with boundary vertices each superstep
(``app/sssp/sssp_enactor.cuh:666``): local relax -> bucket (dst, cand)
pairs by owner -> all-to-all -> scatter-min merge -> new local frontier.
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
from ..ops.segment import compact, dedup_winners, scatter_min
from ..utils.info import make_info
from .comm import bucket_by_owner, exchange, recv_mask
from .mesh import AXIS, make_mesh
from .partition import PartitionedGraph, partition

__all__ = ["sssp_sharded", "sssp_sharded_device", "ShardedSsspResult"]

INF = jnp.float32(jnp.inf)


@dataclasses.dataclass
class ShardedSsspResult:
    distances: np.ndarray
    info: dict


def _make_sssp_fn(pg: PartitionedGraph, *, fcap: int, out_cap: int,
                  per_peer_cap: int, axis: str, mesh: Mesh):
    S = pg.shard_size
    p = pg.num_shards

    def shard_fn(row, col, weights, src_new, max_iters):
        row = row.reshape(-1)
        col = col.reshape(-1)
        weights = weights.reshape(-1)
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        my_base = my * S
        owns_src = (src_new >= my_base) & (src_new < my_base + S)
        lsrc = jnp.where(owns_src, src_new - my_base, 0)

        lane = jnp.arange(S, dtype=jnp.int32)
        dist = jnp.where(owns_src & (lane == lsrc), 0.0, INF)
        frontier = jnp.zeros((fcap,), jnp.int32).at[0].set(lsrc)
        n = jnp.where(owns_src, 1, 0).astype(jnp.int32)

        def cond(carry):
            _, _, _, n_global, it, ovf = carry
            return (n_global > 0) & (it < max_iters) & (~ovf)

        def body(carry):
            dist, frontier, n, _, it, ovf = carry
            ex = _expand_csr(row, col, frontier, n, out_cap)
            w = weights[ex.eid]
            cand = jnp.where(ex.mask, dist[ex.src] + w, INF)
            owner = ex.dst // S
            bufs, counts, send_ovf = bucket_by_owner(
                owner, ex.mask, [ex.dst, cand], num_shards=p,
                per_peer_cap=per_peer_cap)
            recv, rcounts = exchange(axis, bufs, counts)
            rmask = recv_mask(rcounts, per_peer_cap).reshape(-1)
            lid = recv[0].reshape(-1) - my_base
            rcand = recv[1].reshape(-1)
            safe = jnp.where(rmask, lid, 0)
            old = dist[safe]
            new_dist = scatter_min(dist, safe, jnp.where(rmask, rcand, INF),
                                   mask=rmask)
            improved = rmask & (rcand < old)
            changed = dedup_winners(safe, improved, S)
            frontier, n_local = compact(safe, changed, fcap)
            n_global = jax.lax.psum(n_local, axis)
            ovf = ovf | (jax.lax.psum(
                (send_ovf | (ex.total > out_cap)).astype(jnp.int32),
                axis) > 0)
            return new_dist, frontier, n_local, n_global, it + 1, ovf

        dist, _, _, _, iters, ovf = jax.lax.while_loop(
            cond, body,
            (dist, frontier, n, jnp.int32(1), jnp.int32(0),
             jnp.bool_(False)))
        return dist, iters, ovf

    in_specs = (P(AXIS, None), P(AXIS, None), P(AXIS, None), P(), P())
    out_specs = (P(AXIS), P(), P())
    return jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))


def sssp_sharded_device(pg: PartitionedGraph, src_new: int, *,
                        mesh: Optional[Mesh] = None,
                        queue_sizing: float = 1.0, in_sizing: float = 1.0,
                        max_iters: Optional[int] = None):
    if pg.edge_values is None:
        raise ValueError("sharded SSSP needs partition(with_edge_values=True)")
    if mesh is None:
        mesh = make_mesh(pg.num_shards)
    fcap = max(128, int(pg.shard_size * min(queue_sizing, 1.0)))
    out_cap = max(128, int(pg.e_shard_pad * min(queue_sizing, 1.0)))
    per_peer_cap = max(128, int(out_cap * min(in_sizing, 1.0)))
    if max_iters is None:
        max_iters = 4 * pg.num_nodes + 16
    fn = _make_sssp_fn(pg, fcap=fcap, out_cap=out_cap,
                       per_peer_cap=per_peer_cap, axis=AXIS, mesh=mesh)
    return fn(pg.row_offsets, pg.col_indices, pg.edge_values,
              jnp.int32(src_new), jnp.int32(max_iters))


def sssp_sharded(graph: CsrGraph, src: int = 0, *, num_shards: int = None,
                 partition_method: str = "random", seed: int = 0,
                 mesh: Optional[Mesh] = None, queue_sizing: float = 1.0,
                 in_sizing: float = 1.0,
                 max_iters: Optional[int] = None) -> ShardedSsspResult:
    timer = Timer()
    if mesh is None:
        mesh = make_mesh(num_shards)
    num_shards = mesh.devices.size
    if not 0 <= int(src) < graph.num_nodes:
        raise ValueError(f"src {src} out of range [0, {graph.num_nodes})")
    if graph.edge_values is None:
        graph.random_edge_values()

    with timer.time("partition_ms"):
        pg, perm = partition(graph, num_shards, method=partition_method,
                             seed=seed, with_edge_values=True)
    with timer.time("process_ms"):
        # Overflow auto-retry with doubled sizing (reference Check_Size
        # regrow, enactor_helper.cuh:103-138); sizing 1.0 cannot overflow.
        qs, ins = queue_sizing, in_sizing
        while True:
            dist, iters, ovf = jax.block_until_ready(
                sssp_sharded_device(pg, int(perm[src]), mesh=mesh,
                                    queue_sizing=qs,
                                    in_sizing=ins, max_iters=max_iters))
            if not bool(ovf) or (qs >= 1.0 and ins >= 1.0):
                break
            qs = min(qs * 2.0, 1.0)
            ins = min(ins * 2.0, 1.0)

    dist_old = np.asarray(dist)[perm]
    degs = np.diff(graph.row_offsets).astype(np.int64)
    info = make_info(
        primitive="sssp_sharded", graph=graph, timer=timer,
        edges_visited=int(degs[np.isfinite(dist_old)].sum()),
        extra={"src": int(src), "num_shards": int(num_shards),
               "num_iterations": int(iters),
               "frontier_overflow": bool(ovf),
               "partition_method": partition_method},
    )
    return ShardedSsspResult(distances=dist_old, info=info)
