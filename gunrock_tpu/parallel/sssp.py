"""Multi-chip SSSP: sharded relaxation supersteps with distance
associates, near-far delta-stepping, and kernel-grade pull-relax.

Mirrors the reference's multi-GPU SSSP which exchanges distances as
value-associates with boundary vertices each superstep
(``app/sssp/sssp_enactor.cuh:666``):

  push:  local relax -> bucket (dst, cand) pairs by owner -> all-to-all
         -> scatter-min merge
  pull:  boundary-only ghost exchange of (frontier-masked) distances ->
         per-shard blocked value kernel min(dist[u]+w) over local
         in-edges — the single-chip ``_pull_relax`` running unchanged
         per shard (the reference's per-GPU kernel-reuse property).

Scheduling modes match the single-chip zoo (``models/sssp.py``):
``bellman`` relaxes every improved vertex next round; ``nearfar`` keeps
a two-level near/far pile (``gunrock/priority_queue/near_far_pile.cuh``)
— here the threshold-advance "Bisect" is one global ``pmin`` over active
distances (every shard computes the identical new level; no spin).
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
from ..ops.segment import compact, dedup_winners, frontier_from_mask, \
    scatter_min, scatter_set
from ..utils.info import make_info
from .blocked import ShardedBlocked, blocked_from_partition, local_layout
from .comm import bucket_by_owner, exchange, ghost_exchange, recv_mask
from .mesh import AXIS, make_mesh, pvary
from .partition import PartitionedGraph, partition

__all__ = ["sssp_sharded", "sssp_sharded_device", "ShardedSsspResult"]

INF = jnp.float32(jnp.inf)


@dataclasses.dataclass
class ShardedSsspResult:
    distances: np.ndarray
    info: dict


def _make_sssp_fn(pg: PartitionedGraph, *, fcap: int, out_cap: int,
                  per_peer_cap: int, axis: str, mesh: Mesh,
                  mode: str = "bellman", delta: float = 1.0,
                  blocked: Optional[ShardedBlocked] = None,
                  pull_frac: int = 16, pallas_interpret: bool = False):
    S = pg.shard_size
    p = pg.num_shards
    G = pg.ghost_cap
    nearfar = mode == "nearfar"
    pull_edges = pg.num_edges // max(pull_frac, 1)

    def shard_fn(row, col, weights, send_idx, dist, frontier, n, active,
                 level, n_global0, it0, bytes0, it_stop, blk=None):
        row = row.reshape(-1)
        col = col.reshape(-1)
        weights = weights.reshape(-1)
        deg = row[1:] - row[:-1]
        blk_local = local_layout(blk) if blk is not None else None
        if blk is not None:
            send_idx = send_idx.reshape(p, G)
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        my_base = my * S
        n = n.reshape(())

        def push_step(dist, frontier, n):
            """Local relax -> owner-bucketed associate exchange ->
            scatter-min merge. Returns (dist, improved mask, overflow)."""
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
            new_dist = scatter_min(dist, safe,
                                   jnp.where(rmask, rcand, INF),
                                   mask=rmask)
            improved_lanes = rmask & (rcand < old)
            win = dedup_winners(safe, improved_lanes, S)
            imp = jnp.zeros((S,), jnp.bool_)
            imp = scatter_set(imp, safe, jnp.ones_like(win), mask=win)
            ovf = send_ovf | (ex.total > out_cap)
            sent = jnp.sum(counts) * 8
            return new_dist, imp, ovf, sent

        def pull_step(dist, frontier, n):
            """Frontier-masked distances through the boundary exchange,
            blocked value-kernel min over local in-edges (single-chip
            ``models/sssp._pull_relax`` per shard)."""
            from ..ops.pallas_kernels import pull_vertex_reduce
            fmask = jnp.zeros((S,), jnp.bool_)
            fr = jnp.where(jnp.arange(fcap, dtype=jnp.int32) < n,
                           frontier, 0)
            fmask = scatter_set(
                fmask, fr, jnp.ones((fcap,), jnp.bool_),
                mask=jnp.arange(fcap, dtype=jnp.int32) < n)
            masked = jnp.where(fmask, dist, INF)
            table = ghost_exchange(axis, masked, send_idx)
            cand = pull_vertex_reduce(table, blk_local, op="min",
                                      wmode="add",
                                      interpret=pallas_interpret)
            new_dist = jnp.minimum(dist, cand)
            imp = new_dist < dist
            sent = jnp.int32((p - 1) * G * 4)
            return new_dist, imp, jnp.bool_(False), sent

        def cond(carry):
            _, _, _, _, _, n_global, it, ovf, _ = carry
            return (n_global > 0) & (it < it_stop) & (~ovf)

        def body(carry):
            (dist, frontier, n, active, level, n_global, it, ovf,
             bytes_comm) = carry
            if blk is not None:
                m_f = jax.lax.psum(
                    jnp.sum(jnp.where(
                        jnp.arange(fcap, dtype=jnp.int32) < n,
                        deg[frontier], 0)), axis)
                dist, imp, step_ovf, sent = jax.lax.cond(
                    m_f > pull_edges,
                    lambda a: pull_step(*a),
                    lambda a: push_step(*a), (dist, frontier, n))
            else:
                dist, imp, step_ovf, sent = push_step(dist, frontier, n)

            if nearfar:
                # Improved vertices enter the pile; near bucket = below
                # the threshold. Empty bucket -> jump the level straight
                # past the global min active distance (one pmin replaces
                # the reference's Bisect re-split spin).
                active = active | imp
                near = active & (dist < level)
                any_near = jax.lax.psum(
                    jnp.sum(near.astype(jnp.int32)), axis) > 0
                gmin = jax.lax.pmin(
                    jnp.min(jnp.where(active, dist, INF)), axis)
                new_level = delta * (jnp.floor(gmin / delta) + 1.0)
                # float32 guard: the advanced threshold must clear gmin
                # STRICTLY (near uses dist < level), or the near bucket
                # stays empty and the loop exits with active vertices
                # unprocessed — the single-chip _bisect loops until near
                # is nonempty and can't exit early.
                new_level = jnp.where(new_level > gmin, new_level,
                                      jnp.nextafter(gmin, INF))
                new_level = jnp.where(jnp.isfinite(gmin), new_level,
                                      level)
                level = jnp.where(any_near, level, new_level)
                near = active & (dist < level)
                active = active & ~near
            else:
                near = imp

            frontier, n_local = frontier_from_mask(near, fcap)
            rebuild_ovf = n_local > fcap
            n_local = jnp.minimum(n_local, fcap)
            n_global = jax.lax.psum(n_local, axis)
            ovf = ovf | (jax.lax.psum(
                (step_ovf | rebuild_ovf).astype(jnp.int32), axis) > 0)
            bytes_comm = bytes_comm + jax.lax.psum(
                sent.astype(jnp.float32), axis)
            out = (dist, frontier, n_local, active, level, n_global,
                   it + 1, ovf, bytes_comm)
            # psum/pmin outputs and branch constants are axis-invariant;
            # keep the carry uniformly varying for the VMA check
            return jax.tree.map(lambda x: pvary(x, axis), out)

        init = (dist, frontier, n, active, level, n_global0, it0,
                jnp.bool_(False), bytes0)
        init = jax.tree.map(lambda x: pvary(x, axis), init)
        (dist, frontier, n, active, level, n_global, iters, ovf,
         bytes_comm) = jax.lax.while_loop(cond, body, init)
        # scalar outputs are identical on every shard but typed varying;
        # pmax re-establishes the replication proof for P() out_specs
        inv = lambda x: jax.lax.pmax(x.astype(jnp.float32)
                                     if x.dtype == jnp.bool_
                                     else x, axis)
        return (dist, frontier, n.reshape(1), active, inv(level),
                inv(n_global), inv(iters), inv(ovf) > 0, inv(bytes_comm))

    in_specs = [P(AXIS, None), P(AXIS, None), P(AXIS, None),
                P(AXIS, None, None),
                P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P(), P(),
                P()]
    if blocked is not None:
        in_specs.append(blocked.specs(AXIS))
    out_specs = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P(), P(),
                 P())
    return jax.jit(jax.shard_map(shard_fn, mesh=mesh,
                                 in_specs=tuple(in_specs),
                                 out_specs=out_specs,
                                 check_vma=blocked is None))


def sssp_sharded_device(pg: PartitionedGraph, src_new: int, *,
                        mesh: Optional[Mesh] = None,
                        queue_sizing: float = 1.0, in_sizing: float = 1.0,
                        max_iters: Optional[int] = None,
                        mode: str = "bellman", delta: float = 1.0,
                        blocked: Optional[ShardedBlocked] = None,
                        pull_frac: int = 16,
                        pallas_interpret: bool = False):
    if pg.edge_values is None:
        raise ValueError("sharded SSSP needs partition(with_edge_values=True)")
    if mode not in ("bellman", "nearfar"):
        raise ValueError(f"unknown sssp mode {mode!r}")
    if blocked is not None and not pg.has_ghosts:
        raise ValueError("blocked pull-relax needs partition("
                         "with_ghosts=True)")
    if mesh is None:
        mesh = make_mesh(pg.num_shards)
    fcap = max(128, int(pg.shard_size * min(queue_sizing, 1.0)))
    out_cap = max(128, int(pg.e_shard_pad * min(queue_sizing, 1.0)))
    per_peer_cap = max(128, int(out_cap * min(in_sizing, 1.0)))
    if max_iters is None:
        max_iters = 4 * pg.num_nodes + 16
    fn = _make_sssp_fn(pg, fcap=fcap, out_cap=out_cap,
                       per_peer_cap=per_peer_cap, axis=AXIS, mesh=mesh,
                       mode=mode, delta=float(delta), blocked=blocked,
                       pull_frac=pull_frac,
                       pallas_interpret=pallas_interpret)
    zero = jnp.zeros((pg.num_shards, 1, 1), jnp.int32)
    send_idx = pg.ghost_send_idx if pg.ghost_send_idx is not None else zero
    gargs = [pg.row_offsets, pg.col_indices, pg.edge_values, send_idx]

    # Host-side initial state: the source's owner shard holds the lone
    # frontier entry.
    S, p = pg.shard_size, pg.num_shards
    owner = int(src_new) // S
    dist = np.full((p * S,), np.inf, np.float32)
    dist[int(src_new)] = 0.0
    frontier = np.zeros((p * fcap,), np.int32)
    frontier[owner * fcap] = int(src_new) - owner * S
    n = np.zeros((p,), np.int32)
    n[owner] = 1
    active = np.zeros((p * S,), np.bool_)
    level = np.float32(delta if mode == "nearfar" else np.inf)
    state = (jnp.asarray(dist), jnp.asarray(frontier), jnp.asarray(n),
             jnp.asarray(active), jnp.asarray(level), jnp.int32(1),
             jnp.int32(0), jnp.float32(0))

    # Chunked enactment (single-chip models/sssp.py parity): bound each
    # device dispatch by rounds*out_cap edge-lanes so deep traversals
    # (thousands of near-far rounds) never exceed device-execution
    # limits in a single call.
    chunk = max(16, min(512, (1 << 31) // max(out_cap, 1)))
    while True:
        it0 = int(state[6])
        it_stop = jnp.int32(min(it0 + chunk, max_iters))
        args = gargs + list(state) + [it_stop]
        if blocked is not None:
            args.append(blocked)
        out = fn(*args)
        # out = (dist, frontier, n, active, level, n_global, it, ovf,
        #        bytes); resume state excludes ovf (sticky via retry).
        state, ovf = out[:7] + (out[8],), out[7]
        n_global, iters = int(state[5]), int(state[6])
        if n_global == 0 or bool(ovf) or iters >= max_iters:
            break
    return state[0], state[6], ovf, state[7]


def sssp_sharded(graph: CsrGraph, src: int = 0, *, num_shards: int = None,
                 partition_method: str = "random", seed: int = 0,
                 mesh: Optional[Mesh] = None, queue_sizing: float = 1.0,
                 in_sizing: float = 1.0,
                 max_iters: Optional[int] = None,
                 mode: str = "bellman", delta_factor: int = 32,
                 use_blocked: Optional[bool] = None,
                 pull_frac: int = 16,
                 pallas_interpret: bool = False) -> ShardedSsspResult:
    """Partition ``graph`` and run SSSP across the mesh.

    ``mode='nearfar'`` enables sharded delta-stepping with
    ``delta = delta_factor * mean(edge weight)`` (the C API knob,
    ``gunrock/gunrock.h:98``). ``use_blocked`` adds the kernel-grade
    pull-relax branch for large frontiers (default: TPU backends)."""
    timer = Timer()
    if mesh is None:
        mesh = make_mesh(num_shards)
    num_shards = mesh.devices.size
    if not 0 <= int(src) < graph.num_nodes:
        raise ValueError(f"src {src} out of range [0, {graph.num_nodes})")
    if graph.edge_values is None:
        graph.random_edge_values()
    if use_blocked is None:
        use_blocked = jax.default_backend() == "tpu" or pallas_interpret
    delta = float(delta_factor) * float(np.mean(graph.edge_values)) \
        if mode == "nearfar" else 1.0

    with timer.time("partition_ms"):
        pg, perm = partition(graph, num_shards, method=partition_method,
                             seed=seed, with_edge_values=True,
                             with_csc=use_blocked,
                             with_ghosts=use_blocked)
        blocked = None
        if use_blocked:
            blocked = blocked_from_partition(
                pg, compact=True, with_vertex_samples=True,
                edge_weight="csc")
    with timer.time("process_ms"):
        # Overflow auto-retry with doubled sizing (reference Check_Size
        # regrow, enactor_helper.cuh:103-138); sizing 1.0 cannot overflow.
        qs, ins = queue_sizing, in_sizing
        while True:
            dist, iters, ovf, comm_bytes = jax.block_until_ready(
                sssp_sharded_device(pg, int(perm[src]), mesh=mesh,
                                    queue_sizing=qs, in_sizing=ins,
                                    max_iters=max_iters, mode=mode,
                                    delta=delta, blocked=blocked,
                                    pull_frac=pull_frac,
                                    pallas_interpret=pallas_interpret))
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
               "mode": mode, "delta": delta if mode == "nearfar" else None,
               "blocked_kernels": bool(use_blocked),
               "comm_bytes": float(comm_bytes),
               "partition_method": partition_method},
    )
    return ShardedSsspResult(distances=dist_old, info=info)
