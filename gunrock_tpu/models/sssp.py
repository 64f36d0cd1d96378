"""Single-source shortest paths.

TPU-native rebuild of the reference SSSP primitive
(``gunrock/app/sssp/{sssp_problem,sssp_enactor,sssp_functor}.cuh``):
per-round advance relaxes ``dist[dst] = min(dist[dst], dist[src] + w)``
(functor ``sssp_functor.cuh:59-99``, atomicMin -> deterministic
scatter-min here), the filter dedups improved vertices into the next
frontier. Two scheduling modes:

  * ``mode='bellman'`` — plain advance+filter rounds: exactly what the
    reference snapshot ships (its near-far priority queue call is
    commented out, ``sssp_enactor.cuh:276-330``).
  * ``mode='nearfar'`` — the two-level near-far pile delta-stepping of
    ``gunrock/priority_queue/near_far_pile.cuh``: only vertices with
    ``dist < level * delta`` are relaxed each round; the "far pile" is a
    vertex activity mask re-split when the near bucket drains (the
    ``Bisect`` kernel becomes a masked compaction).

``delta_factor`` matches the C API knob (``gunrock/gunrock.h:98``):
``delta = delta_factor * average_edge_weight``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..enactor import (LoopStats, capacity_ladder, dispatch_by_size,
                       init_stats, record_iteration, Timer)
from ..graph.csr import CsrGraph
from ..graph.device import DeviceGraph, to_device
from ..ops.advance import expand
from ..ops.segment import frontier_from_mask, scatter_min
from ..utils.info import make_info

__all__ = ["sssp", "SsspResult", "sssp_device"]

INF = jnp.float32(jnp.inf)


@dataclasses.dataclass
class SsspResult:
    distances: np.ndarray          # (V,) float32, +inf unreachable
    preds: Optional[np.ndarray]    # (V,) int32 shortest-path tree parent
    info: dict


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["dist", "frontier", "n", "m_f", "active", "level",
                 "stats"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _State:
    dist: jax.Array       # (v_pad,) float32
    frontier: jax.Array   # (fcap,) int32 (sorted ascending, actives first)
    n: jax.Array          # () int32
    m_f: jax.Array        # () int32 — frontier degree sum (next dispatch)
    active: jax.Array     # (v_pad,) bool — improved but not yet relaxed
    level: jax.Array      # () float32 — near/far split threshold
    stats: LoopStats


def _relax(graph: DeviceGraph, state: _State, cap: int):
    """One advance relaxation over the (sorted) frontier.

    All expansion gathers are monotonic (sorted frontier); the one
    irregular write is the scatter-min into distances. Improvement is
    detected by a dense vertex-scale compare against the previous
    distances — no dedup chains, no per-lane winner resolution (the
    reference's atomicMin race bookkeeping disappears).
    """
    fcap = state.frontier.shape[0]
    fr = jnp.where(jnp.arange(fcap, dtype=jnp.int32) < state.n,
                   state.frontier, graph.v_pad - 1)
    ex = expand(graph, fr, state.n, cap, sorted_frontier=True)
    dist_f = jnp.take(state.dist, fr, indices_are_sorted=True)
    w = jnp.take(graph.edge_values, ex.eid, indices_are_sorted=True)
    cand = jnp.where(ex.mask, dist_f[ex.rank] + w, INF)
    dist = scatter_min(state.dist, ex.dst, cand, mask=ex.mask)
    return dist, ex.total, ex.total > cap


def _next_frontier(graph, improved, fcap):
    frontier, n = frontier_from_mask(improved, fcap)
    deg = graph.row_offsets[1:] - graph.row_offsets[:-1]
    m_f = jnp.sum(jnp.where(improved, deg, 0))
    return frontier, n, m_f


def _make_bellman_branch(graph, fcap):
    def make(cap):
        def step(state: _State):
            dist, edges, overflow = _relax(graph, state, cap)
            improved = dist < state.dist
            frontier, n, m_f = _next_frontier(graph, improved, fcap)
            overflow = overflow | (n > fcap)
            return dist, frontier, n, m_f, state.active, state.level, \
                edges, overflow
        return step
    return make


def _make_nearfar_branch(graph, fcap, delta):
    def make(cap):
        def step(state: _State):
            dist, edges, overflow = _relax(graph, state, cap)
            # Improved vertices enter the pile; the near bucket (below
            # the current threshold) becomes the next frontier
            # (priority_queue Bisect, near_far_pile.cuh:35-60).
            active = state.active | (dist < state.dist)
            near = active & (dist < state.level)
            active = active & ~near

            # Bucket empty -> advance the threshold until work appears
            # or the pile drains (dense vertex-scale ops only).
            def advance(args):
                lvl, near, active = args
                def body(a):
                    lvl, near, act = a
                    lvl = lvl + delta
                    nr = act & (dist < lvl)
                    return lvl, nr, act & ~nr
                def cond(a):
                    lvl, nr, act = a
                    return (~jnp.any(nr)) & jnp.any(act)
                return jax.lax.while_loop(cond, body, args)

            level, near, active = jax.lax.cond(
                jnp.any(near), lambda a: a, advance,
                (state.level, near, active))
            frontier, n, m_f = _next_frontier(graph, near, fcap)
            overflow = overflow | (n > fcap)
            return dist, frontier, n, m_f, active, level, edges, overflow
        return step
    return make


def _sssp_loop(graph: DeviceGraph, src: jax.Array, max_iters: jax.Array, *,
               fcap: int, caps: tuple[int, ...], mark_preds: bool,
               mode: str, delta: float):
    v_pad = graph.v_pad
    dist = jnp.full((v_pad,), INF, jnp.float32).at[src].set(0.0)
    frontier = jnp.full((fcap,), v_pad - 1, jnp.int32).at[0].set(src)

    if mode == "nearfar":
        branch = _make_nearfar_branch(graph, fcap, delta)
    else:
        branch = _make_bellman_branch(graph, fcap)

    def cond(state: _State):
        return (state.n > 0) & (state.stats.iteration < max_iters) & \
               (~state.stats.overflow)

    def body(state: _State):
        dist, frontier, n, m_f, active, level, edges, overflow = \
            dispatch_by_size(state.m_f, caps, branch, state)
        stats = record_iteration(state.stats, frontier_len=n, edges=edges,
                                 overflow=overflow)
        return _State(dist=dist, frontier=frontier, n=n, m_f=m_f,
                      active=active, level=level, stats=stats)

    init = _State(
        dist=dist, frontier=frontier, n=jnp.int32(1),
        m_f=(graph.row_offsets[src + 1] - graph.row_offsets[src]),
        active=jnp.zeros((v_pad,), jnp.bool_),
        level=jnp.float32(delta if mode == "nearfar" else 0.0),
        stats=init_stats(),
    )
    final = jax.lax.while_loop(cond, body, init)
    preds = jnp.zeros((1,), jnp.int32)
    if mark_preds:
        preds = _fill_preds(graph, final.dist)
    return final.dist, preds, final.stats


def _fill_preds(graph: DeviceGraph, dist: jax.Array) -> jax.Array:
    """Post-hoc shortest-path-tree parents: pred(v) = last in-neighbor u
    (CSC order) with dist[u] + w(u,v) == dist[v]. Exact float equality
    holds because dist[v] was produced as exactly that sum by the
    deterministic scatter-min. One pass, outside the loop."""
    v_pad = graph.v_pad
    dst_of_edge = graph.csc_edge_dst.clip(0, v_pad - 1)
    hit = (dist[graph.csc_indices] + graph.csc_edge_values ==
           dist[dst_of_edge])
    pos = jnp.where(hit, jnp.arange(graph.e_pad, dtype=jnp.int32), -1)
    best = jax.lax.cummax(pos)
    bpos0 = jnp.concatenate([jnp.full((1,), -1, jnp.int32), best])
    last = jnp.take(bpos0, graph.csc_offsets[1:], indices_are_sorted=True)
    start = graph.csc_offsets[:-1]
    ok = jnp.isfinite(dist[:v_pad]) & (dist[:v_pad] > 0) & (last >= start)
    return jnp.where(ok, graph.csc_indices[jnp.maximum(last, 0)], -1)


_sssp_jit = jax.jit(
    _sssp_loop,
    static_argnames=("fcap", "caps", "mark_preds", "mode", "delta"),
)


def sssp_device(graph: DeviceGraph, src, *, mark_preds: bool = False,
                mode: str = "bellman", delta: float = 1.0,
                queue_sizing: float = 1.0,
                max_iters: Optional[int] = None):
    if not graph.has_edge_values:
        raise ValueError("SSSP needs to_device(with_edge_values=True)")
    fcap = max(128, int(graph.v_pad * min(queue_sizing, 1.0)))
    out_cap = max(128, int(graph.e_pad * min(queue_sizing, 1.0)))
    caps = tuple(capacity_ladder(out_cap))
    if max_iters is None:
        max_iters = 4 * graph.num_nodes + 16
    return _sssp_jit(graph, jnp.int32(src), jnp.int32(max_iters),
                     fcap=fcap, caps=caps, mark_preds=mark_preds,
                     mode=mode, delta=float(delta))


def sssp(graph: Union[CsrGraph, DeviceGraph], src: Union[int, str] = 0, *,
         mark_preds: bool = False, mode: str = "bellman",
         delta_factor: float = 32.0, queue_sizing: float = 1.0,
         max_iters: Optional[int] = None) -> SsspResult:
    """Run SSSP from ``src`` (C API parity: ``gunrock_sssp``,
    ``gunrock.h:253``; ``mark_preds`` = MARK_PATHS)."""
    timer = Timer()
    num_nodes = graph.num_nodes
    delta = 1.0
    if isinstance(graph, CsrGraph):
        if src == "largestdegree":
            src = graph.largest_degree_vertex()
        if graph.edge_values is None:
            graph.random_edge_values()
        if graph.num_edges:
            delta = delta_factor * float(np.mean(graph.edge_values))
        with timer.time("preprocess_ms"):
            dgraph = to_device(graph, with_edge_values=True,
                               with_csc=mark_preds)
    else:
        dgraph = graph
    src = int(src)
    if not 0 <= src < num_nodes:
        raise ValueError(f"src {src} out of range [0, {num_nodes})")

    with timer.time("process_ms"):
        dist, preds, stats = jax.block_until_ready(
            sssp_device(dgraph, src, mark_preds=mark_preds, mode=mode,
                        delta=delta, queue_sizing=queue_sizing,
                        max_iters=max_iters))

    dist_np = np.asarray(dist)[:num_nodes]
    preds_np = np.asarray(preds)[:num_nodes] if mark_preds else None
    reached = np.isfinite(dist_np)
    degs = np.diff(np.asarray(dgraph.row_offsets)[:num_nodes + 1]).astype(np.int64)
    info = make_info(
        primitive="sssp", graph=dgraph, stats=stats, timer=timer,
        edges_visited=int(degs[reached].sum()),
        extra={"src": src, "mark_paths": mark_preds, "mode": mode,
               "search_depth": int(stats.iteration)},
    )
    return SsspResult(distances=dist_np, preds=preds_np, info=info)
