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
from ..ops.segment import compact, dedup_winners, scatter_min, scatter_set
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
    data_fields=["dist", "preds", "frontier", "n", "active", "level",
                 "stats"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _State:
    dist: jax.Array       # (v_pad,) float32
    preds: jax.Array      # (v_pad,) or (1,) int32
    frontier: jax.Array   # (fcap,) int32
    n: jax.Array          # () int32
    active: jax.Array     # (v_pad,) bool — improved but not yet relaxed
    level: jax.Array      # () float32 — near/far split threshold
    stats: LoopStats


def _relax(graph: DeviceGraph, state: _State, cap: int, fcap: int,
           mark_preds: bool):
    """One advance+filter relaxation round over the current frontier."""
    ex = expand(graph, state.frontier, state.n, cap)
    w = graph.edge_values[ex.eid]
    cand = jnp.where(ex.mask, state.dist[ex.src] + w, INF)
    dist_old = state.dist[ex.dst]
    dist = scatter_min(state.dist, ex.dst, cand, mask=ex.mask)
    improved = ex.mask & (cand < dist_old)
    # A lane's dst re-enters the frontier iff the final (post-reduction)
    # distance changed; winner lane = the one matching the final value
    # (deterministic pred, unlike the reference's atomicMin race).
    final = dist[ex.dst]
    winner = dedup_winners(ex.dst, improved & (cand == final), graph.v_pad)
    preds = state.preds
    if mark_preds:
        preds = scatter_set(preds, ex.dst, ex.src, mask=winner)
    changed = dedup_winners(ex.dst, improved, graph.v_pad)
    return dist, preds, ex.dst, changed, ex.total, ex.total > cap


def _make_bellman_branch(graph, fcap, mark_preds):
    def make(cap):
        def step(state: _State):
            dist, preds, dsts, changed, edges, overflow = _relax(
                graph, state, cap, fcap, mark_preds)
            frontier, n = compact(dsts, changed, fcap)
            return dist, preds, frontier, n, state.active, state.level, \
                edges, overflow
        return step
    return make


def _make_nearfar_branch(graph, fcap, mark_preds, delta):
    def make(cap):
        def step(state: _State):
            dist, preds, dsts, changed, edges, overflow = _relax(
                graph, state, cap, fcap, mark_preds)
            # Mark improved vertices active (they sit in the pile until
            # their bucket comes up).
            active = state.active.at[
                jnp.where(changed, dsts, graph.v_pad)
            ].set(True, mode="drop")
            # Near bucket: active vertices below the current threshold
            # (priority_queue Bisect, near_far_pile.cuh:35-60).
            verts = jnp.arange(graph.v_pad, dtype=jnp.int32)
            near = active & (dist < state.level)
            frontier, n = compact(verts, near, fcap)
            # Drain processed vertices from the pile.
            active = active & ~near
            # Bucket empty -> advance the threshold until work appears or
            # the pile drains entirely.
            def advance_level(args):
                lvl, frontier, n, active = args
                def body(a):
                    lvl, f, n, act = a
                    lvl = lvl + delta
                    near = act & (dist < lvl)
                    f, n = compact(verts, near, fcap)
                    return lvl, f, n, act & ~near
                def cond(a):
                    lvl, f, n, act = a
                    return (n == 0) & jnp.any(act)
                return jax.lax.while_loop(cond, body, (lvl, frontier, n,
                                                       active))
            level, frontier, n, active = jax.lax.cond(
                n == 0, advance_level, lambda a: a,
                (state.level, frontier, n, active))
            return dist, preds, frontier, n, active, level, edges, overflow
        return step
    return make


def _sssp_loop(graph: DeviceGraph, src: jax.Array, max_iters: jax.Array, *,
               fcap: int, caps: tuple[int, ...], mark_preds: bool,
               mode: str, delta: float):
    v_pad = graph.v_pad
    dist = jnp.full((v_pad,), INF, jnp.float32).at[src].set(0.0)
    # Padded vertices must stay +inf-distant; they do (never a dst).
    preds = (jnp.full((v_pad,), -1, jnp.int32) if mark_preds
             else jnp.zeros((1,), jnp.int32))
    frontier = jnp.zeros((fcap,), jnp.int32).at[0].set(src)

    if mode == "nearfar":
        branch = _make_nearfar_branch(graph, fcap, mark_preds, delta)
    else:
        branch = _make_bellman_branch(graph, fcap, mark_preds)

    def cond(state: _State):
        return (state.n > 0) & (state.stats.iteration < max_iters) & \
               (~state.stats.overflow)

    def body(state: _State):
        lane = jnp.arange(state.frontier.shape[0], dtype=jnp.int32)
        valid = lane < state.n
        f = jnp.where(valid, state.frontier, 0)
        m_f = jnp.sum(jnp.where(
            valid, graph.row_offsets[f + 1] - graph.row_offsets[f], 0))
        dist, preds, frontier, n, active, level, edges, overflow = \
            dispatch_by_size(m_f, caps, branch, state)
        stats = record_iteration(state.stats, frontier_len=n, edges=edges,
                                 overflow=overflow)
        return _State(dist=dist, preds=preds, frontier=frontier, n=n,
                      active=active, level=level, stats=stats)

    init = _State(
        dist=dist, preds=preds, frontier=frontier, n=jnp.int32(1),
        active=jnp.zeros((v_pad,), jnp.bool_),
        level=jnp.float32(delta if mode == "nearfar" else 0.0),
        stats=init_stats(),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.dist, final.preds, final.stats


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
            dgraph = to_device(graph, with_edge_values=True)
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
