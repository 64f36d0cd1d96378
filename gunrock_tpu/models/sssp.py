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
    data_fields=["dist", "fmask", "n", "m_f", "active", "level",
                 "stats"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _State:
    dist: jax.Array       # (v_pad,) float32
    fmask: jax.Array      # (v_pad,) bool — current frontier as a mask
    n: jax.Array          # () int32
    m_f: jax.Array        # () int32 — frontier degree sum (next dispatch)
    active: jax.Array     # (v_pad,) bool — improved but not yet relaxed
    level: jax.Array      # () float32 — near/far split threshold
    stats: LoopStats


def _relax(graph: DeviceGraph, state: _State, cap: int, fcap: int):
    """One push advance relaxation over the frontier mask.

    The queue materializes from the mask (sorted by construction), so
    every expansion gather is monotonic; the one irregular write is the
    scatter-min into distances. Improvement is detected by a dense
    vertex-scale compare — no dedup chains, no per-lane winner
    resolution (the reference's atomicMin race bookkeeping disappears).
    """
    frontier, n0 = frontier_from_mask(state.fmask, fcap)
    # Input-side laddering: scan only the rung width, not the full queue
    # (the dispatch size is max(m_f, n), so the rung bounds n too).
    in_cap = min(cap, fcap)
    frontier = jax.lax.dynamic_slice(frontier, (0,), (in_cap,))
    ovf = n0 > in_cap
    n0 = jnp.minimum(n0, in_cap)
    fr = jnp.where(jnp.arange(in_cap, dtype=jnp.int32) < n0,
                   frontier, graph.v_pad - 1)
    ex = expand(graph, fr, n0, cap, sorted_frontier=True)
    dist_f = jnp.take(state.dist, fr, indices_are_sorted=True)
    w = jnp.take(graph.edge_values, ex.eid, indices_are_sorted=True)
    cand = jnp.where(ex.mask, dist_f[ex.rank] + w, INF)
    dist = scatter_min(state.dist, ex.dst, cand, mask=ex.mask)
    return dist, ex.total, (ex.total > cap) | ovf


def _pull_relax(graph: DeviceGraph, state: _State):
    """Full-edge pull relaxation through the blocked value kernel:
    cand[v] = min over in-edges of (dist[u] + w) with non-frontier
    sources masked to +inf in the VMEM table. Used when the frontier's
    edge volume makes a full pass cheaper than push scatters."""
    from ..ops.pallas_kernels import pull_vertex_reduce
    table = jnp.where(state.fmask, state.dist, INF)
    cand = pull_vertex_reduce(table, graph, op="min", wmode="add")
    dist = jnp.minimum(state.dist, cand)
    edges = jnp.int32(min(graph.num_edges, 2**31 - 1))
    return dist, edges, jnp.bool_(False)


def _mask_stats(graph, mask):
    # int32-clipped: jnp.sum promotes to int64 under x64 (--64bit-SizeT)
    i32 = lambda x: jnp.minimum(x, 2**31 - 1).astype(jnp.int32)
    n = i32(jnp.sum(mask.astype(jnp.int32)))
    deg = graph.row_offsets[1:] - graph.row_offsets[:-1]
    m_f = i32(jnp.sum(jnp.where(mask, deg, 0)))
    return n, m_f


def _make_bellman_branch(graph, fcap, use_pallas):
    def relax_dispatch(state, cap):
        if use_pallas and cap is None:
            return _pull_relax(graph, state)
        return _relax(graph, state, cap, fcap)

    def make(cap):
        def step(state: _State):
            dist, edges, overflow = relax_dispatch(state, cap)
            improved = dist < state.dist
            n, m_f = _mask_stats(graph, improved)
            return dist, improved, n, m_f, state.active, state.level, \
                edges, overflow
        return step
    return make


def _make_nearfar_branch(graph, fcap, delta, use_pallas):
    def make(cap):
        def step(state: _State):
            if use_pallas and cap is None:
                dist, edges, overflow = _pull_relax(graph, state)
            else:
                dist, edges, overflow = _relax(graph, state, cap, fcap)
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
            n, m_f = _mask_stats(graph, near)
            return dist, near, n, m_f, active, level, edges, overflow
        return step
    return make


def _sssp_loop(graph: DeviceGraph, state, upto: jax.Array,
               delta: jax.Array, *,
               fcap: int, caps: tuple[int, ...], mode: str,
               pallas: bool = False, init: bool = False):
    """Run relaxation rounds until convergence or ``upto`` iterations.

    Bounded so the host can enact in chunks (one compiled while_loop per
    chunk) — long traversals otherwise exceed device-execution limits,
    and this mirrors the reference's enactor driving rounds from the
    host."""
    if init:
        state = _sssp_init(graph, state, mode, delta)
    use_pallas = pallas and graph.has_blocked_values

    if mode == "nearfar":
        branch = _make_nearfar_branch(graph, fcap, delta, use_pallas)
    else:
        branch = _make_bellman_branch(graph, fcap, use_pallas)

    def cond(state: _State):
        return (state.n > 0) & (state.stats.iteration < upto) & \
               (~state.stats.overflow)

    def body(state: _State):
        if use_pallas:
            # Direction dispatch (reference DO vote analogue): a full
            # pull pass costs ~fixed; push costs ~m_f irregular ops.
            big = state.m_f > jnp.int32(
                max(1, min(graph.num_edges // 32, 2**30)))
            out = jax.lax.cond(
                big, branch(None),
                lambda st: dispatch_by_size(
                    jnp.maximum(st.m_f, st.n), caps, branch, st),
                state)
        else:
            out = dispatch_by_size(jnp.maximum(state.m_f, state.n), caps,
                                   branch, state)
        dist, fmask, n, m_f, active, level, edges, overflow = out
        stats = record_iteration(state.stats, frontier_len=n, edges=edges,
                                 overflow=overflow)
        return _State(dist=dist, fmask=fmask, n=n, m_f=m_f,
                      active=active, level=level, stats=stats)

    out = jax.lax.while_loop(cond, body, state)
    probe = jnp.stack([out.stats.iteration,
                       out.stats.overflow.astype(jnp.int32), out.n])
    return out, probe


def _sssp_init(graph: DeviceGraph, src: jax.Array, mode: str,
               delta: float) -> _State:
    v_pad = graph.v_pad
    return _State(
        dist=jnp.full((v_pad,), INF, jnp.float32).at[src].set(0.0),
        fmask=(jnp.arange(v_pad, dtype=jnp.int32) == src),
        n=jnp.int32(1),
        m_f=jnp.minimum(graph.row_offsets[src + 1] -
                        graph.row_offsets[src],
                        2**31 - 1).astype(jnp.int32),
        active=jnp.zeros((v_pad,), jnp.bool_),
        level=jnp.float32(delta if mode == "nearfar" else 0.0),
        stats=init_stats(),
    )


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
    # delta stays dynamic (a traced f32): sweeping it must not recompile.
    static_argnames=("fcap", "caps", "mode", "pallas", "init"),
)
_fill_preds_jit = None  # jitted lazily below


def sssp_device(graph: DeviceGraph, src, *, mark_preds: bool = False,
                mode: str = "bellman", delta: float = 1.0,
                queue_sizing: float = 1.0,
                max_iters: Optional[int] = None,
                chunk_iters: Optional[int] = None):
    if not graph.has_edge_values:
        raise ValueError("SSSP needs to_device(with_edge_values=True)")
    fcap = max(128, int(graph.v_pad * min(queue_sizing, 1.0)))
    out_cap = max(128, int(graph.e_pad * min(queue_sizing, 1.0)))
    caps = tuple(capacity_ladder(out_cap, step=4))
    if max_iters is None:
        max_iters = 4 * graph.num_nodes + 16
    use_pallas = (jax.default_backend() == "tpu" and
                  graph.has_blocked_values)
    if chunk_iters is None:
        # Bound each device call well under execution watchdogs: big
        # graphs relax at most a few full-edge rounds per call.
        chunk_iters = max(1, min(64, (1 << 27) // max(graph.e_pad, 1) * 8))
    def chunk(st, upto, first):
        return _sssp_jit(graph, st, jnp.int32(upto), jnp.float32(delta),
                         fcap=fcap, caps=caps, mode=mode,
                         pallas=use_pallas, init=first)

    # Chunked enactment (see bfs_device).
    upto = min(chunk_iters, max_iters)
    state, probe = chunk(jnp.int32(src), upto, True)
    while upto < max_iters:
        it, ovf, n = (int(x) for x in np.asarray(probe))
        if it < upto or ovf or n == 0:
            break
        upto = min(upto + chunk_iters, max_iters)
        state, probe = chunk(state, upto, False)
    preds = jnp.zeros((1,), jnp.int32)
    if mark_preds:
        preds = jax.jit(_fill_preds)(graph, state.dist)
    return state.dist, preds, state.stats


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
