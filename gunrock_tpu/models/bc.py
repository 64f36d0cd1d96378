"""Betweenness centrality (Brandes, forward + backward frontier passes).

TPU-native rebuild of the reference BC primitive
(``gunrock/app/bc/{bc_problem,bc_enactor,bc_functor}.cuh``): a BFS-like
forward phase accumulates per-vertex shortest-path counts ``sigma``
(atomicAdd in ``bc_functor.cuh:70-71`` -> deterministic scatter-add), then
a backward phase replays the BFS levels in reverse accumulating
dependencies ``delta[u] += sigma[u]/sigma[v] * (1 + delta[v])``
(``bc_functor.cuh:203-238``).

Where the reference stores per-iteration frontiers via
``forward_queue_offsets`` and replays them with a backward (pull) advance
over backward partition tables (``bc_enactor.cuh:1528-1870``), we sort
vertices by BFS depth once and slice per-level frontiers from the sorted
order — same replay, one argsort.

Both phases dispatch per level between frontier-proportional push and a
blocked value-kernel pull pass (``pallas=True`` — the direction-optimized
shape of DO-BFS applied to Brandes). The TPU path chunk-enacts bounded
level counts per device call (``_bc_hybrid``), the same discipline as
``bfs_device``/``sssp_device``, so deep-graph traversals stay under the
serving path's execution limits.

Outputs are scaled by 0.5 (undirected double-count), matching the
reference CPU validation (``tests/bc/test_bc.cu`` RefCPUBC).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..enactor import (LoopStats, Timer, capacity_ladder, dispatch_by_size,
                       init_stats, record_iteration)
from ..graph.csr import CsrGraph
from ..graph.device import DeviceGraph, to_device
from ..ops.advance import expand
from ..ops.segment import compact, dedup_winners, scatter_add, scatter_set
from ..utils.info import make_info

__all__ = ["bc", "BcResult", "bc_device"]


@dataclasses.dataclass
class BcResult:
    bc_values: np.ndarray    # (V,) float32 centrality
    sigmas: np.ndarray       # (V,) float32 shortest-path counts (last src)
    labels: np.ndarray       # (V,) int32 BFS depth (last src)
    info: dict


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["labels", "sigma", "frontier", "n", "stats"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _FwdState:
    labels: jax.Array
    sigma: jax.Array
    frontier: jax.Array
    n: jax.Array
    stats: LoopStats


def _frontier_edges(graph, frontier, n):
    lane = jnp.arange(frontier.shape[0], dtype=jnp.int32)
    valid = lane < n
    f = jnp.where(valid, frontier, 0)
    return jnp.sum(jnp.where(
        valid, graph.row_offsets[f + 1] - graph.row_offsets[f], 0))


def _make_forward_branch(graph: DeviceGraph, fcap: int):
    def make(cap: int):
        def step(state: _FwdState):
            depth = state.stats.iteration + 1
            ex = expand(graph, state.frontier, state.n, cap)
            is_new = ex.mask & (state.labels[ex.dst] == -1)
            keep = dedup_winners(ex.dst, is_new, graph.v_pad)
            labels = scatter_set(state.labels, ex.dst, depth, mask=keep)
            # Every lane landing on a depth-`depth` vertex contributes its
            # source's path count (Forward_Iteration, bc_functor.cuh:70).
            contrib = ex.mask & (labels[ex.dst] == depth)
            sigma = scatter_add(state.sigma, ex.dst, state.sigma[ex.src],
                                mask=contrib)
            frontier, n = compact(ex.dst, keep, fcap)
            return labels, sigma, frontier, n, ex.total, ex.total > cap
        return step
    return make


def _make_forward_branch_fused(graph: DeviceGraph, fcap: int,
                               use_pallas: bool):
    """Fused forward level (the SSSP `_relax` shape applied to Brandes):
    expand gather-free over the SORTED frontier, stream dst / source
    sigma through the Pallas samplers, then ONE (dst, contribution) sort
    + the destination-reduction kernel (op=sum) produce per-new-vertex
    sigma totals at distinct-destination scale — replacing the cap-scale
    claim-dedup + two label gathers + sigma scatter-add of the plain
    branch (the reference's atomicAdd functor, ``bc_functor.cuh:70-71``).
    Winners come out ascending, so the next frontier stays sorted.

    The destination reduction runs with the kernel's IMPROVING-ONLY
    filter (``aux = +inf`` where the destination is undiscovered, else
    ``-inf``), so its compacted output is exactly the newly-discovered
    set with their sigma totals — the next frontier — and the dense
    label/sigma updates stream through ``scatter_sorted`` (no XLA
    scatter in the level). Contributions enter NEGATED so a float32
    path-count overflow (sum -> -inf) still satisfies the < +inf
    emission test — an overflowed sigma must not un-discover a vertex
    (the reference's atomicCAS label is equally overflow-independent,
    ``bc_functor.cuh:56-64``)."""
    from ..ops.pallas_kernels import reduce_by_dst_sorted, scatter_sorted
    POS = jnp.float32(jnp.inf)
    NEG = jnp.float32(-jnp.inf)

    def make(cap: int):
        out_lanes = min(cap, graph.v_pad)

        def step(state: _FwdState):
            depth = state.stats.iteration + 1
            ex = expand(graph, state.frontier, state.n, cap,
                        sorted_frontier=True, with_dst=False,
                        with_src=True)
            if use_pallas:
                from ..ops.pallas_kernels import sample_sorted
                dst = sample_sorted(graph.col_indices, ex.eid)
                sig_src = sample_sorted(state.sigma, ex.src)
            else:
                dst = jnp.take(graph.col_indices, ex.eid,
                               indices_are_sorted=True)
                sig_src = jnp.take(state.sigma, ex.src,
                                   indices_are_sorted=True)
            dstm = jnp.where(ex.mask, dst, graph.v_pad)
            sd, sc = jax.lax.sort(
                (dstm, jnp.where(ex.mask, -sig_src, 0.0)), num_keys=1)
            lab_sd = jnp.take(state.labels,
                              jnp.minimum(sd, graph.v_pad - 1),
                              indices_are_sorted=True)
            aux = jnp.where((lab_sd == -1) & (sd < graph.v_pad), POS, NEG)
            cids, csum, n_new = reduce_by_dst_sorted(
                sd, sc, op="sum", out_lanes=out_lanes, aux=aux)
            labels = scatter_sorted(
                state.labels, cids,
                jnp.broadcast_to(depth, (out_lanes,)), count=n_new,
                op="set")
            sigma = scatter_sorted(state.sigma, cids, -csum, count=n_new,
                                   op="set")
            lane_o = jnp.arange(out_lanes, dtype=jnp.int32)
            wq = jnp.where(lane_o < n_new, cids, graph.v_pad - 1)
            if out_lanes >= fcap:
                frontier = jax.lax.slice(wq, (0,), (fcap,))
            else:
                frontier = jnp.concatenate(
                    [wq, jnp.full((fcap - out_lanes,), graph.v_pad - 1,
                                  jnp.int32)])
            return labels, sigma, frontier, n_new, ex.total, \
                ex.total > cap
        return step
    return make


# ---------------------------------------------------------------------------
# Shared per-level pull passes (one blocked value-kernel pass each).
# Both the hybrid loop and the instrumented all-pull path route through
# these, so the two TPU paths produce identical sigma/delta.
# ---------------------------------------------------------------------------

def _fwd_level_pull(graph, labels, sigma, depth, interpret: bool = False):
    """sigma[v] = sum of sigma over in-neighbors one level up; returns
    (labels', sigma', newly_discovered_mask)."""
    from ..ops.pallas_kernels import pull_vertex_reduce
    contrib = jnp.where(labels == depth - 1, sigma, 0.0)
    s = pull_vertex_reduce(contrib, graph, op="sum", wmode="none",
                           interpret=interpret)
    new = (labels == -1) & (s > 0)
    return jnp.where(new, depth, labels), jnp.where(new, s, sigma), new


def _bwd_level_pull(graph, labels, sigma, delta, t, interpret: bool = False):
    """delta[u] = sigma[u] * sum over neighbors one level down of
    (1+delta)/sigma, for the level-``t`` ring."""
    from ..ops.pallas_kernels import pull_vertex_reduce
    contrib = jnp.where(labels == t + 1,
                        (1.0 + delta) / jnp.maximum(sigma, 1e-30), 0.0)
    acc = pull_vertex_reduce(contrib, graph, op="sum", wmode="none",
                             interpret=interpret)
    return jnp.where(labels == t, sigma * acc, delta)


def _make_fwd_step(graph: DeviceGraph, fcap: int, caps, pallas: bool,
                   interpret: bool, fused: bool = False):
    """One forward level: ladder push, or (pallas) one pull pass for big
    levels. Pull wins once a level's push lanes (~100ns each: claim-dedup
    + scatter-add) outweigh one ~2ns/edge full pass — threshold E/32.
    ``fused`` swaps the push ladder for the sorted-stream destination-
    reduction shape (``_make_forward_branch_fused``)."""
    from ..ops.segment import frontier_from_mask
    fwd = _make_forward_branch_fused(graph, fcap, pallas) if fused \
        else _make_forward_branch(graph, fcap)
    pull_threshold = jnp.int32(max(1, min(graph.num_edges // 32, 2**30)))
    edges_i32 = jnp.int32(min(graph.num_edges, 2**31 - 1))

    def _fwd_pull(state: _FwdState):
        depth = state.stats.iteration + 1
        labels, sigma, new = _fwd_level_pull(
            graph, state.labels, state.sigma, depth, interpret)
        frontier, n = frontier_from_mask(new, fcap)
        return labels, sigma, frontier, n, edges_i32, n > fcap

    def step(state: _FwdState):
        m_f = _frontier_edges(graph, state.frontier, state.n)
        if pallas:
            out = jax.lax.cond(
                m_f > pull_threshold, _fwd_pull,
                lambda st: dispatch_by_size(m_f, caps, fwd, st), state)
        else:
            out = dispatch_by_size(m_f, caps, fwd, state)
        labels, sigma, frontier, n, edges, overflow = out
        stats = record_iteration(state.stats, frontier_len=n, edges=edges,
                                 overflow=overflow)
        return _FwdState(labels=labels, sigma=sigma, frontier=frontier,
                         n=n, stats=stats)
    return step


def _fwd_init(graph: DeviceGraph, src, fcap: int) -> _FwdState:
    v_pad = graph.v_pad
    return _FwdState(
        labels=jnp.full((v_pad,), -1, jnp.int32).at[src].set(0),
        sigma=jnp.zeros((v_pad,), jnp.float32).at[src].set(1.0),
        frontier=jnp.zeros((fcap,), jnp.int32).at[0].set(src),
        n=jnp.int32(1), stats=init_stats())


def _level_replay(labels, v_pad: int, fcap: int):
    """Vertices sorted by BFS depth + level offsets (the reference's
    forward_queue_offsets, bc_problem.cuh): one argsort replaces the
    per-iteration frontier stash."""
    BIG = jnp.int32(2**30)
    key = jnp.where(labels >= 0, labels, BIG)
    order = jnp.argsort(key).astype(jnp.int32)          # levels ascending
    sorted_key = key[order]
    # offsets[l] = first sorted index with depth >= l
    levels = jnp.arange(v_pad + 1, dtype=jnp.int32)
    offsets = jnp.searchsorted(sorted_key, levels).astype(jnp.int32)
    order_padded = jnp.concatenate([order, jnp.zeros((fcap,), jnp.int32)])
    return order_padded, offsets


def _make_bwd_step(graph: DeviceGraph, labels, sigma, order_padded,
                   offsets, fcap: int, caps, pallas: bool,
                   interpret: bool, fused: bool = False):
    """One backward level over (delta, t): ladder push from the level-t
    ring, or (pallas) one pull pass when the ring is big. ``fused``
    replaces the cap-scale delta scatter-add with the destination-
    reduction kernel keyed by the level ring's ALREADY-SORTED sources
    (no sort needed: ``order_padded`` is ascending within a level), then
    one vertex-scale add — ``delta[u] = sigma[u] * sum (1+delta_v)/
    sigma_v`` with the sigma[u] factor applied at winner scale."""
    pull_threshold = jnp.int32(max(1, min(graph.num_edges // 32, 2**30)))
    edges_i32 = jnp.int32(min(graph.num_edges, 2**31 - 1))

    def make_back_plain(cap: int):
        def bstep(args):
            delta, t = args
            start = offsets[t]
            n = offsets[t + 1] - start
            frontier = jax.lax.dynamic_slice(order_padded, (start,),
                                             (fcap,))
            ex = expand(graph, frontier, n, cap)
            down = ex.mask & (labels[ex.dst] == t + 1)
            sig_dst = jnp.where(down, sigma[ex.dst], 1.0)
            add = jnp.where(down,
                            sigma[ex.src] / sig_dst * (1.0 + delta[ex.dst]),
                            0.0)
            delta = scatter_add(delta, ex.src, add, mask=down)
            return delta, ex.total
        return bstep

    def make_back_fused(cap: int):
        from ..ops.pallas_kernels import (reduce_by_dst_sorted,
                                          scatter_sorted)
        out_lanes = min(cap, graph.v_pad) + 128

        def bstep(args):
            delta, t = args
            start = offsets[t]
            n = offsets[t + 1] - start
            frontier = jax.lax.dynamic_slice(order_padded, (start,),
                                             (fcap,))
            ex = expand(graph, frontier, n, cap, sorted_frontier=True,
                        with_dst=False)
            if pallas:
                from ..ops.pallas_kernels import sample_sorted
                dst = sample_sorted(graph.col_indices, ex.eid)
            else:
                dst = jnp.take(graph.col_indices, ex.eid,
                               indices_are_sorted=True)
            down = ex.mask & (jnp.take(labels, dst) == t + 1)
            sig_dst = jnp.where(down, jnp.take(sigma, dst), 1.0)
            add = jnp.where(down, (1.0 + jnp.take(delta, dst)) / sig_dst,
                            0.0)
            cids, csum, n_heads = reduce_by_dst_sorted(
                jnp.where(ex.mask, ex.src, graph.v_pad), add, op="sum",
                out_lanes=out_lanes)
            lane = jnp.arange(out_lanes, dtype=jnp.int32)
            hvalid = (lane < n_heads) & (cids < graph.v_pad)
            ids_c = jnp.where(hvalid, cids, graph.v_pad - 1)
            vals = jnp.where(
                hvalid,
                jnp.take(sigma, ids_c, indices_are_sorted=True) * csum,
                0.0)
            # Dense update through the Pallas sorted-scatter kernel
            # (ids ascending + unique by construction of the reduce).
            delta = scatter_sorted(delta, cids, vals, count=n_heads,
                                   op="add")
            return delta, ex.total
        return bstep

    make_back = make_back_fused if fused else make_back_plain

    def _bwd_pull(args):
        delta, t = args
        return _bwd_level_pull(graph, labels, sigma, delta, t,
                               interpret), edges_i32

    def step(args):
        delta, t = args
        start = offsets[t]
        n = offsets[t + 1] - start
        frontier = jax.lax.dynamic_slice(order_padded, (start,), (fcap,))
        m_f = _frontier_edges(graph, frontier, n)
        if pallas:
            delta, _ = jax.lax.cond(
                m_f > pull_threshold, _bwd_pull,
                lambda a: dispatch_by_size(m_f, caps, make_back, a), args)
        else:
            delta, _ = dispatch_by_size(m_f, caps, make_back, args)
        return delta, t - 1
    return step


def _bc_loop(graph: DeviceGraph, src: jax.Array, *, fcap: int,
             caps: tuple[int, ...], pallas: bool = False,
             interpret: bool = False, fused: bool = False):
    """Single-call hybrid Brandes — used by the CPU path, the replicated
    batch execution (``parallel/replicate.bc_batch`` runs it inside
    shard_map), and tests. The TPU path chunk-enacts the SAME step
    makers from the host (``_bc_hybrid``) to stay under device execution
    limits on deep graphs."""
    v_pad = graph.v_pad
    fstep = _make_fwd_step(graph, fcap, caps, pallas, interpret, fused)

    def fcond(state: _FwdState):
        return (state.n > 0) & (~state.stats.overflow)

    fstate = jax.lax.while_loop(fcond, fstep, _fwd_init(graph, src, fcap))
    labels, sigma = fstate.labels, fstate.sigma
    max_depth = fstate.stats.iteration  # >= deepest label

    order_padded, offsets = _level_replay(labels, v_pad, fcap)
    bstep = _make_bwd_step(graph, labels, sigma, order_padded, offsets,
                           fcap, caps, pallas, interpret, fused)

    def bcond(args):
        return args[1] >= 0

    delta, _ = jax.lax.while_loop(
        bcond, bstep, (jnp.zeros((v_pad,), jnp.float32), max_depth - 1))
    bc_vals = jnp.where(jnp.arange(v_pad) == src, 0.0, delta)
    return bc_vals, sigma, labels, fstate.stats


_bc_jit = jax.jit(_bc_loop,
                  static_argnames=("fcap", "caps", "pallas", "interpret",
                                   "fused"))


@partial(jax.jit, static_argnames=("fcap", "caps", "pallas", "interpret",
                                   "fused"))
def _bc_fwd_jit(graph: DeviceGraph, state: _FwdState, upto, *, fcap: int,
                caps, pallas: bool, interpret: bool = False,
                fused: bool = False):
    fstep = _make_fwd_step(graph, fcap, caps, pallas, interpret, fused)

    def fcond(st: _FwdState):
        return (st.n > 0) & (~st.stats.overflow) & \
               (st.stats.iteration < upto)

    st = jax.lax.while_loop(fcond, fstep, state)
    probe = jnp.stack([st.stats.iteration,
                       st.stats.overflow.astype(jnp.int32), st.n])
    return st, probe


@partial(jax.jit, static_argnames=("fcap",))
def _bc_mid_jit(labels, *, fcap: int):
    return _level_replay(labels, labels.shape[0], fcap)


@partial(jax.jit, static_argnames=("fcap", "caps", "pallas", "interpret",
                                   "fused"))
def _bc_bwd_jit(graph: DeviceGraph, labels, sigma, order_padded, offsets,
                delta, t_hi, t_lo, *, fcap: int, caps, pallas: bool,
                interpret: bool = False, fused: bool = False):
    bstep = _make_bwd_step(graph, labels, sigma, order_padded, offsets,
                           fcap, caps, pallas, interpret, fused)

    def bcond(args):
        return args[1] >= t_lo

    delta, _ = jax.lax.while_loop(bcond, bstep, (delta, t_hi))
    return delta


def _bc_hybrid(graph: DeviceGraph, src: int, fcap: int, caps,
               pallas: bool = True, instrument=None,
               interpret: bool = False, fused: bool = False):
    """Host-chunked enactment: bounded level counts per device call — a
    deep graph's ~thousands of sequential levels would otherwise exceed
    the serving path's execution limits (the same chunking discipline as
    bfs_device/sssp_device). With ``instrument`` set, enacts one level
    per call and records per-level wall clocks for both phases (works on
    every backend, unlike the all-pull _bc_pull records)."""
    import time as _time
    chunk = max(8, min(512, (1 << 27) // max(graph.e_pad, 1) * 8))
    if instrument is not None:
        chunk = 1
    st = _fwd_init(graph, jnp.int32(src), fcap)
    upto = chunk
    t0 = _time.perf_counter()
    while True:
        st, probe = _bc_fwd_jit(graph, st, jnp.int32(upto), fcap=fcap,
                                caps=caps, pallas=pallas,
                                interpret=interpret, fused=fused)
        it, ovf, n = (int(x) for x in np.asarray(probe))
        if instrument is not None:
            t1 = _time.perf_counter()
            instrument.append({"phase": "forward", "level": it,
                               "ms": (t1 - t0) * 1e3, "frontier": n})
            t0 = t1
        if ovf or n == 0 or it < upto:
            break
        upto = it + chunk
    labels, sigma = st.labels, st.sigma
    max_depth = int(st.stats.iteration)
    order_padded, offsets = _bc_mid_jit(labels, fcap=fcap)
    delta = jnp.zeros((graph.v_pad,), jnp.float32)
    hi = max_depth - 1
    t0 = _time.perf_counter()
    while hi >= 0:
        lo = max(0, hi - chunk + 1)
        delta = jax.block_until_ready(_bc_bwd_jit(
            graph, labels, sigma, order_padded, offsets,
            delta, jnp.int32(hi), jnp.int32(lo),
            fcap=fcap, caps=caps, pallas=pallas, interpret=interpret,
            fused=fused))
        if instrument is not None:
            t1 = _time.perf_counter()
            instrument.append({"phase": "backward", "level": hi,
                               "ms": (t1 - t0) * 1e3})
            t0 = t1
        hi = lo - 1
    bc_vals = jnp.where(jnp.arange(graph.v_pad) == src, 0.0, delta)
    return bc_vals, sigma, labels, st.stats


# ---------------------------------------------------------------------------
# All-pull BC (instrumented runs): every level of both phases is ONE
# blocked value-kernel pass, one device call per record — per-level
# wall-clock records match the reference's --instrumented kernel stats.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("chunk",))
def _bc_pull_fwd_chunk(graph: DeviceGraph, labels, sigma, d0, *, chunk: int):
    def body(carry):
        labels, sigma, d, _ = carry
        labels, sigma, new = _fwd_level_pull(graph, labels, sigma, d)
        return labels, sigma, d + 1, jnp.sum(new.astype(jnp.int32))

    def cond(carry):
        labels, sigma, d, changed = carry
        return (changed > 0) & (d < d0 + chunk)

    return jax.lax.while_loop(cond, body,
                              (labels, sigma, d0, jnp.int32(1)))


@partial(jax.jit, static_argnames=("chunk",))
def _bc_pull_bwd_chunk(graph: DeviceGraph, labels, sigma, delta, d_hi,
                       d_lo, *, chunk: int):
    def body(carry):
        delta, d = carry
        return _bwd_level_pull(graph, labels, sigma, delta, d), d - 1

    def cond(carry):
        delta, d = carry
        return d >= d_lo

    return jax.lax.while_loop(cond, body, (delta, d_hi))


def _bc_pull(graph: DeviceGraph, src: int, chunk: int = 16,
             instrument=None):
    import time as _time
    if instrument is not None:
        chunk = 1
    v_pad = graph.v_pad
    labels = jnp.full((v_pad,), -1, jnp.int32).at[src].set(0)
    sigma = jnp.zeros((v_pad,), jnp.float32).at[src].set(1.0)
    d = jnp.int32(1)
    t0 = _time.perf_counter()
    while True:
        labels, sigma, d, changed = jax.block_until_ready(
            _bc_pull_fwd_chunk(graph, labels, sigma, d, chunk=chunk))
        if instrument is not None:
            t1 = _time.perf_counter()
            instrument.append({"phase": "forward", "level": int(d) - 1,
                               "ms": (t1 - t0) * 1e3,
                               "discovered": int(changed)})
            t0 = t1
        if int(changed) == 0:
            break
    depth = int(d) - 1          # last level that discovered nothing
    delta = jnp.zeros((v_pad,), jnp.float32)
    hi = depth - 1
    t0 = _time.perf_counter()
    while hi >= 0:
        lo = max(0, hi - chunk + 1)
        delta, _ = jax.block_until_ready(
            _bc_pull_bwd_chunk(graph, labels, sigma, delta, jnp.int32(hi),
                               jnp.int32(lo), chunk=chunk))
        if instrument is not None:
            t1 = _time.perf_counter()
            instrument.append({"phase": "backward", "level": hi,
                               "ms": (t1 - t0) * 1e3})
            t0 = t1
        hi = lo - 1
    bc_vals = jnp.where(jnp.arange(v_pad) == src, 0.0, delta)
    # Real traversal stats (the push path records these per level): the
    # forward phase visits every out-edge of each reached vertex once,
    # so edges_queued = degree sum over the component — bc() then emits
    # m_teps like the reference (util/info.cuh:1431).
    reached = labels >= 0
    deg = graph.row_offsets[1:] - graph.row_offsets[:-1]
    edges_q = jnp.sum(jnp.where(reached, deg, 0)).astype(jnp.float32)
    nodes_q = jnp.sum(reached.astype(jnp.int32)).astype(jnp.float32)
    stats = init_stats()
    stats = dataclasses.replace(stats, iteration=jnp.int32(depth),
                                edges_queued=edges_q,
                                nodes_queued=nodes_q)
    return bc_vals, sigma, labels, stats


# ---------------------------------------------------------------------------
# Kernel-C Brandes (ops/pull2.brandes_{fwd,bwd}_levels): both phases run
# as level-gated sum-pulls with labels/sigma/delta VMEM-resident across
# levels — ~4 device calls for a scale-free graph instead of per-level
# XLA glue. Pull reduces over in-edges, so the backward recurrence
# (out-edge reduction, bc_functor.cuh:203-238) requires a symmetric
# edge set: the route gates on graph.undirected.
# ---------------------------------------------------------------------------

def _bc_pull2(graph: DeviceGraph, src: int, instrument=None):
    import os
    import time as _time
    from ..ops.pull2 import brandes_bwd_levels, brandes_fwd_levels
    interp = jax.default_backend() != "tpu"
    v_pad = graph.v_pad
    lab = jnp.full((v_pad,), jnp.inf, jnp.float32).at[src].set(0.0)
    sig = jnp.zeros((v_pad,), jnp.float32).at[src].set(1.0)
    CH = max(1, int(os.environ.get("GUNROCK_BC_LEVELS", "8")))
    d = 1
    frontiers = []
    t0 = _time.perf_counter()
    while True:
        lab, sig, chg = brandes_fwd_levels(graph, lab, sig, d0=d,
                                           levels=CH, interpret=interp)
        chg_np = np.asarray(chg)
        if instrument is not None:
            t1 = _time.perf_counter()
            instrument.append({"phase": "forward", "level": d + CH - 1,
                               "ms": (t1 - t0) * 1e3,
                               "discovered": int(chg_np.sum())})
            t0 = t1
        frontiers.extend(chg_np.tolist())
        nz = np.nonzero(chg_np == 0)[0]
        if len(nz):
            depth = d + int(nz[0]) - 1   # last discovering level
            break
        d += CH
        if d > graph.num_nodes:
            depth = d - 1
            break
    delta = jnp.zeros((v_pad,), jnp.float32)
    t = depth - 1
    t0 = _time.perf_counter()
    while t >= 0:
        n = min(CH, t + 1)
        delta, _ = brandes_bwd_levels(graph, lab, sig, delta, t0=t,
                                      levels=n, interpret=interp)
        if instrument is not None:
            np.asarray(delta[:1])
            t1 = _time.perf_counter()
            instrument.append({"phase": "backward", "level": t,
                               "ms": (t1 - t0) * 1e3})
            t0 = t1
        t -= n
    bc_vals = jnp.where(jnp.arange(v_pad) == src, 0.0, delta)
    labels = jnp.where(jnp.isfinite(lab), lab,
                       jnp.float32(-1)).astype(jnp.int32)
    reached = labels >= 0
    deg = graph.row_offsets[1:] - graph.row_offsets[:-1]
    edges_q = jnp.sum(jnp.where(reached, deg, 0)).astype(jnp.float32)
    nodes_q = jnp.sum(reached.astype(jnp.int32)).astype(jnp.float32)
    stats = init_stats()
    stats = dataclasses.replace(
        stats, iteration=jnp.int32(depth), edges_queued=edges_q,
        nodes_queued=nodes_q,
        frontier_trace=jnp.asarray(
            ([int(x) for x in frontiers] + [-1] * 512)[:512], jnp.int32))
    return bc_vals, sig, labels, stats


def bc_device(graph: DeviceGraph, src, *, queue_sizing: float = 1.0,
              instrument=None, fused=None):
    import os
    if (getattr(graph, "has_pull2", False) and graph.undirected
            and os.environ.get("GUNROCK_BC_PULL2", "1") == "1"):
        return _bc_pull2(graph, int(src), instrument=instrument)
    use_pallas = (jax.default_backend() == "tpu" and
                  graph.has_blocked_values)
    if fused is None:
        fused = (jax.default_backend() == "tpu" and
                 os.environ.get("GUNROCK_BC_FUSED", "0") == "1")
    if use_pallas and instrument is not None:
        # Per-level wall-clock records, one device call per level
        # (reference --instrumented kernel stats via the all-pull path).
        return _bc_pull(graph, int(src), instrument=instrument)
    fcap = max(128, int(graph.v_pad * min(queue_sizing, 1.0)))
    out_cap = max(128, int(graph.e_pad * min(queue_sizing, 1.0)))
    caps = tuple(capacity_ladder(out_cap))
    if use_pallas or instrument is not None:
        # Chunked enactment: hybrid dispatch on TPU; on other backends
        # it also carries --instrumented per-level records (previously a
        # silent no-op off-TPU).
        return _bc_hybrid(graph, int(src), fcap, caps, pallas=use_pallas,
                          instrument=instrument, fused=fused)
    return _bc_jit(graph, jnp.int32(src), fcap=fcap, caps=caps,
                   fused=fused)


def bc(graph: Union[CsrGraph, DeviceGraph],
       src: Optional[Union[int, str]] = 0, *,
       queue_sizing: float = 1.0, instrumented: bool = False) -> BcResult:
    """Betweenness centrality (C API parity: ``gunrock_bc``,
    ``gunrock.h:200``). ``src=None`` or ``-1`` accumulates over all
    sources (exact BC), matching the reference's ``--src=-1`` mode.
    ``instrumented`` collects per-level phase records (TPU pull path)."""
    timer = Timer()
    per_iter: Optional[list] = [] if instrumented else None
    num_nodes = graph.num_nodes
    if isinstance(graph, CsrGraph):
        if src == "largestdegree":
            src = graph.largest_degree_vertex()
        with timer.time("preprocess_ms"):
            dgraph = to_device(graph)
    else:
        dgraph = graph

    if src is None or src == -1:
        sources = range(num_nodes)
    else:
        src = int(src)
        if not 0 <= src < num_nodes:
            raise ValueError(f"src {src} out of range [0, {num_nodes})")
        sources = [src]

    bc_acc = np.zeros(num_nodes, np.float64)
    with timer.time("process_ms"):
        for s in sources:
            bc_vals, sigma, labels, stats = jax.block_until_ready(
                bc_device(dgraph, s, queue_sizing=queue_sizing,
                          instrument=per_iter))
            bc_acc += np.asarray(bc_vals)[:num_nodes]

    bc_np = (bc_acc * 0.5).astype(np.float32)
    info = make_info(
        primitive="bc", graph=dgraph, stats=stats, timer=timer,
        edges_visited=2 * int(stats.edges_queued) * len(list(sources)),
        extra={"src": -1 if len(list(sources)) > 1 else int(sources[0]),
               "instrumented": instrumented,
               "search_depth": int(stats.iteration),
               **({"per_iteration": per_iter} if instrumented else {})},
    )
    return BcResult(bc_values=bc_np,
                    sigmas=np.asarray(sigma)[:num_nodes],
                    labels=np.asarray(labels)[:num_nodes],
                    info=info)
