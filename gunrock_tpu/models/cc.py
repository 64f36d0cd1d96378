"""Connected components (Soman hooking + pointer jumping).

TPU-native rebuild of the reference CC primitive
(``gunrock/app/cc/{cc_problem,cc_enactor,cc_functor}.cuh``): the reference
iterates Hook{Min,Max} and PtrJump filter kernels over the full edge list
(``cc_functor.cuh:100-659``) using the ALL_EDGES advance variant
(``cc_enactor.cuh:343``). Here the same Shiloach–Vishkin-style scheme is
three fused vector ops per round:

    hook:  comp = scatter_min(comp, max(cu, cv), min(cu, cv))  over edges
    jump:  comp = comp[comp]  until fixpoint (full pointer doubling)
    stop:  no edge has comp[u] != comp[v]

Converges in O(log V) rounds; component ids are the minimum vertex id in
each component (same normal form the reference extracts).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..enactor import LoopStats, Timer, init_stats, record_iteration
from ..graph.csr import CsrGraph
from ..graph.device import DeviceGraph, to_device
from ..utils.info import make_info

__all__ = ["cc", "CcResult", "cc_device"]


@dataclasses.dataclass
class CcResult:
    components: np.ndarray   # (V,) int32 component id (min vertex id)
    num_components: int
    info: dict


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["comp", "changed", "stats"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _State:
    comp: jax.Array     # (v_pad,) int32
    changed: jax.Array  # () bool
    stats: LoopStats


def _cc_loop(graph: DeviceGraph, pallas: bool = False):
    v_pad = graph.v_pad
    use_pallas = pallas and graph.has_blocked_values and v_pad < (1 << 24)
    if not use_pallas:
        lane = jnp.arange(graph.e_pad, dtype=jnp.int32)
        emask = lane < graph.num_edges
        src = graph.edge_src   # (e_pad,) fill v_pad for padding
        dst = graph.col_indices

    comp0 = jnp.arange(v_pad, dtype=jnp.int32)

    def cond(state: _State):
        return state.changed

    def body(state: _State):
        comp = state.comp
        if use_pallas:
            # Min-hooking as a blocked pull over in-edges: component ids
            # < 2^24 are exact in f32, so the value kernel applies.
            from ..ops.pallas_kernels import pull_vertex_reduce
            m = pull_vertex_reduce(comp.astype(jnp.float32), graph,
                                   op="min", wmode="none")
            m = jnp.where(jnp.isfinite(m), m, jnp.float32(v_pad))
            hooked = jnp.minimum(comp, m.astype(jnp.int32))
            differs_count = jnp.sum((hooked != comp).astype(jnp.int32))
            comp = hooked
            changed = differs_count > 0
        else:
            cu = comp[jnp.where(emask, src, 0)]
            cv = comp[jnp.where(emask, dst, 0)]
            differs = emask & (cu != cv)
            hi = jnp.maximum(cu, cv)
            lo = jnp.minimum(cu, cv)
            # HookMin (cc_functor.cuh:235): attach the larger root under
            # the smaller; scatter-min resolves conflicts
            # deterministically.
            comp = comp.at[jnp.where(differs, hi, v_pad)].min(
                lo, mode="drop")
            differs_count = jnp.sum(differs.astype(jnp.int32))
            changed = jnp.any(differs)

        # PtrJump (cc_functor.cuh:503): full pointer doubling to fixpoint.
        def jump_cond(c):
            return jnp.any(c[c] != c)

        def jump_body(c):
            return c[c]

        comp = jax.lax.while_loop(jump_cond, jump_body, comp)
        stats = record_iteration(
            state.stats, frontier_len=differs_count,
            edges=jnp.int32(min(graph.num_edges, 2**31 - 1)))
        return _State(comp=comp, changed=changed, stats=stats)

    init = _State(comp=comp0, changed=jnp.bool_(True), stats=init_stats())
    final = jax.lax.while_loop(cond, body, init)
    vmask = jnp.arange(v_pad, dtype=jnp.int32) < graph.num_nodes
    # Count roots = distinct components.
    is_root = vmask & (final.comp == jnp.arange(v_pad, dtype=jnp.int32))
    num_components = jnp.sum(is_root.astype(jnp.int32))
    return final.comp, num_components, final.stats


_cc_jit = jax.jit(_cc_loop, static_argnames=("pallas",))


def cc_device(graph: DeviceGraph):
    use_pallas = (jax.default_backend() == "tpu" and
                  graph.has_blocked_values)
    if graph.edge_src is None and not use_pallas:
        raise ValueError("CC needs to_device(with_edge_src=True)")
    return _cc_jit(graph, pallas=use_pallas)


def cc(graph: Union[CsrGraph, DeviceGraph]) -> CcResult:
    """C API parity: ``gunrock_cc`` (``gunrock.h:227``). The input is
    treated as undirected connectivity (the reference expects symmetric
    edges; pass an undirected/symmetrized graph)."""
    timer = Timer()
    num_nodes = graph.num_nodes
    if isinstance(graph, CsrGraph):
        with timer.time("preprocess_ms"):
            dgraph = to_device(graph, with_edge_src=True)
    else:
        dgraph = graph

    with timer.time("process_ms"):
        comp, num_components, stats = jax.block_until_ready(
            cc_device(dgraph))

    comp_np = np.asarray(comp)[:num_nodes]
    info = make_info(
        primitive="connected_components", graph=dgraph, stats=stats,
        timer=timer,
        edges_visited=int(dgraph.num_edges) * max(int(stats.iteration), 1),
        extra={"num_components": int(num_components),
               "search_depth": int(stats.iteration)},
    )
    return CcResult(components=comp_np, num_components=int(num_components),
                    info=info)
