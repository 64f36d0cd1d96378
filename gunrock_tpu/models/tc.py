"""Triangle counting via segmented intersection.

The reference documents segmented intersection as its fourth operator
(``doc/programming_model.md`` "Operators", for triangle counting) but the
CUDA implementation is absent from the snapshot (only ``util/join.cuh``
leftovers). This is the complete TPU-native primitive:

  1. orient the undirected graph into a DAG by (degree, id) order —
     the standard forward/node-iterator trick that bounds the oriented
     out-degree by O(sqrt(E));
  2. one :func:`gunrock_tpu.ops.intersection.intersect_counts` call:
     merge-path wedge expansion + binary-search edge probes;
  3. triangle total = sum of per-edge intersection counts (each triangle
     counted exactly once in the DAG).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..enactor import Timer
from ..graph.csr import CsrGraph, from_coo
from ..graph.device import round_up
from ..ops.intersection import intersect_counts
from ..utils.info import make_info

__all__ = ["tc", "TcResult", "tc_device"]


@dataclasses.dataclass
class TcResult:
    total: int                    # number of triangles in the graph
    edge_counts: np.ndarray       # per-oriented-edge intersection sizes
    vertex_counts: np.ndarray     # triangles incident to each vertex
    info: dict


@partial(jax.jit, static_argnames=("num_edges", "wedge_cap", "probe_steps"))
def tc_device(row_offsets: jax.Array, col_indices: jax.Array,
              edge_src: jax.Array, *, num_edges: int, wedge_cap: int,
              probe_steps: int = 32):
    """Per-edge triangle counts over an oriented CSR (device arrays)."""
    counts, vcounts, wedges = intersect_counts(
        row_offsets, col_indices, edge_src, num_edges, wedge_cap,
        probe_steps)
    return counts, vcounts, jnp.sum(counts, dtype=jnp.int32), wedges


def _orient(g: CsrGraph) -> CsrGraph:
    """Degree-order DAG orientation: keep (u, v) iff u precedes v in
    (degree, id) order. Assumes a symmetrized simple graph."""
    deg = g.out_degrees
    src = g.edge_sources()
    dst = g.col_indices
    lt = (deg[src] < deg[dst]) | ((deg[src] == deg[dst]) & (src < dst))
    return from_coo(g.num_nodes, src[lt], dst[lt],
                    remove_self_loops=False, dedup=False)


def tc(graph: Union[CsrGraph], *, undirected_input: bool = True) -> TcResult:
    """Count triangles. Input must be a symmetric (undirected) graph —
    pass ``undirected_input=False`` to symmetrize a directed one first."""
    timer = Timer()
    g = graph
    if not undirected_input:
        src = g.edge_sources()
        g = from_coo(g.num_nodes, src, g.col_indices, undirected=True)

    with timer.time("preprocess_ms"):
        dag = _orient(g)
        deg = np.diff(dag.row_offsets).astype(np.int64)
        wedge_total = int(deg[dag.col_indices].sum())
        wedge_cap = round_up(max(wedge_total, 1))
        e_pad = round_up(max(dag.num_edges, 1))
        v_pad = round_up(max(dag.num_nodes, 1))
        row = np.full(v_pad + 1, dag.num_edges, np.int32)
        row[: dag.num_nodes + 1] = dag.row_offsets.astype(np.int32)
        col = np.zeros(e_pad, np.int32)
        col[: dag.num_edges] = dag.col_indices
        esrc = np.zeros(e_pad, np.int32)
        esrc[: dag.num_edges] = dag.edge_sources()

    probe_steps = int(np.ceil(np.log2(max(int(deg.max(initial=1)), 1) + 1))) + 1

    with timer.time("process_ms"):
        counts, vcounts, total, wedges = jax.block_until_ready(
            tc_device(jnp.asarray(row), jnp.asarray(col), jnp.asarray(esrc),
                      num_edges=dag.num_edges, wedge_cap=wedge_cap,
                      probe_steps=probe_steps))

    counts_np = np.asarray(counts)[: dag.num_edges]
    vcounts = np.asarray(vcounts)[: g.num_nodes].astype(np.int64)
    info = make_info(
        primitive="tc", graph=g, timer=timer,
        edges_visited=wedge_total,
        extra={"num_triangles": int(total),
               "wedges_probed": wedge_total},
    )
    return TcResult(total=int(total), edge_counts=counts_np,
                    vertex_counts=vcounts, info=info)
