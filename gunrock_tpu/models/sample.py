"""Sample/template primitive — the skeleton for authoring new primitives.

Mirrors the reference's ``app/sample`` skeleton + the "Creating a New
Graph Primitive" recipe (``doc/programming_model.md``): define per-vertex
state, express one superstep as advance -> functor -> filter, and drive it
with a ``lax.while_loop``. This example computes per-vertex hop distance
(a minimal BFS), annotated step by step. Copy this file to start a new
primitive.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import CsrGraph
from ..graph.device import DeviceGraph, to_device
from ..ops.advance import expand
from ..ops.segment import compact, dedup_winners, scatter_set

__all__ = ["sample"]


# 1. Problem state: one entry per vertex, padded to v_pad (the reference's
#    DataSlice, app/sample/sample_problem.cuh).
@partial(
    jax.tree_util.register_dataclass,
    data_fields=["labels", "frontier", "n", "iteration"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class _State:
    labels: jax.Array
    frontier: jax.Array
    n: jax.Array
    iteration: jax.Array


def _sample_loop(graph: DeviceGraph, src: jax.Array, *, fcap: int,
                 out_cap: int):
    labels = jnp.full((graph.v_pad,), -1, jnp.int32).at[src].set(0)
    frontier = jnp.zeros((fcap,), jnp.int32).at[0].set(src)

    def cond(s: _State):
        return s.n > 0

    def body(s: _State):
        # 2. Advance: expand the frontier's neighbors (one lane per edge).
        ex = expand(graph, s.frontier, s.n, out_cap)
        # 3. Compute (the functor): CondEdge == "destination unvisited".
        cond_edge = ex.mask & (s.labels[ex.dst] == -1)
        # 4. Filter: exact dedup so each vertex enters the frontier once.
        keep = dedup_winners(ex.dst, cond_edge, graph.v_pad)
        # 5. ApplyEdge: commit the new labels for surviving lanes.
        labels = scatter_set(s.labels, ex.dst, s.iteration + 1, mask=keep)
        # 6. Compact the survivors into the next frontier.
        frontier, n = compact(ex.dst, keep, fcap)
        return _State(labels=labels, frontier=frontier, n=n,
                      iteration=s.iteration + 1)

    final = jax.lax.while_loop(cond, body, _State(
        labels=labels, frontier=frontier, n=jnp.int32(1),
        iteration=jnp.int32(0)))
    return final.labels


_sample_jit = jax.jit(_sample_loop, static_argnames=("fcap", "out_cap"))


def sample(graph: Union[CsrGraph, DeviceGraph], src: int = 0) -> np.ndarray:
    """Run the template primitive; returns hop distances."""
    dgraph = to_device(graph) if isinstance(graph, CsrGraph) else graph
    labels = _sample_jit(dgraph, jnp.int32(src), fcap=dgraph.v_pad,
                         out_cap=dgraph.e_pad)
    return np.asarray(labels)[:dgraph.num_nodes]
