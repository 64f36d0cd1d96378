"""Multi-chip triangle counting: wedge chunks fanned across the mesh.

TC's wedge volume (not the graph) is the working set, so the scaling
axis is CHUNK parallelism over a replicated oriented DAG — the
reference's "duplicate" execution mode applied to the segmented
intersection operator. Each shard runs the same sort-join kernel
(``ops/intersection.intersect_counts``) over its share of the
wedge-budget chunks; one psum combines totals and per-vertex counts.
Comm is O(V) once (the vcounts psum), zero per chunk.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..enactor import Timer
from ..graph.csr import CsrGraph, from_coo
from ..models.tc import _tc_prepare
from ..ops.intersection import intersect_counts
from ..utils.info import make_info
from .mesh import AXIS, make_mesh

__all__ = ["tc_sharded", "ShardedTcResult"]


@dataclasses.dataclass
class ShardedTcResult:
    total: int
    vertex_counts: np.ndarray
    info: dict


def tc_sharded(graph: Union[CsrGraph], *, num_shards: int = None,
               mesh: Optional[Mesh] = None,
               undirected_input: bool = True) -> ShardedTcResult:
    timer = Timer()
    g = graph
    if not undirected_input:
        src = g.edge_sources()
        g = from_coo(g.num_nodes, src, g.col_indices, undirected=True)
    if mesh is None:
        mesh = make_mesh(num_shards)
    p = mesh.devices.size

    with timer.time("preprocess_ms"):
        prep = _tc_prepare(g)
        bounds = prep.bounds
        nchunks = len(bounds) - 1
        cps = max(1, -(-nchunks // p))        # chunks per shard
        # (p*cps, chunk_e) chunk tables; empty tail chunks have ne=0.
        csrc = np.zeros((p * cps, prep.chunk_e), np.int32)
        cdst = np.zeros((p * cps, prep.chunk_e), np.int32)
        ne = np.zeros((p * cps,), np.int32)
        for ci, (a, b) in enumerate(zip(bounds, bounds[1:])):
            csrc[ci, : b - a] = prep.esrc_full[a:b]
            cdst[ci, : b - a] = prep.col[a:b]
            ne[ci] = b - a

    wedge_cap = prep.wedge_cap
    v_pad = prep.v_pad

    def shard_fn(row, col, esrc, csrc_l, cdst_l, ne_l):
        row = row.reshape(-1)
        col = col.reshape(-1)
        esrc = esrc.reshape(-1)
        csrc_l = csrc_l.reshape(cps, -1)
        cdst_l = cdst_l.reshape(cps, -1)
        ne_l = ne_l.reshape(-1)

        def body(_, ch):
            cs, cd, n = ch
            counts, vcounts, _ = intersect_counts(
                row, col, esrc, cs, cd, n, wedge_cap)
            return None, (counts, vcounts)

        _, (counts, vc_chunks) = jax.lax.scan(
            body, None, (csrc_l, cdst_l, ne_l))
        return vc_chunks, counts

    # Graph arrays replicated; chunk tables sharded.
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS, None))))

    with timer.time("process_ms"):
        vc_chunks, counts = jax.block_until_ready(fn(
            jnp.asarray(prep.row), jnp.asarray(prep.col),
            jnp.asarray(prep.esrc_pad), jnp.asarray(csrc),
            jnp.asarray(cdst), jnp.asarray(ne)))
        # Per-chunk device results accumulate on the HOST in int64 —
        # the single-chip contract (models/tc.py): per-chunk int32 is
        # safe (chunk wedge caps bound them) but a cross-chunk device
        # accumulator could overflow on huge graphs.
        vc = np.asarray(vc_chunks).reshape(
            p * cps, -1).sum(axis=0, dtype=np.int64)
        counts_np = np.asarray(counts).reshape(p * cps, -1)
        tot = sum(int(counts_np[ci, : ne[ci]].sum(dtype=np.int64))
                  for ci in range(p * cps))

    info = make_info(
        primitive="tc_sharded", graph=g, timer=timer,
        edges_visited=prep.wedge_total,
        extra={"num_shards": int(p), "num_triangles": int(tot),
               "wedges_probed": prep.wedge_total,
               "num_chunks": nchunks,
               "chunks_per_shard": int(cps)},
    )
    return ShardedTcResult(
        total=int(tot),
        vertex_counts=np.asarray(vc)[: g.num_nodes],
        info=info)
