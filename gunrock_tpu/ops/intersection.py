"""Segmented intersection operator — the reference's documented 4th
operator (``doc/programming_model.md`` "Operators": advance / filter /
compute / *segmented intersection*, used for triangle counting; the CUDA
implementation is absent from the reference snapshot, only the doc and
``util/join.cuh`` leftovers exist).

TPU formulation: instead of per-thread sorted-list merges, intersection
sizes are computed as one dense dataflow —

    wedges  = advance over the second endpoint's adjacency  (merge-path)
    probe   = lane-parallel binary search of w inside the sorted CSR row
              of u (int32-safe; no global V*V keys needed)
    count   = segmented sum of hits per originating edge

Every lane does one O(log max_degree) probe: load-balanced by
construction, no TWC-style dynamic grouping needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["row_probe", "intersect_counts"]


def row_probe(row_offsets: jax.Array, col_indices: jax.Array,
              u: jax.Array, w: jax.Array, steps: int) -> jax.Array:
    """Lane-parallel membership test: is ``w`` in the sorted CSR row of
    ``u``? ``steps`` must be >= ceil(log2(max_degree + 1)) (static)."""
    e_pad = col_indices.shape[0]
    lo = row_offsets[u]
    hi = row_offsets[u + 1]
    end = hi

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        val = col_indices[jnp.minimum(mid, e_pad - 1)]
        go_right = val < w
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(go_right, hi, mid))

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return (lo < end) & (col_indices[jnp.minimum(lo, e_pad - 1)] == w)


def intersect_counts(row_offsets: jax.Array, col_indices: jax.Array,
                     chunk_src: jax.Array, chunk_dst: jax.Array,
                     num_edges: int, wedge_cap: int,
                     probe_steps: int = 32,
                     ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-edge |N(u) ∩ N(v)| for the edge chunk (chunk_src, chunk_dst)
    over one CSR (typically degree-oriented).

    For each chunk edge e=(u, v), expands the wedge set
    {(u, v, w): w ∈ N(v)} with the same merge-path rank-search as
    :mod:`gunrock_tpu.ops.advance`, then binary-searches each w inside
    u's sorted row. Edge chunking bounds the wedge working set — callers
    size ``wedge_cap`` from the chunk's exact wedge count and loop over
    chunks for big graphs. Returns ``(per_chunk_edge_counts,
    per_vertex_counts, total_wedges)``.
    """
    e_pad = chunk_src.shape[0]
    lane_e = jnp.arange(e_pad, dtype=jnp.int32)
    evalid = lane_e < num_edges
    # Degree of each edge's *destination* = wedge fanout.
    v = jnp.where(evalid, chunk_dst, 0)
    deg = jnp.where(evalid, row_offsets[v + 1] - row_offsets[v], 0)
    ends = jnp.cumsum(deg)
    total = ends[-1] if e_pad else jnp.int32(0)

    j = jnp.arange(wedge_cap, dtype=jnp.int32)
    rank = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    rank_c = jnp.minimum(rank, e_pad - 1)
    seg_end = ends[rank_c]
    wedge_eid = row_offsets[v[rank_c]] + (j - (seg_end - deg[rank_c]))
    mask = j < total
    wedge_eid = jnp.where(mask, wedge_eid, 0)

    u = chunk_src[rank_c]                      # first endpoint
    w = col_indices[wedge_eid]                 # candidate third vertex
    u_safe = jnp.where(mask, u, 0)
    hit = mask & row_probe(row_offsets, col_indices, u_safe, w, probe_steps)

    counts = jax.ops.segment_sum(hit.astype(jnp.int32), rank_c, e_pad)
    counts = jnp.where(evalid, counts, 0)

    # Credit each found triangle (u, v, w) to all three corners.
    hits_i = hit.astype(jnp.int32)
    vwedge = v[rank_c]                         # v of the wedge's edge
    v_pad = row_offsets.shape[0] - 1
    oob = jnp.int32(v_pad)
    vcounts = jnp.zeros((v_pad,), jnp.int32)
    vcounts = vcounts.at[jnp.where(hit, u, oob)].add(hits_i, mode="drop")
    vcounts = vcounts.at[jnp.where(hit, vwedge, oob)].add(hits_i, mode="drop")
    vcounts = vcounts.at[jnp.where(hit, w, oob)].add(hits_i, mode="drop")
    return counts, vcounts, total
