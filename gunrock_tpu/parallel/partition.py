"""Graph partitioning for multi-chip execution.

TPU-native rebuild of the reference's partitioning subsystem
(``gunrock/app/partitioner_base.cuh`` + ``app/{rp,brp,cp,sp,metisp,dup}/``).
The reference assigns each vertex an owner GPU (``partition_tables``) and
builds per-GPU sub-CSRs with renumbered locals + appended ghost stubs
(``MakeSubGraph_Thread``, ``partitioner_base.cuh:261-489``).

The TPU formulation is stronger: every partitioner is expressed as a
**relabeling permutation** — vertices are renumbered so that shard ``i``
owns the contiguous global range ``[i*S, (i+1)*S)``. Then:

  * ``owner(v) = v // S`` is pure arithmetic — the reference's
    ``partition_table``/``convertion_table`` gathers disappear entirely;
  * per-shard CSRs stack into dense ``(p, S+1)`` / ``(p, E_shard)`` arrays
    that ``shard_map`` splits across the mesh with zero copies.

Partition methods (reference method strings, ``problem_base.cuh:1640-1677``):
  "static"     contiguous ranges (app/sp)           -> identity permutation
  "random"     uniform random    (app/rp, default)  -> random permutation
  "biasrandom" degree-balanced random (app/brp)     -> greedy bin-pack by degree
  "cluster"    locality clustering (app/cp)         -> BFS traversal order
  "metis"      min-cut (app/metisp, needs libmetis) -> BFS order fallback here
  "duplicate"  full replication (app/dup)           -> replicated execution
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import CsrGraph
from ..graph.device import round_up

__all__ = ["PartitionedGraph", "partition", "make_permutation"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row_offsets", "col_indices", "edge_values",
                 "csc_offsets", "csc_indices", "csc_edge_values"],
    meta_fields=["num_nodes", "num_edges", "num_shards", "shard_size",
                 "e_shard_pad"],
)
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Vertex-sharded CSR in relabeled id space.

    Shard ``i`` owns relabeled vertices ``[i*shard_size, (i+1)*shard_size)``
    and stores the CSR rows of exactly those vertices; ``col_indices`` are
    *global relabeled* ids (possibly remote). Arrays are stacked on a
    leading shard axis for ``shard_map``.
    """

    num_nodes: int        # original vertex count
    num_edges: int
    num_shards: int
    shard_size: int       # S, multiple of 128; global padded V = p * S
    e_shard_pad: int      # per-shard edge capacity
    row_offsets: jax.Array    # (p, S+1) int32, local edge offsets
    col_indices: jax.Array    # (p, e_shard_pad) int32 global relabeled ids
    edge_values: Optional[jax.Array]   # (p, e_shard_pad) float32
    csc_offsets: Optional[jax.Array]   # (p, S+1) inverse CSR of owned verts
    csc_indices: Optional[jax.Array]   # (p, e_shard_pad) global sources
    csc_edge_values: Optional[jax.Array]

    @property
    def v_global_pad(self) -> int:
        return self.num_shards * self.shard_size


def _assignment(g: CsrGraph, method: str, num_shards: int,
                seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(shard_of, slot)`` per old vertex id.

    ``shard_of[v]`` is the owner shard; ``slot[v]`` the dense within-shard
    position. All methods produce near-equal shard populations.
    """
    n = g.num_nodes
    chunk = max(-(-n // num_shards), 1)

    def from_order(order: np.ndarray):
        """Contiguous chunks of a global vertex ordering -> shards."""
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n)
        return rank // chunk, rank % chunk

    if method in ("static", "duplicate"):
        return from_order(np.arange(n, dtype=np.int64))
    if method == "random":
        rng = np.random.default_rng(seed)
        return from_order(rng.permutation(n).astype(np.int64))
    if method == "biasrandom":
        # Degree-balanced: snake-assign vertices by descending degree
        # (reference brp biases assignment by degree,
        # app/brp/brp_partitioner.cuh).
        deg = g.out_degrees
        order = np.argsort(-deg, kind="stable")  # heavy vertices first
        shard_of = np.empty(n, dtype=np.int64)
        slot = np.empty(n, dtype=np.int64)
        counts = np.zeros(num_shards, dtype=np.int64)
        cycle = np.arange(n) % (2 * num_shards)
        snake = np.where(cycle < num_shards, cycle,
                         2 * num_shards - 1 - cycle)
        for rank, v in enumerate(order):
            s = snake[rank]
            shard_of[v] = s
            slot[v] = counts[s]
            counts[s] += 1
        return shard_of, slot
    if method in ("cluster", "metis"):
        # Locality ordering: multi-source BFS traversal order keeps
        # neighborhoods in the same shard (greedy clustering stand-in for
        # app/cp and the libmetis-backed app/metisp).
        row, col = g.row_offsets, g.col_indices
        seen = np.zeros(n, dtype=bool)
        order = np.empty(n, dtype=np.int64)
        k = 0
        for root in range(n):
            if seen[root]:
                continue
            seen[root] = True
            q = deque([root])
            while q:
                u = q.popleft()
                order[k] = u
                k += 1
                for e in range(row[u], row[u + 1]):
                    v = col[e]
                    if not seen[v]:
                        seen[v] = True
                        q.append(v)
        return from_order(order)
    raise ValueError(f"unknown partition method {method!r}")


def make_permutation(g: CsrGraph, method: str, num_shards: int,
                     seed: int = 0) -> tuple[np.ndarray, int]:
    """Return ``(perm, shard_size)`` with ``perm[old_id] = new_id``.

    ``new_id = shard_of * shard_size + slot``; ``shard_size`` is padded to
    a lane multiple, so new ids may be sparse (gaps are zero-degree padding
    vertices).
    """
    shard_of, slot = _assignment(g, method, num_shards, seed)
    max_count = int(slot.max(initial=0)) + 1 if g.num_nodes else 1
    S = round_up(max_count)
    return shard_of * S + slot, S


def partition(g: CsrGraph, num_shards: int, *, method: str = "random",
              seed: int = 0, with_csc: bool = False,
              with_edge_values: bool = False) -> tuple[PartitionedGraph,
                                                       np.ndarray]:
    """Partition + relabel ``g`` into ``num_shards`` vertex shards.

    Returns ``(pg, perm)`` where ``perm[old] = new``; results computed in
    relabeled space map back via ``out[old] = result[perm[old]]``.
    """
    n = g.num_nodes
    perm, S = make_permutation(g, method, num_shards, seed)
    v_pad = num_shards * S

    # Relabel edges: new src/dst.
    src_new = perm[g.edge_sources()]
    dst_new = perm[g.col_indices]
    order = np.lexsort((dst_new, src_new))
    src_new, dst_new = src_new[order], dst_new[order]
    vals = None
    if with_edge_values:
        ev = g.edge_values
        if ev is None:
            ev = np.ones(g.num_edges, dtype=np.float32)
        vals = ev[order]

    def build_stacked(src_arr, dst_arr, val_arr):
        counts = np.bincount(src_arr, minlength=v_pad).astype(np.int64)
        shard_edges = counts.reshape(num_shards, S).sum(axis=1)
        e_shard = round_up(max(int(shard_edges.max(initial=0)), 1))
        row = np.zeros((num_shards, S + 1), dtype=np.int32)
        colx = np.zeros((num_shards, e_shard), dtype=np.int32)
        valx = (np.zeros((num_shards, e_shard), dtype=np.float32)
                if val_arr is not None else None)
        glob_offsets = np.zeros(v_pad + 1, dtype=np.int64)
        np.cumsum(counts, out=glob_offsets[1:])
        for p in range(num_shards):
            lo = glob_offsets[p * S]
            hi = glob_offsets[(p + 1) * S]
            row[p] = (glob_offsets[p * S:(p + 1) * S + 1] - lo).astype(np.int32)
            colx[p, : hi - lo] = dst_arr[lo:hi]
            if valx is not None:
                valx[p, : hi - lo] = val_arr[lo:hi]
        return row, colx, valx

    row, colx, valx = build_stacked(src_new, dst_new, vals)

    csc_row = csc_col = csc_val = None
    if with_csc:
        orderT = np.lexsort((src_new, dst_new))
        csc_row, csc_col, csc_val = build_stacked(
            dst_new[orderT], src_new[orderT],
            vals[orderT] if vals is not None else None)

    pg = PartitionedGraph(
        num_nodes=n,
        num_edges=g.num_edges,
        num_shards=num_shards,
        shard_size=S,
        e_shard_pad=colx.shape[1],
        row_offsets=jnp.asarray(row),
        col_indices=jnp.asarray(colx),
        edge_values=jnp.asarray(valx) if valx is not None else None,
        csc_offsets=jnp.asarray(csc_row) if csc_row is not None else None,
        csc_indices=jnp.asarray(csc_col) if csc_col is not None else None,
        csc_edge_values=(jnp.asarray(csc_val)
                         if csc_val is not None else None),
    )
    return pg, perm
