"""Multi-chip Connected Components: Shiloach–Vishkin-style min-label
hooking + pointer jumping over a vertex-sharded mesh.

The reference CC (``gunrock/app/cc/cc_enactor.cuh``, Soman hooking +
pointer jumping as filter-only edge-list iterations) becomes, per
superstep on each shard:

  1. ``all_gather`` of the component vector (the activation exchange —
     CC reads every neighbor's component, so the boundary set is the
     whole vector; the reference ships this as vertex-associates)
  2. hook: comp[u] <- min(comp[u], min over out-neighbors comp[v])
     — one sorted segmented min over the local CSR rows
  3. pointer jump: comp <- comp[comp] (log-collapse of trees), also
     over the gathered vector

Termination: ``psum`` of per-shard change counts == 0 (``All_Done``,
``enactor_helper.cuh:36``). Requires the symmetrized (undirected) graph,
same as the reference's CC.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..enactor import Timer
from ..graph.csr import CsrGraph
from ..utils.info import make_info
from .mesh import AXIS, make_mesh
from ..ops.segment import row_reduce_sorted
from .partition import PartitionedGraph, partition

__all__ = ["cc_sharded", "cc_sharded_device", "ShardedCcResult"]


@dataclasses.dataclass
class ShardedCcResult:
    components: np.ndarray
    num_components: int
    info: dict


def _make_cc_fn(pg: PartitionedGraph, *, axis: str, mesh: Mesh):
    S = pg.shard_size

    def shard_fn(row, col, vmask, max_iters):
        row = row.reshape(-1)            # (S+1,)
        col = col.reshape(-1)            # (E_shard,) global dst ids
        vmask = vmask.reshape(-1)        # (S,) real-vertex mask
        my_base = jax.lax.axis_index(axis).astype(jnp.int32) * S

        lane = jnp.arange(col.shape[0], dtype=jnp.int32)
        evalid = lane < row[-1]
        col_safe = jnp.where(evalid, col, 0)

        vid = my_base + jnp.arange(S, dtype=jnp.int32)
        comp0 = jnp.where(vmask, vid, jnp.int32(0x7FFFFFFF))

        def cond(carry):
            comp, changed, it = carry
            return (changed > 0) & (it < max_iters)

        def body(carry):
            comp, _, it = carry
            compG = jax.lax.all_gather(comp, axis, tiled=True)  # (p*S,)
            # Hook: min over out-neighbors' components.
            nbr = jnp.where(evalid, compG[col_safe], jnp.int32(0x7FFFFFFF))
            m = row_reduce_sorted(nbr, row, op="min")
            hooked = jnp.minimum(comp, m)
            # Pointer jumping: comp <- comp[comp], twice per superstep
            # (each application halves tree height).
            j1 = jnp.where(vmask, compG[jnp.minimum(hooked, compG.shape[0] - 1)],
                           hooked)
            jumped = jnp.minimum(hooked, j1)
            changed_local = jnp.sum((jumped != comp).astype(jnp.int32))
            changed = jax.lax.psum(changed_local, axis)
            return jumped, changed, it + 1

        comp, _, iters = jax.lax.while_loop(
            cond, body, (comp0, jnp.int32(1), jnp.int32(0)))
        return comp, iters

    in_specs = (P(AXIS, None), P(AXIS, None), P(AXIS), P())
    out_specs = (P(AXIS), P())
    return jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))


def cc_sharded_device(pg: PartitionedGraph, *, mesh: Optional[Mesh] = None,
                      vmask_new: jax.Array, max_iters: Optional[int] = None):
    if mesh is None:
        mesh = make_mesh(pg.num_shards)
    if max_iters is None:
        max_iters = 4 * int(np.ceil(np.log2(max(pg.num_nodes, 2)))) + 16
    fn = _make_cc_fn(pg, axis=AXIS, mesh=mesh)
    return fn(pg.row_offsets, pg.col_indices,
              vmask_new.reshape(pg.num_shards, pg.shard_size),
              jnp.int32(max_iters))


def cc_sharded(graph: CsrGraph, *, num_shards: int = None,
               partition_method: str = "random", seed: int = 0,
               mesh: Optional[Mesh] = None) -> ShardedCcResult:
    """Partition + run CC across the mesh; components labeled by the
    minimum original vertex id present in each component."""
    timer = Timer()
    if mesh is None:
        mesh = make_mesh(num_shards)
    num_shards = mesh.devices.size

    with timer.time("partition_ms"):
        pg, perm = partition(graph, num_shards, method=partition_method,
                             seed=seed)
        vmask = np.zeros(pg.v_global_pad, bool)
        vmask[perm] = True

    with timer.time("process_ms"):
        comp_new, iters = jax.block_until_ready(
            cc_sharded_device(pg, mesh=mesh, vmask_new=jnp.asarray(vmask)))

    # Back to original ids: component representative = min ORIGINAL id.
    comp_old = np.asarray(comp_new)[perm]          # rep in relabeled space
    inv = np.zeros(pg.v_global_pad, np.int64)
    inv[perm] = np.arange(graph.num_nodes)
    rep_old = inv[comp_old]                        # rep as original id
    # Normalize: representative = min original id within each component.
    mins = np.full(graph.num_nodes, np.iinfo(np.int64).max)
    np.minimum.at(mins, rep_old, np.arange(graph.num_nodes))
    comp = mins[rep_old].astype(np.int32)
    num_components = int(np.unique(comp).size)
    info = make_info(
        primitive="cc_sharded", graph=graph, timer=timer,
        edges_visited=graph.num_edges * int(iters),
        extra={"num_shards": int(num_shards),
               "num_components": num_components,
               "num_iterations": int(iters),
               "partition_method": partition_method},
    )
    return ShardedCcResult(components=comp, num_components=num_components,
                           info=info)
