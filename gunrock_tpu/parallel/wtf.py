"""Multi-chip WTF ("Who To Follow"): vertex-sharded three-phase chain.

Beyond the reference's multi-GPU zoo (its ILoop apps cover
bfs/sssp/bc/cc/pr only); this runs the reference's exact WTF phase chain
(``wtf_enactor.cuh:236-565``, single-chip rebuild in ``models/wtf.py``)
over a ``shard_map`` mesh:

  1. **Personalized PageRank** — a csc-direction sharded SpMV per
     iteration (same boundary-only ``ghost_exchange`` as sharded
     PageRank), convergence via a ``psum``'d L1 diff.
  2. **Circle of trust** — a distributed top-k: each shard two-key sorts
     ``(-ppr, original_id)`` and contributes its top ``min(k, S)``
     candidates; one ``all_gather`` + a second two-key sort picks the
     global top ``cot_size``. Tie-breaking by ORIGINAL vertex id
     reproduces the single-chip ``lax.top_k`` selection exactly (exact
     rank ties — e.g. the zero-PPR cluster — land on the same side of
     the CoT boundary on any mesh size / partition).
  3. **Personalized SALSA over CoT out-edges** — dual-direction sweeps
     (csc for refscores, forward for hub ranks) with the CoT as a
     multiplicative edge-source mask; both directions ship only
     boundary values.
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
from ..models.wtf import COT_SIZE
from ..ops.segment import row_reduce_sorted
from ..utils.info import make_info
from .comm import ghost_exchange
from .mesh import AXIS, make_mesh, pvary
from .partition import PartitionedGraph, partition

__all__ = ["wtf_sharded", "ShardedWtfResult"]


@dataclasses.dataclass
class ShardedWtfResult:
    node_ids: np.ndarray    # recommended vertices, best first
    scores: np.ndarray      # their refscores
    ppr_ranks: np.ndarray   # (V,) personalized PageRank from phase 1
    info: dict


def _make_wtf_fn(pg: PartitionedGraph, *, axis: str, mesh: Mesh,
                 delta: float, alpha: float, cot_cap: int,
                 comm_latency: int):
    S = pg.shard_size
    p = pg.num_shards
    n = pg.num_nodes
    G = pg.ghost_cap
    Gf = pg.fwd_ghost_cap
    kcap = min(cot_cap, S)
    # A global top-cot_cap vertex is beaten by < cot_cap others, so it is
    # within its own shard's top-min(cot_cap, S): per-shard truncation to
    # kcap candidates is lossless.
    salsa_iters = int(1.0 / alpha)  # reference wtf_enactor.cuh:464

    def shard_fn(csc_off, csc_local, row_off, col_local, send_idx,
                 fwd_send_idx, vmask_local, orig_id, src_new, max_iters,
                 threshold):
        csc_off = csc_off.reshape(-1)        # (S+1,)
        csc_local = csc_local.reshape(-1)
        row_off = row_off.reshape(-1)
        col_local = col_local.reshape(-1)
        send_idx = send_idx.reshape(p, G)
        fwd_send_idx = fwd_send_idx.reshape(p, Gf)
        vmask_local = vmask_local.reshape(-1)
        orig_id = orig_id.reshape(-1)
        pid = jax.lax.axis_index(axis)
        my_base = pid * S
        lane_v = jnp.arange(S, dtype=jnp.int32)
        lane_c = jnp.arange(csc_local.shape[0], dtype=jnp.int32)
        lane_f = jnp.arange(col_local.shape[0], dtype=jnp.int32)

        out_deg = (row_off[1:] - row_off[:-1]).astype(jnp.float32)
        inv_out = jnp.where(out_deg > 0, 1.0 / jnp.maximum(out_deg, 1.0),
                            0.0)
        is_src = (lane_v + my_base) == src_new

        def csc_sweep(contrib):
            table = ghost_exchange(axis, contrib, send_idx,
                                   comm_latency=comm_latency)
            vals = table[jnp.where(lane_c < csc_off[-1], csc_local, 0)]
            return row_reduce_sorted(vals, csc_off, op="sum")

        def fwd_sweep(contrib):
            table = ghost_exchange(axis, contrib, fwd_send_idx,
                                   comm_latency=comm_latency)
            vals = table[jnp.where(lane_f < row_off[-1], col_local, 0)]
            return row_reduce_sorted(vals, row_off, op="sum")

        # ---- phase 1: personalized PageRank (wtf_functor.cuh:91,118)
        rank0 = jnp.where(vmask_local, 1.0 / n, 0.0).astype(jnp.float32)

        def pr_cond(carry):
            _, diff, it = carry
            return (diff > threshold) & (it < max_iters)

        def pr_body(carry):
            rank, _, it = carry
            incoming = csc_sweep(rank * inv_out)
            new_rank = delta * incoming + (1.0 - delta) * is_src
            new_rank = jnp.where(vmask_local, new_rank, 0.0)
            diff = jax.lax.psum(jnp.sum(jnp.abs(new_rank - rank)), axis)
            return new_rank, diff, it + 1

        ppr, _, ppr_iters = jax.lax.while_loop(
            pr_cond, pr_body, (rank0, jnp.float32(jnp.inf), jnp.int32(0)))

        # ---- phase 2: circle of trust = distributed top-k by PPR rank.
        # Two-key sort (-rank, original id) everywhere so exact ties
        # resolve identically to single-chip lax.top_k (smallest original
        # id wins).
        neg = jnp.where(vmask_local, -ppr, 2.0)  # pad slots sort last
        okey = jnp.where(vmask_local, orig_id, jnp.int32(2**30))
        gid = lane_v + my_base
        lneg, loid, lgid = jax.lax.sort((neg, okey, gid), num_keys=2)
        cand = jax.lax.all_gather(
            (lneg[:kcap], loid[:kcap], lgid[:kcap]), axis)
        fneg, foid, fgid = (c.reshape(-1) for c in cand)   # (p*kcap,)
        sneg, _, sgid = jax.lax.sort((fneg, foid, fgid), num_keys=2)
        sel_neg, sel_gid = sneg[:cot_cap], sgid[:cot_cap]
        mine = (sel_gid >= my_base) & (sel_gid < my_base + S) \
            & (sel_neg < 2.0)
        cot_mask = jnp.zeros((S,), bool).at[
            jnp.where(mine, sel_gid - my_base, 0)].max(mine)
        cot_f = cot_mask.astype(jnp.float32)

        # CoT in-degrees (CotFunctor atomicAdd, wtf_functor.cuh:219)
        cot_indeg = csc_sweep(cot_f)
        inv_cot_in = jnp.where(cot_indeg > 0,
                               1.0 / jnp.maximum(cot_indeg, 1.0), 0.0)

        # ---- phase 3: personalized SALSA over CoT out-edges
        # (wtf_enactor.cuh:350-365); cot_f masks edge sources.
        rank0 = is_src.astype(jnp.float32)
        # mesh.pvary shim, not jax.lax.pvary directly: survives the
        # pvary/pcast API churn across jax versions like every other
        # sharded primitive.
        ref0 = pvary(jnp.zeros((S,), jnp.float32), axis)

        def s_body(i, carry):
            rank, _ = carry
            ref = csc_sweep(rank * inv_out * cot_f)
            hub = fwd_sweep(ref * inv_cot_in)
            rank = cot_f * (is_src * alpha * inv_out * out_deg
                            + (1.0 - alpha) * hub)
            return rank, ref

        _, refscore = jax.lax.fori_loop(0, salsa_iters, s_body,
                                        (rank0, ref0))
        refscore = jnp.where(vmask_local, refscore, 0.0)
        return ppr, refscore, ppr_iters

    in_specs = (P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS, None),
                P(AXIS, None, None), P(AXIS, None, None), P(AXIS), P(AXIS),
                P(), P(), P())
    out_specs = (P(AXIS), P(AXIS), P())
    return jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))


def wtf_sharded(graph: CsrGraph, src: int = 0, *, delta: float = 0.85,
                alpha: float = 0.2, max_iters: int = 50,
                threshold: float = 1e-6, num_shards: int = None,
                partition_method: str = "random", seed: int = 0,
                mesh: Optional[Mesh] = None,
                comm_latency: int = 0) -> ShardedWtfResult:
    """Sharded WTF; single-chip semantics (``models/wtf.py``) with
    boundary-only exchanges in every phase."""
    timer = Timer()
    if not 0 <= int(src) < graph.num_nodes:
        raise ValueError(f"src {src} out of range [0, {graph.num_nodes})")
    if mesh is None:
        mesh = make_mesh(num_shards)
    num_shards = mesh.devices.size
    cot_cap = min(COT_SIZE, graph.num_nodes)

    with timer.time("partition_ms"):
        pg, perm = partition(graph, num_shards, method=partition_method,
                             seed=seed, with_csc=True, with_ghosts=True)
        vmask_new = np.zeros(pg.v_global_pad, bool)
        vmask_new[perm] = True
        orig_id = np.full(pg.v_global_pad, 2**30, np.int32)
        orig_id[perm] = np.arange(graph.num_nodes, dtype=np.int32)

    fn = _make_wtf_fn(pg, axis=AXIS, mesh=mesh, delta=float(delta),
                      alpha=float(alpha), cot_cap=cot_cap,
                      comm_latency=comm_latency)
    with timer.time("process_ms"):
        ppr, refscore, ppr_iters = jax.block_until_ready(fn(
            pg.csc_offsets, pg.csc_local, pg.row_offsets, pg.col_local,
            pg.ghost_send_idx, pg.fwd_ghost_send_idx,
            jnp.asarray(vmask_new).reshape(num_shards, pg.shard_size),
            jnp.asarray(orig_id).reshape(num_shards, pg.shard_size),
            jnp.int32(perm[int(src)]), jnp.int32(max_iters),
            jnp.float32(threshold)))

    ppr_out = np.asarray(ppr).reshape(-1)[perm]
    ref_out = np.asarray(refscore).reshape(-1)[perm]
    # Final ranking: score desc, original id asc — single-chip
    # lax.top_k tie order.
    order = np.lexsort((np.arange(graph.num_nodes), -ref_out))[:cot_cap]
    bytes_per_step = num_shards * (num_shards - 1) * \
        (pg.ghost_cap + pg.fwd_ghost_cap) * 4
    info = make_info(
        primitive="wtf_sharded", graph=graph, timer=timer,
        edges_visited=graph.num_edges * int(ppr_iters),
        extra={"src": int(src), "delta": delta, "alpha": alpha,
               "ppr_iterations": int(ppr_iters),
               "num_shards": int(num_shards),
               "partition_method": partition_method,
               "ghost_cap": int(pg.ghost_cap),
               "fwd_ghost_cap": int(pg.fwd_ghost_cap),
               "comm_bytes_per_superstep": int(bytes_per_step),
               "comm_latency_rounds": comm_latency},
    )
    return ShardedWtfResult(node_ids=order.astype(np.int32),
                            scores=ref_out[order], ppr_ranks=ppr_out,
                            info=info)
