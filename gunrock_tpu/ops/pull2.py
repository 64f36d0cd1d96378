"""Write-minimal blocked value pull (v2): VMEM-accumulator pull-reduce.

out[v] = op over in-edges (u, v) of f(values[u], w_uv), computed in ONE
pallas kernel that writes ONLY the (v_pad,) result. See
``graph/pull2.py`` for the layout and the measured cost law that forces
this shape (HBM writes ~0.5-3.3 GB/s on the tunnel vs reads 40-70 GB/s:
the round-4 pipeline's E-scale scan + K*V sample writes were ~93% of
its 145 ms/pass).

Per block (one grid step, sequential on the TPU core):

1. gather ``values[src]`` by scanning the block's group table slice
   (``rpg_v`` rows resident in VMEM; per-lane take_along_axis handles
   the lane axis for free, rows are scanned in 8-row slabs),
2. segmented reduce by destination (inclusive scan, carry spliced
   across blocks, carry reset at group boundaries),
3. extract each destination run's full value at its static ``lastpos``
   slot (sign-encoded positions DMA'd per block; monotone 8-row slab
   walk over the VMEM scan — dynamic fori bounds skip untouched slabs),
4. combine the dense (span_rows, 128) window into the VMEM-resident
   accumulator (= the kernel output, constant index_map: flushed to HBM
   once at grid end).

Replaces the reference's atomic pull accumulation
(``gunrock/oprtr/edge_map_backward/kernel.cuh``,
``app/pr/pr_functor.cuh:60-75`` atomicAdd) with a deterministic
single-writer reduction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _seg_scan_val

__all__ = ["pull_reduce2", "pull_min_sweeps", "pull_power_iters",
           "brandes_fwd_levels", "brandes_bwd_levels", "PULL2_MAX_ROWS"]

LANE = 128
PULL2_MAX_ROWS = 16384       # accumulator rows cap (8 MB f32 VMEM at 16k)


def _identity(op: str) -> float:
    return 0.0 if op == "sum" else float("inf")


def _combine(op: str):
    return (lambda a, b: a + b) if op == "sum" else jnp.minimum


def _pull2_kernel(rows_v: int, rpg_v: int, span_rows: int, block_rows: int,
                  op: str, wmode: str, has_init: bool, ablate: str, *refs):
    i = 0
    gob_ref, d0_ref, nt_ref = refs[0], refs[1], refs[2]
    i = 3
    t_ref, src_ref, dst_ref = refs[i], refs[i + 1], refs[i + 2]
    i += 3
    w_ref = None
    if wmode in ("add", "mul"):
        w_ref = refs[i]
        i += 1
    pos_ref = refs[i]
    cb_ref = refs[i + 1]
    i += 2
    init_ref = None
    if has_init:
        init_ref = refs[i]
        i += 1
    (o_ref, scan_ref, posbuf, win_ref, cbbuf, smi, smf, sem,
     sem2, sem3) = refs[i:i + 10]

    k = pl.program_id(0)
    g = gob_ref[k]
    d0 = d0_ref[k]
    identity = jnp.float32(_identity(op))
    combine = _combine(op)
    BE = block_rows * LANE

    # positions window + slab-range DMAs (overlap the gather/scan below)
    ntiles = span_rows // 32
    cp = pltpu.make_async_copy(
        pos_ref.at[pl.ds(g * rows_v + d0, span_rows), :], posbuf, sem)
    cp.start()
    cpc = pltpu.make_async_copy(
        cb_ref.at[pl.ds(k, 1), :], cbbuf, sem2)
    cpc.start()

    @pl.when(k == 0)
    def _():
        if has_init:
            # init lives in ANY memory; one blocking DMA into the
            # accumulator
            cpi = pltpu.make_async_copy(init_ref, o_ref, sem3)
            cpi.start()
            cpi.wait()
        else:
            o_ref[...] = jnp.full((rows_v, LANE), identity, jnp.float32)
        smi[0, 0] = -1            # carry dst key
        smi[0, 1] = -1            # carry group
        smf[0, 0] = identity

    src = src_ref[...]
    dst = dst_ref[...]
    shape = src.shape

    vrow_l = jax.lax.shift_right_logical(src, 7) - g * rpg_v
    vlane = src & (LANE - 1)

    def body(gg, acc):
        slab = t_ref[pl.ds(gg * 8, 8), :]
        for u in range(8):
            rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
            rowc = jnp.take_along_axis(rowv, vlane, axis=1)
            acc = jnp.where(vrow_l == gg * 8 + u, rowc, acc)
        return acc

    if ablate == "nogather":       # probe hook: charge everything else
        val = src.astype(jnp.float32) * 1e-9
    else:
        val = jax.lax.fori_loop(0, rpg_v // 8, body,
                                jnp.full(shape, identity, jnp.float32))
    if wmode == "add":
        val = val + w_ref[...]
    elif wmode == "mul":
        val = val * w_ref[...]
    elif wmode == "incr":        # unit weights without a w stream (BFS)
        val = val + 1.0

    # carry splice, guarded by group (a fresh group's leading run may
    # reuse the previous group's final dst id — round-4 layouts relied
    # on pad-dst luck here; v2 makes the reset explicit)
    splice = (dst == smi[0, 0]) & (g == smi[0, 1])
    if op == "min":
        val = jnp.where(splice, jnp.minimum(val, smf[0, 0]), val)
    else:
        rowpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lanepos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        first = (rowpos == 0) & (lanepos == 0) & splice
        val = jnp.where(first, val + smf[0, 0], val)

    scan = _seg_scan_val(val, dst, op)
    scan_ref[...] = scan
    smf[0, 0] = scan[block_rows - 1, LANE - 1]
    smi[0, 0] = dst[block_rows - 1, LANE - 1]
    smi[0, 1] = g

    cp.wait()
    cpc.wait()                     # ALWAYS drain (an in-flight DMA at
    if ablate == "noextract":      # kernel end wedges the device)
        o_ref[pl.ds(d0, 8), :] = jnp.broadcast_to(
            scan[0:1, :], (8, LANE))
        return
    base = k * BE
    nt = nt_ref[k]
    slab_rows = min(32, block_rows)
    # Per-tile contributions build in the window scratch (static tile
    # offsets); ONE dynamic read-combine-write against the accumulator
    # per block. Slab ranges come precomputed from the layout via SMEM
    # (pv2_cb) — no vector->scalar extractions in the loop.
    win_ref[...] = jnp.full((span_rows, LANE), identity, jnp.float32)
    for t in range(span_rows // 32):
        # dead window tiles (beyond the block's static tail span) cost
        # one scalar compare; their window rows stay identity.
        @pl.when(t < nt)
        def _():
            enc = posbuf[t * 32:(t + 1) * 32, :]
            p = enc & 0x7FFFFFFF
            local = p - base
            ok = (enc >= 0) & (local >= 0) & (local < BE)
            lcl = jnp.clip(local, 0, BE - 1)
            lrow = jax.lax.shift_right_logical(lcl, 7)
            llane = lcl & (LANE - 1)
            packed = cbbuf[0, t]
            c0 = packed >> 16
            c1 = packed & 0xFFFF
            # live scan-row range from the positions themselves
            # (monotone + carry-filled): visit 8-row sub-slabs over
            # exactly [min, max] of the tile's valid rows — tighter
            # than the 32-row cb ranges; a tile with no valid slot
            # costs two reduces (lo > hi: zero trips).
            lo = jnp.min(jnp.where(ok, lrow, BE)) // 8
            hi = jnp.max(jnp.where(ok, lrow, -1)) // 8

            def visit(c, acc):
                slab = scan_ref[pl.ds(c * 8, 8), :]
                for u in range(8):
                    rowv = jnp.broadcast_to(slab[u:u + 1, :], (32, LANE))
                    sel = ok & (lrow == c * 8 + u)
                    acc = jnp.where(
                        sel, jnp.take_along_axis(rowv, llane, axis=1),
                        acc)
                return acc

            contrib = jax.lax.fori_loop(
                lo, hi + 1, visit,
                jnp.full((32, LANE), identity, jnp.float32))
            win_ref[t * 32:(t + 1) * 32, :] = contrib
    cur = o_ref[pl.ds(d0, span_rows), :]
    o_ref[pl.ds(d0, span_rows), :] = combine(cur, win_ref[...])


@functools.partial(jax.jit, static_argnames=(
    "rows_v", "rpg_v", "span_rows", "block_rows", "op", "wmode",
    "interpret", "ablate"))
def _pull2_call(table, src2d, dst2d, w2d, pos2d, cb2d, init2d, gob,
                d0row, nt, *,
                rows_v: int, rpg_v: int, span_rows: int, block_rows: int,
                op: str, wmode: str, interpret: bool,
                ablate: str = "full"):
    nblocks = src2d.shape[0] // block_rows
    kernel = functools.partial(
        _pull2_kernel, rows_v, rpg_v, span_rows, block_rows, op, wmode,
        init2d is not None, ablate)
    in_specs = [
        pl.BlockSpec((rpg_v, LANE), lambda k, go, dr, ntr: (go[k], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, LANE), lambda k, go, dr, ntr: (k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, LANE), lambda k, go, dr, ntr: (k, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [table, src2d, dst2d]
    if wmode in ("add", "mul"):
        in_specs.append(pl.BlockSpec((block_rows, LANE),
                                     lambda k, go, dr, ntr: (k, 0),
                                     memory_space=pltpu.VMEM))
        args.append(w2d)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # positions
    args.append(pos2d)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))      # slab ranges
    args.append(cb2d)
    if init2d is not None:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # DMA'd once
        args.append(init2d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows_v, LANE),
                               lambda k, go, dr, ntr: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_rows, LANE), jnp.float32),   # scan
            pltpu.VMEM((span_rows, LANE), jnp.int32),      # positions
            pltpu.VMEM((span_rows, LANE), jnp.float32),    # window acc
            pltpu.SMEM((1, 128), jnp.int32),               # slab ranges
            pltpu.SMEM((1, 2), jnp.int32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),                   # init copy
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_v, LANE), jnp.float32),
        interpret=interpret,
    )(gob, d0row, nt, *args)


def pull_reduce2(values: jax.Array, graph, *, op: str = "sum",
                 wmode: str = "none", init: Optional[jax.Array] = None,
                 weights: str = "val", ablate: str = "full",
                 interpret: bool = False) -> jax.Array:
    """v2 pull-reduce over in-edges using the graph's ``pv2_*`` layout.

    ``wmode``: "none" (values[u]), "add" (values[u]+w), "mul"
    (values[u]*w), "incr" (values[u]+1, no weight stream). ``weights``
    picks the stream for add/mul: "val" (edge values) or "wpr"
    (1/out-degree[src], PageRank contributions). ``init`` seeds the
    accumulator (e.g. current dist for SSSP pull); identity otherwise.
    """
    assert graph.has_pull2, "graph lacks the pull2 layout"
    rows_v = graph.v_pad // LANE
    table = values.astype(jnp.float32).reshape(rows_v, LANE)
    w2d = None
    if wmode in ("add", "mul"):
        w = graph.pv2_val if weights == "val" else graph.pv2_wpr
        assert w is not None, f"pull2 layout lacks the {weights} stream"
        w2d = w.reshape(-1, LANE)
    init2d = None if init is None else \
        init.astype(jnp.float32).reshape(rows_v, LANE)
    out = _pull2_call(
        table, graph.pv2_src.reshape(-1, LANE),
        graph.pv2_dst.reshape(-1, LANE), w2d,
        graph.pv2_pos.reshape(-1, LANE),
        graph.pv2_cb.reshape(-1, 128), init2d,
        graph.pv2_gob, graph.pv2_d0row, graph.pv2_nt,
        rows_v=rows_v, rpg_v=rows_v // graph.pv2_groups,
        span_rows=graph.pv2_span_rows, block_rows=graph.pv2_block_rows,
        op=op, wmode=wmode, interpret=interpret, ablate=ablate)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Kernel B: Gauss-Seidel min-pull sweeps — the iterative-primitive engine
# (SSSP pull Bellman-Ford, deep-regime BFS, CC min-label propagation).
#
# The distance/label vector lives in the VMEM accumulator across a
# (sweeps, nblocks) grid; each block gathers FROM the evolving vector
# (in-place min updates are monotone-safe and propagate within a sweep —
# Gauss-Seidel), odd sweeps process blocks in reverse (backward sweeps
# may compute run-subset minima when a run straddles blocks; min over a
# subset never under-shoots, and convergence is only declared on a
# FORWARD sweep with zero changes). Per-group activity flags skip all
# VPU work for groups whose source rows did not change in the previous
# sweep; a per-sweep changed-count lands in a tiny second output.
#
# This replaces the reference's iterative enactor loops whose per-round
# V-scale buffer writes (~9 ms each on the tunnel) were the entire
# SSSP/BC/deep-regime story (BENCH.md round-4 cost model; reference
# round structure: app/sssp/sssp_enactor.cuh:274-330 near/far piles).
# ---------------------------------------------------------------------------


def _sweeps_kernel(rows_v: int, rpg_v: int, span_rows: int,
                   block_rows: int, nblocks: int, kgroups: int,
                   wmode: str, *refs):
    (gob_ref, d0_ref, nt_ref, act0_ref, src_ref, dst_ref) = refs[:6]
    i = 6
    w_ref = None
    if wmode in ("add", "mul"):
        w_ref = refs[i]
        i += 1
    pos_ref, cb_ref, init_ref = refs[i:i + 3]
    i += 3
    (o_ref, chg_ref, scan_ref, posbuf, win_ref, cbbuf, smi, smf, act,
     nxt, sem, sem2, sem3) = refs[i:i + 13]

    r = pl.program_id(0)
    b = pl.program_id(1)
    # logical block: odd sweeps run backward
    bb = jnp.where(r % 2 == 1, nblocks - 1 - b, b)
    g = gob_ref[bb]
    d0 = d0_ref[bb]
    identity = jnp.float32(jnp.inf)
    BE = block_rows * LANE

    @pl.when((r == 0) & (b == 0))
    def _():
        # init lives in ANY memory (VMEM can't afford a resident copy):
        # one blocking DMA straight into the accumulator
        cpi = pltpu.make_async_copy(init_ref, o_ref, sem3)
        cpi.start()
        cpi.wait()
        smi[0, 2] = 0                      # per-sweep changed counter
        for gg in range(kgroups):
            # seed from the groups holding finite init entries; the
            # within-sweep dirty check below propagates from there
            act[0, gg] = act0_ref[gg]
            nxt[0, gg] = 0

    @pl.when((b == 0) & (r > 0))
    def _():
        smi[0, 2] = 0                      # per-sweep changed counter
        # Backward sweeps evaluate run-subset minima (a run straddling
        # blocks is seen without its earlier-block candidates), so a
        # forward sweep must RE-CONFIRM everything the backward sweep
        # touched: entering an even sweep, inherit the backward active
        # set in addition to the freshly dirtied groups. This makes
        # "even sweep with zero changes" a sound fixpoint certificate.
        fwd = (r % 2 == 0).astype(jnp.int32)
        for gg in range(kgroups):
            act[0, gg] = jnp.where(fwd > 0, act[0, gg] | nxt[0, gg],
                                   nxt[0, gg])
            nxt[0, gg] = 0

    @pl.when(b == 0)
    def _():
        smi[0, 0] = -1                     # carry dst key
        smi[0, 1] = -1                     # carry group
        smf[0, 0] = identity

    chg_ref[pl.ds(r, 1), :] = jnp.broadcast_to(
        smi[0, 2].reshape(1, 1), (1, LANE))

    # active if dirty from the previous sweep OR dirtied earlier in THIS
    # sweep (keeps full Gauss-Seidel within-sweep propagation when the
    # initial activity is sparse)
    active = (act[0, g] | nxt[0, g]) > 0

    @pl.when(active)
    def _():
        ntiles = span_rows // 32
        cp = pltpu.make_async_copy(
            pos_ref.at[pl.ds(g * rows_v + d0, span_rows), :], posbuf, sem)
        cp.start()
        cpc = pltpu.make_async_copy(
            cb_ref.at[pl.ds(bb, 1), :], cbbuf, sem2)
        cpc.start()

        src = src_ref[...]
        dst = dst_ref[...]
        shape = src.shape
        vrow_l = jax.lax.shift_right_logical(src, 7) - g * rpg_v
        vlane = src & (LANE - 1)

        def body(gg, acc):
            slab = o_ref[pl.ds(g * rpg_v + gg * 8, 8), :]
            for u in range(8):
                rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
                rowc = jnp.take_along_axis(rowv, vlane, axis=1)
                acc = jnp.where(vrow_l == gg * 8 + u, rowc, acc)
            return acc

        val = jax.lax.fori_loop(0, rpg_v // 8, body,
                                jnp.full(shape, identity, jnp.float32))
        if wmode == "add":
            val = val + w_ref[...]
        elif wmode == "mul":
            val = val * w_ref[...]
        elif wmode == "incr":
            val = val + 1.0

        splice = (dst == smi[0, 0]) & (g == smi[0, 1])
        val = jnp.where(splice, jnp.minimum(val, smf[0, 0]), val)
        scan = _seg_scan_val(val, dst, "min")
        scan_ref[...] = scan
        smf[0, 0] = scan[block_rows - 1, LANE - 1]
        smi[0, 0] = dst[block_rows - 1, LANE - 1]
        smi[0, 1] = g

        cp.wait()
        cpc.wait()
        base = bb * BE
        nt = nt_ref[bb]
        slab_rows = min(32, block_rows)
        win_ref[...] = jnp.full((span_rows, LANE), identity, jnp.float32)
        for t in range(span_rows // 32):
            @pl.when(t < nt)
            def _():
                enc = posbuf[t * 32:(t + 1) * 32, :]
                p = enc & 0x7FFFFFFF
                local = p - base
                ok = (enc >= 0) & (local >= 0) & (local < BE)
                lcl = jnp.clip(local, 0, BE - 1)
                lrow = jax.lax.shift_right_logical(lcl, 7)
                llane = lcl & (LANE - 1)
                packed = cbbuf[0, t]
                c0 = packed >> 16
                c1 = packed & 0xFFFF
                # live 8-row sub-slab range from the positions (see
                # _pull2_kernel's extract walk)
                lo = jnp.min(jnp.where(ok, lrow, BE)) // 8
                hi = jnp.max(jnp.where(ok, lrow, -1)) // 8

                def visit(c, acc):
                    slab = scan_ref[pl.ds(c * 8, 8), :]
                    for u in range(8):
                        rowv = jnp.broadcast_to(slab[u:u + 1, :],
                                                (32, LANE))
                        sel = ok & (lrow == c * 8 + u)
                        acc = jnp.where(
                            sel,
                            jnp.take_along_axis(rowv, llane, axis=1),
                            acc)
                    return acc

                contrib = jax.lax.fori_loop(
                    lo, hi + 1, visit,
                    jnp.full((32, LANE), identity, jnp.float32))
                win_ref[t * 32:(t + 1) * 32, :] = contrib

        cur = o_ref[pl.ds(d0, span_rows), :]
        new = jnp.minimum(cur, win_ref[...])
        nchanged = jnp.sum((new < cur).astype(jnp.int32))
        o_ref[pl.ds(d0, span_rows), :] = new

        @pl.when(nchanged > 0)
        def _():
            smi[0, 2] = smi[0, 2] + nchanged
            # mark src groups overlapping the changed dst window dirty
            for j in range(span_rows // rpg_v + 1):
                gg = jnp.minimum(d0 // rpg_v + j, kgroups - 1)
                nxt[0, gg] = 1

        chg_ref[pl.ds(r, 1), :] = jnp.broadcast_to(
            smi[0, 2].reshape(1, 1), (1, LANE))


@functools.partial(jax.jit, static_argnames=(
    "rows_v", "rpg_v", "span_rows", "block_rows", "wmode", "sweeps",
    "interpret"))
def _sweeps_call(init2d, src2d, dst2d, w2d, pos2d, cb2d, gob, d0row, nt,
                 act0, *, rows_v: int, rpg_v: int, span_rows: int,
                 block_rows: int, wmode: str, sweeps: int,
                 interpret: bool):
    nblocks = src2d.shape[0] // block_rows
    kgroups = (rows_v // rpg_v)
    kernel = functools.partial(
        _sweeps_kernel, rows_v, rpg_v, span_rows, block_rows, nblocks,
        kgroups, wmode)

    def emap(r, b, go, dr, ntr, a0):
        return (jnp.where(r % 2 == 1, nblocks - 1 - b, b), 0)

    in_specs = [
        pl.BlockSpec((block_rows, LANE), emap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, LANE), emap, memory_space=pltpu.VMEM),
    ]
    args = [src2d, dst2d]
    if wmode in ("add", "mul"):
        in_specs.append(pl.BlockSpec((block_rows, LANE), emap,
                                     memory_space=pltpu.VMEM))
        args.append(w2d)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # positions
    args.append(pos2d)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # slab ranges
    args.append(cb2d)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # init (DMA'd once)
    args.append(init2d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(sweeps, nblocks),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((rows_v, LANE),
                         lambda r, b, go, dr, ntr, a0: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sweeps, LANE),
                         lambda r, b, go, dr, ntr, a0: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_rows, LANE), jnp.float32),   # scan
            pltpu.VMEM((span_rows, LANE), jnp.int32),      # positions
            pltpu.VMEM((span_rows, LANE), jnp.float32),    # window
            pltpu.SMEM((1, 128), jnp.int32),               # slab ranges
            pltpu.SMEM((1, 4), jnp.int32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, kgroups), jnp.int32),           # act
            pltpu.SMEM((1, kgroups), jnp.int32),           # next act
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),                   # init copy
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((rows_v, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((sweeps, LANE), jnp.int32)),
        interpret=interpret,
    )(gob, d0row, nt, act0, *args)


def pull_min_sweeps(graph, init: jax.Array, *, sweeps: int,
                    wmode: str = "add", weights: str = "val",
                    interpret: bool = False):
    """Run ``sweeps`` Gauss-Seidel min-pull sweeps over the pv2 layout.

    ``init`` is the starting distance/label vector (f32, +inf for
    unreached). Returns ``(dist, changed)`` where ``changed[r]`` is the
    number of improved lanes in sweep r — ``changed[r] == 0`` on an
    EVEN (forward) sweep means the fixpoint was reached (odd sweeps run
    backward and may see run-subset minima; their zero is necessary but
    not sufficient).
    """
    assert graph.has_pull2, "graph lacks the pull2 layout"
    rows_v = graph.v_pad // LANE
    w2d = None
    if wmode in ("add", "mul"):
        w = graph.pv2_val if weights == "val" else graph.pv2_wpr
        assert w is not None, f"pull2 layout lacks the {weights} stream"
        w2d = w.reshape(-1, LANE)
    # initial activity: groups holding any finite init entry
    K = graph.pv2_groups
    finite = jnp.isfinite(init.astype(jnp.float32)).reshape(K, -1)
    act0 = jnp.any(finite, axis=1).astype(jnp.int32)
    out, chg = _sweeps_call(
        init.astype(jnp.float32).reshape(rows_v, LANE),
        graph.pv2_src.reshape(-1, LANE),
        graph.pv2_dst.reshape(-1, LANE), w2d,
        graph.pv2_pos.reshape(-1, LANE),
        graph.pv2_cb.reshape(-1, 128),
        graph.pv2_gob, graph.pv2_d0row, graph.pv2_nt, act0,
        rows_v=rows_v, rpg_v=rows_v // graph.pv2_groups,
        span_rows=graph.pv2_span_rows,
        block_rows=graph.pv2_block_rows, wmode=wmode, sweeps=sweeps,
        interpret=interpret)
    return out.reshape(-1), chg[:, 0]


# ---------------------------------------------------------------------------
# Kernel P: power iterations — PageRank-family (PR/HITS-norm/SALSA/WTF
# phases) run ENTIRELY in one kernel. Rank ping-pongs between the output
# accumulator and a VMEM scratch buffer across a (iters, nblocks) grid;
# the per-iteration epilogue (rank' = reset + damping*acc, vertex mask,
# |delta|>threshold count) fuses into the final block of each iteration.
# Kills the ~40 ms/iter of V-scale XLA writes (contrib multiply, reset
# update, mask, convergence compare, while-carry) the round-4 PR paid
# around its pull (reference full-frontier push: pr_enactor.cuh:326-341;
# here the contribution weights 1/outdeg[src] ride the static pv2_wpr
# edge stream).
# ---------------------------------------------------------------------------


def _power_kernel(rows_v: int, rpg_v: int, span_rows: int,
                  block_rows: int, nblocks: int, n_nodes: int,
                  damping: float, reset: float, threshold: float,
                  *refs):
    (gob_ref, d0_ref, nt_ref, src_ref, dst_ref, w_ref, pos_ref, cb_ref,
     init_ref, o_ref, chg_ref, buf_ref, scan_ref, posbuf, win_ref, cbbuf,
     smi, smf, sem, sem2, sem3) = refs

    r = pl.program_id(0)
    b = pl.program_id(1)
    g = gob_ref[b]
    d0 = d0_ref[b]
    BE = block_rows * LANE
    even = r % 2 == 0

    ntiles = span_rows // 32
    cp = pltpu.make_async_copy(
        pos_ref.at[pl.ds(g * rows_v + d0, span_rows), :], posbuf, sem)
    cp.start()
    cpc = pltpu.make_async_copy(
        cb_ref.at[pl.ds(b, 1), :], cbbuf, sem2)
    cpc.start()

    @pl.when((r == 0) & (b == 0))
    def _():
        # init lives in ANY memory; one blocking DMA into the accumulator
        cpi = pltpu.make_async_copy(init_ref, o_ref, sem3)
        cpi.start()
        cpi.wait()

    # V-scale whole-buffer ops run in row slabs: a full (rows_v, LANE)
    # temporary is 4 MB of VMEM *stack* (the epilogue would need 3) and
    # blows the scoped-vmem limit at V=1M.
    SLAB = 512 if rows_v % 512 == 0 else rows_v
    nslab = rows_v // SLAB

    def _zero_slabs(ref):
        def zb(s, c):
            ref[pl.ds(s * SLAB, SLAB), :] = jnp.zeros((SLAB, LANE),
                                                      jnp.float32)
            return c
        jax.lax.fori_loop(0, nslab, zb, 0)

    @pl.when(b == 0)
    def _():
        # zero the write-side buffer; reset carry + changed counter
        @pl.when(even)
        def _():
            _zero_slabs(buf_ref)

        @pl.when(jnp.logical_not(even))
        def _():
            _zero_slabs(o_ref)
        smi[0, 0] = -1
        smi[0, 2] = 0
        smf[0, 0] = jnp.float32(0.0)

    src = src_ref[...]
    dst = dst_ref[...]
    shape = src.shape
    vrow_l = jax.lax.shift_right_logical(src, 7) - g * rpg_v
    vlane = src & (LANE - 1)

    def gather_from(t_ref):
        def body(gg, acc):
            slab = t_ref[pl.ds(g * rpg_v + gg * 8, 8), :]
            for u in range(8):
                rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
                rowc = jnp.take_along_axis(rowv, vlane, axis=1)
                acc = jnp.where(vrow_l == gg * 8 + u, rowc, acc)
            return acc
        return jax.lax.fori_loop(0, rpg_v // 8, body,
                                 jnp.zeros(shape, jnp.float32))

    val = jax.lax.cond(even, lambda: gather_from(o_ref),
                       lambda: gather_from(buf_ref))
    val = val * w_ref[...]

    splice = (dst == smi[0, 0])
    rowpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanepos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    first = (rowpos == 0) & (lanepos == 0) & splice
    val = jnp.where(first, val + smf[0, 0], val)
    scan = _seg_scan_val(val, dst, "sum")
    scan_ref[...] = scan
    smf[0, 0] = scan[block_rows - 1, LANE - 1]
    smi[0, 0] = dst[block_rows - 1, LANE - 1]

    cp.wait()
    cpc.wait()
    base = b * BE
    nt = nt_ref[b]
    slab_rows = min(32, block_rows)
    win_ref[...] = jnp.zeros((span_rows, LANE), jnp.float32)
    for t in range(span_rows // 32):
        @pl.when(t < nt)
        def _():
            enc = posbuf[t * 32:(t + 1) * 32, :]
            p = enc & 0x7FFFFFFF
            local = p - base
            ok = (enc >= 0) & (local >= 0) & (local < BE)
            lcl = jnp.clip(local, 0, BE - 1)
            lrow = jax.lax.shift_right_logical(lcl, 7)
            llane = lcl & (LANE - 1)
            packed = cbbuf[0, t]
            c0 = packed >> 16
            c1 = packed & 0xFFFF
            # live scan-row range from the positions themselves
            # (monotone + carry-filled): visit 8-row sub-slabs over
            # exactly [min, max] of the tile's valid rows — tighter
            # than the 32-row cb ranges; a tile with no valid slot
            # costs two reduces (lo > hi: zero trips).
            lo = jnp.min(jnp.where(ok, lrow, BE)) // 8
            hi = jnp.max(jnp.where(ok, lrow, -1)) // 8

            def visit(c, acc):
                slab = scan_ref[pl.ds(c * 8, 8), :]
                for u in range(8):
                    rowv = jnp.broadcast_to(slab[u:u + 1, :], (32, LANE))
                    sel = ok & (lrow == c * 8 + u)
                    acc = jnp.where(
                        sel, jnp.take_along_axis(rowv, llane, axis=1),
                        acc)
                return acc

            contrib = jax.lax.fori_loop(
                lo, hi + 1, visit, jnp.zeros((32, LANE), jnp.float32))
            win_ref[t * 32:(t + 1) * 32, :] = contrib

    def rmw(acc_ref):
        cur = acc_ref[pl.ds(d0, span_rows), :]
        acc_ref[pl.ds(d0, span_rows), :] = cur + win_ref[...]

    @pl.when(even)
    def _():
        rmw(buf_ref)

    @pl.when(jnp.logical_not(even))
    def _():
        rmw(o_ref)

    # iteration epilogue at the last block: rank' = reset + d*acc over
    # real vertices; count |delta| > threshold for convergence
    @pl.when(b == nblocks - 1)
    def _():
        rowi = jax.lax.broadcasted_iota(jnp.int32, (SLAB, LANE), 0)
        lanei = jax.lax.broadcasted_iota(jnp.int32, (SLAB, LANE), 1)

        def fin(acc_ref, old_ref):
            def body(s, cnt):
                vmask = ((s * SLAB + rowi) * LANE + lanei) < n_nodes
                acc = acc_ref[pl.ds(s * SLAB, SLAB), :]
                new = jnp.where(vmask,
                                jnp.float32(reset) + jnp.float32(damping)
                                * acc, 0.0)
                acc_ref[pl.ds(s * SLAB, SLAB), :] = new
                old = old_ref[pl.ds(s * SLAB, SLAB), :]
                return cnt + jnp.sum((jnp.abs(new - old)
                                      > jnp.float32(threshold))
                                     .astype(jnp.int32))
            smi[0, 2] = jax.lax.fori_loop(0, nslab, body, jnp.int32(0))

        @pl.when(even)
        def _():
            fin(buf_ref, o_ref)

        @pl.when(jnp.logical_not(even))
        def _():
            fin(o_ref, buf_ref)
        chg_ref[pl.ds(r, 1), :] = jnp.broadcast_to(
            smi[0, 2].reshape(1, 1), (1, LANE))

        # final iteration: make sure the result lands in o_ref
        @pl.when(even & (r == pl.num_programs(0) - 1))
        def _():
            def cpb(s, c):
                o_ref[pl.ds(s * SLAB, SLAB), :] = \
                    buf_ref[pl.ds(s * SLAB, SLAB), :]
                return c
            jax.lax.fori_loop(0, nslab, cpb, 0)


@functools.partial(jax.jit, static_argnames=(
    "rows_v", "rpg_v", "span_rows", "block_rows", "n_nodes", "damping",
    "reset", "threshold", "iters", "interpret"))
def _power_call(init2d, src2d, dst2d, w2d, pos2d, cb2d, gob, d0row, nt,
                *, rows_v: int, rpg_v: int, span_rows: int,
                block_rows: int, n_nodes: int, damping: float,
                reset: float, threshold: float, iters: int,
                interpret: bool):
    nblocks = src2d.shape[0] // block_rows
    kernel = functools.partial(
        _power_kernel, rows_v, rpg_v, span_rows, block_rows, nblocks,
        n_nodes, damping, reset, threshold)
    bmap = lambda r, b, go, dr, ntr: (b, 0)
    cmap = lambda r, b, go, dr, ntr: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(iters, nblocks),
        in_specs=[
            pl.BlockSpec((block_rows, LANE), bmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), bmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), bmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),   # init (DMA'd once)
        ],
        out_specs=(
            pl.BlockSpec((rows_v, LANE), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((iters, LANE), lambda r, b, go, dr, ntr: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_v, LANE), jnp.float32),       # ping-pong
            pltpu.VMEM((block_rows, LANE), jnp.float32),   # scan
            pltpu.VMEM((span_rows, LANE), jnp.int32),      # positions
            pltpu.VMEM((span_rows, LANE), jnp.float32),    # window
            pltpu.SMEM((1, 128), jnp.int32),               # slab ranges
            pltpu.SMEM((1, 4), jnp.int32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),                   # init copy
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((rows_v, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((iters, LANE), jnp.int32)),
        interpret=interpret,
    )(gob, d0row, nt, src2d, dst2d, w2d, pos2d, cb2d, init2d)


def pull_power_iters(graph, init: jax.Array, *, iters: int,
                     damping: float, reset: float,
                     threshold: float = 0.0, weights: str = "wpr",
                     interpret: bool = False):
    """Run ``iters`` PageRank-style power iterations fully in-kernel:
    rank' = reset + damping * sum over in-edges of rank[u] * w_uv, with
    w from the static ``weights`` stream ("wpr" = 1/outdeg[src]).
    Returns (rank, changed-per-iteration)."""
    assert graph.has_pull2, "graph lacks the pull2 layout"
    rows_v = graph.v_pad // LANE
    w = graph.pv2_wpr if weights == "wpr" else graph.pv2_val
    assert w is not None, f"pull2 layout lacks the {weights} stream"
    out, chg = _power_call(
        init.astype(jnp.float32).reshape(rows_v, LANE),
        graph.pv2_src.reshape(-1, LANE),
        graph.pv2_dst.reshape(-1, LANE), w.reshape(-1, LANE),
        graph.pv2_pos.reshape(-1, LANE),
        graph.pv2_cb.reshape(-1, 128),
        graph.pv2_gob, graph.pv2_d0row, graph.pv2_nt,
        rows_v=rows_v, rpg_v=rows_v // graph.pv2_groups,
        span_rows=graph.pv2_span_rows,
        block_rows=graph.pv2_block_rows, n_nodes=graph.num_nodes,
        damping=float(damping), reset=float(reset),
        threshold=float(threshold), iters=iters, interpret=interpret)
    return out.reshape(-1), chg[:, 0]


# ---------------------------------------------------------------------------
# Kernel C: whole-run Brandes — both BC phases as level-synchronous
# level-gated sum-pulls over a (levels, nblocks) grid with ALL state
# (labels, sigma, delta) VMEM-resident across levels.
#
# Forward (levels ascending): gated[u] = sigma[u] if lab[u] == d-1 else
# 0; one full gated sum-pull per level lands per-vertex totals in an
# accumulator; the last block's epilogue discovers lab==inf vertices
# with acc>0 at depth d and sets sigma=acc (replacing the reference's
# atomicAdd forward functor, app/bc/bc_functor.cuh:56-71). Backward
# (levels descending): gated[v] = (1+delta[v])/sigma[v] if lab[v]==t+1;
# delta[u] = sigma[u]*acc[u] on the level-t ring
# (bc_functor.cuh:203-238). The pull layout reduces over IN-edges, so
# the backward pass requires a symmetric edge set (undirected graphs —
# the kernel-C route gates on it; directed graphs take the hybrid
# enactor).
#
# Per-level prologue (block 0) rebuilds the gated gather table, zeroes
# the accumulator, and recomputes per-group activity (any nonzero gated
# entry) so blocks of quiet groups skip — tail levels of a scale-free
# traversal cost ~nothing. Replaces the round-4 path's ~2x depth
# full XLA value passes + per-level V-scale glue (models/bc.py
# _fwd_level_pull/_bwd_level_pull).
# ---------------------------------------------------------------------------


def _brandes_kernel(rows_v: int, rpg_v: int, span_rows: int,
                    block_rows: int, nblocks: int, kgroups: int,
                    fwd: bool, *refs):
    (gob_ref, d0_ref, dz_ref, nt_ref, src_ref, dst_ref, pos_ref, cb_ref,
     ilab_ref, isig_ref) = refs[:10]
    i = 10
    idel_ref = None
    if not fwd:
        idel_ref = refs[i]
        i += 1
    if fwd:
        (lab_ref, sig_ref, chg_ref) = refs[i:i + 3]
        i += 3
        del_ref = None
    else:
        (del_ref, chg_ref) = refs[i:i + 2]
        i += 2
        lab_ref, sig_ref = refs[i], refs[i + 1]   # scratch in bwd
        i += 2
    (gated, scan_ref, posbuf, win_ref, cbbuf, smi, smf, act,
     sem, sem2, sem3) = refs[i:i + 11]

    r = pl.program_id(0)
    b = pl.program_id(1)
    g = gob_ref[b]
    d0 = d0_ref[b]
    # forward: level d = dz + r; backward: ring t = dz - r
    lvl = jnp.where(jnp.bool_(fwd), dz_ref[0] + r, dz_ref[0] - r) \
        .astype(jnp.float32)
    INF = jnp.float32(jnp.inf)
    BE = block_rows * LANE
    SLAB = 512 if rows_v % 512 == 0 else rows_v
    nslab = rows_v // SLAB

    @pl.when((r == 0) & (b == 0))
    def _():
        cpi = pltpu.make_async_copy(ilab_ref, lab_ref, sem3)
        cpi.start()
        cpi.wait()
        cpi = pltpu.make_async_copy(isig_ref, sig_ref, sem3)
        cpi.start()
        cpi.wait()
        if not fwd:
            cpi = pltpu.make_async_copy(idel_ref, del_ref, sem3)
            cpi.start()
            cpi.wait()

    @pl.when(b == 0)
    def _():
        # per-level prologue: rebuild the gated gather table. Level sums
        # accumulate DIRECTLY into sig (fwd) / delta (bwd), gated by
        # label — discovered vertices' entries are final and the window
        # combine never touches them, so no separate accumulator buffer
        # (the 4 MB that blew the 16 MB scoped-vmem budget at V=1M).
        def pro(s, c):
            sl = pl.ds(s * SLAB, SLAB)
            l = lab_ref[sl]
            if fwd:
                gv = jnp.where(l == lvl - 1.0, sig_ref[sl], 0.0)
            else:
                gv = jnp.where(
                    l == lvl + 1.0,
                    (1.0 + del_ref[sl])
                    / jnp.maximum(sig_ref[sl], jnp.float32(1e-30)), 0.0)
            gated[sl] = gv
            return c
        jax.lax.fori_loop(0, nslab, pro, 0)
        # per-group activity: any nonzero gated entry
        def actg(gg, c):
            s = jnp.sum((gated[pl.ds(gg * rpg_v, rpg_v), :]
                         != 0.0).astype(jnp.int32))
            act[0, gg] = (s > 0).astype(jnp.int32)
            return c
        jax.lax.fori_loop(0, kgroups, actg, 0)
        smi[0, 0] = -1                     # carry dst key
        smi[0, 1] = -1                     # carry group
        smi[0, 2] = 0                      # level changed count
        smf[0, 0] = jnp.float32(0.0)

    @pl.when(act[0, g] > 0)
    def _():
        cp = pltpu.make_async_copy(
            pos_ref.at[pl.ds(g * rows_v + d0, span_rows), :], posbuf, sem)
        cp.start()
        cpc = pltpu.make_async_copy(
            cb_ref.at[pl.ds(b, 1), :], cbbuf, sem2)
        cpc.start()

        src = src_ref[...]
        dst = dst_ref[...]
        shape = src.shape
        vrow_l = jax.lax.shift_right_logical(src, 7) - g * rpg_v
        vlane = src & (LANE - 1)

        def body(gg, a):
            slab = gated[pl.ds(g * rpg_v + gg * 8, 8), :]
            for u in range(8):
                rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
                rowc = jnp.take_along_axis(rowv, vlane, axis=1)
                a = jnp.where(vrow_l == gg * 8 + u, rowc, a)
            return a

        val = jax.lax.fori_loop(0, rpg_v // 8, body,
                                jnp.zeros(shape, jnp.float32))
        # sum-splice the carry into the first lane, guarded by (dst,
        # group) — whole groups skip together, so a same-group splice
        # target always ran
        splice = (dst == smi[0, 0]) & (g == smi[0, 1])
        rowpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lanepos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        first = (rowpos == 0) & (lanepos == 0) & splice
        val = jnp.where(first, val + smf[0, 0], val)
        scan = _seg_scan_val(val, dst, "sum")
        scan_ref[...] = scan
        smf[0, 0] = scan[block_rows - 1, LANE - 1]
        smi[0, 0] = dst[block_rows - 1, LANE - 1]
        smi[0, 1] = g

        cp.wait()
        cpc.wait()
        base = b * BE
        nt = nt_ref[b]
        slab_rows = min(32, block_rows)
        win_ref[...] = jnp.zeros((span_rows, LANE), jnp.float32)
        for t in range(span_rows // 32):
            @pl.when(t < nt)
            def _():
                enc = posbuf[t * 32:(t + 1) * 32, :]
                p = enc & 0x7FFFFFFF
                local = p - base
                ok = (enc >= 0) & (local >= 0) & (local < BE)
                lcl = jnp.clip(local, 0, BE - 1)
                lrow = jax.lax.shift_right_logical(lcl, 7)
                llane = lcl & (LANE - 1)
                packed = cbbuf[0, t]
                c0 = packed >> 16
                c1 = packed & 0xFFFF
                # live 8-row sub-slab range from the positions (see
                # _pull2_kernel's extract walk)
                lo = jnp.min(jnp.where(ok, lrow, BE)) // 8
                hi = jnp.max(jnp.where(ok, lrow, -1)) // 8

                def visit(c, a):
                    slab = scan_ref[pl.ds(c * 8, 8), :]
                    for u in range(8):
                        rowv = jnp.broadcast_to(slab[u:u + 1, :],
                                                (32, LANE))
                        sel = ok & (lrow == c * 8 + u)
                        a = jnp.where(
                            sel,
                            jnp.take_along_axis(rowv, llane, axis=1),
                            a)
                    return a

                contrib = jax.lax.fori_loop(
                    lo, hi + 1, visit,
                    jnp.zeros((32, LANE), jnp.float32))
                win_ref[t * 32:(t + 1) * 32, :] = contrib
        lwin = lab_ref[pl.ds(d0, span_rows), :]
        if fwd:
            tgt, gate = sig_ref, lwin == INF
        else:
            tgt, gate = del_ref, lwin == lvl
        cur = tgt[pl.ds(d0, span_rows), :]
        tgt[pl.ds(d0, span_rows), :] = jnp.where(
            gate, cur + win_ref[...], cur)

    # level epilogue at the last block
    @pl.when(b == nblocks - 1)
    def _():
        def epi(s, cnt):
            sl = pl.ds(s * SLAB, SLAB)
            l = lab_ref[sl]
            if fwd:
                m = (l == INF) & (sig_ref[sl] > 0)
                lab_ref[sl] = jnp.where(m, lvl, l)
            else:
                m = l == lvl
                del_ref[sl] = jnp.where(m, sig_ref[sl] * del_ref[sl],
                                        del_ref[sl])
            return cnt + jnp.sum(m.astype(jnp.int32))
        smi[0, 2] = jax.lax.fori_loop(0, nslab, epi, jnp.int32(0))
        chg_ref[pl.ds(r, 1), :] = jnp.broadcast_to(
            smi[0, 2].reshape(1, 1), (1, LANE))


@functools.partial(jax.jit, static_argnames=(
    "rows_v", "rpg_v", "span_rows", "block_rows", "fwd", "levels",
    "interpret"))
def _brandes_call(ilab2d, isig2d, idel2d, src2d, dst2d, pos2d, cb2d,
                  gob, d0row, dz, nt, *, rows_v: int, rpg_v: int,
                  span_rows: int, block_rows: int, fwd: bool,
                  levels: int, interpret: bool):
    nblocks = src2d.shape[0] // block_rows
    kgroups = rows_v // rpg_v
    kernel = functools.partial(
        _brandes_kernel, rows_v, rpg_v, span_rows, block_rows, nblocks,
        kgroups, fwd)
    bmap = lambda r, b, go, dr, dzr, ntr: (b, 0)
    cmap = lambda r, b, go, dr, dzr, ntr: (0, 0)
    in_specs = [
        pl.BlockSpec((block_rows, LANE), bmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, LANE), bmap, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),   # positions
        pl.BlockSpec(memory_space=pl.ANY),   # slab ranges
        pl.BlockSpec(memory_space=pl.ANY),   # init lab (DMA'd once)
        pl.BlockSpec(memory_space=pl.ANY),   # init sig
    ]
    args = [src2d, dst2d, pos2d, cb2d, ilab2d, isig2d]
    if not fwd:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # init delta
        args.append(idel2d)
    if fwd:
        out_specs = (
            pl.BlockSpec((rows_v, LANE), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_v, LANE), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, LANE), cmap, memory_space=pltpu.VMEM),
        )
        out_shape = (jax.ShapeDtypeStruct((rows_v, LANE), jnp.float32),
                     jax.ShapeDtypeStruct((rows_v, LANE), jnp.float32),
                     jax.ShapeDtypeStruct((levels, LANE), jnp.int32))
        extra_scratch = []
    else:
        out_specs = (
            pl.BlockSpec((rows_v, LANE), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, LANE), cmap, memory_space=pltpu.VMEM),
        )
        out_shape = (jax.ShapeDtypeStruct((rows_v, LANE), jnp.float32),
                     jax.ShapeDtypeStruct((levels, LANE), jnp.int32))
        extra_scratch = [pltpu.VMEM((rows_v, LANE), jnp.float32),  # lab
                         pltpu.VMEM((rows_v, LANE), jnp.float32)]  # sig
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(levels, nblocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=extra_scratch + [
            pltpu.VMEM((rows_v, LANE), jnp.float32),       # gated
            pltpu.VMEM((block_rows, LANE), jnp.float32),   # scan
            pltpu.VMEM((span_rows, LANE), jnp.int32),      # positions
            pltpu.VMEM((span_rows, LANE), jnp.float32),    # window
            pltpu.SMEM((1, 128), jnp.int32),               # slab ranges
            pltpu.SMEM((1, 4), jnp.int32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, kgroups), jnp.int32),           # act
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),                   # init copies
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        # lab/sig/delta/gated are all VMEM-resident across levels:
        # ~13 MB (fwd) / ~17 MB (bwd) at V=1M plus kernel stack — above
        # the default 16 MB scoped-vmem budget.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(gob, d0row, dz, nt, *args)


def _brandes_args(graph):
    rows_v = graph.v_pad // LANE
    return dict(rows_v=rows_v, rpg_v=rows_v // graph.pv2_groups,
                span_rows=graph.pv2_span_rows,
                block_rows=graph.pv2_block_rows)


def brandes_fwd_levels(graph, lab: jax.Array, sig: jax.Array, *,
                       d0, levels: int, interpret: bool = False):
    """Run ``levels`` forward Brandes levels (depths d0..d0+levels-1) on
    the pv2 layout. ``lab`` is f32 depth (+inf unreached), ``sig`` the
    running path counts. Returns (lab', sig', discovered-per-level)."""
    assert graph.has_pull2, "graph lacks the pull2 layout"
    rows_v = graph.v_pad // LANE
    lab2, sig2, chg = _brandes_call(
        lab.astype(jnp.float32).reshape(rows_v, LANE),
        sig.astype(jnp.float32).reshape(rows_v, LANE), None,
        graph.pv2_src.reshape(-1, LANE),
        graph.pv2_dst.reshape(-1, LANE),
        graph.pv2_pos.reshape(-1, LANE),
        graph.pv2_cb.reshape(-1, 128),
        graph.pv2_gob, graph.pv2_d0row,
        jnp.asarray(d0, jnp.int32).reshape(1), graph.pv2_nt,
        fwd=True, levels=levels, interpret=interpret,
        **_brandes_args(graph))
    return lab2.reshape(-1), sig2.reshape(-1), chg[:, 0]


def brandes_bwd_levels(graph, lab: jax.Array, sig: jax.Array,
                       delta: jax.Array, *, t0, levels: int,
                       interpret: bool = False):
    """Run ``levels`` backward Brandes levels (rings t0 down to
    t0-levels+1). Requires a symmetric edge set (the pull reduces over
    in-edges; the backward recurrence needs out-edges). Returns
    (delta', ring-size-per-level)."""
    assert graph.has_pull2, "graph lacks the pull2 layout"
    rows_v = graph.v_pad // LANE
    dl, chg = _brandes_call(
        lab.astype(jnp.float32).reshape(rows_v, LANE),
        sig.astype(jnp.float32).reshape(rows_v, LANE),
        delta.astype(jnp.float32).reshape(rows_v, LANE),
        graph.pv2_src.reshape(-1, LANE),
        graph.pv2_dst.reshape(-1, LANE),
        graph.pv2_pos.reshape(-1, LANE),
        graph.pv2_cb.reshape(-1, 128),
        graph.pv2_gob, graph.pv2_d0row,
        jnp.asarray(t0, jnp.int32).reshape(1), graph.pv2_nt,
        fwd=False, levels=levels, interpret=interpret,
        **_brandes_args(graph))
    return dl.reshape(-1), chg[:, 0]
