"""Pallas TPU kernels for the irregular hot ops.

XLA lowers arbitrary gathers element-serially on TPU (~110M elem/s
measured on v5e) — 'advance' and pull-mode traversal are gather-bound, so
the reference's throughput story (HBM-bandwidth CUDA gathers) needs real
kernels here. The key hardware fact (probed, scripts/pallas_probe2.py):
**per-lane dynamic gather along the 128-lane axis is ~free** via
``jnp.take_along_axis(.., axis=1)`` inside a Pallas kernel.

``bitmask_gather``: out[i] = bit idx[i] of a packed bitmask resident in
VMEM. The table is packed 32 bits/word into an (R, 128) int32 array, so a
1M-vertex frontier mask is 128KB — comfortably VMEM-resident. Per table
row r: broadcast row, lane-gather at each element's word-lane, select
where the element's word-row == r. R rounds of 3 VPU ops per block —
~0.75 vector-ops per index for V=1M.

Used by pull-mode BFS (frontier membership tests over all E edges) and
any primitive needing "is vertex x in set S" at edge scale.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bitmask_gather", "bitmask_gather_cumsum", "blocked_pull_or",
           "pack_bitmask", "words_for", "sample_sorted", "sample_sorted2",
           "pull_vertex_reduce", "pad_values_table", "reduce_by_dst_sorted",
           "scatter_sorted"]

LANE = 128
DEFAULT_BLOCK_ROWS = 512          # 64K indices per grid step


def words_for(num_bits: int) -> int:
    """Packed words needed for ``num_bits``, rounded so the word array is
    (R, 128) with R a multiple of 8 (vreg-aligned)."""
    words = -(-num_bits // 32)
    rows = -(-words // LANE)
    rows = ((rows + 7) // 8) * 8
    return rows * LANE


def pack_bitmask(mask: jax.Array, rows: Optional[int] = None) -> jax.Array:
    """(V,) bool/int -> (R, 128) int32 packed words (bit v of word v>>5).

    Pure XLA (vertex-scale): reshape to (words, 32) and dot with bit
    weights — no scatters. ``rows`` overrides the row count (the blocked
    pull kernel wants K*rows_per_group rows; extra rows are zero).
    """
    v = mask.shape[0]
    nwords = rows * LANE if rows is not None else words_for(v)
    assert nwords * 32 >= v, "rows too small for the mask"
    pad = nwords * 32 - v
    m = jnp.concatenate(
        [mask.astype(jnp.int32),
         jnp.zeros((pad,), jnp.int32)]) if pad else mask.astype(jnp.int32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)) \
        .astype(jnp.int32)
    words = jnp.sum(m.reshape(nwords, 32) * weights[None, :], axis=1,
                    dtype=jnp.int32)
    return words.reshape(nwords // LANE, LANE)


def _gather_kernel(rows_const: int, t_ref, i_ref, o_ref):
    ii = i_ref[...]                          # (B,128) vertex ids
    wid = jax.lax.shift_right_logical(ii, 5)
    wrow = jax.lax.shift_right_logical(wid, 7)
    wlane = wid & (LANE - 1)
    bit = ii & 31
    shape = ii.shape

    def body(g, acc):
        # one dynamic slab read per 8 rows (table rows are padded to a
        # multiple of 8 by words_for), then static sub-rows — dynamic
        # per-row addressing costs ~100-200ns of scalar-core time each
        slab = t_ref[pl.ds(g * 8, 8), :]
        for u in range(8):
            rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
            # free per-lane dynamic gather along the lane axis
            rowc = jnp.take_along_axis(rowv, wlane, axis=1)
            acc = jnp.where(wrow == g * 8 + u, rowc, acc)
        return acc

    acc = jax.lax.fori_loop(0, rows_const // 8, body,
                            jnp.zeros(shape, jnp.int32))
    o_ref[...] = jax.lax.shift_right_logical(acc, bit) & 1


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _bitmask_gather_2d(words: jax.Array, idx2d: jax.Array, *,
                       block_rows: int, interpret: bool) -> jax.Array:
    R = words.shape[0]
    m = idx2d.shape[0]
    kernel = functools.partial(_gather_kernel, R)
    return pl.pallas_call(
        kernel,
        grid=(m // block_rows,),
        in_specs=[pl.BlockSpec((R, LANE), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_rows, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, LANE), jnp.int32),
        interpret=interpret,
    )(words, idx2d)


def bitmask_gather(words: jax.Array, idx: jax.Array, *,
                   block_rows: int = DEFAULT_BLOCK_ROWS,
                   interpret: bool = False) -> jax.Array:
    """out[i] = bit ``idx[i]`` of the packed bitmask (0/1 int32).

    ``words``: (R, 128) int32 from :func:`pack_bitmask`. ``idx``: (N,)
    int32 vertex ids, N a multiple of 128 (pad with any in-range id).
    """
    n = idx.shape[0]
    assert n % LANE == 0, "pad idx to a multiple of 128"
    m = n // LANE
    br = min(block_rows, max(((m + 7) // 8) * 8, 8))
    m_pad = -(-m // br) * br
    idx2d = idx.reshape(m, LANE)
    if m_pad != m:
        idx2d = jnp.concatenate(
            [idx2d, jnp.zeros((m_pad - m, LANE), idx.dtype)])
    out = _bitmask_gather_2d(words, idx2d, block_rows=br,
                             interpret=interpret)
    return out[:m].reshape(n)


def _seg_scan_or(vals: jax.Array, key: jax.Array) -> jax.Array:
    """Row-major inclusive segmented OR over a (B, 128) block; segments
    are runs of equal (sorted, nondecreasing) ``key``."""
    b = vals.shape[0]
    lanepos = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    y = vals
    s = 1
    while s < LANE:
        ok = (lanepos >= s) & (key == pltpu.roll(key, s, 1))
        y = y | jnp.where(ok, pltpu.roll(y, s, 1), 0)
        s *= 2
    # combine across sublanes via row-last values (kept 128 lanes wide —
    # narrow last dims hit Mosaic layout restrictions)
    L = jnp.broadcast_to(y[:, LANE - 1:LANE], vals.shape)
    LK = jnp.broadcast_to(key[:, LANE - 1:LANE], vals.shape)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0)
    s = 1
    while s < b:
        ok = (rowpos >= s) & (LK == pltpu.roll(LK, s, 0))
        L = L | jnp.where(ok, pltpu.roll(L, s, 0), 0)
        s *= 2
    # incoming prefix for each row = combined value of the previous row,
    # applied to this row's elements that share the previous row's key
    inc = jnp.where(rowpos >= 1, pltpu.roll(L, 1, 0), 0)
    prev_k = jnp.where(rowpos >= 1, pltpu.roll(LK, 1, 0), -1)
    return y | jnp.where(key == prev_k, inc, 0)


def _blocked_pull_kernel(rpg: int, g_ref, t_ref, src_ref, dst_ref, o_ref,
                         carry_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        carry_ref[0, 0] = 0
        carry_ref[0, 1] = -1

    g = g_ref[k]
    src = src_ref[...]                      # (B,128) source vertex ids
    dst = dst_ref[...]                      # (B,128) sorted dest ids
    shape = src.shape

    wid_s = jax.lax.shift_right_logical(src, 5)
    wrow_l = jax.lax.shift_right_logical(wid_s, 7) - g * rpg
    wlane_s = wid_s & (LANE - 1)
    bit_s = src & 31

    def body(gg, acc):
        slab = t_ref[pl.ds(gg * 8, 8), :]
        for u in range(8):
            rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
            rowc = jnp.take_along_axis(rowv, wlane_s, axis=1)
            acc = jnp.where(wrow_l == gg * 8 + u, rowc, acc)
        return acc

    acc = jax.lax.fori_loop(0, rpg // 8, body, jnp.zeros(shape, jnp.int32))
    hit = jax.lax.shift_right_logical(acc, bit_s) & 1

    wid_d = jax.lax.shift_right_logical(dst, 5)
    contrib = jnp.where(hit > 0,
                        jax.lax.shift_left(jnp.int32(1), dst & 31), 0)
    # splice the carry into this block's leading segment
    contrib = contrib | jnp.where(wid_d == carry_ref[0, 1],
                                  carry_ref[0, 0], 0)
    scan = _seg_scan_or(contrib, wid_d)
    o_ref[...] = scan
    carry_ref[0, 0] = scan[shape[0] - 1, LANE - 1]
    carry_ref[0, 1] = wid_d[shape[0] - 1, LANE - 1]


@functools.partial(jax.jit, static_argnames=("rpg", "block_rows",
                                             "interpret"))
def _blocked_pull_2d(words, src2d, dst2d, group_of_block, *, rpg: int,
                     block_rows: int, interpret: bool):
    m = src2d.shape[0]
    kernel = functools.partial(_blocked_pull_kernel, rpg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_rows,),
        in_specs=[
            pl.BlockSpec((rpg, LANE), lambda k, gref: (gref[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda k, gref: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda k, gref: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANE),
                               lambda k, gref: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, LANE), jnp.int32),
        interpret=interpret,
    )(group_of_block, words, src2d, dst2d)


def blocked_pull_or(words: jax.Array, graph, *,
                    interpret: bool = False) -> jax.Array:
    """Packed per-word OR of frontier membership over in-edges.

    Consumes a DeviceGraph's blocked CSC (``graph.bcsc_*``): one pass over
    all edges — per block, gather frontier bits from the group's bitmask
    slice (rows_per_group rounds), build per-edge one-bit words keyed by
    dst>>5, segmented-OR with cross-block carry. Returns the per-edge
    inclusive scan; reach words live at ``graph.bcsc_sample_pos``.
    """
    br = graph.bcsc_block_rows
    src2d = graph.bcsc_src.reshape(-1, LANE)
    dst2d = graph.bcsc_dst.reshape(-1, LANE)
    scan = _blocked_pull_2d(words, src2d, dst2d, graph.bcsc_group_of_block,
                            rpg=graph.bcsc_rows_per_group, block_rows=br,
                            interpret=interpret)
    return scan.reshape(-1)


def _pull_cells_kernel(rpg: int, g_ref, t_ref, src_ref, dst_ref, cw_ref,
                       o_ref, cellbuf, carry_ref):
    """Cells variant of the pull kernel (cell-transposed layout): the
    within-cell OR is five unkeyed sublane rolls, cell results extract to
    a compact (windows, 128) buffer, and the keyed segmented scan runs
    over cells — 1/32nd of the slot count the full-scan kernel reduces.
    """
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        carry_ref[0, 0] = 0
        carry_ref[0, 1] = -1

    g = g_ref[k]
    src = src_ref[...]                      # (BR,128) transposed sources
    dst = dst_ref[...]
    shape = src.shape

    wid_s = jax.lax.shift_right_logical(src, 5)
    wrow_l = jax.lax.shift_right_logical(wid_s, 7) - g * rpg
    wlane_s = wid_s & (LANE - 1)
    bit_s = src & 31

    def body(gg, acc):
        slab = t_ref[pl.ds(gg * 8, 8), :]
        for u in range(8):
            rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
            rowc = jnp.take_along_axis(rowv, wlane_s, axis=1)
            acc = jnp.where(wrow_l == gg * 8 + u, rowc, acc)
        return acc

    acc = jax.lax.fori_loop(0, rpg // 8, body, jnp.zeros(shape, jnp.int32))
    hit = jax.lax.shift_right_logical(acc, bit_s) & 1
    y = jnp.where(hit > 0,
                  jax.lax.shift_left(jnp.int32(1), dst & 31), 0)

    # Within-cell OR: a cell's 32 slots sit in one 32-row column window;
    # no keys needed (windows == cells by construction).
    rowpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0) & 31
    s = 1
    while s < 32:
        y = y | jnp.where(rowpos >= s, pltpu.roll(y, s, 0), 0)
        s *= 2
    # Row 31 of window w holds window w's 128 cell OR values.
    for w in range(shape[0] // 32):
        cellbuf[w, :] = y[w * 32 + 31, :]

    cw = cw_ref[...]                        # (BR//32, 128) cell word ids
    cells = cellbuf[...]
    # splice the running carry into the leading segment (OR: idempotent)
    cells = cells | jnp.where(cw == carry_ref[0, 1], carry_ref[0, 0], 0)
    scan = _seg_scan_or(cells, cw)
    o_ref[...] = scan
    carry_ref[0, 0] = scan[shape[0] // 32 - 1, LANE - 1]
    carry_ref[0, 1] = cw[shape[0] // 32 - 1, LANE - 1]


@functools.partial(jax.jit, static_argnames=("rpg", "block_rows",
                                             "interpret"))
def _pull_cells_2d(words, src2d, dst2d, cw2d, group_of_block, *, rpg: int,
                   block_rows: int, interpret: bool):
    m = src2d.shape[0]
    nw = block_rows // 32
    kernel = functools.partial(_pull_cells_kernel, rpg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_rows,),
        in_specs=[
            pl.BlockSpec((rpg, LANE), lambda k, gref: (gref[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda k, gref: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda k, gref: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, LANE), lambda k, gref: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nw, LANE), lambda k, gref: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nw, LANE), jnp.int32),
                        pltpu.SMEM((1, 2), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m // 32, LANE), jnp.int32),
        interpret=interpret,
    )(group_of_block, words, src2d, dst2d, cw2d)


def pull_reached_words(words: jax.Array, graph, *,
                       interpret: bool = False) -> jax.Array:
    """(nwords,) int32 packed reach bits: bit v set iff some in-neighbor
    of v is in the frontier bitmask ``words``."""
    K = graph.bcsc_groups
    if graph.bcsc_cellword is not None and graph.bcsc_wcell_pos is not None:
        # Cells kernel: compact cell-value output, sampled densely.
        br = graph.bcsc_block_rows
        cells = _pull_cells_2d(
            words, graph.bcsc_csrc.reshape(-1, LANE),
            graph.bcsc_cdst.reshape(-1, LANE),
            graph.bcsc_cellword.reshape(-1, LANE),
            graph.bcsc_group_of_block,
            rpg=graph.bcsc_rows_per_group, block_rows=br,
            interpret=interpret).reshape(-1)
        s = sample_sorted(cells, graph.bcsc_wcell_pos,
                          interpret=interpret)
        valid = graph.bcsc_sample_valid.reshape(K, -1)
        per_k = jnp.where(valid, s.reshape(K, -1), 0)
        return jax.lax.reduce(per_k, jnp.int32(0), jax.lax.bitwise_or,
                              (0,))
    scan = blocked_pull_or(words, graph, interpret=interpret)
    if graph.bcsc_wcell_pos is not None:
        # Word-last slots are cell-aligned (31 mod 32) by construction
        # (word-aligned layout): one strided slice yields the cell-last
        # array, then one DENSE sorted-sample pass reads all K*nwords
        # word results (vs K serial XLA gathers / a sparse sample).
        cell_last = scan.reshape(-1, 32)[:, 31]
        s = sample_sorted(cell_last, graph.bcsc_wcell_pos,
                          interpret=interpret)
        valid = graph.bcsc_sample_valid.reshape(K, -1)
        per_k = jnp.where(valid, s.reshape(K, -1), 0)
        return jax.lax.reduce(per_k, jnp.int32(0), jax.lax.bitwise_or,
                              (0,))
    outs = []
    for k in range(K):
        s = jnp.take(scan, graph.bcsc_sample_pos[k],
                     indices_are_sorted=False)
        outs.append(jnp.where(graph.bcsc_sample_valid[k], s, 0))
    acc = outs[0]
    for o in outs[1:]:
        acc = acc | o
    return acc


def unpack_bitmask(words_flat: jax.Array, v_pad: int) -> jax.Array:
    """(nwords,) int32 -> (v_pad,) bool."""
    bits = (words_flat[:, None] >>
            jnp.arange(32, dtype=jnp.int32)[None, :]) & 1
    return bits.reshape(-1)[:v_pad].astype(bool)


def bitmask_gather_reference(words: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """numpy oracle for tests."""
    flat = np.asarray(words).reshape(-1).astype(np.uint32)
    i = np.asarray(idx)
    return ((flat[i >> 5] >> (i & 31)) & 1).astype(np.int32)


# --------------------------------------------------------------------------
# Blocked VALUE pull-reduce: per-vertex sum/min of f(value[src], w) over
# in-edges. Same layout as blocked_pull_or, but the VMEM table holds f32
# per-vertex values (one group slice at a time) and the fused scan is a
# segmented sum/min keyed by the destination id. Results are read at the
# static per-(group, vertex) sample positions via sample_sorted.
# --------------------------------------------------------------------------


def pad_values_table(vals: jax.Array, groups: int,
                     rows_per_group_bits: int, fill) -> jax.Array:
    """(v_pad,) f32 -> (K*rpg_v, 128) table aligned with the blocked-CSC
    vertex grouping (rpg_v = 32 * bitmask rows per group)."""
    rpg_v = rows_per_group_bits * 32
    rows = groups * rpg_v
    n = rows * LANE
    pad = n - vals.shape[0]
    v = jnp.concatenate([vals, jnp.full((pad,), fill, vals.dtype)]) \
        if pad else vals
    return v.reshape(rows, LANE)


def _seg_scan_val(vals: jax.Array, key: jax.Array, op: str) -> jax.Array:
    """Row-major inclusive segmented sum/min over a (B,128) block."""
    b = vals.shape[0]
    combine = (lambda a, c: a + c) if op == "sum" else jnp.minimum
    zero = jnp.zeros_like(vals) if op == "sum" else \
        jnp.full_like(vals, jnp.inf)
    lanepos = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    y = vals
    s = 1
    while s < LANE:
        ok = (lanepos >= s) & (key == pltpu.roll(key, s, 1))
        y = combine(y, jnp.where(ok, pltpu.roll(y, s, 1), zero))
        s *= 2
    L = jnp.broadcast_to(y[:, LANE - 1:LANE], vals.shape)
    LK = jnp.broadcast_to(key[:, LANE - 1:LANE], vals.shape)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0)
    s = 1
    while s < b:
        ok = (rowpos >= s) & (LK == pltpu.roll(LK, s, 0))
        L = combine(L, jnp.where(ok, pltpu.roll(L, s, 0), zero))
        s *= 2
    inc = jnp.where(rowpos >= 1, pltpu.roll(L, 1, 0),
                    zero)
    prev_k = jnp.where(rowpos >= 1, pltpu.roll(LK, 1, 0), -1)
    return combine(y, jnp.where(key == prev_k, inc, zero))


def _blocked_value_kernel(rpg_v: int, op: str, wmode: str, g_ref, t_ref,
                          src_ref, dst_ref, w_ref, o_ref, cval_ref,
                          ckey_ref):
    k = pl.program_id(0)
    identity = jnp.float32(0.0 if op == "sum" else jnp.inf)

    @pl.when(k == 0)
    def _():
        cval_ref[0, 0] = identity
        ckey_ref[0, 0] = -1

    g = g_ref[k]
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

    val = jax.lax.fori_loop(0, rpg_v // 8, body,
                            jnp.full(shape, identity, jnp.float32))
    if wmode == "add":
        val = val + w_ref[...]
    elif wmode == "mul":
        val = val * w_ref[...]

    if op == "min":
        # splice carry into the leading segment (idempotent for min)
        val = jnp.where(dst == ckey_ref[0, 0],
                        jnp.minimum(val, cval_ref[0, 0]), val)
    else:
        # sum: add the carry exactly once, at the first element
        rowpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lanepos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        first = (rowpos == 0) & (lanepos == 0) & (dst == ckey_ref[0, 0])
        val = jnp.where(first, val + cval_ref[0, 0], val)

    scan = _seg_scan_val(val, dst, op)
    o_ref[...] = scan
    cval_ref[0, 0] = scan[shape[0] - 1, LANE - 1]
    ckey_ref[0, 0] = dst[shape[0] - 1, LANE - 1]


@functools.partial(jax.jit, static_argnames=("rpg_v", "op", "wmode",
                                             "block_rows", "interpret"))
def _blocked_value_2d(table, src2d, dst2d, w2d, group_of_block, *,
                      rpg_v: int, op: str, wmode: str, block_rows: int,
                      interpret: bool):
    m = src2d.shape[0]
    kernel = functools.partial(_blocked_value_kernel, rpg_v, op, wmode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // block_rows,),
        in_specs=[
            pl.BlockSpec((rpg_v, LANE), lambda k, gref: (gref[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda k, gref: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda k, gref: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda k, gref: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANE), lambda k, gref: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.SMEM((1, 1), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, LANE), jnp.float32),
        interpret=interpret,
    )(group_of_block, table, src2d, dst2d, w2d)


def pull_vertex_reduce(values: jax.Array, graph, *, op: str = "sum",
                       wmode: str = "none",
                       interpret: bool = False) -> jax.Array:
    """(v_pad,) per-vertex reduce over in-edges: out[v] = op over
    in-edges (u,v) of f(values[u], w), with f per ``wmode``
    ("none" / "add" / "mul"); identity for vertices with no in-edges.

    Dispatches to the write-minimal pull-v2 kernel (``ops/pull2.py``)
    when the graph carries that layout; the round-4 sampled pipeline
    below remains the big-V / rectangular (sharded) fallback.
    """
    assert graph.has_blocked_values, \
        "needs to_device(with_blocked_values=True)"
    if getattr(graph, "has_pull2", False):
        from .pull2 import pull_reduce2
        return pull_reduce2(values, graph, op=op, wmode=wmode,
                            interpret=interpret)
    K = graph.bcsc_groups
    rpg_v = graph.bcsc_rows_per_group * 32
    fill = 0.0 if op == "sum" else jnp.inf
    table = pad_values_table(values, K, graph.bcsc_rows_per_group, fill)
    src2d = graph.bcsc_src.reshape(-1, LANE)
    dst2d = graph.bcsc_dst.reshape(-1, LANE)
    if wmode == "none":
        w2d = jnp.zeros_like(src2d, dtype=jnp.float32)
    else:
        w2d = graph.bcsc_val.reshape(-1, LANE)
    scan = _blocked_value_2d(table, src2d, dst2d, w2d,
                             graph.bcsc_group_of_block, rpg_v=rpg_v, op=op,
                             wmode=wmode, block_rows=graph.bcsc_block_rows,
                             interpret=interpret).reshape(-1)
    samples = sample_sorted(scan, graph.bcsc_vsample_pos,
                            interpret=interpret)
    ident = jnp.float32(fill)
    per_kv = jnp.where(graph.bcsc_vsample_valid, samples, ident)
    per_kv = per_kv.reshape(K, -1)
    if op == "sum":
        return jnp.sum(per_kv, axis=0)
    return jnp.min(per_kv, axis=0)


# --------------------------------------------------------------------------
# sample_sorted: gather arr[pos] for a SORTED static position vector, with
# arr living in HBM (too big for VMEM). XLA's gather runs ~50ns/elem even
# sorted; here each sample tile streams its position window through a
# small VMEM chunk via DMA and extracts lanes with take_along_axis —
# ~4 VPU ops per sample + one pass of DMA over the touched array range.
# --------------------------------------------------------------------------

_SAMPLE_TILE_ROWS = 32        # samples per grid step = 32*128 = 4096
_CHUNK_ROWS = 64              # DMA window chunk = 64*128 = 8192 values
_NBUF = 4                     # DMA pipeline depth


def _sample_kernel(arr_ref, pos_ref, o_ref, scratch, sem):
    # scratch: (NBUF, CHUNK_ROWS, 128) ring buffer; sem: NBUF DMA sems.
    pos = pos_ref[...]                       # (TR,128) sorted positions
    shape = pos.shape
    chunk_vals = _CHUNK_ROWS * LANE
    c0 = pos[0, 0] // chunk_vals
    c1 = pos[shape[0] - 1, LANE - 1] // chunk_vals

    def start_dma(c, slot):
        return pltpu.make_async_copy(
            arr_ref.at[pl.ds(c * _CHUNK_ROWS, _CHUNK_ROWS), :],
            scratch.at[slot], sem.at[slot])

    # warm the pipeline NBUF deep (chunks along a tile are consumed in
    # order; deep prefetch hides per-DMA latency)
    for w in range(_NBUF - 1):
        @pl.when(c0 + w <= c1)
        def _():
            start_dma(c0 + w, w % _NBUF).start()

    def visit(i, acc):
        c = c0 + i
        slot = i % _NBUF

        @pl.when(c + (_NBUF - 1) <= c1)
        def _():
            start_dma(c + (_NBUF - 1), (i + (_NBUF - 1)) % _NBUF).start()

        start_dma(c, slot).wait()
        local = pos - c * chunk_vals
        ok = (local >= 0) & (local < chunk_vals)
        lsafe = jnp.where(ok, local, 0)
        lrow = jax.lax.shift_right_logical(lsafe, 7)
        llane = lsafe & (LANE - 1)

        def rows(g, a):
            # one dynamic slab read per 8 rows, then static sub-rows:
            # scalar-core dynamic-slice addressing dominates row loops
            slab = scratch[slot, pl.ds(g * 8, 8), :]
            for u in range(8):
                rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
                v = jnp.take_along_axis(rowv, llane, axis=1)
                a = jnp.where(ok & (lrow == g * 8 + u), v, a)
            return a

        return jax.lax.fori_loop(0, _CHUNK_ROWS // 8, rows, acc)

    acc = jax.lax.fori_loop(0, c1 - c0 + 1, visit,
                            jnp.zeros(shape, arr_ref.dtype))
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sample_sorted_2d(arr2d: jax.Array, pos2d: jax.Array, *,
                      interpret: bool) -> jax.Array:
    m = pos2d.shape[0]
    return pl.pallas_call(
        _sample_kernel,
        grid=(m // _SAMPLE_TILE_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((_SAMPLE_TILE_ROWS, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_SAMPLE_TILE_ROWS, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, LANE), arr2d.dtype),
        scratch_shapes=[pltpu.VMEM((_NBUF, _CHUNK_ROWS, LANE), arr2d.dtype),
                        pltpu.SemaphoreType.DMA((_NBUF,))],
        interpret=interpret,
    )(arr2d, pos2d)


def sample_sorted(arr: jax.Array, pos: jax.Array, *,
                  interpret: bool = False) -> jax.Array:
    """``arr[pos]`` for sorted ``pos`` (int32, nondecreasing); ``arr``
    stays in HBM. ``arr`` length must be a multiple of 8192 (the blocked
    layouts guarantee it); ``pos`` is padded internally."""
    e = arr.shape[0]
    chunk = _CHUNK_ROWS * LANE
    if e % chunk:
        arr = jnp.concatenate(
            [arr, jnp.zeros((chunk - e % chunk,), arr.dtype)])
    s = pos.shape[0]
    tile = _SAMPLE_TILE_ROWS * LANE
    s_pad = -(-s // tile) * tile
    if s_pad != s:
        pos = jnp.concatenate(
            [pos, jnp.broadcast_to(pos[-1:], (s_pad - s,))])
    out = _sample_sorted_2d(arr.reshape(-1, LANE),
                            pos.reshape(-1, LANE), interpret=interpret)
    return out.reshape(-1)[:s]


def _sample2_kernel(a_ref, b_ref, pos_ref, oa_ref, ob_ref, sa, sb, sem):
    """Two-array variant of :func:`_sample_kernel`: both arrays are read
    at the SAME sorted positions, sharing one position decode and one
    chunk walk — the per-lane extraction cost of the second array is the
    only addition (the DMA windows ride the same chunk schedule)."""
    pos = pos_ref[...]
    shape = pos.shape
    chunk_vals = _CHUNK_ROWS * LANE
    c0 = pos[0, 0] // chunk_vals
    c1 = pos[shape[0] - 1, LANE - 1] // chunk_vals

    def start_dmas(c, slot):
        pltpu.make_async_copy(
            a_ref.at[pl.ds(c * _CHUNK_ROWS, _CHUNK_ROWS), :],
            sa.at[slot], sem.at[0, slot]).start()
        pltpu.make_async_copy(
            b_ref.at[pl.ds(c * _CHUNK_ROWS, _CHUNK_ROWS), :],
            sb.at[slot], sem.at[1, slot]).start()

    def wait_dmas(c, slot):
        pltpu.make_async_copy(
            a_ref.at[pl.ds(c * _CHUNK_ROWS, _CHUNK_ROWS), :],
            sa.at[slot], sem.at[0, slot]).wait()
        pltpu.make_async_copy(
            b_ref.at[pl.ds(c * _CHUNK_ROWS, _CHUNK_ROWS), :],
            sb.at[slot], sem.at[1, slot]).wait()

    for w in range(_NBUF - 1):
        @pl.when(c0 + w <= c1)
        def _():
            start_dmas(c0 + w, w % _NBUF)

    def visit(i, accs):
        acc_a, acc_b = accs
        c = c0 + i
        slot = i % _NBUF

        @pl.when(c + (_NBUF - 1) <= c1)
        def _():
            start_dmas(c + (_NBUF - 1), (i + (_NBUF - 1)) % _NBUF)

        wait_dmas(c, slot)
        local = pos - c * chunk_vals
        ok = (local >= 0) & (local < chunk_vals)
        lsafe = jnp.where(ok, local, 0)
        lrow = jax.lax.shift_right_logical(lsafe, 7)
        llane = lsafe & (LANE - 1)

        def rows(g, accs):
            acc_a, acc_b = accs
            slab_a = sa[slot, pl.ds(g * 8, 8), :]
            slab_b = sb[slot, pl.ds(g * 8, 8), :]
            for u in range(8):
                sel = ok & (lrow == g * 8 + u)
                va = jnp.take_along_axis(
                    jnp.broadcast_to(slab_a[u:u + 1, :], shape), llane,
                    axis=1)
                vb = jnp.take_along_axis(
                    jnp.broadcast_to(slab_b[u:u + 1, :], shape), llane,
                    axis=1)
                acc_a = jnp.where(sel, va, acc_a)
                acc_b = jnp.where(sel, vb, acc_b)
            return acc_a, acc_b

        return jax.lax.fori_loop(0, _CHUNK_ROWS // 8, rows,
                                 (acc_a, acc_b))

    acc_a, acc_b = jax.lax.fori_loop(
        0, c1 - c0 + 1, visit,
        (jnp.zeros(shape, a_ref.dtype), jnp.zeros(shape, b_ref.dtype)))
    oa_ref[...] = acc_a
    ob_ref[...] = acc_b


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sample_sorted2_2d(a2d, b2d, pos2d, *, interpret: bool):
    m = pos2d.shape[0]
    return pl.pallas_call(
        _sample2_kernel,
        grid=(m // _SAMPLE_TILE_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((_SAMPLE_TILE_ROWS, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((_SAMPLE_TILE_ROWS, LANE), lambda k: (k, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_SAMPLE_TILE_ROWS, LANE), lambda k: (k, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((m, LANE), a2d.dtype),
                   jax.ShapeDtypeStruct((m, LANE), b2d.dtype)),
        scratch_shapes=[pltpu.VMEM((_NBUF, _CHUNK_ROWS, LANE), a2d.dtype),
                        pltpu.VMEM((_NBUF, _CHUNK_ROWS, LANE), b2d.dtype),
                        pltpu.SemaphoreType.DMA((2, _NBUF))],
        interpret=interpret,
    )(a2d, b2d, pos2d)


def sample_sorted2(arr_a: jax.Array, arr_b: jax.Array, pos: jax.Array, *,
                   interpret: bool = False):
    """``(arr_a[pos], arr_b[pos])`` for sorted ``pos`` — one fused chunk
    walk (see :func:`sample_sorted`). Arrays must be equal length."""
    assert arr_a.shape[0] == arr_b.shape[0]
    e = arr_a.shape[0]
    chunk = _CHUNK_ROWS * LANE
    if e % chunk:
        padn = chunk - e % chunk
        arr_a = jnp.concatenate([arr_a, jnp.zeros((padn,), arr_a.dtype)])
        arr_b = jnp.concatenate([arr_b, jnp.zeros((padn,), arr_b.dtype)])
    s = pos.shape[0]
    tile = _SAMPLE_TILE_ROWS * LANE
    s_pad = -(-s // tile) * tile
    if s_pad != s:
        pos = jnp.concatenate(
            [pos, jnp.broadcast_to(pos[-1:], (s_pad - s,))])
    oa, ob = _sample_sorted2_2d(arr_a.reshape(-1, LANE),
                                arr_b.reshape(-1, LANE),
                                pos.reshape(-1, LANE), interpret=interpret)
    return oa.reshape(-1)[:s], ob.reshape(-1)[:s]


def _block_cumsum_rowmajor(x: jax.Array) -> jax.Array:
    """Inclusive row-major cumsum of a (B, 128) int32 block via log-step
    shifted adds (Mosaic-friendly; no native cumsum lowering needed)."""
    b = x.shape[0]
    lanepos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # prefix along lanes
    y = x
    s = 1
    while s < LANE:
        y = y + jnp.where(lanepos >= s, pltpu.roll(y, s, 1), 0)
        s *= 2
    row_tot = jnp.broadcast_to(y[:, LANE - 1:LANE], x.shape)
    # prefix of row totals along sublanes (exclusive)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    z = row_tot
    s = 1
    while s < b:
        z = z + jnp.where(rowpos >= s, pltpu.roll(z, s, 0), 0)
        s *= 2
    prev_rows = z - row_tot              # exclusive prefix over rows
    return y + prev_rows


def _gather_cumsum_kernel(rows_const: int, t_ref, i_ref, o_ref, carry_ref):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        carry_ref[0, 0] = 0

    ii = i_ref[...]
    wid = jax.lax.shift_right_logical(ii, 5)
    wrow = jax.lax.shift_right_logical(wid, 7)
    wlane = wid & (LANE - 1)
    bit = ii & 31
    shape = ii.shape

    def body(g, acc):
        slab = t_ref[pl.ds(g * 8, 8), :]
        for u in range(8):
            rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
            rowc = jnp.take_along_axis(rowv, wlane, axis=1)
            acc = jnp.where(wrow == g * 8 + u, rowc, acc)
        return acc

    acc = jax.lax.fori_loop(0, rows_const // 8, body,
                            jnp.zeros(shape, jnp.int32))
    hit = jax.lax.shift_right_logical(acc, bit) & 1
    cs = _block_cumsum_rowmajor(hit) + carry_ref[0, 0]
    o_ref[...] = cs
    carry_ref[0, 0] = cs[shape[0] - 1, LANE - 1]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _bitmask_gather_cumsum_2d(words: jax.Array, idx2d: jax.Array, *,
                              block_rows: int, interpret: bool) -> jax.Array:
    R = words.shape[0]
    m = idx2d.shape[0]
    kernel = functools.partial(_gather_cumsum_kernel, R)
    return pl.pallas_call(
        kernel,
        grid=(m // block_rows,),
        in_specs=[pl.BlockSpec((R, LANE), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_rows, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, LANE), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(words, idx2d)


def bitmask_gather_cumsum(words: jax.Array, idx: jax.Array, *,
                          block_rows: int = DEFAULT_BLOCK_ROWS,
                          interpret: bool = False) -> jax.Array:
    """Fused ``cumsum(bitmask_gather(words, idx))`` (inclusive, int32).

    The TPU grid executes sequentially on one core, so the running total
    carries across blocks through SMEM scratch — one kernel produces the
    full running sum of frontier-membership hits, which pull-mode
    traversal consumes via boundary differences.
    """
    n = idx.shape[0]
    assert n % LANE == 0, "pad idx to a multiple of 128"
    m = n // LANE
    br = min(block_rows, max(((m + 7) // 8) * 8, 8))
    m_pad = -(-m // br) * br
    idx2d = idx.reshape(m, LANE)
    if m_pad != m:
        # pad with an always-miss index? 0 may be a hit — pad AFTER the
        # real lanes only affects their own positions, which we slice off.
        idx2d = jnp.concatenate(
            [idx2d, jnp.zeros((m_pad - m, LANE), idx.dtype)])
    out = _bitmask_gather_cumsum_2d(words, idx2d, block_rows=br,
                                    interpret=interpret)
    return out[:m].reshape(n)


# --------------------------------------------------------------------------
# Fused destination reduction over a dst-SORTED candidate stream: segmented
# min/sum scan + run-tail detection + in-kernel stream compaction (staged
# binary router) + append-DMA of the compacted (dst, value) winner pairs.
#
# This is the TPU re-shape of the reference's fused atomicMin/atomicAdd
# advance (gunrock/app/sssp/sssp_functor.cuh:59-99 relax, bc_functor.cuh:
# 70-71 sigma accumulation): after one XLA sort by destination, ONE VPU
# pass replaces the whole M-scale post-sort soup (run-head compare,
# M-scale dist gather, M-scale masked value scatter, M-scale compaction
# scatter). Output is at DISTINCT-DESTINATION scale (<= min(M, V)), so
# every downstream op (improvement test, dist scatter-min, next-queue
# compaction) runs at vertex scale even for 60M-lane advances.
#
# Compaction inside the kernel: lane i's target slot is p + (# tails
# before i) (p = cross-tile partial fill); the required DOWN-shift
# s = flat(i) - target is nondecreasing along the stream, so routing it
# through 13 staged binary shifts (move down 2^j iff bit j of the
# remaining shift is set, LSB first) is collision-free — verified
# against a numpy oracle in tests. The cross-tile partial row rides the
# same butterfly (it enters at row 0 with shift 0), so appended windows
# stay 128-lane dense with no dynamic rolls anywhere.
# --------------------------------------------------------------------------

_RED_TILE_ROWS = 32            # stream lanes per grid step = 4096
_RED_WORK_ROWS = 40            # partial row + 32 data rows + roll pad
_RED_WIN_ROWS = 33             # HBM append window rows (static DMA size)
_RED_SENT = 0x7FFFFFFF               # id-space sentinel (plain int: jnp
                                     # constants would be captured consts)


def _flat_shift_down(x: jax.Array, step: int) -> jax.Array:
    """y[flat l] = x[flat l + step] over a row-major (R, 128) tile
    (junk ripples in at the tail; callers gate on the id sentinel)."""
    rows = x.shape[0]
    if step % LANE == 0:
        return pltpu.roll(x, rows - step // LANE, 0)
    a = pltpu.roll(x, LANE - step, 1)          # a[r,l] = x[r,(l+step)%128]
    b = pltpu.roll(a, rows - 1, 0)             # b[r,l] = a[r+1,l]
    lanepos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lanepos < LANE - step, a, b)


def _reduce_sorted_kernel(op: str, out_rows: int, filtered: bool,
                          *refs):
    if filtered:
        (sd_ref, sn_ref, sc_ref, aux_ref,
         oid_ref, oval_ref, cnt_ref,
         wid, wval, pid, pval, smi, smf, sems) = refs
    else:
        (sd_ref, sn_ref, sc_ref,
         oid_ref, oval_ref, cnt_ref,
         wid, wval, pid, pval, smi, smf, sems) = refs
    k = pl.program_id(0)
    identity = jnp.float32(jnp.inf if op == "min" else 0.0)

    @pl.when(k == 0)
    def _():
        smi[0, 0] = -1                 # ckey: no vertex id is -1
        smi[0, 1] = 0                  # off_row: next append row
        smi[0, 2] = 0                  # p: partial-row fill level
        smi[0, 3] = 0                  # total winner lanes emitted
        smf[0, 0] = identity           # cval: running reduction carry
        pid[0:1, :] = jnp.full((1, LANE), _RED_SENT, jnp.int32)
        pval[0:1, :] = jnp.full((1, LANE), identity, jnp.float32)

    sd = sd_ref[...]                   # (32,128) sorted destination ids
    sn = sn_ref[...]                   # sd shifted one lane (next id)
    sc = sc_ref[...]                   # candidate values
    shape = sd.shape

    # Carry splice: the leading run may continue the previous tile's run.
    ckey = smi[0, 0]
    cval = smf[0, 0]
    if op == "min":
        sc = jnp.where(sd == ckey, jnp.minimum(sc, cval), sc)
    else:
        rowpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lanepos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        first = (rowpos == 0) & (lanepos == 0) & (sd == ckey)
        sc = jnp.where(first, sc + cval, sc)
    scan = _seg_scan_val(sc, sd, op)
    smf[0, 0] = scan[_RED_TILE_ROWS - 1, LANE - 1]
    smi[0, 0] = sd[_RED_TILE_ROWS - 1, LANE - 1]

    tails = sd != sn                   # last lane of each GLOBAL run
    if filtered:
        # Emit a run iff its full reduction IMPROVES on the aux stream
        # (aux is constant within a run: callers gather it per sorted
        # destination). scan at the tail holds the whole-run value, so
        # this is the SSSP strict-improvement test / the BC "newly
        # discovered" test fused into the compaction — the kernel's
        # output becomes the next frontier itself.
        tails = tails & (scan < aux_ref[...])
    # Target slot (within the appended stream segment starting at the
    # current partial fill p) and the down-shift for the router.
    p = smi[0, 2]
    tl = tails.astype(jnp.int32)
    t = p + _block_cumsum_rowmajor(tl) - tl        # exclusive rank + p
    lanepos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    flat = (rowpos + 1) * LANE + lanepos           # data starts at row 1
    s_data = jnp.where(tails, flat - t, 0)
    k_count = jnp.sum(tl)

    # Wait for the previous append before touching the staging tile.
    @pl.when(k > 0)
    def _():
        pltpu.make_async_copy(
            wid.at[pl.ds(0, _RED_WIN_ROWS)],
            oid_ref.at[pl.ds(0, _RED_WIN_ROWS)], sems.at[0]).wait()
        pltpu.make_async_copy(
            wval.at[pl.ds(0, _RED_WIN_ROWS)],
            oval_ref.at[pl.ds(0, _RED_WIN_ROWS)], sems.at[1]).wait()

    # Assemble the working tile: row 0 = partial, rows 1..32 = this
    # tile's tails (others SENT), rest = SENT pad.
    wid[0:1, :] = pid[...]
    wval[0:1, :] = pval[...]
    wid[1:1 + _RED_TILE_ROWS, :] = jnp.where(tails, sd, _RED_SENT)
    wval[1:1 + _RED_TILE_ROWS, :] = scan
    wid[1 + _RED_TILE_ROWS:, :] = jnp.full(
        (_RED_WORK_ROWS - 1 - _RED_TILE_ROWS, LANE), _RED_SENT, jnp.int32)

    ids = wid[...]
    vals = wval[...]
    svec = jnp.concatenate(
        [jnp.zeros((1, LANE), jnp.int32), s_data,
         jnp.zeros((_RED_WORK_ROWS - 1 - _RED_TILE_ROWS, LANE),
                   jnp.int32)])

    # Staged binary router, LSB first (collision-free for the
    # nondecreasing shifts of a monotone compaction).
    for j in range(13):                           # shifts < 40*128 = 5120
        step = 1 << j
        up_id = _flat_shift_down(ids, step)
        up_s = _flat_shift_down(svec, step)
        up_val = _flat_shift_down(vals, step)
        take = (up_id != _RED_SENT) & (((up_s >> j) & 1) == 1)
        keep = (ids != _RED_SENT) & (((svec >> j) & 1) == 0)
        ids = jnp.where(take, up_id, jnp.where(keep, ids, _RED_SENT))
        svec = jnp.where(take, up_s - step, svec)
        vals = jnp.where(take, up_val, vals)

    wid[...] = ids
    wval[...] = vals

    # New fill level and the rows completed this step.
    kt = p + k_count
    full_rows = kt >> 7
    newp = kt & (LANE - 1)
    # Save the new partial row (row `full_rows` of the compacted tile).
    prow_id = wid[pl.ds(full_rows, 1), :]
    prow_val = wval[pl.ds(full_rows, 1), :]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    pid[...] = jnp.where(lane1 < newp, prow_id, _RED_SENT)
    pval[...] = jnp.where(lane1 < newp, prow_val, identity)

    off = smi[0, 1]
    off_w = jnp.minimum(off, out_rows - _RED_WIN_ROWS)   # overflow clamp
    pltpu.make_async_copy(wid.at[pl.ds(0, _RED_WIN_ROWS)],
                          oid_ref.at[pl.ds(off_w, _RED_WIN_ROWS)],
                          sems.at[0]).start()
    pltpu.make_async_copy(wval.at[pl.ds(0, _RED_WIN_ROWS)],
                          oval_ref.at[pl.ds(off_w, _RED_WIN_ROWS)],
                          sems.at[1]).start()
    smi[0, 1] = off + full_rows
    smi[0, 2] = newp
    smi[0, 3] = smi[0, 3] + k_count
    cnt_ref[0, 0] = smi[0, 3]

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        pltpu.make_async_copy(
            wid.at[pl.ds(0, _RED_WIN_ROWS)],
            oid_ref.at[pl.ds(0, _RED_WIN_ROWS)], sems.at[0]).wait()
        pltpu.make_async_copy(
            wval.at[pl.ds(0, _RED_WIN_ROWS)],
            oval_ref.at[pl.ds(0, _RED_WIN_ROWS)], sems.at[1]).wait()


@functools.partial(jax.jit, static_argnames=("op", "out_rows", "interpret"))
def _reduce_sorted_2d(sd2d, sn2d, sc2d, *aux2d, op: str, out_rows: int,
                      interpret: bool):
    m = sd2d.shape[0]
    kernel = functools.partial(_reduce_sorted_kernel, op, out_rows,
                               bool(aux2d))
    return pl.pallas_call(
        kernel,
        grid=(m // _RED_TILE_ROWS,),
        in_specs=[pl.BlockSpec((_RED_TILE_ROWS, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)] * (3 + len(aux2d)),
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((out_rows, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((out_rows, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((_RED_WORK_ROWS, LANE), jnp.int32),
                        pltpu.VMEM((_RED_WORK_ROWS, LANE), jnp.float32),
                        pltpu.VMEM((1, LANE), jnp.int32),
                        pltpu.VMEM((1, LANE), jnp.float32),
                        pltpu.SMEM((1, 4), jnp.int32),
                        pltpu.SMEM((1, 1), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(sd2d, sn2d, sc2d, *aux2d)


# --------------------------------------------------------------------------
# scatter_sorted: dense[ids] = op(dense[ids], vals) for a SORTED UNIQUE id
# stream — the deterministic replacement for the reference's atomic
# scatter (sssp_functor.cuh:59-99 atomicMin / bc_functor.cuh:70 atomicAdd)
# on the destination-update side. XLA lowers scatter element-serially on
# TPU (~150 ns/element measured on v5e — the wall under every per-round
# winner write-back); here the dense vector streams through VMEM in
# (32,128) tiles while the update stream co-walks in chunks: per busy
# tile, the (contiguous) in-tile updates route from their stream slots to
# their dense slots with a 13-stage binary UP-router (mirror of the
# reduce kernel's compaction router; collision-free because the source
# range is contiguous and targets are unique ascending), then one masked
# elementwise min/set/add merges them. ~100 vector ops per BUSY tile,
# zero per quiet tile — amortized ~2-5 ns per dense lane instead of
# ~150 ns per update.
# --------------------------------------------------------------------------

_SCT_TILE_ROWS = 32          # dense rows per grid step = 4096 slots
_SCT_SENT = 0x7FFFFFFF


def _flat_shift_up(x: jax.Array, step: int) -> jax.Array:
    """y[flat l] = x[flat l - step] over a row-major (R, 128) tile
    (junk ripples in at the head; callers gate on the id sentinel)."""
    rows = x.shape[0]
    if step % LANE == 0:
        return pltpu.roll(x, step // LANE, 0)
    t = step % LANE
    q = step // LANE
    a = pltpu.roll(x, t, 1)                    # a[r,l] = x[r,(l-t)%128]
    lo = pltpu.roll(a, q, 0)                   # l >= t rows
    hi = pltpu.roll(a, (q + 1) % rows, 0)      # l < t rows
    lanepos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lanepos >= t, lo, hi)


def _scatter_sorted_kernel(op: str, nchunks: int,
                           ids_ref, vals_ref, dense_ref, o_ref,
                           cid, cval, smi, sem):
    k = pl.program_id(0)
    base = k * _SCT_TILE_ROWS * LANE
    tile_end = base + _SCT_TILE_ROWS * LANE

    @pl.when(k == 0)
    def _():
        smi[0, 0] = 0        # c: first chunk not fully below this tile
        smi[0, 1] = -1       # chunk index currently resident in cid/cval

    dense = dense_ref[...]

    def load(c):
        pltpu.make_async_copy(
            ids_ref.at[pl.ds(c * _SCT_TILE_ROWS, _SCT_TILE_ROWS)],
            cid, sem.at[0]).start()
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(c * _SCT_TILE_ROWS, _SCT_TILE_ROWS)],
            cval, sem.at[1]).start()
        pltpu.make_async_copy(
            ids_ref.at[pl.ds(c * _SCT_TILE_ROWS, _SCT_TILE_ROWS)],
            cid, sem.at[0]).wait()
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(c * _SCT_TILE_ROWS, _SCT_TILE_ROWS)],
            cval, sem.at[1]).wait()

    def apply_chunk(args):
        dense, ids, vals = args
        shape = ids.shape
        inmask = (ids >= base) & (ids < tile_end)
        rowpos = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lanepos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        flat = rowpos * LANE + lanepos
        # UP-shift to workspace flat 4096 + (id - base). In-tile updates
        # are CONTIGUOUS in the stream (source gaps = 1) with unique
        # ascending targets -> shifts nondecreasing -> collision-free.
        u = jnp.where(inmask,
                      _SCT_TILE_ROWS * LANE + (ids - base) - flat, 0)
        wid = jnp.concatenate(
            [jnp.where(inmask, ids, _SCT_SENT),
             jnp.full(shape, _SCT_SENT, jnp.int32)])
        wval = jnp.concatenate([vals, vals])
        wu = jnp.concatenate([u, jnp.zeros(shape, jnp.int32)])
        # MSB-first: the expansion is the time-reversal of an LSB-first
        # down-compaction (reduce kernel's router), so running its
        # stages in reverse order reproduces that movie's collision-free
        # occupancy states; LSB-first UP-routing can collide.
        for j in reversed(range(13)):           # shifts <= 8191
            step = 1 << j
            dn_id = _flat_shift_up(wid, step)
            dn_u = _flat_shift_up(wu, step)
            dn_val = _flat_shift_up(wval, step)
            take = (dn_id != _SCT_SENT) & (((dn_u >> j) & 1) == 1)
            keep = (wid != _SCT_SENT) & (((wu >> j) & 1) == 0)
            wid = jnp.where(take, dn_id,
                            jnp.where(keep, wid, _SCT_SENT))
            wu = jnp.where(take, dn_u - step, wu)
            wval = jnp.where(take, dn_val, wval)
        rid = wid[_SCT_TILE_ROWS:]
        rval = wval[_SCT_TILE_ROWS:]
        hit = rid != _SCT_SENT
        if op == "min":
            return jnp.where(hit, jnp.minimum(dense, rval), dense)
        if op == "max":
            return jnp.where(hit, jnp.maximum(dense, rval), dense)
        if op == "set":
            return jnp.where(hit, rval, dense)
        return dense + jnp.where(hit, rval,
                                 jnp.zeros_like(rval))    # add

    c0 = smi[0, 0]

    # ---- chunk c0: reload only when a different chunk is resident.
    @pl.when((c0 < nchunks) & (smi[0, 1] != c0))
    def _():
        load(c0)
        smi[0, 1] = c0

    ids0 = cid[...]
    vals0 = cval[...]
    last0 = jnp.where(c0 < nchunks, ids0[_SCT_TILE_ROWS - 1, LANE - 1],
                      _SCT_SENT)
    first0 = jnp.where(c0 < nchunks, ids0[0, 0], _SCT_SENT)
    busy0 = (first0 < tile_end) & (last0 >= base) & (c0 < nchunks)
    dense = jax.lax.cond(busy0, apply_chunk, lambda a: a[0],
                         (dense, ids0, vals0))

    # ---- chunk c0+1 only when c0 ended inside this tile's range.
    need1 = (last0 < tile_end) & (c0 + 1 < nchunks)

    @pl.when(need1)
    def _():
        load(c0 + 1)
        smi[0, 1] = c0 + 1

    ids1 = cid[...]
    vals1 = cval[...]
    last1 = jnp.where(need1, ids1[_SCT_TILE_ROWS - 1, LANE - 1],
                      _SCT_SENT)
    first1 = jnp.where(need1, ids1[0, 0], _SCT_SENT)
    busy1 = need1 & (first1 < tile_end)
    dense = jax.lax.cond(busy1, apply_chunk, lambda a: a[0],
                         (dense, ids1, vals1))

    # Advance past fully-consumed chunks (a chunk whose last id is below
    # this tile's end can never matter again; <=2 finish per tile since
    # ids are unique and a tile has 4096 slots).
    smi[0, 0] = c0 + (last0 < tile_end).astype(jnp.int32) \
        + (need1 & (last1 < tile_end)).astype(jnp.int32)
    o_ref[...] = dense


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def _scatter_sorted_2d(dense2d, ids2d, vals2d, *, op: str,
                       interpret: bool):
    r = dense2d.shape[0]
    kernel = functools.partial(_scatter_sorted_kernel, op,
                               ids2d.shape[0] // _SCT_TILE_ROWS)
    return pl.pallas_call(
        kernel,
        grid=(r // _SCT_TILE_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((_SCT_TILE_ROWS, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_SCT_TILE_ROWS, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, LANE), dense2d.dtype),
        scratch_shapes=[pltpu.VMEM((_SCT_TILE_ROWS, LANE), jnp.int32),
                        pltpu.VMEM((_SCT_TILE_ROWS, LANE), vals2d.dtype),
                        pltpu.SMEM((1, 2), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(ids2d, vals2d, dense2d)


def scatter_sorted(dense: jax.Array, ids: jax.Array, vals: jax.Array, *,
                   count=None, op: str = "min",
                   interpret: bool = False) -> jax.Array:
    """``dense[ids[i]] = op(dense[ids[i]], vals[i])`` for ``i < count``.

    ``ids`` must be SORTED ascending and UNIQUE among the first ``count``
    lanes (a compacted winner stream — ``compact``/``dedup`` output);
    lanes >= count are masked here. ids >= dense.size are dropped.
    dtype of ``vals`` must match ``dense`` (float32 or int32).
    """
    n = dense.shape[0]
    m = ids.shape[0]
    tile = _SCT_TILE_ROWS * LANE
    n_pad = max(-(-n // tile) * tile, tile)
    m_pad = max(-(-m // tile) * tile, tile)
    if count is None:
        count = m
    lane = jax.lax.iota(jnp.int32, m_pad)
    idsp = jnp.full((m_pad,), _SCT_SENT, jnp.int32).at[:m].set(ids)
    idsp = jnp.where((lane < count) & (idsp < n), idsp, _SCT_SENT)
    valsp = jnp.zeros((m_pad,), dense.dtype).at[:m].set(
        vals.astype(dense.dtype))
    densep = dense if n_pad == n else jnp.concatenate(
        [dense, jnp.zeros((n_pad - n,), dense.dtype)])
    out = _scatter_sorted_2d(densep.reshape(-1, LANE),
                             idsp.reshape(-1, LANE),
                             valsp.reshape(-1, LANE),
                             op=op, interpret=interpret).reshape(-1)
    return out[:n]


def reduce_by_dst_sorted(sd: jax.Array, vals: jax.Array, *, op: str = "min",
                         out_lanes: int, aux: Optional[jax.Array] = None,
                         interpret: bool = False):
    """Reduce ``vals`` by runs of equal (sorted, nondecreasing) ``sd``.

    Returns ``(ids, rvals, count)``: one lane per DISTINCT ``sd`` value —
    its id and the min/sum of its candidates — compacted (ascending ids)
    into ``out_lanes`` lanes; lanes >= ``count`` are garbage (callers
    mask). ``count > out_lanes`` signals overflow (appends were clamped;
    treat like a failed ``Check_Size``). The stream pads (to a tile
    multiple) by extending the final run with identity values.

    ``aux`` (f32, constant within each run — e.g. ``dist[sd]`` via a
    sorted gather) switches on the IMPROVING-ONLY filter: a run is
    emitted iff its full reduction is strictly below its aux value.
    With ``op='min'`` / ``aux=dist[sd]`` the output is exactly SSSP's
    improving-winner set (the fused atomicMin of the reference,
    ``sssp_functor.cuh:59-99``, including the next-frontier compaction);
    with ``op='sum'`` / ``aux = +inf where new else -inf`` it is BC's
    newly-discovered set with their sigma totals.
    """
    m = sd.shape[0]
    tile = _RED_TILE_ROWS * LANE
    m_pad = max(-(-m // tile) * tile, tile)
    identity = jnp.float32(jnp.inf if op == "min" else 0.0)
    if m_pad != m:
        sd = jnp.concatenate([sd, jnp.broadcast_to(sd[-1:], (m_pad - m,))])
        vals = jnp.concatenate(
            [vals, jnp.full((m_pad - m,), identity, vals.dtype)])
        if aux is not None:
            # The pad extends the FINAL run, so its tail lane (where the
            # filter reads aux) lands in the pad: pad with the run's own
            # aux value, not a sentinel.
            aux = jnp.concatenate(
                [aux, jnp.broadcast_to(aux[-1:], (m_pad - m,))])
    sn = jnp.concatenate([sd[1:], jnp.full((1,), 2**31 - 1, jnp.int32)])
    out_rows = -(-out_lanes // LANE) + _RED_WIN_ROWS
    out_rows = ((out_rows + 7) // 8) * 8
    aux2d = () if aux is None else (
        aux.astype(jnp.float32).reshape(-1, LANE),)
    ids2d, vals2d, cnt = _reduce_sorted_2d(
        sd.reshape(-1, LANE), sn.reshape(-1, LANE),
        vals.astype(jnp.float32).reshape(-1, LANE), *aux2d,
        op=op, out_rows=out_rows, interpret=interpret)
    return (ids2d.reshape(-1)[:out_lanes], vals2d.reshape(-1)[:out_lanes],
            cnt[0, 0])
