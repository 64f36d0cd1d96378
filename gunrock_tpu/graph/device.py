"""Device-resident graph: padded, static-shape, int32 CSR for XLA.

TPU-native replacement for the reference's ``GraphSlice``
(``gunrock/app/problem_base.cuh:85-342``): the per-device graph holds the
forward CSR, optionally the inverse CSR (CSC) for pull/backward primitives,
and per-edge values. Where the reference relies on dynamic allocation
(``util/array_utils.cuh`` Array1D EnsureSize), we pad every array to a
static, tile-aligned capacity once at load time — XLA requires static
shapes, and padding to lane multiples keeps the VPU happy.

Padding invariants:
  * ``row_offsets`` has ``v_pad + 1`` entries; entries past ``num_nodes``
    repeat ``num_edges`` so padded vertices have degree 0.
  * ``col_indices`` / ``edge_values`` are padded to ``e_pad``; padded edges
    point at vertex 0 but are never reachable via offsets (their source has
    degree 0). Per-edge segment-id arrays (``edge_src`` / ``csc_edge_dst``)
    use ``v_pad`` as the fill so segment ops sized ``v_pad`` drop them.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .csr import CsrGraph

__all__ = ["DeviceGraph", "to_device", "round_up"]

LANE = 128  # TPU lane width; last-dim alignment target.


def round_up(x: int, m: int = LANE) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "row_offsets", "col_indices", "edge_values", "edge_src",
        "csc_offsets", "csc_indices", "csc_edge_values", "csc_edge_dst",
        "bcsc_src", "bcsc_dst", "bcsc_group_of_block", "bcsc_sample_pos",
        "bcsc_sample_valid", "bcsc_wcell_pos", "bcsc_csrc", "bcsc_cdst",
        "bcsc_cellword", "bcsc_val",
        "bcsc_vsample_pos", "bcsc_vsample_valid",
        "pv2_src", "pv2_dst", "pv2_val", "pv2_wpr", "pv2_gob",
        "pv2_d0row", "pv2_nt", "pv2_cb", "pv2_pos",
    ],
    meta_fields=["num_nodes", "num_edges", "v_pad", "e_pad",
                 "bcsc_groups", "bcsc_rows_per_group", "bcsc_block_rows",
                 "pv2_groups", "pv2_block_rows", "pv2_span_rows",
                 "undirected"],
)
@dataclasses.dataclass(frozen=True)
class DeviceGraph:
    """Static-shape CSR (+ optional CSC) living in HBM.

    ``num_nodes``/``num_edges`` are Python ints (static under jit);
    dynamic per-run state (frontiers, labels) lives in the per-primitive
    problem state, mirroring the reference's GraphSlice/DataSlice split
    (``problem_base.cuh:85,357``).
    """

    num_nodes: int
    num_edges: int
    v_pad: int
    e_pad: int
    row_offsets: jax.Array                 # (v_pad+1,) int32
    col_indices: jax.Array                 # (e_pad,)   int32
    edge_values: Optional[jax.Array]       # (e_pad,)   float32 or None
    # Per-CSR-edge source vertex (COO rows): segment/source ids for
    # full-edge-list ("ALL_EDGES") advance, reference
    # ``oprtr/all_edges_advance/`` used by CC (``app/cc/cc_enactor.cuh:343``).
    edge_src: Optional[jax.Array]          # (e_pad,)   int32, fill v_pad
    # Inverse CSR (reference GraphSlice column_offsets/row_indices,
    # problem_base.cuh:97-98) for pull-mode advance / backward BC.
    # csc row v lists the *in*-neighbors (sources) of v.
    csc_offsets: Optional[jax.Array]       # (v_pad+1,) int32
    csc_indices: Optional[jax.Array]       # (e_pad,)   int32 (source u per in-edge)
    csc_edge_values: Optional[jax.Array]   # (e_pad,)   float32
    csc_edge_dst: Optional[jax.Array]      # (e_pad,)   int32 (dest v per in-edge, fill v_pad)
    # Blocked CSC — the pull-kernel edge layout: edges grouped by SOURCE
    # block (group k owns src in [k*v_pad/K, (k+1)*v_pad/K)), sorted by
    # (dst, src) within each group, each group padded to a multiple of
    # bcsc_block_rows*128. Cuts the in-kernel frontier-bitmask gather to
    # rows_per_group rounds and enables static per-word result sampling.
    bcsc_src: Optional[jax.Array] = None            # (E',) int32
    bcsc_dst: Optional[jax.Array] = None            # (E',) int32
    bcsc_group_of_block: Optional[jax.Array] = None  # (E'/(br*128),) int32
    bcsc_sample_pos: Optional[jax.Array] = None     # (K, v_pad//32) int32
    bcsc_sample_valid: Optional[jax.Array] = None   # (K, v_pad//32) bool
    # Flat nondecreasing word-last CELL indices (invalid slots carry the
    # previous valid cell forward) — pull_reached_words slices the
    # cell-last array and streams all K*nwords samples through one dense
    # sample_sorted DMA pass instead of K serial XLA gathers.
    bcsc_wcell_pos: Optional[jax.Array] = None      # (K*v_pad//32,) int32
    # Cell-transposed copies for the cells pull kernel: within each
    # 4096-slot window, slot s of cell c sits at (row s, lane c), so the
    # within-cell OR is five unkeyed sublane rolls and cell results
    # extract to a compact (windows, 128) layout in-kernel — the keyed
    # segmented scan then runs over cells (1/32nd the elements) instead
    # of slots. bcsc_cellword holds each cell's destination word id.
    bcsc_csrc: Optional[jax.Array] = None           # (E',) int32
    bcsc_cdst: Optional[jax.Array] = None           # (E',) int32
    bcsc_cellword: Optional[jax.Array] = None       # (E'//32,) int32
    # Value-kernel extensions: weights in blocked order, per-(group,
    # vertex) sample positions for segmented value reductions.
    bcsc_val: Optional[jax.Array] = None            # (E',) float32
    bcsc_vsample_pos: Optional[jax.Array] = None    # (K*v_pad,) int32 sorted
    bcsc_vsample_valid: Optional[jax.Array] = None  # (K*v_pad,) bool
    bcsc_groups: int = 0                            # K (0 = not built)
    bcsc_rows_per_group: int = 0                    # bitmask rows per group
    bcsc_block_rows: int = 0                        # kernel block height
    # Pull-v2 layout (graph/pull2.py): write-minimal VMEM-accumulator
    # value pull. Decoupled grouping (1024-vertex units), span-split
    # blocks, sign-encoded static result positions.
    pv2_src: Optional[jax.Array] = None             # (E2,) int32
    pv2_dst: Optional[jax.Array] = None             # (E2,) int32
    pv2_val: Optional[jax.Array] = None             # (E2,) float32
    pv2_wpr: Optional[jax.Array] = None             # (E2,) f32 1/outdeg[src]
    pv2_gob: Optional[jax.Array] = None             # (nblocks,) int32
    pv2_d0row: Optional[jax.Array] = None           # (nblocks,) int32
    pv2_nt: Optional[jax.Array] = None              # (nblocks,) int32
    pv2_cb: Optional[jax.Array] = None              # (nblocks*ntiles,) i32
    pv2_pos: Optional[jax.Array] = None             # (K*v_pad,) int32 enc
    pv2_groups: int = 0
    pv2_block_rows: int = 0
    pv2_span_rows: int = 0
    # Symmetric edge set (built with undirected=True): pull-over-
    # in-edges kernels that need OUT-edge reductions (Brandes backward)
    # gate on this instead of building a transpose layout.
    undirected: bool = False

    @property
    def has_pull2(self) -> bool:
        return self.pv2_pos is not None

    @property
    def has_blocked_values(self) -> bool:
        return self.bcsc_vsample_pos is not None or self.pv2_pos is not None

    @property
    def has_csc(self) -> bool:
        return self.csc_offsets is not None

    @property
    def has_blocked_csc(self) -> bool:
        return self.bcsc_groups > 0

    @property
    def has_edge_values(self) -> bool:
        return self.edge_values is not None

    def out_degree(self, v: jax.Array) -> jax.Array:
        return self.row_offsets[v + 1] - self.row_offsets[v]

    def in_degree(self, v: jax.Array) -> jax.Array:
        return self.csc_offsets[v + 1] - self.csc_offsets[v]


def _pad_offsets(row_offsets: np.ndarray, v_pad: int, num_edges: int,
                 dtype=np.int32) -> np.ndarray:
    out = np.full(v_pad + 1, num_edges, dtype=dtype)
    out[: row_offsets.shape[0]] = row_offsets.astype(dtype)
    return out


def _pad_edges(arr: np.ndarray, e_pad: int, fill) -> np.ndarray:
    out = np.full(e_pad, fill, dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def _edge_seg_ids(row_offsets: np.ndarray, num_nodes: int, e_pad: int,
                  v_pad: int) -> np.ndarray:
    seg = np.repeat(np.arange(num_nodes, dtype=np.int32), np.diff(row_offsets))
    return _pad_edges(seg, e_pad, v_pad)


def _bitmask_rows(v_pad: int) -> int:
    """Rows of the packed bitmask for v_pad bits (mirror of
    ops.pallas_kernels.words_for)."""
    words = -(-v_pad // 32)
    rows = -(-words // 128)
    return ((rows + 7) // 8) * 8


def _word_align_group(ds_k: np.ndarray, ss_k: np.ndarray,
                      ev_k, sentinel_src: int):
    """Pad each destination word's edge run to a multiple of 32 slots.

    Word results then end at cell-aligned (31 mod 32) positions, so the
    pull consumer extracts them with one strided slice + a dense sorted
    sample instead of a sparse edge-scale gather. Pad slots carry the
    word's own (maximal) dst — the segmented scan keys stay sorted — and
    an out-of-range source, so both the bitmask kernel (hit=0) and the
    value kernel (identity) ignore them.
    """
    c = ds_k.shape[0]
    if c == 0:
        return ds_k.astype(np.int64), ss_k, ev_k
    wid = ds_k >> 5
    uw, first_idx, wcounts = np.unique(wid, return_index=True,
                                       return_counts=True)
    padded_counts = ((wcounts + 31) // 32) * 32
    offs = np.zeros(len(uw) + 1, np.int64)
    np.cumsum(padded_counts, out=offs[1:])
    word_rank = np.repeat(np.arange(len(uw)), wcounts)
    pos = offs[word_rank] + (np.arange(c) - first_idx[word_rank])
    total = int(offs[-1])
    out_ds = np.repeat(uw * 32 + 31, padded_counts)
    out_ss = np.full(total, sentinel_src, np.int64)
    out_ds[pos] = ds_k
    out_ss[pos] = ss_k
    out_ev = None
    if ev_k is not None:
        out_ev = np.zeros(total, np.float32)
        out_ev[pos] = ev_k
    return out_ds, out_ss, out_ev


def _cell_transpose(bsrc: np.ndarray, bdst: np.ndarray) -> dict:
    """(slot-ordered) -> cell-transposed layout for the cells pull kernel:
    within each 4096-slot window, slot s of cell c moves to row s, lane c.
    Cell indices are unchanged (cell = slot // 32)."""
    seg_s = bsrc.reshape(-1, 128, 32)
    seg_d = bdst.reshape(-1, 128, 32)
    return dict(
        bcsc_csrc=jnp.asarray(
            np.ascontiguousarray(seg_s.transpose(0, 2, 1)).reshape(-1)),
        bcsc_cdst=jnp.asarray(
            np.ascontiguousarray(seg_d.transpose(0, 2, 1)).reshape(-1)),
        bcsc_cellword=jnp.asarray(
            (seg_d[:, :, 0] >> 5).astype(np.int32).reshape(-1)),
    )


def build_blocked_csc(g: CsrGraph, v_pad: int, block_rows: int,
                      with_vertex_samples: bool = False, K: int = 16):
    """Blocked-CSC edge layout for the pull kernel (square case:
    source and destination spaces are both ``v_pad``)."""
    return build_blocked_rect(
        g.edge_sources().astype(np.int64), g.col_indices.astype(np.int64),
        None if g.edge_values is None else
        g.edge_values.astype(np.float32),
        v_pad, v_pad, block_rows,
        with_vertex_samples=with_vertex_samples, K=K)


def build_blocked_rect(src: np.ndarray, dst: np.ndarray,
                       ev: Optional[np.ndarray], src_pad: int,
                       dst_pad: int, block_rows: int,
                       with_vertex_samples: bool = False, K: int = 16):
    """Blocked edge layout for the pull kernels, rectangular form.

    Edges grouped by SOURCE block (K groups over ``src_pad`` table ids —
    the gathered side), sorted by (dst, src) per group, word-aligned
    (every destination word's run padded to 32-slot cells), padded per
    group to a block multiple. Emits the static per-(group, word) result
    positions: the inclusive segmented-OR value at the last slot of word
    w in group k IS the packed reach word, and word-last slots sit at
    cell boundaries by construction.

    The rectangular form (``src_pad != dst_pad``) serves the multi-chip
    shards: each shard reduces into its LOCAL ``dst_pad = S`` vertices
    while gathering from a global or ghost-compact source table space.

    ``K`` balances the kernel's two costs: in-VMEM gather rounds per block
    scale as 1/K (smaller table slice), result sampling scales as K·V.
    Measured optimum on rmat n20 is K=32 (value pass 188 -> 132 ms).
    """
    R_base = _bitmask_rows(src_pad)
    rpg = max(-(-R_base // K), 8)
    rpg = ((rpg + 7) // 8) * 8
    R = rpg * K          # effective (padded) table rows; extra rows zero
    v_per_group = rpg * 128 * 32
    nwords = _bitmask_rows(dst_pad) * LANE
    block_edges = block_rows * 128
    # Out-of-range source: every kernel's table-row loop misses it, for
    # any group — pad slots contribute hit=0 / the reduce identity.
    SENT = R * 128 * 32

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if ev is not None:
        ev = np.asarray(ev, np.float32)
    # Pull kernel reads frontier[src] for in-edges of dst: group by the
    # SOURCE block, sort by (dst, src) within groups.
    group = np.minimum(src // v_per_group, K - 1)
    order = np.lexsort((src, dst, group))
    gs, ss, ds = group[order], src[order], dst[order]
    ev = ev[order] if ev is not None else None

    counts = np.bincount(gs, minlength=K)
    reads = np.zeros(K + 1, np.int64)
    np.cumsum(counts, out=reads[1:])
    aligned = [_word_align_group(ds[reads[k]:reads[k + 1]],
                                 ss[reads[k]:reads[k + 1]],
                                 None if ev is None else
                                 ev[reads[k]:reads[k + 1]], SENT)
               for k in range(K)]
    acounts = np.array([a[0].shape[0] for a in aligned], np.int64)
    padded = -(-np.maximum(acounts, 1) // block_edges) * block_edges
    total = int(padded.sum())
    starts = np.zeros(K + 1, np.int64)
    np.cumsum(padded, out=starts[1:])

    bsrc = np.empty(total, np.int32)
    bdst = np.empty(total, np.int32)
    sample_pos = np.zeros((K, nwords), np.int32)
    sample_valid = np.zeros((K, nwords), bool)
    bval = None
    vs = None
    if ev is not None:
        bval = np.zeros(total, np.float32)
    if with_vertex_samples:
        vpos = np.zeros((K, dst_pad), np.int32)
        vvalid = np.zeros((K, dst_pad), bool)
    pad_wid = nwords - 1
    for k in range(K):
        ds_k, ss_k, ev_k = aligned[k]
        c = int(acounts[k])
        lo = int(starts[k])
        bsrc[lo:lo + c] = ss_k
        bdst[lo:lo + c] = ds_k
        bsrc[lo + c:starts[k + 1]] = SENT
        bdst[lo + c:starts[k + 1]] = pad_wid * 32 + 31
        if bval is not None:
            bval[lo:lo + c] = ev_k
        if c:
            wids = (ds_k >> 5).astype(np.int64)
            # last slot of each distinct word: cell-aligned (31 mod 32)
            last = np.nonzero(np.r_[wids[1:] != wids[:-1], True])[0]
            sample_pos[k, wids[last]] = (lo + last).astype(np.int32)
            sample_valid[k, wids[last]] = True
            if with_vertex_samples:
                vlast = np.nonzero(np.r_[ds_k[1:] != ds_k[:-1], True])[0]
                keep = ds_k[vlast] < dst_pad
                vpos[k, ds_k[vlast[keep]]] = (lo + vlast[keep]).astype(np.int32)
                vvalid[k, ds_k[vlast[keep]]] = True

    if with_vertex_samples:
        # Sorted fill for invalid entries: carry the previous valid
        # position forward so the flat position vector is nondecreasing.
        flatp = vpos.reshape(-1)
        flatv = vvalid.reshape(-1)
        idx = np.where(flatv, np.arange(flatp.size), 0)
        np.maximum.accumulate(idx, out=idx)
        vs = (flatp[idx].astype(np.int32), flatv)

    num_blocks = total // block_edges
    group_of_block = np.repeat(np.arange(K, dtype=np.int32),
                               (padded // block_edges).astype(np.int64))
    assert group_of_block.shape[0] == num_blocks
    # Monotone word-CELL vector: word-last slots are cell-aligned
    # (31 mod 32), so the consumer samples the (E'/32,) cell-last array
    # densely; invalid slots carry the previous valid cell forward so
    # sample_sorted's DMA windows advance monotonically.
    wflat = sample_pos.reshape(-1)
    widx = np.where(sample_valid.reshape(-1), np.arange(wflat.size), 0)
    np.maximum.accumulate(widx, out=widx)
    wcell_pos = (wflat[widx] >> 5).astype(np.int32)
    out = dict(
        bcsc_src=jnp.asarray(bsrc),
        bcsc_dst=jnp.asarray(bdst),
        bcsc_group_of_block=jnp.asarray(group_of_block),
        bcsc_sample_pos=jnp.asarray(sample_pos),
        bcsc_sample_valid=jnp.asarray(sample_valid),
        bcsc_wcell_pos=jnp.asarray(wcell_pos),
        # Cell-transposed copies (see DeviceGraph): windows never straddle
        # groups (block_edges is a multiple of 4096).
        **(_cell_transpose(bsrc, bdst) if block_rows >= 32 else {}),
        bcsc_groups=K,
        bcsc_rows_per_group=rpg,
        bcsc_block_rows=block_rows,
    )
    if bval is not None:
        out["bcsc_val"] = jnp.asarray(bval)
    if vs is not None:
        out["bcsc_vsample_pos"] = jnp.asarray(vs[0])
        out["bcsc_vsample_valid"] = jnp.asarray(vs[1])
    return out


def to_device(
    g: CsrGraph,
    *,
    with_csc: bool = False,
    with_edge_values: bool = False,
    with_edge_src: bool = False,
    with_blocked_csc: bool = False,
    with_blocked_values: bool = False,
    blocked_block_rows: Optional[int] = None,
    blocked_groups: int = 32,
    blocked_cache: Optional[str] = None,
    sizet64: Optional[bool] = None,
) -> DeviceGraph:
    """Upload a host CSR to the device with tile-aligned padding.

    Equivalent role to ``GraphSlice::Init`` H2D copies
    (``problem_base.cuh:192-310``).

    ``sizet64``: hold edge offsets as int64 (the reference's
    ``--64bit-SizeT``, ``util/test_utils.h``); auto-enabled past 2^31-2
    edges. Offset arithmetic in the XLA operators follows the dtype;
    the blocked pallas layouts stay int32 and are refused beyond int32
    range.
    """
    # 8192 = the Pallas samplers' DMA chunk (ops.pallas_kernels._CHUNK_ROWS
    # * 128): padding vertex/edge arrays to chunk multiples lets
    # sample_sorted consume them without a per-call copy-pad. Small
    # graphs stay lane-padded (the samplers' internal copy-pad is free
    # there, and CPU interpret-mode tests scale with v_pad).
    def _pad(sz: int) -> int:
        return round_up(max(sz, 1), 8192 if sz >= 8192 else LANE)

    v_pad = _pad(g.num_nodes)
    e_pad = _pad(g.num_edges)
    if sizet64 is None:
        sizet64 = e_pad >= 2**31 - 2
    if sizet64 and (with_blocked_csc or with_blocked_values):
        raise ValueError("blocked pallas layouts require 32-bit SizeT "
                         "(graphs beyond 2^31 edges: shard first)")
    if sizet64 and not jax.config.jax_enable_x64:
        raise ValueError("sizet64 needs JAX x64 mode: set JAX_ENABLE_X64=1 "
                         "or jax.config.update('jax_enable_x64', True)")
    off_t = np.int64 if sizet64 else np.int32

    row = _pad_offsets(g.row_offsets, v_pad, g.num_edges, off_t)
    col = _pad_edges(g.col_indices.astype(np.int32), e_pad, 0)

    ev = None
    if with_edge_values:
        vals = g.edge_values
        if vals is None:
            vals = np.ones(g.num_edges, dtype=np.float32)
        ev = jnp.asarray(_pad_edges(vals.astype(np.float32), e_pad, 0.0))

    edge_src = None
    if with_edge_src:
        edge_src = jnp.asarray(_edge_seg_ids(g.row_offsets, g.num_nodes, e_pad, v_pad))

    csc_off = csc_idx = csc_ev = csc_dst = None
    if with_csc:
        t = g.csc()
        csc_off = jnp.asarray(_pad_offsets(t.row_offsets, v_pad,
                                           t.num_edges, off_t))
        csc_idx = jnp.asarray(_pad_edges(t.col_indices.astype(np.int32), e_pad, 0))
        if with_edge_values:
            tv = t.edge_values
            if tv is None:
                tv = np.ones(t.num_edges, dtype=np.float32)
            csc_ev = jnp.asarray(_pad_edges(tv.astype(np.float32), e_pad, 0.0))
        csc_dst = jnp.asarray(_edge_seg_ids(t.row_offsets, t.num_nodes, e_pad, v_pad))

    # Pull-v2 value layout (graph/pull2.py): preferred whenever the
    # VMEM accumulator fits (rows_v <= 16384 = v_pad 2M); the round-4
    # sampled layout stays as the big-V / rect fallback.
    pull2_ok = (with_blocked_values and not sizet64
                and 32 <= v_pad // LANE <= 16384
                and v_pad % 1024 == 0
                and os.environ.get("GUNROCK_PULL2", "1") != "0")

    blocked = {}
    if with_blocked_csc or (with_blocked_values and not pull2_ok):
        # 1024-row blocks ≈ 131K edges/grid-step: grid-step overhead
        # (~6µs each) would otherwise dominate the bitmask pull kernel
        # (rows_per_group is small, so per-block compute is light).
        br = blocked_block_rows or (1024 if e_pad >= (1 << 22) else 8)
        need_vsamples = with_blocked_values and not pull2_ok
        built = None
        if blocked_cache and os.path.exists(blocked_cache):
            # The blocked layout is expensive to build (host lexsort over
            # all edges) — reload it from the .npz cache when present.
            with np.load(blocked_cache) as z:
                # v_pad is part of the layout contract (group bounds,
                # sample positions): a cache written under a different
                # padding rule must be rebuilt, not reused.
                if (int(z["block_rows"]) == br
                        and int(z["groups"]) == blocked_groups
                        and "v_pad" in z.files
                        and int(z["v_pad"]) == v_pad
                        and ("bcsc_cellword" in z.files or br < 32)
                        and bool(z["has_vsamples"]) >= need_vsamples):
                    built = {k: jnp.asarray(z[k]) for k in z.files
                             if k.startswith("bcsc_")}
                    built["bcsc_groups"] = int(z["groups"])
                    built["bcsc_rows_per_group"] = int(z["rows_per_group"])
                    built["bcsc_block_rows"] = int(z["block_rows"])
        if built is None:
            built = build_blocked_csc(
                g, v_pad, br, with_vertex_samples=need_vsamples,
                K=blocked_groups)
            if built is not None and blocked_cache:
                arrs = {k: np.asarray(v) for k, v in built.items()
                        if k.startswith("bcsc_") and v is not None}
                arrs["groups"] = np.int64(built["bcsc_groups"])
                arrs["rows_per_group"] = np.int64(
                    built["bcsc_rows_per_group"])
                arrs["block_rows"] = np.int64(built["bcsc_block_rows"])
                arrs["has_vsamples"] = np.bool_(
                    "bcsc_vsample_pos" in built)
                arrs["v_pad"] = np.int64(v_pad)
                try:
                    tmp = blocked_cache + ".tmp"
                    with open(tmp, "wb") as f:
                        np.savez(f, **arrs)
                    os.replace(tmp, blocked_cache)
                except OSError:
                    pass
        if built is not None:
            blocked = built

    if pull2_ok:
        from .pull2 import PULL2_VERSION, build_pull2
        k2 = int(os.environ.get("GUNROCK_PULL2_K", "64"))
        br2 = int(os.environ.get("GUNROCK_PULL2_BR", "512"))
        sp2 = int(os.environ.get("GUNROCK_PULL2_SPAN", "1024"))
        cache2 = (blocked_cache + f".pv2.npz") if blocked_cache else None
        p2 = None
        if cache2 and os.path.exists(cache2):
            with np.load(cache2) as z:
                if (int(z["version"]) == PULL2_VERSION
                        and int(z["k"]) == k2 and int(z["br"]) == br2
                        and int(z["sp"]) == sp2
                        and int(z["v_pad"]) == v_pad
                        and bool(z["has_val"]) >= with_edge_values):
                    p2 = {f: z[f] for f in z.files if f.startswith("pv2_")}
                    p2["pv2_groups"] = int(z["groups"])
                    p2["pv2_block_rows"] = int(z["block_rows"])
                    p2["pv2_span_rows"] = int(z["span_rows"])
        if p2 is None:
            vals = None
            if with_edge_values:
                vals = g.edge_values
                if vals is None:
                    vals = np.ones(g.num_edges, dtype=np.float32)
            p2 = build_pull2(g.edge_sources(), g.col_indices, vals, v_pad,
                             groups=k2, block_rows=br2, span_rows=sp2,
                             with_invdeg=True)
            if cache2:
                arrs = {f: np.asarray(v) for f, v in p2.items()
                        if f.startswith("pv2_") and not isinstance(v, int)}
                arrs.update(version=np.int64(PULL2_VERSION),
                            k=np.int64(k2), br=np.int64(br2),
                            sp=np.int64(sp2), v_pad=np.int64(v_pad),
                            has_val=np.bool_(with_edge_values),
                            groups=np.int64(p2["pv2_groups"]),
                            block_rows=np.int64(p2["pv2_block_rows"]),
                            span_rows=np.int64(p2["pv2_span_rows"]))
                try:
                    tmp = cache2 + ".tmp"
                    with open(tmp, "wb") as f:
                        np.savez(f, **arrs)
                    os.replace(tmp, cache2)
                except OSError:
                    pass
        for f, v in p2.items():
            blocked[f] = v if isinstance(v, int) else jnp.asarray(v)

    return DeviceGraph(
        num_nodes=g.num_nodes,
        num_edges=g.num_edges,
        v_pad=v_pad,
        e_pad=e_pad,
        row_offsets=jnp.asarray(row),
        col_indices=jnp.asarray(col),
        edge_values=ev,
        edge_src=edge_src,
        csc_offsets=csc_off,
        csc_indices=csc_idx,
        csc_edge_values=csc_ev,
        csc_edge_dst=csc_dst,
        undirected=bool(getattr(g, "undirected", False)),
        **blocked,
    )
