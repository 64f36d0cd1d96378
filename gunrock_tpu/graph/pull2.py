"""Pull-v2 edge layout: the write-minimal blocked CSC for TPU.

Round-5 probes established the tunnel's cost law: HBM reads run at
~40-70 GB/s but WRITES at ~0.5-3.3 GB/s, and any mutation of a V-scale
XLA buffer costs ~9 ms (full rewrite). The round-4 value-pull pipeline
(`ops/pallas_kernels.pull_vertex_reduce`) writes its E-scale segmented
scan (~314 MB) plus K*V sampled partials (~134 MB) to HBM every pass —
~135 of its 145 ms/pass is write traffic. The v2 design writes ONLY the
final (v_pad,) result: the per-block segmented scan stays in VMEM, the
per-(group, dst) partial extraction happens in-kernel against static
positions, and a VMEM-resident accumulator combines groups across the
sequential TPU grid.

Layout (vs the round-4 layout in ``device.build_blocked_rect``):

* Grouping decoupled from the bitmask-row unit: group granularity is
  1024 vertices (8 f32 table rows), not 32768, so K can grow until the
  in-kernel gather scan (3 VPU ops x ``rpg_v`` rows per block) stops
  dominating. The round-4 layout flooring at rpg_v=256 is why K=32 was
  its optimum.
* Blocks additionally split when their destination span exceeds the
  kernel's dense window (``span_rows`` rows), so every block's results
  land in one dynamic slice of the VMEM accumulator.
* Per-(group, vertex) result positions are sign-encoded int32
  (``enc = lastpos`` with the sign bit set on invalid slots,
  carry-filled so the masked value is nondecreasing): the kernel walks
  its in-VMEM scan with monotone 8-row slabs and selects the identity
  wherever the sign bit is set or the position falls outside the block.

Replaces the role of the reference's per-vertex atomic accumulation in
pull/SpMV-style advance (``gunrock/oprtr/edge_map_backward/``,
``app/pr/pr_functor.cuh:60-75`` atomicAdd) with a deterministic
single-writer design.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["build_pull2", "PULL2_VERSION"]

LANE = 128
PULL2_VERSION = 6          # bump to invalidate .npz caches on layout change
INVALID = np.int32(-2**31)  # sign bit: position slot has no run tail


def _choose_groups(v_pad: int, k_req: int) -> int:
    """Largest power-of-two K <= k_req with rpg_v = v_pad/(128K) a
    multiple of 8 (the gather slab unit)."""
    rows_v = v_pad // LANE
    k = 1
    while (k * 2 <= k_req and rows_v % (k * 2) == 0
           and (rows_v // (k * 2)) % 8 == 0):
        k *= 2
    return k


def build_pull2(src: np.ndarray, dst: np.ndarray,
                ev: Optional[np.ndarray], v_pad: int, *,
                groups: int = 64, block_rows: int = 512,
                span_rows: int = 1024,
                with_invdeg: bool = False) -> dict:
    """Build the pull-v2 layout for in-edges (src -> dst reduce at dst).

    Returns the ``pv2_*`` field dict for DeviceGraph (numpy arrays; the
    caller uploads). ``ev`` are per-edge values in the same order as
    (src, dst). ``with_invdeg`` additionally emits a 1/out-degree[src]
    stream (``pv2_wpr``) for PageRank-family pulls, making the
    rank/out_degree contribution a static edge weight instead of a
    per-iteration V-scale op.
    """
    rows_v = v_pad // LANE
    K = _choose_groups(v_pad, groups)
    rpg_v = rows_v // K
    vpg = rpg_v * LANE
    assert rows_v >= 32, "pull2 needs v_pad >= 4096 (use the v1 layout)"
    assert rows_v % 8 == 0, \
        "pull2 needs v_pad % 1024 == 0 (8-row gather slabs must tile " \
        "the table; to_device gates on this)"
    span_rows = max(32, (min(span_rows, rows_v) // 32) * 32)
    span_cap = (span_rows - 1) * LANE      # max dst span per block
    BE = block_rows * LANE
    SENT_SRC = v_pad                        # misses every group's slabs

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    m = src.shape[0]
    if ev is not None:
        ev = np.asarray(ev, np.float32)
    invdeg = None
    if with_invdeg:
        deg = np.bincount(src, minlength=v_pad).astype(np.float64)
        inv = np.zeros(v_pad, np.float32)
        nz = deg > 0
        inv[nz] = (1.0 / deg[nz]).astype(np.float32)
        invdeg = inv

    group = np.minimum(src // vpg, K - 1)
    order = np.lexsort((src, dst, group))
    gs, ss, ds = group[order], src[order], dst[order]
    evs = ev[order] if ev is not None else None
    wprs = invdeg[ss] if invdeg is not None else None

    counts = np.bincount(gs, minlength=K)
    gstart = np.zeros(K + 1, np.int64)
    np.cumsum(counts, out=gstart[1:])

    # Greedy block cuts per group: <= BE edges AND dst span <= span_cap.
    # Python loop over BLOCKS (hundreds), numpy searchsorted per cut.
    cuts = []          # (group, lo, hi) half-open edge ranges
    for k in range(K):
        lo, hi = int(gstart[k]), int(gstart[k + 1])
        e = lo
        while e < hi:
            end = min(e + BE, hi)
            # span limit: first dst beyond ds[e] + span_cap
            lim = int(np.searchsorted(ds[e:hi], ds[e] + span_cap + 1,
                                      side="left")) + e
            end = min(end, max(lim, e + 1))
            cuts.append((k, e, end))
            e = end

    nblocks = max(len(cuts), 1)
    if not cuts:
        cuts = [(0, 0, 0)]
    total = nblocks * BE
    bsrc = np.full(total, SENT_SRC, np.int32)
    bdst = np.zeros(total, np.int32)
    bval = np.zeros(total, np.float32) if evs is not None else None
    bwpr = np.zeros(total, np.float32) if wprs is not None else None
    gob = np.zeros(nblocks, np.int32)
    d0row = np.zeros(nblocks, np.int32)
    ntile = np.zeros(nblocks, np.int32)   # live 32-row window tiles
    bgroup_slot = np.zeros(total, np.int32)     # group id per slot

    for b, (k, e, end) in enumerate(cuts):
        n = end - e
        o = b * BE
        gob[b] = k
        if n:
            bsrc[o:o + n] = ss[e:end]
            bdst[o:o + n] = ds[e:end]
            # pad extends the final run (identity values via SENT src)
            bdst[o + n:o + BE] = ds[end - 1]
            if bval is not None:
                bval[o:o + n] = evs[e:end]
            if bwpr is not None:
                bwpr[o:o + n] = wprs[e:end]
            first_row = int(ds[e]) >> 7
        else:
            first_row = 0
        d0row[b] = min(max(first_row, 0), rows_v - span_rows)
        if n:
            last_row = int(ds[end - 1]) >> 7
            ntile[b] = (last_row - int(d0row[b])) // 32 + 1
        bgroup_slot[o:o + BE] = k

    # Run tails on the padded stream: last slot of each (group, dst) run.
    nxt_d = np.empty(total, np.int32)
    nxt_d[:-1] = bdst[1:]
    nxt_d[-1] = -1
    nxt_g = np.empty(total, np.int32)
    nxt_g[:-1] = bgroup_slot[1:]
    nxt_g[-1] = -1
    is_tail = (bdst != nxt_d) | (bgroup_slot != nxt_g)
    # drop tails of pure-pad blocks (no real edges): their src is SENT
    # throughout and dst 0 — they would claim (g, 0)'s slot with an
    # identity value, which is harmless, but only when (g, 0) has no
    # real run; real runs always end at a later slot. Keep them.
    tails = np.nonzero(is_tail)[0]
    tail_key = bgroup_slot[tails].astype(np.int64) * v_pad + bdst[tails]

    pos = np.full(K * v_pad, 0, np.int32)
    valid = np.zeros(K * v_pad, bool)
    pos[tail_key] = tails.astype(np.int32)
    valid[tail_key] = True
    # carry-fill: masked positions nondecreasing for the kernel's walk
    idx = np.where(valid, np.arange(K * v_pad, dtype=np.int64), 0)
    np.maximum.accumulate(idx, out=idx)
    filled = pos[idx]
    enc = np.where(valid, filled, filled | INVALID).astype(np.int32)

    # Per-(block, window-tile) scan-slab ranges for the kernel's
    # extraction walk, precomputed so the kernel never extracts scalars
    # from vectors: for tile t of block b, the (32-row) scan slabs
    # holding its positions are [c0, c1]; packed c0 << 16 | c1.
    ntiles = span_rows // 32
    slab_rows = min(32, block_rows)
    # second dim padded to 128 lanes (DMA slice alignment on TPU)
    cb = np.zeros((nblocks, 128), np.int32)
    enc2 = enc.reshape(-1, LANE) if False else enc
    for b in range(nblocks):
        g0 = int(gob[b]) * v_pad + int(d0row[b]) * LANE
        w = enc[g0:g0 + span_rows * LANE]
        p = (w & 0x7FFFFFFF).astype(np.int64) - b * BE
        np.clip(p, 0, BE - 1, out=p)
        pt = p.reshape(ntiles, 32 * LANE)
        c0 = pt[:, 0] // (slab_rows * LANE)
        c1 = pt[:, -1] // (slab_rows * LANE)
        cb[b, :ntiles] = (c0.astype(np.int64) << 16 | c1).astype(np.int32)

    out = dict(
        pv2_src=bsrc,
        pv2_dst=bdst,
        pv2_gob=gob,
        pv2_d0row=d0row,
        pv2_nt=ntile,
        pv2_cb=cb.reshape(-1),
        pv2_pos=enc,
        pv2_groups=K,
        pv2_block_rows=block_rows,
        pv2_span_rows=span_rows,
    )
    if bval is not None:
        out["pv2_val"] = bval
    if bwpr is not None:
        out["pv2_wpr"] = bwpr
    return out
