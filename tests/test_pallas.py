"""Pallas kernel correctness (interpret mode on the CPU test platform)."""

import numpy as np
import pytest

import conftest  # noqa: F401
import jax.numpy as jnp

from gunrock_tpu.ops.pallas_kernels import (bitmask_gather,
                                            bitmask_gather_reference,
                                            pack_bitmask, words_for)


def test_pack_bitmask_roundtrip():
    rng = np.random.default_rng(0)
    v = 1000
    mask = rng.integers(0, 2, v).astype(bool)
    words = np.asarray(pack_bitmask(jnp.asarray(mask)))
    assert words.shape == (words_for(v) // 128, 128)
    idx = np.arange(v, dtype=np.int32)
    bits = bitmask_gather_reference(words, idx)
    np.testing.assert_array_equal(bits, mask.astype(np.int32))


@pytest.mark.parametrize("v,n", [(4096, 512), (1 << 15, 1 << 12)])
def test_bitmask_gather_interpret(v, n):
    rng = np.random.default_rng(1)
    mask = rng.integers(0, 2, v).astype(bool)
    words = pack_bitmask(jnp.asarray(mask))
    idx = rng.integers(0, v, n).astype(np.int32)
    out = bitmask_gather(words, jnp.asarray(idx), block_rows=2,
                         interpret=True)
    ref = bitmask_gather_reference(np.asarray(words), idx)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_bfs_pallas_pull_matches_xla(rmat_small):
    """Full DO-BFS with the pallas pull path (interpret) == XLA path."""
    import gunrock_tpu as gt
    from gunrock_tpu.models.bfs import bfs_device
    import jax

    dg = gt.to_device(rmat_small, with_csc=True)
    src = rmat_small.largest_degree_vertex()
    # interpret-mode pallas inside the while_loop is too slow for CPU CI;
    # instead check one pull step directly.
    from gunrock_tpu.models.bfs import _pull_step, _State
    from gunrock_tpu.enactor import init_stats
    import jax.numpy as jnp

    labels = jnp.full((dg.v_pad,), -1, jnp.int32).at[src].set(0)
    st = _State(labels=labels, preds=jnp.zeros((1,), jnp.int32),
                frontier=jnp.zeros((dg.v_pad,), jnp.int32),
                n=jnp.int32(1), m_f=jnp.int32(0), fvalid=jnp.bool_(True),
                use_pull=jnp.bool_(False),
                unexplored=jnp.float32(dg.num_edges), stats=init_stats())

    ref = _pull_step(dg, dg.v_pad, False, st, use_pallas=False)

    import gunrock_tpu.ops.pallas_kernels as pk
    orig = pk.bitmask_gather_cumsum

    def interp_gather(words, idx, **kw):
        kw["interpret"] = True
        return orig(words, idx, **kw)

    pk.bitmask_gather_cumsum = interp_gather
    try:
        got = _pull_step(dg, dg.v_pad, False, st, use_pallas=True)
    finally:
        pk.bitmask_gather_cumsum = orig

    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    assert int(got[3]) == int(ref[3])      # n
    assert int(got[4]) == int(ref[4])      # m_f_next


@pytest.mark.parametrize("v,n", [(4096, 1024), (1 << 15, 1 << 13)])
def test_bitmask_gather_cumsum_interpret(v, n):
    from gunrock_tpu.ops.pallas_kernels import bitmask_gather_cumsum
    rng = np.random.default_rng(2)
    mask = rng.integers(0, 2, v).astype(bool)
    words = pack_bitmask(jnp.asarray(mask))
    idx = rng.integers(0, v, n).astype(np.int32)
    out = bitmask_gather_cumsum(words, jnp.asarray(idx), block_rows=2,
                                interpret=True)
    ref = np.cumsum(bitmask_gather_reference(np.asarray(words), idx))
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("seed", [5, 9])
def test_blocked_pull_or_interpret(seed):
    import gunrock_tpu as gt
    from gunrock_tpu.ops.pallas_kernels import (pack_bitmask,
                                                pull_reached_words,
                                                unpack_bitmask)
    rng = np.random.default_rng(seed)
    g = gt.io.rmat(scale=10, edge_factor=6, seed=seed, undirected=True)
    dg = gt.to_device(g, with_csc=True, with_blocked_csc=True,
                      blocked_block_rows=8)
    assert dg.has_blocked_csc
    rows = dg.bcsc_groups * dg.bcsc_rows_per_group
    mask = rng.integers(0, 2, dg.v_pad).astype(bool)
    words = pack_bitmask(jnp.asarray(mask), rows=rows)
    rw = pull_reached_words(words, dg, interpret=True)
    reached = np.asarray(unpack_bitmask(rw, dg.v_pad))
    ref = np.zeros(dg.v_pad, bool)
    src = g.edge_sources()
    hits = mask[src]
    np.logical_or.at(ref, g.col_indices[hits], True)
    np.testing.assert_array_equal(reached, ref)


@pytest.mark.parametrize("seed", [5, 9])
def test_pull_cells_kernel_interpret(seed):
    """The cell-transposed cells kernel path == the edge-level oracle
    (block_rows=32 builds the bcsc_c* arrays)."""
    import gunrock_tpu as gt
    from gunrock_tpu.ops.pallas_kernels import (pack_bitmask,
                                                pull_reached_words,
                                                unpack_bitmask)
    rng = np.random.default_rng(seed)
    g = gt.io.rmat(scale=10, edge_factor=6, seed=seed, undirected=True)
    dg = gt.to_device(g, with_csc=True, with_blocked_csc=True,
                      blocked_block_rows=32)
    assert dg.bcsc_cellword is not None
    rows = dg.bcsc_groups * dg.bcsc_rows_per_group
    mask = rng.integers(0, 2, dg.v_pad).astype(bool)
    words = pack_bitmask(jnp.asarray(mask), rows=rows)
    rw = pull_reached_words(words, dg, interpret=True)
    reached = np.asarray(unpack_bitmask(rw, dg.v_pad))
    ref = np.zeros(dg.v_pad, bool)
    src = g.edge_sources()
    hits = mask[src]
    np.logical_or.at(ref, g.col_indices[hits], True)
    np.testing.assert_array_equal(reached, ref)


def test_sssp_pull_relax_matches_push(rmat_small):
    """The blocked min/add pull relaxation == the push relaxation."""
    import gunrock_tpu as gt
    import gunrock_tpu.ops.pallas_kernels as pk
    from gunrock_tpu.models.sssp import _relax, _pull_relax, _State
    from gunrock_tpu.enactor import init_stats
    import jax.numpy as jnp

    rmat_small.random_edge_values(seed=4)
    dg = gt.to_device(rmat_small, with_edge_values=True,
                      with_blocked_values=True, blocked_block_rows=8)
    src = rmat_small.largest_degree_vertex()
    dist = jnp.full((dg.v_pad,), jnp.inf, jnp.float32).at[src].set(0.0)
    frontier = jnp.full((dg.v_pad,), dg.v_pad - 1,
                        jnp.int32).at[0].set(src)
    st = _State(dist=dist, frontier=frontier, n=jnp.int32(1),
                m_f=jnp.int32(0), active=jnp.zeros((dg.v_pad,), bool),
                level=jnp.float32(0.0), stats=init_stats())

    d_push = _relax(dg, st, dg.e_pad, dg.v_pad, False)[0]

    orig_vr = pk._blocked_value_2d
    orig_ss = pk._sample_sorted_2d

    def vr_i(*a, **kw):
        kw["interpret"] = True
        return orig_vr(*a, **kw)

    def ss_i(*a, **kw):
        kw["interpret"] = True
        return orig_ss(*a, **kw)

    pk._blocked_value_2d = vr_i
    pk._sample_sorted_2d = ss_i
    try:
        d_pull = _pull_relax(dg, st, dg.v_pad)[0]
    finally:
        pk._blocked_value_2d = orig_vr
        pk._sample_sorted_2d = orig_ss

    a = np.asarray(d_push)[: rmat_small.num_nodes]
    b = np.asarray(d_pull)[: rmat_small.num_nodes]
    fin = np.isfinite(a)
    np.testing.assert_array_equal(np.isfinite(b), fin)
    np.testing.assert_allclose(b[fin], a[fin], rtol=1e-6)


def test_cc_pallas_matches_xla(rmat_small):
    """Min-hooking via the blocked value kernel == the scatter path."""
    import gunrock_tpu as gt
    import gunrock_tpu.ops.pallas_kernels as pk
    from gunrock_tpu.models.cc import _cc_loop

    dg = gt.to_device(rmat_small, with_edge_src=True,
                      with_blocked_values=True, blocked_block_rows=8)
    ref_comp, ref_n, _ = _cc_loop(dg, pallas=False)

    orig_vr = pk._blocked_value_2d
    orig_ss = pk._sample_sorted_2d
    pk._blocked_value_2d = lambda *a, **kw: orig_vr(
        *a, **{**kw, "interpret": True})
    pk._sample_sorted_2d = lambda *a, **kw: orig_ss(
        *a, **{**kw, "interpret": True})
    try:
        comp, n, _ = _cc_loop(dg, pallas=True)
    finally:
        pk._blocked_value_2d = orig_vr
        pk._sample_sorted_2d = orig_ss
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(ref_comp))
    assert int(n) == int(ref_n)


def test_bc_pull_matches_push(chesapeake):
    """Pull-mode BC (value kernel) == the push frontier machinery."""
    import gunrock_tpu as gt
    import gunrock_tpu.ops.pallas_kernels as pk
    from gunrock_tpu.models.bc import _bc_pull, _bc_loop
    from gunrock_tpu.enactor import capacity_ladder

    dg = gt.to_device(chesapeake, with_blocked_values=True,
                      blocked_block_rows=8)
    src = chesapeake.largest_degree_vertex()
    caps = tuple(capacity_ladder(dg.e_pad))
    ref_bc, ref_sig, ref_lab, _ = _bc_loop(dg, jnp.int32(src),
                                           fcap=dg.v_pad, caps=caps)

    orig_vr = pk._blocked_value_2d
    orig_ss = pk._sample_sorted_2d
    pk._blocked_value_2d = lambda *a, **kw: orig_vr(
        *a, **{**kw, "interpret": True})
    pk._sample_sorted_2d = lambda *a, **kw: orig_ss(
        *a, **{**kw, "interpret": True})
    try:
        bc_v, sig, lab, _ = _bc_pull(dg, src, chunk=4)
    finally:
        pk._blocked_value_2d = orig_vr
        pk._sample_sorted_2d = orig_ss

    np.testing.assert_array_equal(np.asarray(lab), np.asarray(ref_lab))
    np.testing.assert_allclose(np.asarray(sig), np.asarray(ref_sig),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bc_v), np.asarray(ref_bc),
                               rtol=1e-4, atol=1e-4)


def test_sample_sorted_expand_tail_contract(rmat_small):
    """End-to-end: the eid stream expand() hands to the sorted samplers
    keeps its tail pinned to the last edge, and sample_sorted returns
    correct values for the valid prefix (a zeroed tail made every valid
    lane in the boundary tile read garbage — round-3 review finding)."""
    import jax.numpy as jnp
    import gunrock_tpu as gt
    from gunrock_tpu.ops import pallas_kernels as pk
    from gunrock_tpu.ops.advance import expand

    dg = gt.to_device(rmat_small)
    fr = jnp.sort(jnp.array([1, 5, 9, 100] + [dg.v_pad - 1] * 28,
                            jnp.int32))
    ex = expand(dg, fr, jnp.int32(4), 8192, sorted_frontier=True,
                with_dst=False)
    got = pk.sample_sorted(dg.col_indices, ex.eid, interpret=True)
    want = np.asarray(dg.col_indices)[np.asarray(ex.eid)]
    m = np.asarray(ex.mask)
    np.testing.assert_array_equal(np.asarray(got)[m], want[m])


@pytest.mark.parametrize("m,nv,op", [(5000, 300, "min"), (9000, 2000, "sum"),
                                     (20000, 6000, "sum"),
                                     (12288, 12288, "min")])
def test_reduce_by_dst_sorted_interpret(m, nv, op):
    """Fused destination reduction == numpy group-by oracle (distinct-id
    compaction, cross-tile runs, exact min / float sum)."""
    from gunrock_tpu.ops.pallas_kernels import reduce_by_dst_sorted
    rng = np.random.default_rng(m + nv)
    sd = np.sort(rng.integers(0, nv, m).astype(np.int32))
    vals = rng.random(m).astype(np.float32) * 10
    ids_u = np.unique(sd)
    if op == "min":
        want = np.array([vals[sd == i].min() for i in ids_u])
    else:
        want = np.array([vals[sd == i].sum(dtype=np.float32)
                         for i in ids_u])
    ids, rv, cnt = reduce_by_dst_sorted(
        jnp.asarray(sd), jnp.asarray(vals), op=op,
        out_lanes=len(ids_u) + 200, interpret=True)
    assert int(cnt) == len(ids_u)
    np.testing.assert_array_equal(np.asarray(ids)[:len(ids_u)], ids_u)
    if op == "min":
        np.testing.assert_array_equal(np.asarray(rv)[:len(ids_u)], want)
    else:
        np.testing.assert_allclose(np.asarray(rv)[:len(ids_u)], want,
                                   rtol=1e-5)


def test_reduce_by_dst_sorted_filtered():
    """The improving-only filter (aux stream): emitted runs are exactly
    those whose full reduction is strictly below aux — SSSP's winner
    set / BC's newly-discovered set, compacted in-kernel."""
    from gunrock_tpu.ops.pallas_kernels import reduce_by_dst_sorted
    rng = np.random.default_rng(11)
    m, nv = 20000, 3000
    sd = np.sort(rng.integers(0, nv, m).astype(np.int32))
    vals = rng.random(m).astype(np.float32)
    dist = rng.random(nv).astype(np.float32)
    aux = dist[sd]
    ids, rv, cnt = reduce_by_dst_sorted(
        jnp.asarray(sd), jnp.asarray(vals), op="min", out_lanes=4096,
        aux=jnp.asarray(aux), interpret=True)
    ids_u = np.unique(sd)
    runmin = np.array([vals[sd == i].min() for i in ids_u])
    keep = runmin < dist[ids_u]
    cnt = int(cnt)
    assert cnt == int(keep.sum())
    np.testing.assert_array_equal(np.asarray(ids)[:cnt], ids_u[keep])
    np.testing.assert_array_equal(np.asarray(rv)[:cnt], runmin[keep])
    # -inf aux suppresses every run; +inf emits every run (even -inf
    # sums — the BC overflow guard relies on this).
    _, _, c0 = reduce_by_dst_sorted(
        jnp.asarray(sd), jnp.asarray(vals), op="min", out_lanes=4096,
        aux=jnp.full((m,), -np.inf, np.float32), interpret=True)
    assert int(c0) == 0
    _, _, c1 = reduce_by_dst_sorted(
        jnp.asarray(sd), jnp.full((m,), -np.inf, jnp.float32), op="sum",
        out_lanes=4096, aux=jnp.full((m,), np.inf, np.float32),
        interpret=True)
    assert int(c1) == len(ids_u)


def test_reduce_by_dst_sorted_overflow_and_giant_run():
    from gunrock_tpu.ops.pallas_kernels import reduce_by_dst_sorted
    rng = np.random.default_rng(7)
    # one run spanning many tiles
    vals = rng.random(40960).astype(np.float32)
    ids, rv, cnt = reduce_by_dst_sorted(
        jnp.zeros(40960, jnp.int32), jnp.asarray(vals), op="min",
        out_lanes=256, interpret=True)
    assert int(cnt) == 1 and float(rv[0]) == vals.min()
    # overflow: count signals it, appends clamp, no crash
    sd = np.sort(rng.integers(0, 30000, 65536).astype(np.int32))
    ids, rv, cnt = reduce_by_dst_sorted(
        jnp.asarray(sd), jnp.asarray(rng.random(65536).astype(np.float32)),
        op="min", out_lanes=1000, interpret=True)
    assert int(cnt) == len(np.unique(sd)) > 1000


def test_sssp_fused_relax_matches_xla(rmat_small):
    """The fused-kernel relax round (sort + Pallas destination reduction
    + vertex-scale finish) is bitwise-identical to the XLA winner path."""
    import gunrock_tpu as gt
    import gunrock_tpu.ops.pallas_kernels as pk
    from gunrock_tpu.models.sssp import _relax, _State
    from gunrock_tpu.enactor import init_stats

    rmat_small.random_edge_values(seed=4)
    dg = gt.to_device(rmat_small, with_edge_values=True)
    src = rmat_small.largest_degree_vertex()
    dist = jnp.full((dg.v_pad,), jnp.inf, jnp.float32).at[src].set(0.0)
    frontier = jnp.full((dg.v_pad,), dg.v_pad - 1,
                        jnp.int32).at[0].set(src)
    st = _State(dist=dist, frontier=frontier, n=jnp.int32(1),
                m_f=jnp.int32(0), active=jnp.zeros((dg.v_pad,), bool),
                level=jnp.float32(0.0), stats=init_stats())

    orig = pk._reduce_sorted_2d
    origs = pk._scatter_sorted_2d
    pk._reduce_sorted_2d = lambda *a, **kw: orig(
        *a, **{**kw, "interpret": True})
    pk._scatter_sorted_2d = lambda *a, **kw: origs(
        *a, **{**kw, "interpret": True})
    try:
        # two rounds: seed frontier, then the broad second frontier
        for _ in range(2):
            ref = _relax(dg, st, dg.e_pad, dg.v_pad, False, fused=False)
            got = _relax(dg, st, dg.e_pad, dg.v_pad, False, fused=True)
            np.testing.assert_array_equal(np.asarray(got[0]),
                                          np.asarray(ref[0]))  # dist
            np.testing.assert_array_equal(np.asarray(got[1]),
                                          np.asarray(ref[1]))  # queue
            assert int(got[2]) == int(ref[2])                  # n
            assert int(got[3]) == int(ref[3])                  # m_f
            import dataclasses as dc
            st = dc.replace(st, dist=ref[0], frontier=ref[1], n=ref[2],
                            m_f=ref[3])
    finally:
        pk._reduce_sorted_2d = orig
        pk._scatter_sorted_2d = origs


def test_bc_fused_matches_plain(chesapeake):
    """Fused BC (sorted-stream destination reduction in both phases) ==
    the plain push machinery (float sums reassociate => rtol)."""
    import gunrock_tpu as gt
    import gunrock_tpu.ops.pallas_kernels as pk
    from gunrock_tpu.models.bc import _bc_loop
    from gunrock_tpu.enactor import capacity_ladder

    dg = gt.to_device(chesapeake)
    src = chesapeake.largest_degree_vertex()
    caps = tuple(capacity_ladder(dg.e_pad))
    ref_bc, ref_sig, ref_lab, _ = _bc_loop(dg, jnp.int32(src),
                                           fcap=dg.v_pad, caps=caps)

    orig = pk._reduce_sorted_2d
    origs = pk._scatter_sorted_2d
    pk._reduce_sorted_2d = lambda *a, **kw: orig(
        *a, **{**kw, "interpret": True})
    pk._scatter_sorted_2d = lambda *a, **kw: origs(
        *a, **{**kw, "interpret": True})
    try:
        bc_v, sig, lab, _ = _bc_loop(dg, jnp.int32(src), fcap=dg.v_pad,
                                     caps=caps, fused=True)
    finally:
        pk._reduce_sorted_2d = orig
        pk._scatter_sorted_2d = origs

    np.testing.assert_array_equal(np.asarray(lab), np.asarray(ref_lab))
    np.testing.assert_allclose(np.asarray(sig), np.asarray(ref_sig),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bc_v), np.asarray(ref_bc),
                               rtol=1e-4, atol=1e-4)


def test_bc_fused_matches_plain_rmat(rmat_small):
    import gunrock_tpu as gt
    import gunrock_tpu.ops.pallas_kernels as pk
    from gunrock_tpu.models.bc import _bc_loop
    from gunrock_tpu.enactor import capacity_ladder

    dg = gt.to_device(rmat_small)
    src = rmat_small.largest_degree_vertex()
    caps = tuple(capacity_ladder(dg.e_pad))
    ref_bc, ref_sig, ref_lab, _ = _bc_loop(dg, jnp.int32(src),
                                           fcap=dg.v_pad, caps=caps)
    orig = pk._reduce_sorted_2d
    origs = pk._scatter_sorted_2d
    pk._reduce_sorted_2d = lambda *a, **kw: orig(
        *a, **{**kw, "interpret": True})
    pk._scatter_sorted_2d = lambda *a, **kw: origs(
        *a, **{**kw, "interpret": True})
    try:
        bc_v, sig, lab, _ = _bc_loop(dg, jnp.int32(src), fcap=dg.v_pad,
                                     caps=caps, fused=True)
    finally:
        pk._reduce_sorted_2d = orig
        pk._scatter_sorted_2d = origs
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(ref_lab))
    np.testing.assert_allclose(np.asarray(sig), np.asarray(ref_sig),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bc_v), np.asarray(ref_bc),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("op", ["min", "set", "add", "max"])
@pytest.mark.parametrize("n,m", [(4096, 128), (8192, 4096),
                                 (20000, 7000), (65536, 12000)])
def test_scatter_sorted_interpret(op, n, m):
    """scatter_sorted == XLA .at[] scatter for sorted-unique updates
    (dense sizes off the tile grid, counts straddling chunk boundaries,
    empty tiles, ids beyond dense range dropped)."""
    import gunrock_tpu.ops.pallas_kernels as pk
    rng = np.random.default_rng(hash((op, n, m)) % 2**31)
    ids = np.unique(rng.integers(0, n, m).astype(np.int32))
    cnt = len(ids)
    vals = rng.normal(size=cnt).astype(np.float32) * 10
    dense = rng.normal(size=n).astype(np.float32) * 10
    cap = -(-m // 4096) * 4096
    ids_p = np.full(cap, 0, np.int32)
    ids_p[:cnt] = ids
    ids_p[cnt:] = n - 1            # garbage beyond count: must be masked
    vals_p = np.zeros(cap, np.float32)
    vals_p[:cnt] = vals
    got = pk.scatter_sorted(jnp.asarray(dense), jnp.asarray(ids_p),
                            jnp.asarray(vals_p), count=cnt, op=op,
                            interpret=True)
    want = dense.copy()
    if op == "min":
        np.minimum.at(want, ids, vals)
    elif op == "max":
        np.maximum.at(want, ids, vals)
    elif op == "add":
        np.add.at(want, ids, vals)
    else:
        want[ids] = vals
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_scatter_sorted_dense_full_and_empty():
    """All 4096 slots of one tile updated (router saturation) and a
    zero-count call (no-op)."""
    import gunrock_tpu.ops.pallas_kernels as pk
    n = 8192
    ids = np.arange(4096, dtype=np.int32) + 2048   # straddles two tiles
    vals = np.arange(4096, dtype=np.float32)
    dense = np.full(n, 1e9, np.float32)
    got = pk.scatter_sorted(jnp.asarray(dense), jnp.asarray(ids),
                            jnp.asarray(vals), op="min", interpret=True)
    want = dense.copy()
    want[ids] = vals
    np.testing.assert_allclose(np.asarray(got), want)
    got0 = pk.scatter_sorted(jnp.asarray(dense), jnp.asarray(ids),
                             jnp.asarray(vals), count=0, op="min",
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got0), dense)


def test_scatter_sorted_int32_set():
    import gunrock_tpu.ops.pallas_kernels as pk
    rng = np.random.default_rng(7)
    n = 12000
    ids = np.unique(rng.integers(0, n, 3000).astype(np.int32))
    vals = rng.integers(0, 100, len(ids)).astype(np.int32)
    dense = np.full(n, -1, np.int32)
    got = pk.scatter_sorted(jnp.asarray(dense), jnp.asarray(ids),
                            jnp.asarray(vals), op="set", interpret=True)
    want = dense.copy()
    want[ids] = vals
    np.testing.assert_array_equal(np.asarray(got), want)
