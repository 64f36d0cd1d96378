"""Pull-v2 kernel vs numpy oracle (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import gunrock_tpu as gt
from gunrock_tpu.graph.pull2 import build_pull2
from gunrock_tpu.graph.device import DeviceGraph, round_up
from gunrock_tpu.ops.pull2 import pull_reduce2

import jax.numpy as jnp


def _oracle(src, dst, vals, w, v_pad, op, wmode):
    x = vals[src].astype(np.float64)
    if wmode == "add":
        x = x + w
    elif wmode == "mul":
        x = x * w
    elif wmode == "incr":
        x = x + 1.0
    out = np.full(v_pad, 0.0 if op == "sum" else np.inf)
    for d, v in zip(dst, x):
        out[d] = out[d] + v if op == "sum" else min(out[d], v)
    return out.astype(np.float32)


def _graph_device(src, dst, w, v_pad, groups, block_rows=32,
                  span_rows=32):
    p2 = build_pull2(src, dst, w, v_pad, groups=groups,
                     block_rows=block_rows, span_rows=span_rows,
                     with_invdeg=True)
    fields = {k: (v if isinstance(v, int) else jnp.asarray(v))
              for k, v in p2.items()}
    return DeviceGraph(
        num_nodes=v_pad, num_edges=len(src), v_pad=v_pad,
        e_pad=round_up(max(len(src), 1)),
        row_offsets=jnp.zeros(v_pad + 1, jnp.int32),
        col_indices=jnp.zeros(1, jnp.int32), edge_values=None,
        edge_src=None, csc_offsets=None, csc_indices=None,
        csc_edge_values=None, csc_edge_dst=None, **fields)


@pytest.mark.parametrize("op,wmode", [("sum", "none"), ("min", "add"),
                                      ("sum", "mul"), ("min", "incr")])
@pytest.mark.parametrize("groups", [1, 4])
def test_pull2_random(op, wmode, groups):
    rng = np.random.default_rng(hash((op, wmode, groups)) % 2**31)
    v_pad = 4096
    m = 20000
    src = rng.integers(0, v_pad, m)
    dst = rng.integers(0, v_pad, m)
    w = rng.random(m).astype(np.float32)
    vals = rng.random(v_pad).astype(np.float32)
    dg = _graph_device(src, dst, w, v_pad, groups)
    out = np.asarray(pull_reduce2(jnp.asarray(vals), dg, op=op,
                                  wmode=wmode, interpret=True))
    ref = _oracle(src, dst, vals, w, v_pad, op, wmode)
    if op == "min":
        np.testing.assert_allclose(out, ref, rtol=1e-6)
    else:
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


def test_pull2_span_splits_and_straddles():
    """Sparse far-apart dsts force span splits; a giant run straddles
    blocks; a run crosses a group boundary with the SAME dst id."""
    rng = np.random.default_rng(0)
    v_pad = 4096
    src = []
    dst = []
    # giant run: dst 7 with 3000 in-edges (straddles 32-row blocks)
    src += list(rng.integers(0, v_pad, 3000))
    dst += [7] * 3000
    # sparse tail: single edges to far-apart dsts
    for d in range(0, v_pad, 97):
        src.append(int(rng.integers(0, v_pad)))
        dst.append(d)
    # same dst from the last vertex of group 0 and first of group 1
    src += [1023, 1024, 2047, 2048]
    dst += [4095, 4095, 0, 0]
    src = np.array(src)
    dst = np.array(dst)
    w = rng.random(len(src)).astype(np.float32)
    vals = rng.random(v_pad).astype(np.float32)
    dg = _graph_device(src, dst, w, v_pad, groups=4, block_rows=8,
                       span_rows=32)
    for op, wmode in (("sum", "none"), ("min", "add")):
        out = np.asarray(pull_reduce2(jnp.asarray(vals), dg, op=op,
                                      wmode=wmode, interpret=True))
        ref = _oracle(src, dst, vals, w, v_pad, op, wmode)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


def test_pull2_init_and_wpr():
    rng = np.random.default_rng(3)
    v_pad = 4096
    m = 8000
    src = rng.integers(0, v_pad, m)
    dst = rng.integers(0, v_pad, m)
    vals = rng.random(v_pad).astype(np.float32)
    init = rng.random(v_pad).astype(np.float32)
    dg = _graph_device(src, dst, np.ones(m, np.float32), v_pad, 4)
    out = np.asarray(pull_reduce2(
        jnp.asarray(vals), dg, op="min", wmode="none",
        init=jnp.asarray(init), interpret=True))
    ref = np.minimum(_oracle(src, dst, vals, np.ones(m), v_pad, "min",
                             "none"), init)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    # wpr stream: contribution vals[u]/outdeg[u]
    out = np.asarray(pull_reduce2(jnp.asarray(vals), dg, op="sum",
                                  wmode="mul", weights="wpr",
                                  interpret=True))
    deg = np.bincount(src, minlength=v_pad).astype(np.float64)
    contrib = vals / np.maximum(deg, 1)
    ref = _oracle(src, dst, contrib.astype(np.float32),
                  np.ones(m), v_pad, "sum", "none")
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5)


def test_pull2_through_to_device():
    """to_device builds pv2 and pull_vertex_reduce dispatches to it."""
    rng = np.random.default_rng(5)
    n = 5000
    m = 30000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = gt.from_coo(n, src, dst, undirected=False)
    g.random_edge_values(seed=2)
    dg = gt.to_device(g, with_edge_values=True, with_blocked_values=True)
    assert dg.has_pull2
    from gunrock_tpu.ops.pallas_kernels import pull_vertex_reduce
    vals = rng.random(dg.v_pad).astype(np.float32)
    out = np.asarray(pull_vertex_reduce(jnp.asarray(vals), dg, op="min",
                                        wmode="add", interpret=True))
    es, ed = g.edge_sources(), g.col_indices
    ref = _oracle(es, ed, vals, g.edge_values, dg.v_pad, "min", "add")
    np.testing.assert_allclose(out[:n], ref[:n], rtol=1e-6)


def test_pull_min_sweeps_sssp():
    """Gauss-Seidel min-pull sweeps converge to single-source shortest
    paths (vs scipy dijkstra)."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import dijkstra
    from gunrock_tpu.ops.pull2 import pull_min_sweeps

    rng = np.random.default_rng(11)
    n = 4500
    m = 40000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = (rng.random(m) + 0.05).astype(np.float32)
    # undirected: both directions in the pull layout
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w])
    v_pad = 5120
    dg = _graph_device(s2, d2, w2, v_pad, groups=4, block_rows=32,
                      span_rows=32)
    init = np.full(v_pad, np.inf, np.float32)
    init[0] = 0.0
    dist, chg = pull_min_sweeps(dg, jnp.asarray(init), sweeps=24,
                                wmode="add", interpret=True)
    dist = np.asarray(dist)[:n]
    chg = np.asarray(chg)
    # converged: some even sweep reports zero changes
    assert any(chg[r] == 0 for r in range(0, 24, 2))
    # scipy csr_matrix SUMS duplicate entries; the kernel treats them as
    # parallel edges (min) — dedupe keeping the lightest for the oracle
    order = np.lexsort((w2, d2, s2))
    su, du, wu = s2[order], d2[order], w2[order]
    keep = np.r_[True, (su[1:] != su[:-1]) | (du[1:] != du[:-1])]
    g = csr_matrix((wu[keep], (su[keep], du[keep])), shape=(n, n))
    ref = dijkstra(g, indices=0)
    mask = np.isfinite(ref)
    np.testing.assert_allclose(dist[mask], ref[mask], rtol=1e-5)
    assert np.all(np.isinf(dist[~mask]))


def test_pull_min_sweeps_bfs_and_cc():
    from gunrock_tpu.ops.pull2 import pull_min_sweeps
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import breadth_first_order, connected_components

    rng = np.random.default_rng(12)
    n = 4200
    m = 9000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    v_pad = 5120
    dg = _graph_device(s2, d2, None, v_pad, groups=4, block_rows=32,
                      span_rows=32)
    # BFS depths: unit weights without a stream (wmode="incr")
    init = np.full(v_pad, np.inf, np.float32)
    init[0] = 0.0
    dist, chg = pull_min_sweeps(dg, jnp.asarray(init), sweeps=40,
                                wmode="incr", interpret=True)
    dist = np.asarray(dist)[:n]
    g = csr_matrix((np.ones(2 * m), (s2, d2)), shape=(n, n))
    from scipy.sparse.csgraph import dijkstra
    ref = dijkstra(g, indices=0, unweighted=True)
    mask = np.isfinite(ref)
    np.testing.assert_allclose(dist[mask], ref[mask])
    # CC min-label propagation (wmode="none", init = vertex ids)
    init = np.full(v_pad, np.inf, np.float32)
    init[:n] = np.arange(n, dtype=np.float32)
    comp, chg = pull_min_sweeps(dg, jnp.asarray(init), sweeps=40,
                                wmode="none", interpret=True)
    comp = np.asarray(comp)[:n].astype(np.int64)
    ncc, labels = connected_components(g, directed=False)
    # same partition: min vertex id per scipy component
    import collections
    mins = collections.defaultdict(lambda: 1 << 60)
    for v, l in enumerate(labels):
        mins[l] = min(mins[l], v)
    expect = np.array([mins[l] for l in labels])
    np.testing.assert_array_equal(comp, expect)


def test_pull_power_iters_pagerank():
    """In-kernel power iterations match the XLA PageRank recurrence."""
    from gunrock_tpu.ops.pull2 import pull_power_iters

    rng = np.random.default_rng(44)
    n = 4000
    v_pad = 4096
    m = 30000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    dg = _graph_device(src, dst, None, v_pad, groups=4)
    dg = __import__("dataclasses").replace(dg, num_nodes=n)
    d = 0.85
    reset = (1.0 - d) / n
    init = np.where(np.arange(v_pad) < n, 1.0 / n, 0.0).astype(np.float32)
    rank, chg = pull_power_iters(dg, jnp.asarray(init), iters=7,
                                 damping=d, reset=reset, interpret=True)
    rank = np.asarray(rank)
    # float64 oracle
    deg = np.bincount(src, minlength=v_pad).astype(np.float64)
    invd = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    r = init.astype(np.float64).copy()
    for _ in range(7):
        inc = np.bincount(dst, weights=r[src] * invd[src],
                          minlength=v_pad)
        r = np.where(np.arange(v_pad) < n, reset + d * inc, 0.0)
    np.testing.assert_allclose(rank[:n], r[:n], rtol=3e-4, atol=1e-9)
    # odd iteration count exercises the final buf->o_ref copy
    rank5, _ = pull_power_iters(dg, jnp.asarray(init), iters=5,
                                damping=d, reset=reset, interpret=True)
    r5 = init.astype(np.float64).copy()
    for _ in range(5):
        inc = np.bincount(dst, weights=r5[src] * invd[src],
                          minlength=v_pad)
        r5 = np.where(np.arange(v_pad) < n, reset + d * inc, 0.0)
    np.testing.assert_allclose(np.asarray(rank5)[:n], r5[:n], rtol=3e-4,
                               atol=1e-9)
