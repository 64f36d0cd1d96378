"""PageRank + CC vs CPU oracles (reference tests/pr, tests/cc)."""

import numpy as np
import pytest

import gunrock_tpu as gt
from gunrock_tpu.models.cc import cc
from gunrock_tpu.models.pr import pagerank
from oracles import cpu_cc, cpu_pagerank


def test_pagerank_rmat(rmat_small):
    res = pagerank(rmat_small, max_iters=100, threshold=1e-9)
    expected = cpu_pagerank(rmat_small, max_iters=100, tol=1e-9)
    np.testing.assert_allclose(res.ranks, expected, rtol=1e-3)
    # mass matches the oracle (dangling vertices leak mass in both,
    # matching the reference's semantics)
    assert abs(res.ranks.sum() - expected.sum()) < 1e-3


def test_pagerank_compensated_mass(rmat_small):
    res = pagerank(rmat_small, compensate=True, max_iters=200,
                   threshold=1e-9)
    assert abs(res.ranks.sum() - 1.0) < 1e-3


def test_pagerank_sorted_output(rmat_small):
    res = pagerank(rmat_small)
    ranks_in_order = res.ranks[res.node_ids]
    assert (np.diff(ranks_in_order) <= 1e-12).all()


def test_pagerank_unnormalized(chesapeake):
    res = pagerank(chesapeake, normalized=False, max_iters=60,
                   threshold=1e-9)
    expected = cpu_pagerank(chesapeake, max_iters=60, tol=1e-12,
                            normalized=False)
    np.testing.assert_allclose(res.ranks, expected, rtol=1e-3)


def test_pagerank_convergence_early_stop(chesapeake):
    res = pagerank(chesapeake, threshold=1e-3, max_iters=1000)
    assert res.info["num_iterations"] < 1000


def test_cc_components(rmat_small):
    res = cc(rmat_small)
    expected = cpu_cc(rmat_small)
    np.testing.assert_array_equal(res.components, expected)
    assert res.num_components == len(np.unique(expected))


def test_cc_disconnected():
    # two triangles + isolated vertex
    src = np.array([0, 1, 2, 3, 4, 5])
    dst = np.array([1, 2, 0, 4, 5, 3])
    g = gt.from_coo(7, src, dst, undirected=True)
    res = cc(g)
    assert res.num_components == 3
    assert (res.components[:3] == 0).all()
    assert (res.components[3:6] == 3).all()
    assert res.components[6] == 6


def test_cc_log_rounds(road_like):
    """Hook+jump should converge in O(log V) outer rounds, not diameter."""
    res = cc(road_like)
    assert res.num_components == 1
    assert res.info["num_iterations"] <= 12


def test_cc_sum_balanced_asymmetric_graph():
    """_is_symmetric must not be fooled by sum-balanced asymmetric edge
    sets (a linear multiset hash collapses to comparing sum(src) with
    sum(dst)); directed input must be symmetrized so CC returns weak
    components (round-3 review finding)."""
    from gunrock_tpu.models.cc import _is_symmetric
    n = 5002
    src = [0] * 4999 + list(range(1, 5000)) + [10, 5001]
    dst = list(range(1, 5000)) + [0] * 4999 + [5000, 11]
    g = gt.from_coo(n, src, dst, undirected=False, dedup=False)
    assert not _is_symmetric(g)
    res = cc(g)
    assert res.num_components == len(set(cpu_cc(g).tolist()))


def test_pagerank_power_path():
    """pagerank_device routes through the in-kernel power iterations on
    pull2-capable graphs; ranks match the XLA recurrence."""
    import os
    import numpy as np
    import jax.numpy as jnp
    import gunrock_tpu as gt
    from gunrock_tpu.models.pr import pagerank_device

    rng = np.random.default_rng(9)
    n, m = 8300, 60000
    g = gt.from_coo(n, rng.integers(0, n, m), rng.integers(0, n, m),
                    undirected=True)
    dg = gt.to_device(g, with_csc=True, with_edge_src=True,
                      with_blocked_values=True)
    assert dg.has_pull2
    rank, order, stats = pagerank_device(dg, max_iters=12, threshold=0.0)
    os.environ["GUNROCK_PR_POWER"] = "0"
    try:
        rank_ref, _, _ = pagerank_device(dg, max_iters=12, threshold=0.0,
                                         pallas=False)
    finally:
        del os.environ["GUNROCK_PR_POWER"]
    # one iteration matches exactly; over 12 iterations the two paths'
    # f32 accumulation orders compound to ~0.1% relative divergence
    # (mass is conserved to 1e-7 in both)
    np.testing.assert_allclose(np.asarray(rank)[:n],
                               np.asarray(rank_ref)[:n], rtol=5e-3,
                               atol=1e-9)
    assert int(stats.iteration) == 12
    # early convergence with a loose threshold (chunked continuation)
    rank2, _, st2 = pagerank_device(dg, max_iters=40, threshold=1e-3)
    assert int(st2.iteration) < 40


def test_cc_sweeps_path():
    """cc_device routes through min-label sweeps on pull2-capable
    graphs; labels are canonical min-ids matching scipy components."""
    import numpy as np
    import gunrock_tpu as gt
    from gunrock_tpu.models.cc import cc_device
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components

    rng = np.random.default_rng(17)
    n, m = 8300, 12000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = gt.from_coo(n, src, dst, undirected=True)
    dg = gt.to_device(g, with_edge_src=True, with_blocked_values=True)
    assert dg.has_pull2
    comp, ncc, stats = cc_device(dg)
    comp = np.asarray(comp)[:n]
    mat = csr_matrix((np.ones(m), (src, dst)), shape=(n, n))
    ncc_ref, labels = connected_components(mat, directed=False)
    assert int(ncc) == ncc_ref
    import collections
    mins = collections.defaultdict(lambda: 1 << 60)
    for v, l in enumerate(labels):
        mins[l] = min(mins[l], v)
    expect = np.array([mins[l] for l in labels])
    np.testing.assert_array_equal(comp, expect)
