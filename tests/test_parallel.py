"""Multi-chip tests on the virtual 8-device CPU mesh (the reference's
``--device=0,0`` multi-GPU-without-a-cluster trick, CMakeLists:389-421)."""

import numpy as np
import pytest

import gunrock_tpu as gt
from gunrock_tpu.parallel import (bfs_sharded, make_mesh, pagerank_sharded,
                                  partition, sssp_sharded)
from oracles import cpu_bfs, cpu_pagerank, cpu_sssp


def test_partition_static_roundtrip(rmat_small):
    pg, perm = partition(rmat_small, 4, method="static")
    assert pg.num_shards == 4
    assert pg.shard_size % 128 == 0
    # every vertex maps to exactly one relabeled slot
    assert len(np.unique(perm)) == rmat_small.num_nodes
    # static: owners are contiguous chunks in old order
    owners = perm // pg.shard_size
    assert (np.diff(owners) >= 0).all()


@pytest.mark.parametrize("method", ["static", "random", "biasrandom",
                                    "cluster", "metis"])
def test_partition_methods_preserve_edges(method, rmat_small):
    pg, perm = partition(rmat_small, 4, method=method, seed=1)
    # total stored edges match
    row = np.asarray(pg.row_offsets)
    assert int(row[:, -1].sum()) == rmat_small.num_edges
    # spot-check adjacency of vertex 0 survives relabeling
    old_nbrs = rmat_small.col_indices[
        rmat_small.row_offsets[0]:rmat_small.row_offsets[1]]
    new0 = perm[0]
    s, l = divmod(int(new0), pg.shard_size)
    col = np.asarray(pg.col_indices)
    nbrs_new = col[s, row[s, l]:row[s, l + 1]]
    assert sorted(nbrs_new.tolist()) == sorted(perm[old_nbrs].tolist())


def test_biasrandom_balances_degrees(rmat_small):
    pg, perm = partition(rmat_small, 4, method="biasrandom")
    owners = perm // pg.shard_size
    deg = np.diff(rmat_small.row_offsets)
    per_shard = np.bincount(owners, weights=deg, minlength=4)
    assert per_shard.max() / max(per_shard.mean(), 1) < 1.3


@pytest.mark.parametrize("num_shards", [2, 4, 8])
def test_bfs_sharded_matches_oracle(rmat_small, num_shards):
    res = bfs_sharded(rmat_small, src=0, num_shards=num_shards,
                      partition_method="random", seed=3)
    np.testing.assert_array_equal(res.labels, cpu_bfs(rmat_small, 0))


@pytest.mark.parametrize("method", ["static", "cluster", "biasrandom"])
def test_bfs_sharded_partition_methods(rmat_small, method):
    res = bfs_sharded(rmat_small, src=5, num_shards=4,
                      partition_method=method)
    np.testing.assert_array_equal(res.labels, cpu_bfs(rmat_small, 5))


def test_bfs_sharded_preds_valid(chesapeake):
    res = bfs_sharded(chesapeake, src=0, num_shards=4, mark_preds=True)
    expected = cpu_bfs(chesapeake, 0)
    np.testing.assert_array_equal(res.labels, expected)
    row, col = chesapeake.row_offsets, chesapeake.col_indices
    for v in range(chesapeake.num_nodes):
        if v == 0 or res.labels[v] <= 0:
            continue
        pv = res.preds[v]
        assert pv >= 0
        assert res.labels[pv] == res.labels[v] - 1
        assert v in col[row[pv]:row[pv + 1]]


def test_bfs_sharded_deep_graph(road_like):
    res = bfs_sharded(road_like, src=0, num_shards=4)
    np.testing.assert_array_equal(res.labels, cpu_bfs(road_like, 0))


def test_bfs_sharded_matches_single_chip(rmat_small):
    multi = bfs_sharded(rmat_small, src=2, num_shards=8)
    single = gt.bfs(rmat_small, src=2)
    np.testing.assert_array_equal(multi.labels, single.labels)


@pytest.mark.parametrize("num_shards", [2, 8])
def test_pagerank_sharded(rmat_small, num_shards):
    res = pagerank_sharded(rmat_small, num_shards=num_shards,
                           max_iters=100, threshold=1e-9)
    expected = cpu_pagerank(rmat_small, max_iters=100, tol=1e-9)
    np.testing.assert_allclose(res.ranks, expected, rtol=1e-3)


def test_pagerank_sharded_matches_single_chip(rmat_small):
    from gunrock_tpu.models.pr import pagerank
    multi = pagerank_sharded(rmat_small, num_shards=4, max_iters=40,
                             threshold=1e-8)
    single = pagerank(rmat_small, max_iters=40, threshold=1e-8)
    np.testing.assert_allclose(multi.ranks, single.ranks, rtol=2e-3,
                               atol=1e-7)


@pytest.mark.parametrize("num_shards", [2, 4])
def test_sssp_sharded(num_shards):
    g = gt.io.rmat(scale=9, edge_factor=6, seed=11, undirected=True,
                   random_edge_values=True)
    res = sssp_sharded(g, src=0, num_shards=num_shards)
    expected = cpu_sssp(g, 0)
    np.testing.assert_allclose(res.distances, expected, rtol=1e-5)


def test_sssp_sharded_deep(road_like):
    road_like.edge_values = np.ones(road_like.num_edges, np.float32)
    res = sssp_sharded(road_like, src=0, num_shards=4)
    expected = cpu_sssp(road_like, 0)
    np.testing.assert_allclose(res.distances, expected, rtol=1e-5)


@pytest.mark.parametrize("num_shards", [2, 4])
def test_cc_sharded_matches_oracle(rmat_small, num_shards):
    from gunrock_tpu.parallel import cc_sharded
    from oracles import cpu_cc
    res = cc_sharded(rmat_small, num_shards=num_shards)
    ref = cpu_cc(rmat_small)
    assert res.num_components == len(np.unique(ref))
    # identical partitions: same-component iff same ref component
    np.testing.assert_array_equal(res.components, ref)


def test_cc_sharded_disconnected():
    from gunrock_tpu.parallel import cc_sharded
    # two cliques + an isolated vertex
    src = np.array([0, 1, 2, 4, 5, 6])
    dst = np.array([1, 2, 0, 5, 6, 4])
    g = gt.from_coo(8, src, dst, undirected=True)
    res = cc_sharded(g, num_shards=2)
    assert res.num_components == 4  # {0,1,2}, {4,5,6}, {3}, {7}
    assert res.components[0] == res.components[1] == res.components[2] == 0
    assert res.components[4] == res.components[5] == res.components[6] == 4


@pytest.mark.parametrize("num_shards", [2, 4])
def test_bc_sharded_matches_oracle(rmat_small, num_shards):
    from gunrock_tpu.parallel import bc_sharded
    from oracles import cpu_bc
    res = bc_sharded(rmat_small, src=0, num_shards=num_shards)
    ref = cpu_bc(rmat_small, 0)
    np.testing.assert_allclose(res.bc_values, ref, rtol=1e-4, atol=1e-4)


def test_bc_sharded_matches_single_chip(chesapeake):
    from gunrock_tpu.parallel import bc_sharded
    res = bc_sharded(chesapeake, src="largestdegree", num_shards=4,
                     partition_method="biasrandom")
    single = gt.bc(chesapeake, chesapeake.largest_degree_vertex())
    np.testing.assert_allclose(res.bc_values, single.bc_values,
                               rtol=1e-4, atol=1e-4)
