"""CPU reference implementations (oracles) for primitive validation.

The reference validates every primitive against a CPU implementation in
the same test binary (e.g. ReferenceBFS ``tests/bfs/test_bfs.cu:186-257``,
CPU Dijkstra in test_sssp.cu, Brandes BC in test_bc.cu); these are the
equivalent simple, obviously-correct host oracles. They are shipped in
the package (not just the test tree) because the CLI drivers offer the
same ``--quick``-off validation path as the reference's test binaries.
"""

from __future__ import annotations

import heapq
from collections import deque

import numpy as np


def cpu_bfs(g, src: int) -> np.ndarray:
    """Plain queue BFS; labels[v] = depth, -1 unreachable."""
    labels = np.full(g.num_nodes, -1, dtype=np.int32)
    labels[src] = 0
    q = deque([src])
    row, col = g.row_offsets, g.col_indices
    while q:
        u = q.popleft()
        for e in range(row[u], row[u + 1]):
            v = col[e]
            if labels[v] == -1:
                labels[v] = labels[u] + 1
                q.append(v)
    return labels


def cpu_sssp(g, src: int) -> np.ndarray:
    """Dijkstra; dist[v] = shortest distance, +inf unreachable."""
    dist = np.full(g.num_nodes, np.inf, dtype=np.float64)
    dist[src] = 0.0
    row, col, w = g.row_offsets, g.col_indices, g.edge_values
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for e in range(row[u], row[u + 1]):
            v, nd = col[e], d + w[e]
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def cpu_pagerank(g, damping: float = 0.85, max_iters: int = 100,
                 tol: float = 1e-6, normalized: bool = True) -> np.ndarray:
    """Power-iteration PageRank matching the reference semantics
    (``tests/pr/test_pr.cu`` SimpleReferencePr)."""
    n = g.num_nodes
    deg = np.diff(g.row_offsets).astype(np.float64)
    src_of_edge = g.edge_sources()
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(max_iters):
        contrib = np.where(deg[src_of_edge] > 0,
                           rank[src_of_edge] / deg[src_of_edge], 0.0)
        incoming = np.bincount(g.col_indices, weights=contrib, minlength=n)
        new_rank = (1.0 - damping) / n + damping * incoming
        if not normalized:
            new_rank = (1.0 - damping) + damping * incoming
        if np.abs(new_rank - rank).sum() < tol:
            rank = new_rank
            break
        rank = new_rank
    return rank


def cpu_cc(g) -> np.ndarray:
    """Connected components via union-find; returns component ids
    normalized to the minimum vertex id in each component."""
    parent = np.arange(g.num_nodes)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    src_of_edge = g.edge_sources()
    for u, v in zip(src_of_edge, g.col_indices):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return np.array([find(x) for x in range(g.num_nodes)], dtype=np.int32)


def cpu_bc(g, src: int = -1) -> np.ndarray:
    """Brandes betweenness centrality (reference test_bc.cu RefCPUBC).

    ``src=-1`` computes over all sources; otherwise single-source
    dependency accumulation (what the reference computes per run, scaled
    by 0.5 for undirected double-counting).
    """
    n = g.num_nodes
    bc = np.zeros(n, dtype=np.float64)
    row, col = g.row_offsets, g.col_indices
    sources = range(n) if src < 0 else [src]
    for s in sources:
        sigma = np.zeros(n)
        sigma[s] = 1.0
        dist = np.full(n, -1, dtype=np.int64)
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for e in range(row[u], row[u + 1]):
                v = col[e]
                if dist[v] == -1:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = np.zeros(n)
        for u in reversed(order):
            for e in range(row[u], row[u + 1]):
                v = col[e]
                if dist[v] == dist[u] + 1 and sigma[v] > 0:
                    delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
            if u != s:
                bc[u] += delta[u]
    return bc * 0.5


def cpu_tc(g) -> int:
    """Triangle count via per-edge sorted-adjacency intersection
    (node-iterator; independent of the device DAG-probe algorithm)."""
    row, col = g.row_offsets, g.col_indices
    adj = [np.sort(col[row[v]:row[v + 1]]) for v in range(g.num_nodes)]
    total = 0
    src = g.edge_sources()
    for u, v in zip(src, col):
        if u < v:
            total += np.intersect1d(adj[u], adj[v],
                                    assume_unique=True).size
    # Each triangle counted once per one of its three u<v edges minus
    # shared corners: the u<v filter counts each triangle exactly 3x/2...
    # precisely: for undirected simple graphs, each triangle {a,b,c} has
    # 3 edges with u<v, each contributing 1 => total = 3 * triangles.
    return total // 3


def cpu_hits(g, max_iters: int = 50):
    """HITS hub/authority scores (reference tests/hits)."""
    n = g.num_nodes
    src_of_edge = g.edge_sources()
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(max_iters):
        auth = np.bincount(g.col_indices, weights=hub[src_of_edge],
                           minlength=n)
        hub = np.bincount(src_of_edge, weights=auth[g.col_indices],
                          minlength=n)
        auth /= max(auth.max(), 1e-12)
        hub /= max(hub.max(), 1e-12)
    return hub, auth
