"""Community modularity metric (reference experimental "global
indicator", ``gunrock/global_indicator/modularity.cuh``).

Q = (1/2m) * sum_{(u,v) in E, c(u)=c(v)} [1 - k_u * k_v / (2m)]
computed as intra-community edge fraction minus the degree-based
expectation — one dense pass, no scatters.
"""

from __future__ import annotations

import numpy as np

__all__ = ["modularity"]


def modularity(g, communities: np.ndarray) -> float:
    """Newman modularity of a vertex->community assignment over an
    undirected graph (edges counted once per direction, 2m = num_edges
    for a symmetrized CSR)."""
    comm = np.asarray(communities)
    src = g.edge_sources()
    dst = g.col_indices
    m2 = float(g.num_edges)          # = 2m for symmetrized input
    if m2 == 0:
        return 0.0
    intra = float((comm[src] == comm[dst]).sum()) / m2
    deg = g.out_degrees.astype(np.float64)
    deg_per_comm = np.bincount(comm, weights=deg)
    expected = float((deg_per_comm ** 2).sum()) / (m2 * m2)
    return intra - expected
