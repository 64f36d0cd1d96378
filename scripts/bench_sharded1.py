"""num_shards=1 sharded DO-BFS vs the single-chip enactor on real
hardware — the kernel-grade multi-chip acceptance check: the sharded
path must stay within ~1.3x of models.bfs (i.e. it rides the same
blocked Pallas kernels per shard instead of falling off to XLA's
serial gathers).

    python scripts/bench_sharded1.py          # rmat n20 ef32 (cached)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np  # noqa: E402

import gunrock_tpu as gt  # noqa: E402

SCALE = int(os.environ.get("BENCH_SCALE", "20"))
EF = int(os.environ.get("BENCH_EDGE_FACTOR", "32"))


def main():
    import jax
    from gunrock_tpu.parallel.bfs import bfs_sharded

    cdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    cache = os.path.join(cdir, f"rmat_n{SCALE}_e{EF}.csr.npz")
    if os.path.exists(cache):
        g = gt.CsrGraph.read_binary(cache)
    else:
        g = gt.io.rmat(scale=SCALE, edge_factor=EF, seed=1,
                       undirected=True)
    src = g.largest_degree_vertex()

    # Single-chip reference number: warm (compile excluded), enact only.
    gt.bfs(g, src=src, direction_optimized=True)
    r1 = gt.bfs(g, src=src, direction_optimized=True)
    base_ms = r1.info["process_ms"]

    # Warm-up + timed sharded run (num_shards=1: same device, sharded
    # code path incl. per-shard blocked layouts). process_ms excludes
    # the host-side partition/layout build (partition_ms) — the
    # reference's methodology also excludes load/partition/transfer
    # (doc/results.md:28-35); the pre-fix row compared a cold
    # compile-inclusive single number to a wall-clock sharded number
    # dominated by the re-partition.
    rs = bfs_sharded(g, src, num_shards=1, direction_optimized=True)
    rs = bfs_sharded(g, src, num_shards=1, direction_optimized=True)
    shard_ms = rs.info["process_ms"]
    assert (np.asarray(rs.labels) == np.asarray(r1.labels)).all(), \
        "sharded labels diverge from single-chip"
    print(json.dumps({
        "metric": f"bfs_sharded1_vs_single_rmat{SCALE}",
        "single_ms": round(base_ms, 2),
        "sharded1_ms": round(shard_ms, 2),
        "ratio": round(shard_ms / max(base_ms, 1e-9), 3),
        "target": "<=1.3",
    }))


if __name__ == "__main__":
    main()
