"""Injected-latency multi-chip scaling projection (VERDICT item 8).

With one real chip, the only multi-chip perf evidence this environment
can produce is an emulation: run the sharded primitives on the 8-device
CPU mesh with calibrated compute-burn injected into every exchange
(``utils.track.inject_latency``, the reference's --communicate-latency,
``util/latency_utils.cuh``), and report how superstep time degrades as
the emulated interconnect slows. Results land in doc/perf_notes.md.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/latency_experiment.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# a sitecustomize may have pre-registered an accelerator backend; force
# the virtual CPU mesh after import (backends initialize lazily)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import gunrock_tpu as gt  # noqa: E402
from gunrock_tpu.parallel import (bfs_sharded, pagerank_sharded)  # noqa: E402

LAT = [0, 2_000, 20_000, 200_000]


def best_ms(fn, runs=2):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    g = gt.io.rmat(scale=15, edge_factor=16, seed=3, undirected=True)
    src = g.largest_degree_vertex()
    print(f"graph: scale-15 rmat, V={g.num_nodes} E={g.num_edges}, "
          f"8 virtual devices\n")

    print("| comm_latency rounds | BFS(DO) ms | BFS slowdown | "
          "PR(10 it) ms | PR slowdown |")
    print("|---|---|---|---|---|")
    base_bfs = base_pr = None
    for lat in LAT:
        ms_bfs = best_ms(lambda: bfs_sharded(
            g, src, num_shards=8, direction_optimized=True,
            comm_latency=lat))
        ms_pr = best_ms(lambda: pagerank_sharded(
            g, num_shards=8, max_iters=10, threshold=0.0,
            comm_latency=lat))
        base_bfs = base_bfs or ms_bfs
        base_pr = base_pr or ms_pr
        print(f"| {lat:>9,} | {ms_bfs:8.0f} | {ms_bfs/base_bfs:10.2f}x | "
              f"{ms_pr:8.0f} | {ms_pr/base_pr:9.2f}x |", flush=True)

    r = bfs_sharded(g, src, num_shards=8, direction_optimized=True)
    print(f"\nBFS comm bytes/traversal: {r.info['comm_bytes']:.0f} "
          f"({r.info['num_iterations']} supersteps, "
          f"pull={r.info['pull_iterations']})")
    rp = pagerank_sharded(g, num_shards=8, max_iters=10, threshold=0.0)
    print(f"PR comm bytes/superstep: {rp.info['comm_bytes_per_superstep']:.0f}")


if __name__ == "__main__":
    main()
