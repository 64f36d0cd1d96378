"""Round-4 phase profile on real TPU: where do SSSP/BC/BFS actually
spend their time? Uses the instrumented per-phase duty split (the
reference's --instrumented kernel stats) to print pull / push / deep
totals per primitive — the data that decides the next kernel to build.

Run: python scripts/profile_phases_r4.py
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
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def main():
    os.makedirs(CACHE, exist_ok=True)
    cache = os.path.join(CACHE, f"rmat_n{SCALE}_e{EF}.csr.npz")
    if os.path.exists(cache):
        g = gt.CsrGraph.read_binary(cache)
    else:
        g = gt.io.rmat(scale=SCALE, edge_factor=EF, seed=1,
                       undirected=True)
        g.write_binary(cache)
    g.random_edge_values(seed=1)
    src = int(g.largest_degree_vertex())

    for name, fn in (
        ("sssp_bellman", lambda: gt.sssp(g, src=src, instrumented=True)),
        ("sssp_nearfar", lambda: gt.sssp(g, src=src, mode="nearfar",
                                         instrumented=True)),
        ("bfs_do", lambda: gt.bfs(g, src=src, direction_optimized=True,
                                  instrumented=True)),
        ("bc", lambda: gt.bc(g, src=src, instrumented=True)),
    ):
        # warm compile run, then the measured run
        fn()
        res = fn()
        info = res.info
        rec = info.get("per_iteration", [])
        out = {"metric": "phase_profile", "primitive": name,
               "process_ms": round(info.get("process_ms", 0.0), 1),
               "iterations": len(rec),
               "phase_ms": info.get("phase_ms"),
               "phase_iterations": info.get("phase_iterations"),
               "avg_duty": round(info.get("avg_duty", 0.0), 3)}
        print(json.dumps(out), flush=True)
        # top-5 most expensive iterations with their phase + m_f
        top = sorted((r for r in rec), key=lambda r: -r["ms"])[:5]
        print(json.dumps({"metric": "phase_top5", "primitive": name,
                          "top": [{k: (round(v, 1) if k == "ms" else v)
                                   for k, v in r.items()} for r in top]}),
              flush=True)


if __name__ == "__main__":
    main()
