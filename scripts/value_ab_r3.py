"""Value-kernel A/B on real TPU: K-group sweep for pull_vertex_reduce.

The full-edge value pass (PR/HITS/CC/BC/SSSP-pull) measured ~130 ms on
rmat n20 ef32 at K=32 groups (BENCH.md round 2) — ~29 GB/s effective,
>=4x off v5e HBM speed-of-light. This sweep measures the pass at wider/
narrower group counts and both wmodes to find the knee; layouts are
cached per K so re-runs are cheap.

    python scripts/value_ab_r3.py           # rmat n20 ef32 (cached CSR)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import gunrock_tpu as gt  # noqa: E402
from gunrock_tpu.ops.pallas_kernels import pull_vertex_reduce  # noqa: E402

SCALE = int(os.environ.get("BENCH_SCALE", "20"))
EF = int(os.environ.get("BENCH_EDGE_FACTOR", "32"))
KS = tuple(int(k) for k in
           os.environ.get("AB_KS", "16,32,64,128").split(","))


def fence(out):
    np.asarray(out.reshape(-1)[0:1])
    return out


def best_ms(f, *args, runs=5):
    fence(f(*args))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fence(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    cdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache")
    os.makedirs(cdir, exist_ok=True)
    cache = os.path.join(cdir, f"rmat_n{SCALE}_e{EF}.csr.npz")
    if os.path.exists(cache):
        g = gt.CsrGraph.read_binary(cache)
    else:
        g = gt.io.rmat(scale=SCALE, edge_factor=EF, seed=1,
                       undirected=True)
        g.write_binary(cache)
    g.random_edge_values(seed=7)
    E = g.num_edges
    rng = np.random.default_rng(3)
    interp = jax.default_backend() != "tpu"   # CPU smoke path

    for K in KS:
        bcache = os.path.join(cdir, f"rmat{SCALE}e{EF}.blockedv.K{K}.npz")
        t0 = time.time()
        dg = gt.to_device(g, with_edge_values=True,
                          with_blocked_values=True, blocked_groups=K,
                          blocked_cache=bcache)
        build_s = time.time() - t0
        x = jnp.asarray(rng.random(dg.v_pad).astype(np.float32))

        # Pass dg as a pytree ARGUMENT: closure capture would embed the
        # GB-scale blocked arrays as HLO constants and blow the remote
        # compile request size (HTTP 413 over the tunnel).
        f_sum = jax.jit(lambda x, dgg: pull_vertex_reduce(
            x, dgg, op="sum", wmode="none", interpret=interp))
        ms_sum = best_ms(f_sum, x, dg)
        f_min = jax.jit(lambda x, dgg: pull_vertex_reduce(
            x, dgg, op="min", wmode="add", interpret=interp))
        ms_min = best_ms(f_min, x, dg)

        print(json.dumps({
            "metric": "value_pass_ab", "K": K,
            "sum_ms": round(ms_sum, 2), "min_add_ms": round(ms_min, 2),
            "sum_mteps": round(E / (ms_sum * 1000.0), 1),
            "gbps_effective": round(E * 8 / ms_sum / 1e6, 1),
            "layout_build_s": round(build_s, 1),
        }), flush=True)
        del dg, x, f_sum, f_min


if __name__ == "__main__":
    main()
