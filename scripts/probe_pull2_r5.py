"""Pull-v2 on real TPU: correctness vs v1 + loop-amortized timing.

    GUNROCK_PULL2_K=64 python scripts/probe_pull2_r5.py
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

RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])
    return x


def timed_loop(step, init, aux=None, repeat: int = 8):
    @jax.jit
    def run(x, aux):
        def body(c):
            i, x = c
            return i + 1, step(x, aux)
        return jax.lax.while_loop(lambda c: c[0] < repeat, body,
                                  (jnp.int32(0), x))[1]

    fence(run(init, aux))
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fence(run(init, aux))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / repeat


def main():
    import gunrock_tpu as gt
    from gunrock_tpu.graph.device import to_device
    from gunrock_tpu.ops.pull2 import pull_reduce2

    cdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    g = gt.CsrGraph.read_binary(
        os.path.join(cdir, "rmat_n20_e32.csr.npz"))
    g.random_edge_values(seed=7)
    t0 = time.time()
    dg = to_device(g, with_edge_values=True, with_blocked_values=True,
                   blocked_cache=os.path.join(cdir,
                                              "rmat_n20_e32.blockedv.npz"))
    K = dg.pv2_groups
    print(json.dumps({"probe": "pv2_layout", "K": K,
                      "nblocks": int(dg.pv2_gob.shape[0]),
                      "e2": int(dg.pv2_src.shape[0]),
                      "block_rows": dg.pv2_block_rows,
                      "span_rows": dg.pv2_span_rows,
                      "build_s": round(time.time() - t0, 1)}), flush=True)

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random(dg.v_pad).astype(np.float32))

    # correctness vs numpy oracle on a sampled subset
    out = np.asarray(jax.jit(
        lambda v, a: pull_reduce2(v, a, op="sum"))(vals, dg))
    es, ed = g.edge_sources(), g.col_indices
    vh = np.asarray(vals)
    ref = np.zeros(dg.v_pad, np.float64)
    np.add.at(ref, ed, vh[es])
    err = np.max(np.abs(out - ref) / np.maximum(np.abs(ref), 1e-6))
    print(json.dumps({"probe": "pv2_sum_maxrelerr",
                      "err": float(err)}), flush=True)

    ms = timed_loop(lambda v, a: pull_reduce2(v, a, op="sum"), vals, dg)
    print(json.dumps({"probe": "pv2_sum", "ms": round(ms, 2),
                      "mteps": round(dg.num_edges / ms / 1e3, 1)}),
          flush=True)
    ms = timed_loop(lambda v, a: pull_reduce2(v, a, op="min",
                                              wmode="add"), vals, dg)
    print(json.dumps({"probe": "pv2_min_add", "ms": round(ms, 2),
                      "mteps": round(dg.num_edges / ms / 1e3, 1)}),
          flush=True)
    ms = timed_loop(lambda v, a: pull_reduce2(v, a, op="sum",
                                              wmode="mul",
                                              weights="wpr"), vals, dg)
    print(json.dumps({"probe": "pv2_sum_wpr", "ms": round(ms, 2),
                      "mteps": round(dg.num_edges / ms / 1e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
