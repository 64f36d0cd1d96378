"""Pull2 layout-config sweep (round 5, session 2).

The gather-strategy probe (probe_gather_r5b.py) established that the
per-row ``take_along_axis`` (~8 VPU ops) cannot be tree-batched (the
row selection must ride the same lane as the gather — tree-select
before the lane take reads a different edge's row choice), so the
gather cost is linear in ``rpg_v``: more groups K = less scan per
block. The tradeoff is block padding: blocks also split when their dst
span exceeds ``span_rows``, so K and span must move together.

Builds the pv2 layout at each config (cached per config) and measures
the real kernels: pull_reduce2 full pass + kernel P (20 PR iterations)
+ kernel B (SSSP sweeps).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = [(int(k), int(sp)) for k, sp in
           (c.split(":") for c in os.environ.get(
               "CFGS", "128:1024,256:2048").split(","))]


def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])
    return x


def timed_loop(step, init, aux, repeat=4, runs=3):
    @jax.jit
    def run(x, aux):
        def body(c):
            i, x = c
            return i + 1, step(x, aux)
        return jax.lax.while_loop(lambda c: c[0] < repeat, body,
                                  (jnp.int32(0), x))[1]
    fence(run(init, aux))
    best = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        fence(run(init, aux))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / repeat


def timed(fn, *args, runs=3):
    fence(fn(*args))
    best = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    import gunrock_tpu as gt
    from gunrock_tpu.graph.device import to_device
    from gunrock_tpu.ops import pull2 as p2
    from gunrock_tpu.models.pr import pagerank_device
    from gunrock_tpu.models.sssp import sssp_device

    cdir = "/root/repo/.bench_cache"
    g = gt.CsrGraph.read_binary(os.path.join(cdir, "rmat_n20_e32.csr.npz"))
    g.random_edge_values(seed=7)
    E = g.num_edges
    src_v = int(g.largest_degree_vertex())
    degs = np.diff(g.row_offsets).astype(np.int64)

    for K, SPAN in CONFIGS:
        os.environ["GUNROCK_PULL2_K"] = str(K)
        os.environ["GUNROCK_PULL2_SPAN"] = str(SPAN)
        t0 = time.time()
        dg = to_device(g, with_edge_values=True, with_blocked_values=True,
                       blocked_cache=os.path.join(
                           cdir, f"rmat_n20_e32.k{K}s{SPAN}.npz"))
        build_s = round(time.time() - t0, 1)
        rec = {"cfg": f"K{K}/span{SPAN}", "build_s": build_s,
               "K": dg.pv2_groups, "nblocks": int(dg.pv2_gob.shape[0]),
               "pad_x": round(int(dg.pv2_gob.shape[0]) * dg.pv2_block_rows
                              * 128 / E, 2)}
        print(json.dumps(rec), flush=True)

        rng = np.random.default_rng(0)
        vals = jnp.asarray(rng.random(dg.v_pad).astype(np.float32))
        ms = timed_loop(lambda v, a: p2.pull_reduce2(v, a, op="sum"),
                        vals, dg)
        print(json.dumps({"cfg": rec["cfg"], "full_ms": round(ms, 2),
                          "mteps": round(E / ms / 1e3, 1)}), flush=True)

        out = pagerank_device(dg, max_iters=20, threshold=0.0)
        fence(out)
        ms = timed(lambda: pagerank_device(dg, max_iters=20, threshold=0.0))
        print(json.dumps({"cfg": rec["cfg"], "pr20_ms": round(ms, 2),
                          "pr_iter_ms": round(ms / 20, 2),
                          "pr_mteps": round(E / (ms / 20) / 1e3, 1)}),
              flush=True)

        d0, _, st = sssp_device(dg, src_v, mode="pull")
        fence(d0)
        ms = timed(lambda: sssp_device(dg, src_v, mode="pull"))
        reached = np.isfinite(np.asarray(d0)[:g.num_nodes])
        ev = int(degs[reached].sum())
        print(json.dumps({"cfg": rec["cfg"],
                          "sssp_sweeps": int(st.iteration),
                          "sssp_ms": round(ms, 2),
                          "sssp_mteps": round(ev / ms / 1e3, 1)}),
              flush=True)
        del dg


if __name__ == "__main__":
    main()
