"""Round-4 fused-path A/B on real TPU: the destination-reduction kernel
(reduce_by_dst_sorted) vs the XLA winner/scatter paths.

Measures, on rmat (scale/ef from env, default n20 ef32):
  - sssp bellman + nearfar, fused on/off
  - bc single-source, fused on/off
  - the raw kernel vs the XLA sort+head+scatter soup at several stream
    widths (isolates the kernel's per-lane cost from the sort's)

Each row is one JSON line; flip the GUNROCK_*_FUSED defaults from the
winners. Run: python scripts/fused_ab_r4.py
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
from gunrock_tpu.models.sssp import sssp_device  # noqa: E402
from gunrock_tpu.models.bc import bc_device  # noqa: E402

SCALE = int(os.environ.get("BENCH_SCALE", "20"))
EF = int(os.environ.get("BENCH_EDGE_FACTOR", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])
    return x


def timed(fn):
    fence(fn())                       # warmup/compile
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    os.makedirs(CACHE, exist_ok=True)
    cache = os.path.join(CACHE, f"rmat_n{SCALE}_e{EF}.csr.npz")
    if os.path.exists(cache):
        g = gt.CsrGraph.read_binary(cache)
    else:
        g = gt.io.rmat(scale=SCALE, edge_factor=EF, seed=1, undirected=True)
        g.write_binary(cache)
    g.random_edge_values(seed=1)
    src = g.largest_degree_vertex()
    dg = gt.to_device(g, with_edge_values=True, with_blocked_values=True,
                      blocked_cache=os.path.join(
                          CACHE, f"rmat_n{SCALE}_e{EF}.blockedv.npz"))

    # --- raw kernel vs XLA soup at several stream widths ---------------
    from gunrock_tpu.ops.pallas_kernels import reduce_by_dst_sorted
    rng = np.random.default_rng(0)
    for m in (1 << 20, 1 << 23, 1 << 25):
        sd = jnp.asarray(np.sort(rng.integers(
            0, dg.v_pad, m).astype(np.int32)))
        vals = jnp.asarray(rng.random(m).astype(np.float32))
        dist = jnp.full((dg.v_pad,), jnp.inf, jnp.float32)

        @jax.jit
        def kern(sd, vals):
            return reduce_by_dst_sorted(sd, vals, op="min",
                                        out_lanes=dg.v_pad)

        @jax.jit
        def soup(sd, vals, dist):
            head = jnp.concatenate([jnp.ones((1,), bool),
                                    sd[1:] != sd[:-1]])
            d_old = jnp.take(dist, sd, indices_are_sorted=True)
            win = head & (vals < d_old)
            return dist.at[jnp.where(win, sd, dg.v_pad)].min(
                vals, mode="drop"), win

        tk = timed(lambda: kern(sd, vals))
        ts = timed(lambda: soup(sd, vals, dist))
        print(json.dumps({"ab": "kernel_vs_soup", "m": m,
                          "kernel_ms": round(tk, 3),
                          "kernel_ns_lane": round(tk * 1e6 / m, 2),
                          "soup_ms": round(ts, 3),
                          "soup_ns_lane": round(ts * 1e6 / m, 2)}),
              flush=True)

    # --- end-to-end primitives ------------------------------------------
    for mode in ("bellman", "nearfar"):
        for fused in (False, True):
            t = timed(lambda: sssp_device(dg, src, mode=mode, fused=fused))
            print(json.dumps({"ab": "sssp", "mode": mode, "fused": fused,
                              "ms": round(t, 1),
                              "mteps": round(g.num_edges / t / 1e3, 1)}),
                  flush=True)
    for fused in (False, True):
        t = timed(lambda: bc_device(dg, src, fused=fused))
        print(json.dumps({"ab": "bc", "fused": fused, "ms": round(t, 1),
                          "mteps": round(2 * g.num_edges / t / 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
