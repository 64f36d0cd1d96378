import json, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np

def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]); return x

def timed_loop(step, init, aux=None, repeat=4, runs=3):
    @jax.jit
    def run(x, aux):
        def body(c):
            i, x = c
            return i + 1, step(x, aux)
        return jax.lax.while_loop(lambda c: c[0] < repeat, body, (jnp.int32(0), x))[1]
    fence(run(init, aux)); best = 1e9
    for _ in range(runs):
        t0 = time.perf_counter(); fence(run(init, aux)); best = min(best, time.perf_counter()-t0)
    return best * 1e3 / repeat

def timed(fn, *args, runs=3):
    fence(fn(*args)); best=1e9
    for _ in range(runs):
        t0=time.perf_counter(); fence(fn(*args)); best=min(best,time.perf_counter()-t0)
    return best*1e3

import gunrock_tpu as gt
from gunrock_tpu.graph.device import to_device
from gunrock_tpu.ops import pull2 as p2
cdir = "/root/repo/.bench_cache"
g = gt.CsrGraph.read_binary(os.path.join(cdir, "rmat_n20_e32.csr.npz"))
g.random_edge_values(seed=7)
dg = to_device(g, with_edge_values=True, with_blocked_values=True,
               blocked_cache=os.path.join(cdir, "rmat_n20_e32.blockedv.npz"))
E = dg.num_edges
print(json.dumps({"layout": {"K": dg.pv2_groups, "nblocks": int(dg.pv2_gob.shape[0]),
   "br": dg.pv2_block_rows, "span": dg.pv2_span_rows}}), flush=True)
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.random(dg.v_pad).astype(np.float32))

for ab in (() if os.environ.get("SKIP_A") else ("full", "noextract", "nogather")):
    ms = timed_loop(lambda v,a,ab=ab: p2.pull_reduce2(v, a, op="sum", ablate=ab), vals, dg)
    print(json.dumps({"A": ab, "ms": round(ms,2), "mteps": round(E/ms/1e3,1)}), flush=True)

# kernel P: PR 20 iterations in one call
from gunrock_tpu.models.pr import pagerank_device
out = pagerank_device(dg, max_iters=20, threshold=0.0)
fence(out)
ms = timed(lambda: pagerank_device(dg, max_iters=20, threshold=0.0))
print(json.dumps({"P_pr20": round(ms,2), "per_iter": round(ms/20,2),
                  "mteps_iter": round(E/(ms/20)/1e3,1)}), flush=True)

# kernel B: SSSP
from gunrock_tpu.models.sssp import sssp_device
src = int(g.largest_degree_vertex())
d0, _, st = sssp_device(dg, src, mode="pull")
fence(d0)
print(json.dumps({"B_sssp_sweeps": int(st.iteration),
  "trace": np.asarray(st.frontier_trace)[:int(st.iteration)].tolist()}), flush=True)
ms = timed(lambda: sssp_device(dg, src, mode="pull"))
reached = np.isfinite(np.asarray(d0)[:g.num_nodes])
degs = np.diff(g.row_offsets).astype(np.int64)
ev = int(degs[reached].sum())
print(json.dumps({"B_sssp_ms": round(ms,2), "mteps": round(ev/ms/1e3,1)}), flush=True)
