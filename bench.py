"""Benchmark harness: flagship metric on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MTEPS", "vs_baseline": N}

Flagship: direction-optimized BFS MTEPS on a scale-free R-MAT graph
(soc-orkut-class; the reference's headline BFS numbers are DO-BFS on
soc-orkut / rmat graphs, doc/stats/engines_topc.md). vs_baseline is
measured against the 1 GTEPS/chip north-star target (BASELINE.md).

Methodology matches the reference (doc/results.md:28-35): process time
excludes graph load/build/upload; m_teps = edges_visited/(elapsed_ms*1000)
(util/info.cuh:1431). Reported value = best of N timed runs after warmup
(compile cached).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Persistent XLA executable cache: the DO-BFS program takes ~2 min to
# compile; cache it across bench invocations.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

SCALE = int(os.environ.get("BENCH_SCALE", "20"))
EDGE_FACTOR = int(os.environ.get("BENCH_EDGE_FACTOR", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "5"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


def wait_for_backend():
    """Bounded wait for the TPU tunnel (round-3 postmortem: BENCH_r03
    was rc=1 because the axon backend failed to initialize during a
    transient tunnel outage). Probe in a SUBPROCESS — a failed init in
    this process would be cached by jax — and re-exec once it's up so
    our own interpreter gets a clean registration. If the tunnel never
    comes back inside the window, fall through and run on whatever
    backend is available, honestly labelled in the output record."""
    import subprocess

    if os.environ.get("BENCH_PROBED") == "1":
        return
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_TUNNEL_WAIT_SECS", "2400"))
    probe = [sys.executable, "-c", "import jax; assert jax.devices()"]
    first = True
    while True:
        try:
            ok = subprocess.run(probe, timeout=120,
                                capture_output=True).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            if first:
                return           # backend healthy on the first probe
            os.environ["BENCH_PROBED"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        first = False
        if time.monotonic() >= deadline:
            print(f"# tunnel still down after wait window; "
                  f"falling back to available backend", file=sys.stderr)
            return
        print("# waiting for TPU tunnel...", file=sys.stderr)
        time.sleep(60)


def load_graph():
    import gunrock_tpu as gt

    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, f"rmat_n{SCALE}_e{EDGE_FACTOR}.csr.npz")
    if os.path.exists(cache):
        return gt.CsrGraph.read_binary(cache)
    g = gt.io.rmat(scale=SCALE, edge_factor=EDGE_FACTOR, seed=1,
                   undirected=True)
    try:
        g.write_binary(cache)
    except OSError:
        pass
    return g


def main():
    wait_for_backend()
    import jax
    import numpy as np

    import gunrock_tpu as gt
    from gunrock_tpu.models.bfs import bfs_device

    g = load_graph()
    src = g.largest_degree_vertex()
    dgraph = gt.to_device(
        g, with_csc=True, with_blocked_csc=True,
        blocked_cache=os.path.join(
            CACHE_DIR, f"rmat_n{SCALE}_e{EDGE_FACTOR}.blocked.npz"))

    # max_iters == chunk budget => single device call, no convergence
    # probe round-trip; the structural asserts below catch truncation.
    # The completion fence is a 1-element fetch: block_until_ready can
    # return early over the serving tunnel for fresh outputs.
    def run():
        out = bfs_device(dgraph, src, direction_optimized=True,
                         max_iters=16384)
        np.asarray(out[0].reshape(-1)[0:1])
        return out

    labels, _, stats = run()  # warmup + compile
    lab = np.asarray(labels)[: g.num_nodes]
    reached = lab >= 0
    degs = np.diff(g.row_offsets).astype(np.int64)
    edges_visited = int(degs[reached].sum())

    # Structural correctness gate: BFS labels must satisfy the edge
    # relaxation property |l(u)-l(v)| <= 1 on reached edges, src label 0.
    assert lab[src] == 0, "src label wrong"
    rng = np.random.default_rng(0)
    probe = rng.integers(0, g.num_edges, 200_000)
    es = g.edge_sources()[probe]
    ed = g.col_indices[probe]
    both = (lab[es] >= 0) & (lab[ed] >= 0)
    assert (np.abs(lab[es][both].astype(np.int64) -
                   lab[ed][both].astype(np.int64)) <= 1).all(), \
        "BFS label property violated"
    assert not (reached[es] & ~reached[ed]).any(), \
        "reached vertex with unreached neighbor"

    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    # Device-fenced estimate: K chained traversals in ONE dispatch (a
    # lax.scan with a data dependency between runs), differenced against
    # the single-call wall — the per-call dispatch+sync floor over the
    # serving tunnel (~26-30 ms, doc/perf_notes.md) cancels out.
    device_ms = None
    K = int(os.environ.get("BENCH_DEVICE_RUNS", "4"))
    if K > 1:
        import jax.numpy as jnp
        from functools import partial
        from gunrock_tpu.models.bfs import _bfs_loop
        from gunrock_tpu.enactor import capacity_ladder
        fcap = max(128, dgraph.v_pad // 4)
        caps = tuple(capacity_ladder(dgraph.e_pad))
        loop = partial(_bfs_loop, fcap=fcap, caps=caps, mark_preds=False,
                       direction_optimized=True, alpha=15.0, beta=18.0,
                       pallas_pull=jax.default_backend() == "tpu",
                       init=True)

        @jax.jit
        def run_k(gg, s):
            def body(carry, _):
                _, probe = loop(gg, s + carry, jnp.int32(16384))
                return probe[2] * 0, probe    # n==0 at convergence
            _, probes = jax.lax.scan(body, jnp.int32(0), None, length=K)
            return probes

        def timed_k():
            out = run_k(dgraph, jnp.int32(src))
            np.asarray(out.reshape(-1)[0:1])
            return out

        probes = timed_k()                    # warmup + compile
        assert int(np.asarray(probes)[-1, 2]) == 0
        best_k = float("inf")
        for _ in range(max(RUNS - 2, 2)):
            t0 = time.perf_counter()
            timed_k()
            best_k = min(best_k, time.perf_counter() - t0)
        device_ms = (best_k - best) * 1000.0 / (K - 1)

    elapsed_ms = best * 1000.0
    mteps = edges_visited / (elapsed_ms * 1000.0)
    rec = {
        "metric": f"bfs_do_mteps_rmat_n{SCALE}_e{EDGE_FACTOR}",
        "value": round(mteps, 1),
        "unit": "MTEPS",
        "vs_baseline": round(mteps / 1000.0, 4),
        "elapsed_ms": round(elapsed_ms, 3),
        "edges_visited": edges_visited,
        "search_depth": int(np.asarray(labels).max()),
        "num_vertices": g.num_nodes,
        "num_edges": g.num_edges,
        "device": str(jax.devices()[0].device_kind),
    }
    if device_ms is not None and device_ms > 0:
        rec["device_ms"] = round(device_ms, 3)
        rec["device_mteps"] = round(edges_visited / (device_ms * 1000.0), 1)
    from gunrock_tpu.utils.baseline import annotate
    annotate(rec, "bfs", "rmat", mteps)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
