"""ICI cost-model calibration on real TPU hardware (VERDICT r3 item 9).

One real chip cannot measure ICI collectives, but it CAN calibrate the
pieces the multi-chip projection is made of:

  1. **burn curve** — wall time of ``utils.track.inject_latency(x, r)``
     vs ``r`` on the real chip. This converts the ``comm_latency``
     rounds knob (the reference's ``--communicate-latency``,
     ``util/latency_utils.cuh``) into device nanoseconds, so emulated
     interconnect slowdowns are stated in time, not abstract rounds.
  2. **dispatch floor** — the per-call device round-trip (the floor any
     real collective also pays under this serving path).
  3. **burned supersteps** — ``num_shards=1`` sharded primitives on the
     real chip with the burn set to the ICI time the analytic model
     projects for the 8-chip boundary volume (measured on the CPU mesh
     by scripts/latency_experiment.py). The measured slowdown IS the
     projected multi-chip comm share, on real silicon, under the real
     compute times — the calibrated weak-scaling-efficiency bound.

Emits one JSON line per measurement; summary lines go to perf_notes.

Run (tunnel up): python scripts/ici_calibrate.py
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
from gunrock_tpu.utils.track import inject_latency  # noqa: E402

RUNS = int(os.environ.get("BENCH_RUNS", "5"))


def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])
    return x


def best_ms(fn, runs=RUNS):
    fence(fn())
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", flush=True)

    # ---- 1. burn curve + dispatch floor --------------------------------
    x = jnp.zeros((8, 128), jnp.float32)

    fadd = jax.jit(lambda v: v + 1)
    floor_ms = best_ms(lambda: fadd(x))
    print(json.dumps({"metric": "dispatch_floor_ms",
                      "value": round(floor_ms, 3)}), flush=True)

    burn_pts = []
    for r in (0, 1_000, 10_000, 100_000, 1_000_000, 4_000_000):
        f = jax.jit(lambda v, r=r: inject_latency(v, r))
        ms = best_ms(lambda: f(x))
        burn_pts.append((r, ms))
        print(json.dumps({"metric": "burn_ms", "rounds": r,
                          "value": round(ms, 3)}), flush=True)
    # ns/round from the two largest points (dispatch floor cancels)
    (r1, m1), (r2, m2) = burn_pts[-2], burn_pts[-1]
    ns_per_round = (m2 - m1) * 1e6 / (r2 - r1)
    print(json.dumps({"metric": "burn_ns_per_round",
                      "value": round(ns_per_round, 3)}), flush=True)

    # ---- 2. projected 8-chip ICI times -> rounds -----------------------
    # Volumes measured on the CPU mesh (scripts/latency_experiment.py,
    # doc/perf_notes.md): per-superstep per-chip boundary bytes at
    # scale-15/8 shards, scaled linearly to scale-20-per-chip weak
    # scaling (boundary ~ cut edges ~ E/chip for random partition).
    # ICI model: v5e 45 GB/s/link, ~1 us/hop, plus a per-collective
    # dispatch of ~5 us (XLA async collective issue).
    cases = {
        # bytes/chip/superstep at scale-20-per-chip (x32 from scale-15)
        "pr_ghost_exchange": 61_440 * 32,
        "bfs_push_alltoall": 14_113 * 32,
        "bfs_pull_bitmask_allgather": (1 << 20) // 32 * 4 * 7,  # 7 peers
    }
    burns = {}
    for name, nbytes in cases.items():
        t_us = nbytes / 45e9 * 1e6 + 1.0 + 5.0
        rounds = int(t_us * 1000 / max(ns_per_round, 1e-9))
        burns[name] = rounds
        print(json.dumps({"metric": "projected_ici", "case": name,
                          "bytes_per_chip": nbytes,
                          "ici_us": round(t_us, 2),
                          "burn_rounds": rounds}), flush=True)

    # ---- 3. burned supersteps on the real chip -------------------------
    from gunrock_tpu.parallel import bfs_sharded, pagerank_sharded
    cdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    os.makedirs(cdir, exist_ok=True)
    cache = os.path.join(cdir, "rmat_n20_e32.csr.npz")
    if os.path.exists(cache):
        g = gt.CsrGraph.read_binary(cache)
    else:
        g = gt.io.rmat(scale=20, edge_factor=32, seed=1, undirected=True)
        g.write_binary(cache)
    src = g.largest_degree_vertex()

    for name, fn0 in (
        ("pr10", lambda lat: pagerank_sharded(
            g, num_shards=1, max_iters=10, comm_latency=lat)),
        ("bfs_do", lambda lat: bfs_sharded(
            g, src=src, num_shards=1, direction_optimized=True,
            comm_latency=lat)),
    ):
        lat = burns["pr_ghost_exchange" if name == "pr10"
                    else "bfs_pull_bitmask_allgather"]
        base = best_ms(lambda: fn0(0), runs=3)
        burned = best_ms(lambda: fn0(lat), runs=3)
        supersteps = 10 if name == "pr10" else 6
        share = max(burned - base, 0.0) / max(burned, 1e-9)
        print(json.dumps({
            "metric": "burned_superstep", "case": name,
            "base_ms": round(base, 2), "burned_ms": round(burned, 2),
            "burn_rounds_per_exchange": lat,
            "supersteps": supersteps,
            "comm_share": round(share, 4),
            "weak_scaling_eff_bound": round(1.0 - share, 4)}), flush=True)


if __name__ == "__main__":
    main()
