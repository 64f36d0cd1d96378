"""Round-4 destination-update probes on real TPU.

Pins the costs the fused_ab A/B exposed indirectly:
  1. XLA ``.at[].min`` scatter: fixed + per-lane cost vs update count
     and operand size (the wall under every winner write-back).
  2. ``reduce_by_dst_sorted``: cost vs m and OUT_LANES (isolates the
     ~128 ms fixed cost seen at out_lanes = v_pad).
  3. ``scatter_sorted`` (new): correctness vs XLA on device + cost vs
     update count — the intended replacement for (1).
  4. lax.sort 2-key cost vs m (the other half of a push round).

    python scripts/probe_scatter_r4.py
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

from gunrock_tpu.ops.pallas_kernels import (reduce_by_dst_sorted,  # noqa: E402
                                            scatter_sorted)

RUNS = int(os.environ.get("BENCH_RUNS", "4"))
V = 1 << 20


def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])
    return x


def timed(fn):
    fence(fn())
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    dist = jnp.full((V,), jnp.inf, jnp.float32)

    # ---- 1. XLA scatter-min vs update count ---------------------------
    for m in (1 << 13, 1 << 16, 1 << 18, 1 << 20, 1 << 23):
        ids = np.sort(rng.integers(0, V, m).astype(np.int32))
        idsj = jnp.asarray(ids)
        vals = jnp.asarray(rng.random(m).astype(np.float32))

        t_plain = timed(lambda: jax.jit(
            lambda d, i, v: d.at[i].min(v))(dist, idsj, vals))
        t_sorted = timed(lambda: jax.jit(
            lambda d, i, v: d.at[i].min(
                v, indices_are_sorted=True, unique_indices=False))(
                    dist, idsj, vals))
        print(json.dumps({"probe": "xla_scatter_min", "m": m,
                          "ms": round(t_plain, 3),
                          "sorted_ms": round(t_sorted, 3),
                          "ns_lane": round(t_plain * 1e6 / m, 2)}),
              flush=True)

    # ---- 2. reduce_by_dst_sorted vs out_lanes -------------------------
    m = 1 << 20
    sd = jnp.asarray(np.sort(rng.integers(0, 1 << 16, m).astype(np.int32)))
    vals = jnp.asarray(rng.random(m).astype(np.float32))
    for ol in (1 << 13, 1 << 16, 1 << 18, 1 << 20):
        t = timed(lambda ol=ol: jax.jit(
            lambda s, v: reduce_by_dst_sorted(s, v, op="min",
                                              out_lanes=ol))(sd, vals))
        print(json.dumps({"probe": "reduce_by_dst", "m": m,
                          "out_lanes": ol, "ms": round(t, 3)}), flush=True)

    # ---- 3. scatter_sorted: correctness on device + cost --------------
    for m in (1 << 13, 1 << 16, 1 << 18, 1 << 20):
        ids = np.unique(rng.integers(0, V, m).astype(np.int32))
        cnt = len(ids)
        cap = -(-cnt // 4096) * 4096
        idsp = np.full(cap, 2**31 - 1, np.int32)
        idsp[:cnt] = ids
        valsp = np.zeros(cap, np.float32)
        valsp[:cnt] = rng.random(cnt).astype(np.float32)
        idsj, valsj = jnp.asarray(idsp), jnp.asarray(valsp)
        base = jnp.asarray(rng.random(V).astype(np.float32))

        f = jax.jit(lambda d, i, v: scatter_sorted(d, i, v, count=cnt,
                                                   op="min"))
        got = np.asarray(f(base, idsj, valsj))
        want = np.asarray(base).copy()
        np.minimum.at(want, ids, valsp[:cnt])
        ok = bool(np.allclose(got, want))
        t = timed(lambda: f(base, idsj, valsj))
        txla = timed(lambda: jax.jit(
            lambda d, i, v: d.at[i].min(v, mode="drop"))(base, idsj,
                                                         valsj))
        print(json.dumps({"probe": "scatter_sorted", "m": cnt,
                          "correct": ok, "ms": round(t, 3),
                          "xla_ms": round(txla, 3),
                          "speedup": round(txla / max(t, 1e-9), 1)}),
              flush=True)

    # ---- 3b. the actual enactor idioms at v-scale ----------------------
    from gunrock_tpu.ops.segment import (compact, frontier_from_mask,
                                         mask_from_frontier, scatter_set)
    fr = jnp.asarray(np.sort(rng.choice(V, 1 << 18, replace=False))
                     .astype(np.int32))
    frp = jnp.concatenate([fr, jnp.full(((1 << 20) - (1 << 18),), V - 1,
                                        jnp.int32)])
    n = jnp.int32(1 << 18)
    mask = jnp.zeros((V,), jnp.bool_).at[fr].set(True)
    vals = jnp.asarray(rng.random(1 << 20).astype(np.float32))
    win = jnp.asarray(rng.random(1 << 20) < 0.25)
    for name, f, args in (
        ("mask_from_frontier", jax.jit(
            lambda q, nn: mask_from_frontier(q, nn, V)), (frp, n)),
        ("frontier_from_mask", jax.jit(
            lambda mk: frontier_from_mask(mk, 1 << 20)), (mask,)),
        ("compact_1m", jax.jit(
            lambda v, w: compact(v, w, 1 << 20, fill=0)), (frp, win)),
        ("scatter_set_masked_1m", jax.jit(
            lambda d, i, v, w: scatter_set(d, i, v, mask=w)),
         (dist, frp, vals, win)),
    ):
        t = timed(lambda: f(*args))
        print(json.dumps({"probe": name, "ms": round(t, 3)}), flush=True)

    # ---- 4. sort cost vs m --------------------------------------------
    for m in (1 << 18, 1 << 20, 1 << 23, 1 << 25):
        a = jnp.asarray(rng.integers(0, V, m).astype(np.int32))
        b = jnp.asarray(rng.random(m).astype(np.float32))
        t = timed(lambda: jax.jit(
            lambda x, y: jax.lax.sort((x, y), num_keys=2))(a, b))
        print(json.dumps({"probe": "sort2", "m": m, "ms": round(t, 3),
                          "ns_lane": round(t * 1e6 / m, 2)}), flush=True)


if __name__ == "__main__":
    main()
