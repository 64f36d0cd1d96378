"""Deep micro-round op-level decomposition on real TPU (round 4).

The deep regime pays ~0.9 ms/level (bfs_deep_grid1024, r4 wave 1) where
the r2 input ladder paid ~0.43. Every candidate cost inside one micro
round is timed standalone at C=8192 (and 2048) so the fix targets the
real wall:

  1. C-lane scatter into a V-table (the labels write / compact slot
     scatter) — and the 3-in-1 windowed variant ((C,3) updates at one
     index vector, candidate replacement for expand's three marker
     scatters).
  2. C-lane gather from a V-table: random vs sorted.
  3. C-lane sort (1-key, stable) and 2C merge sort.
  4. C-scale cumsum and the whole expand() call.
  5. One full micro_body equivalent, jitted standalone (per-dispatch
     floor excluded by while_loop-of-K trick).

    python scripts/probe_deep_r4.py
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

RUNS = int(os.environ.get("BENCH_RUNS", "4"))
V = 1 << 20
def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])
    return x


def timed_loop(step, init, repeat: int = 1024):
    """Best-of wall of a jitted while_loop running `step` `repeat`
    times; returns per-iteration ms. The loop amortizes the ~26-110 ms
    dispatch/sync tail that swamps per-call timing of sub-ms ops."""
    @jax.jit
    def run(x):
        def body(c):
            i, x = c
            return i + 1, step(x)
        return jax.lax.while_loop(lambda c: c[0] < repeat, body,
                                  (jnp.int32(0), x))[1]

    fence(run(init))
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fence(run(init))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / repeat


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 9, V).astype(np.int32))
    ftab = jnp.asarray(rng.random(V).astype(np.float32))

    for C in (2048, 8192):
        ids_r = jnp.asarray(rng.integers(0, V, C).astype(np.int32))
        ids_s = jnp.sort(ids_r)
        vals3 = jnp.asarray(rng.integers(0, 9, (C, 3)).astype(np.int32))
        out = {}

        out["scatter_set"] = timed_loop(
            lambda t: t.at[ids_r].set(7, mode="drop") + 0, table)
        out["scatter_set_sorted"] = timed_loop(
            lambda t: t.at[ids_s].set(
                7, mode="drop", indices_are_sorted=True) + 0, table)
        big3 = jnp.zeros((V, 3), jnp.int32)
        out["scatter3_packed"] = timed_loop(
            lambda t: t.at[ids_r].set(vals3, mode="drop") + 0, big3)
        out["scatter3_separate"] = timed_loop(
            lambda t: ((t.at[ids_r].set(vals3[:, 0], mode="drop")
                        .at[ids_r].set(vals3[:, 1], mode="drop")
                        .at[ids_r].set(vals3[:, 2], mode="drop")) + 0),
            table)
        out["gather_random"] = timed_loop(
            lambda x: x + jnp.sum(jnp.take(table, ids_r + x,
                                           mode="clip")), jnp.int32(0))
        out["gather_sorted"] = timed_loop(
            lambda x: x + jnp.sum(jnp.take(table, ids_s + x, mode="clip",
                                           indices_are_sorted=True)),
            jnp.int32(0))
        out["sort_C"] = timed_loop(
            lambda x: jnp.sort(x, stable=True) + 1, ids_r)
        key2 = jnp.concatenate([ids_r, ids_s])
        out["sort_2C_2key"] = timed_loop(
            lambda x: jax.lax.sort((x, x.astype(jnp.float32)),
                                   num_keys=2)[0] + 1, key2)
        out["cumsum_C"] = timed_loop(lambda x: jnp.cumsum(x) + 1, ids_r)

        # whole expand() at out_cap=C over a C-wide sorted frontier
        import gunrock_tpu as gt
        from gunrock_tpu.ops.advance import expand
        cdir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_cache")
        gpath = os.path.join(cdir, "grid1024.csr.npz")
        if os.path.exists(gpath):
            g = gt.CsrGraph.read_binary(gpath)
        else:
            n = 1024
            idx = np.arange(n * n).reshape(n, n)
            gsrc = np.concatenate([idx[:, :-1].ravel(),
                                   idx[:-1, :].ravel()])
            gdst = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
            g = gt.from_coo(n * n, gsrc, gdst, undirected=True)
            os.makedirs(cdir, exist_ok=True)
            g.write_binary(gpath)
        dg = gt.to_device(g)
        fr0 = jnp.sort(jnp.asarray(
            rng.choice(g.num_nodes, C // 8, replace=False)
            .astype(np.int32)))
        frontier = jnp.concatenate(
            [fr0, jnp.full((C - C // 8,), dg.v_pad - 1, jnp.int32)])

        def exp_step(x):
            ex = expand(dg, frontier + x - x, jnp.int32(C // 8), C,
                        sorted_frontier=True, with_src=False)
            return x + ex.total

        out["expand_full"] = timed_loop(exp_step, jnp.int32(0))

        for k, v in out.items():
            print(json.dumps({"probe": k, "C": C,
                              "us": round(v * 1e3, 1)}), flush=True)

    # ---- Pallas kernels under the while_loop harness (per-call probes
    # cannot separate the ~30-110 ms dispatch/sync tail from device
    # time; probe_scatter_r4's inline-jit rows measured COMPILE time) —
    from gunrock_tpu.ops.pallas_kernels import (reduce_by_dst_sorted,
                                                scatter_sorted)
    for m in (1 << 13, 1 << 18, 1 << 20):
        ids = np.unique(rng.integers(0, V, m).astype(np.int32))
        cnt = len(ids)
        cap = -(-cnt // 4096) * 4096
        idsp = np.full(cap, 2**31 - 1, np.int32)
        idsp[:cnt] = ids
        idsj = jnp.asarray(idsp)
        valsj = jnp.asarray(rng.random(cap).astype(np.float32))
        base = jnp.asarray(rng.random(V).astype(np.float32))
        ms = timed_loop(
            lambda d: scatter_sorted(d, idsj, valsj, count=cnt, op="min"),
            base, repeat=16)
        print(json.dumps({"probe": "scatter_sorted_loop", "m": cnt,
                          "V": V, "ms": round(ms, 3)}), flush=True)
        msx = timed_loop(
            lambda d: d.at[idsj].min(valsj, mode="drop"), base, repeat=16)
        print(json.dumps({"probe": "xla_scatter_loop", "m": cap, "V": V,
                          "ms": round(msx, 3)}), flush=True)

    m = 1 << 20
    sd = jnp.asarray(np.sort(rng.integers(0, V, m).astype(np.int32)))
    vals = jnp.asarray(rng.random(m).astype(np.float32))
    dist = jnp.asarray(rng.random(V).astype(np.float32))
    ms = timed_loop(
        lambda v: reduce_by_dst_sorted(sd, v, op="min",
                                       out_lanes=V)[1][:m],
        vals, repeat=16)
    print(json.dumps({"probe": "reduce_by_dst_loop", "m": m,
                      "out_lanes": V, "ms": round(ms, 3)}), flush=True)
    aux = jnp.take(dist, sd, indices_are_sorted=True)
    ms = timed_loop(
        lambda v: reduce_by_dst_sorted(sd, v, op="min", out_lanes=V,
                                       aux=aux)[1][:m],
        vals, repeat=16)
    print(json.dumps({"probe": "reduce_by_dst_filtered_loop", "m": m,
                      "out_lanes": V, "ms": round(ms, 3)}), flush=True)
    ms = timed_loop(
        lambda v: jax.lax.sort((sd, v), num_keys=1)[1], vals, repeat=16)
    print(json.dumps({"probe": "sort_1key_payload_loop", "m": m,
                      "ms": round(ms, 3)}), flush=True)
    ms = timed_loop(
        lambda v: jax.lax.sort((sd, v), num_keys=2)[1], vals, repeat=16)
    print(json.dumps({"probe": "sort_2key_loop", "m": m,
                      "ms": round(ms, 3)}), flush=True)
    ms = timed_loop(
        lambda v: jnp.take(dist, sd, indices_are_sorted=True) + v, vals,
        repeat=16)
    print(json.dumps({"probe": "take_sorted_loop", "m": m,
                      "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
