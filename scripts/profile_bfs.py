"""Per-stage BFS cost breakdown on the bench graph (real TPU).

Times each hot-loop component standalone at realistic shapes to locate
the 126ms: pull passes, push expansion pieces, dispatch overhead.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gunrock_tpu as gt
from gunrock_tpu.models.bfs import bfs_device
from gunrock_tpu.ops import pallas_kernels as pk
from gunrock_tpu.ops.advance import expand
from gunrock_tpu.ops.segment import (compact, dedup_winners,
                                     frontier_from_mask, scatter_set)

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def timeit(f, *args, n=5):
    g = jax.jit(lambda *a: jax.tree_util.tree_leaves(f(*a))[0].reshape(-1)[:1])
    float(np.asarray(g(*args))[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(g(*args))[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    g = gt.CsrGraph.read_binary(
        os.path.join(CACHE, "rmat_n20_e32.csr.npz"))
    dg = gt.to_device(g, with_csc=True, with_blocked_csc=True,
                      blocked_cache=os.path.join(
                          CACHE, "rmat_n20_e32.blocked.npz"))
    src = g.largest_degree_vertex()

    # ---- end-to-end + instrumented per-iteration ----
    run = lambda: jax.block_until_ready(
        bfs_device(dg, src, direction_optimized=True, max_iters=16384))
    run()
    t0 = time.perf_counter()
    run()
    total_ms = (time.perf_counter() - t0) * 1e3
    print(f"end-to-end: {total_ms:.1f} ms")

    inst = []
    jax.block_until_ready(bfs_device(dg, src, direction_optimized=True,
                                     instrument=inst))
    for r in inst:
        print(f"  iter {r['iteration']:2d} {'PULL' if r['pull'] else 'push'}"
              f" frontier={r['frontier']:8d} {r['ms']:7.1f} ms (instrumented)")

    # ---- pull pass pieces ----
    labels = jnp.zeros((dg.v_pad,), jnp.int32)
    rows = dg.bcsc_groups * dg.bcsc_rows_per_group
    ms = timeit(lambda lab: pk.pack_bitmask(lab == 0, rows=rows), labels)
    print(f"pack_bitmask: {ms:.2f} ms")
    words = pk.pack_bitmask(labels == 0, rows=rows)
    ms = timeit(lambda w: pk.blocked_pull_or(w, dg), words)
    print(f"blocked_pull_or scan: {ms:.2f} ms")
    ms = timeit(lambda w: pk.pull_reached_words(w, dg), words)
    print(f"pull_reached_words (scan+samples): {ms:.2f} ms")
    reach = pk.pull_reached_words(words, dg)
    ms = timeit(lambda r: pk.unpack_bitmask(r, dg.v_pad), reach)
    print(f"unpack_bitmask: {ms:.2f} ms")

    # full pull step cost model: new_mask + counts
    def pull_tail(reach_w, lab):
        new_mask = (lab == jnp.int32(-1)) & pk.unpack_bitmask(reach_w, dg.v_pad)
        lab2 = jnp.where(new_mask, 2, lab)
        n = jnp.sum(new_mask.astype(jnp.int32))
        deg = dg.row_offsets[1:] - dg.row_offsets[:-1]
        m_f = jnp.sum(jnp.where(new_mask, deg, 0))
        return lab2, n, m_f
    ms = timeit(pull_tail, reach, labels)
    print(f"pull tail (mask+label+counts): {ms:.2f} ms")

    # ---- push pieces at the big rung (cap = e_pad/4 and frontier ~500k) ----
    rng = np.random.default_rng(0)
    fcap = dg.v_pad // 4
    for nf in (4096, 65536, fcap):
        fr_np = np.sort(rng.choice(g.num_nodes, nf, replace=False)
                        .astype(np.int32))
        fr = jnp.asarray(fr_np)
        deg = np.diff(g.row_offsets)[fr_np]
        m_f = int(deg.sum())
        # pick rung like dispatch would: smallest cap >= m_f
        from gunrock_tpu.enactor import capacity_ladder
        caps = capacity_ladder(max(128, dg.e_pad))
        cap = min(c for c in caps if c >= max(m_f, nf))
        frp = jnp.concatenate([fr, jnp.full((cap - nf,), dg.v_pad - 1,
                                            jnp.int32)]) \
            if cap > nf else fr[:cap]
        n0 = jnp.int32(nf)
        print(f"frontier n={nf} m_f={m_f/1e6:.2f}M cap={cap/1e6:.2f}M:")
        ms = timeit(lambda f, n: expand(dg, f, n, cap, sorted_frontier=True),
                    frp, n0)
        print(f"  expand: {ms:.2f} ms")
        ex = jax.jit(lambda f, n: expand(dg, f, n, cap,
                                         sorted_frontier=True))(frp, n0)
        ms = timeit(lambda lab, d: lab[d] == jnp.int32(-1), labels, ex.dst)
        print(f"  membership gather (XLA): {ms:.2f} ms")
        unv = pk.pack_bitmask(labels == jnp.int32(-1))
        ms = timeit(lambda w, d: pk.bitmask_gather(w, d), unv, ex.dst)
        print(f"  membership gather (pallas bitmask): {ms:.2f} ms")
        isn = jnp.asarray(ex.mask)
        ms = timeit(lambda d, m: dedup_winners(d, m, dg.v_pad), ex.dst, isn)
        print(f"  dedup_winners: {ms:.2f} ms")
        ms = timeit(lambda lab, d, m: scatter_set(lab, d, 3, mask=m),
                    labels, ex.dst, isn)
        print(f"  scatter_set labels: {ms:.2f} ms")
        ms = timeit(lambda d, m: compact(d, m, fcap), ex.dst, isn)
        print(f"  compact next frontier: {ms:.2f} ms")
        ms = timeit(lambda d, m: jnp.sum(jnp.where(
            m, dg.row_offsets[d + 1] - dg.row_offsets[d], 0)),
            ex.dst, isn)
        print(f"  next degree sum: {ms:.2f} ms")

    # dispatch overhead probe: tiny jit call
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    ms = timeit(f, x)
    print(f"null dispatch: {ms:.2f} ms")


if __name__ == "__main__":
    main()
