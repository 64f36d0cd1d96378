"""Push-relax decomposition on the real TPU: where do the ns/lane go?

Measures, at several rung caps, the pieces of an SSSP push round:
  expand (rank/eid dataflow) / payload gathers (XLA sorted take vs
  sample_sorted kernel) / dist_f[rank] / scatter_min / sort-by-dst.
Ground truth for the round-3 fused push-relax design.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

import gunrock_tpu as gt
from gunrock_tpu.ops.advance import expand
from gunrock_tpu.ops import pallas_kernels as pk
from gunrock_tpu.ops.segment import scatter_min, frontier_from_mask

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def timeit(f, *args, n=5):
    g = jax.jit(lambda *a: jax.tree_util.tree_leaves(f(*a))[0].reshape(-1)[:1])
    np.asarray(g(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    g = gt.CsrGraph.read_binary(os.path.join(CACHE, "rmat_n20_e32.csr.npz"))
    g.random_edge_values()
    dg = gt.to_device(g, with_edge_values=True)
    rng = np.random.default_rng(0)

    for cap, nfrac in [(1 << 20, 0.02), (1 << 22, 0.1), (1 << 23, 0.25)]:
        # random frontier whose degree sum ~ cap
        target = cap * 0.7
        mean_deg = g.num_edges / g.num_nodes
        nf = int(target / mean_deg)
        mask = np.zeros(dg.v_pad, bool)
        mask[rng.choice(g.num_nodes, nf, replace=False)] = True
        fmask = jnp.asarray(mask)
        dist = jnp.asarray(
            rng.uniform(0, 10, dg.v_pad).astype(np.float32))
        fcap = dg.v_pad

        def f_queue(fm, d):
            fr, n0 = frontier_from_mask(fm, fcap)
            return fr, n0

        def f_expand(fm, d):
            fr, n0 = frontier_from_mask(fm, fcap)
            fr2 = jax.lax.dynamic_slice(fr, (0,), (cap,)) if cap < fcap \
                else fr
            n0 = jnp.minimum(n0, min(cap, fcap))
            ex = expand(dg, fr2[:min(cap, fcap)], n0, cap,
                        sorted_frontier=True)
            return ex.eid, ex.rank, ex.mask, ex.total

        def f_payload_xla(fm, d):
            eid, rank, mask_, _ = f_expand(fm, d)
            dstv = jnp.take(dg.col_indices, eid, indices_are_sorted=True)
            w = jnp.take(dg.edge_values, eid, indices_are_sorted=True)
            return dstv, w

        def f_payload_sample(fm, d):
            eid, rank, mask_, _ = f_expand(fm, d)
            dstv = pk.sample_sorted(dg.col_indices, eid)
            w = pk.sample_sorted(dg.edge_values, eid)
            return dstv, w

        def f_distf_xla(fm, d):
            eid, rank, mask_, _ = f_expand(fm, d)
            fr, n0 = frontier_from_mask(fm, fcap)
            dist_f = jnp.take(d, fr[:min(cap, fcap)],
                              indices_are_sorted=True)
            cand = jnp.take(dist_f, rank, indices_are_sorted=True)
            return cand

        def f_distf_sample(fm, d):
            eid, rank, mask_, _ = f_expand(fm, d)
            fr, n0 = frontier_from_mask(fm, fcap)
            dist_f = jnp.take(d, fr[:min(cap, fcap)],
                              indices_are_sorted=True)
            return pk.sample_sorted(dist_f, rank)

        def f_full_sample(fm, d):
            eid, rank, mask_, _ = f_expand(fm, d)
            fr, n0 = frontier_from_mask(fm, fcap)
            dist_f = jnp.take(d, fr[:min(cap, fcap)],
                              indices_are_sorted=True)
            dstv = pk.sample_sorted(dg.col_indices, eid)
            w = pk.sample_sorted(dg.edge_values, eid)
            cand = pk.sample_sorted(dist_f, rank) + w
            cand = jnp.where(mask_, cand, jnp.inf)
            return scatter_min(d, dstv, cand)

        def f_full_xla(fm, d):
            eid, rank, mask_, _ = f_expand(fm, d)
            fr, n0 = frontier_from_mask(fm, fcap)
            dist_f = jnp.take(d, fr[:min(cap, fcap)],
                              indices_are_sorted=True)
            dstv = jnp.take(dg.col_indices, eid, indices_are_sorted=True)
            w = jnp.take(dg.edge_values, eid, indices_are_sorted=True)
            cand = jnp.where(mask_, dist_f[rank] + w, jnp.inf)
            return scatter_min(d, dstv, cand)

        def f_scatter_only(fm, d):
            # pre-made random dst/cand: isolate the scatter
            dstv = jnp.asarray(
                rng.integers(0, dg.v_pad, cap).astype(np.int32))
            cand = jnp.asarray(
                rng.uniform(0, 10, cap).astype(np.float32))
            return scatter_min(d, dstv + jnp.int32(fm[0]), cand)

        def f_sort(fm, d):
            dstv = jnp.asarray(
                rng.integers(0, dg.v_pad, cap).astype(np.int32))
            cand = jnp.asarray(rng.uniform(0, 10, cap).astype(np.float32))
            sd, sc = jax.lax.sort((dstv + jnp.int32(fm[0]), cand),
                                  num_keys=1)
            return sd, sc

        names = [("queue", f_queue), ("expand", f_expand),
                 ("payload_xla", f_payload_xla),
                 ("payload_sample", f_payload_sample),
                 ("distf_xla", f_distf_xla),
                 ("distf_sample", f_distf_sample),
                 ("FULL_sample+scatter", f_full_sample),
                 ("FULL_xla", f_full_xla),
                 ("scatter_only", f_scatter_only),
                 ("sort_pairs", f_sort)]
        print(f"== cap {cap} ({cap/1e6:.1f}M lanes), frontier {nf} ==")
        for name, f in names:
            ms = timeit(f, fmask, dist)
            print(f"  {name:22s}: {ms:8.2f} ms  "
                  f"({ms*1e6/cap:6.1f} ns/lane)")


if __name__ == "__main__":
    main()
