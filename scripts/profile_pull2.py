"""In-context pull-step decomposition: cumulative compositions, diffed.

Each stage function takes (graph, labels) explicitly (no closure-captured
device arrays — those blow the remote-compile request size).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gunrock_tpu as gt
from gunrock_tpu.ops import pallas_kernels as pk

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def timeit(f, *args, n=6):
    g = jax.jit(lambda *a: jax.tree_util.tree_leaves(f(*a))[0].reshape(-1)[:1])
    float(np.asarray(g(*args))[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(g(*args))[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    g = gt.CsrGraph.read_binary(os.path.join(CACHE, "rmat_n20_e32.csr.npz"))
    dg = gt.to_device(g, with_csc=True, with_blocked_csc=True,
                      blocked_cache=os.path.join(
                          CACHE, "rmat_n20_e32.blocked.npz"))
    lab = np.full(dg.v_pad, -1, np.int32)
    rng = np.random.default_rng(0)
    lab[rng.choice(g.num_nodes, 614000, replace=False)] = 0
    labels = jnp.asarray(lab)
    rows = dg.bcsc_groups * dg.bcsc_rows_per_group

    def s0(gr, lab):
        return (lab == 0).astype(jnp.int32)

    def s1(gr, lab):
        return pk.pack_bitmask(lab == 0, rows=rows)

    def s2(gr, lab):
        return pk.blocked_pull_or(s1(gr, lab), gr)

    def s3(gr, lab):
        scan = s2(gr, lab)
        cell_last = scan.reshape(-1, 32)[:, 31]
        return pk.sample_sorted(cell_last, gr.bcsc_wcell_pos)

    def s4(gr, lab):
        K = gr.bcsc_groups
        s = s3(gr, lab)
        valid = gr.bcsc_sample_valid.reshape(K, -1)
        per_k = jnp.where(valid, s.reshape(K, -1), 0)
        return jax.lax.reduce(per_k, jnp.int32(0), jax.lax.bitwise_or, (0,))

    def s5(gr, lab):
        return pk.unpack_bitmask(s4(gr, lab), gr.v_pad)

    def s6(gr, lab):
        reached = s5(gr, lab)
        new_mask = (lab == jnp.int32(-1)) & reached
        lab2 = jnp.where(new_mask, 2, lab)
        n = jnp.sum(new_mask.astype(jnp.int32))
        deg = gr.row_offsets[1:] - gr.row_offsets[:-1]
        m_f = jnp.sum(jnp.where(new_mask, deg, 0))
        return lab2, n, m_f

    prev = 0.0
    for name, f in [("mask", s0), ("pack", s1), ("scan", s2),
                    ("sample", s3), ("or-reduce", s4), ("unpack", s5),
                    ("tail", s6)]:
        ms = timeit(f, dg, labels)
        print(f"+{name:10s}: {ms:7.2f} ms (delta {ms-prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
