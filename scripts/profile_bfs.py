"""Microbenchmark the DO-BFS hot-loop pieces on real TPU hardware.

Times each stage of the superstep in isolation to find where the
3.2s (18.9 MTEPS) run at scale 20 goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gunrock_tpu as gt

SCALE = int(os.environ.get("SCALE", "20"))
EF = int(os.environ.get("EF", "32"))
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", f"rmat_n{SCALE}_e{EF}.csr.npz")


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def main():
    if os.path.exists(CACHE):
        g = gt.CsrGraph.read_binary(CACHE)
    else:
        g = gt.io.rmat(scale=SCALE, edge_factor=EF, seed=1, undirected=True)
    dg = gt.to_device(g, with_csc=True)
    print(f"V={g.num_nodes} E={g.num_edges} v_pad={dg.v_pad} e_pad={dg.e_pad}",
          f"dev={jax.devices()[0].device_kind}")

    v_pad, e_pad = dg.v_pad, dg.e_pad
    E = g.num_edges

    # 1. full-edge gather: labels[csc_indices]
    labels = jnp.zeros((v_pad,), jnp.int32)
    f = jax.jit(lambda l: l[dg.csc_indices].sum())
    ms, _ = timeit(f, labels)
    print(f"gather labels[csc_indices] (E={e_pad}): {ms:8.2f} ms "
          f"({e_pad*4/ms/1e6:.0f} GB/s effective)")

    # 2. segment_max over CSC (the pull step's reduction)
    vals = jnp.ones((e_pad,), jnp.int32)
    f = jax.jit(lambda v: jax.ops.segment_max(v, dg.csc_edge_dst, v_pad,
                                              indices_are_sorted=True))
    ms, _ = timeit(f, vals)
    print(f"segment_max sorted (E->V):          {ms:8.2f} ms")

    # 2b. segment ops via ppermute-free .at[].max scatter
    f = jax.jit(lambda v: jnp.zeros((v_pad,), jnp.int32)
                .at[dg.csc_edge_dst].max(v, mode="drop"))
    ms, _ = timeit(f, vals)
    print(f"scatter .at[].max (E->V):           {ms:8.2f} ms")

    # 3. full pull step (as in models/bfs._pull_step)
    from gunrock_tpu.models.bfs import _pull_step, _State
    from gunrock_tpu.enactor import init_stats
    st = _State(labels=labels, preds=jnp.zeros((1,), jnp.int32),
                frontier=jnp.zeros((v_pad,), jnp.int32), n=jnp.int32(1),
                use_pull=jnp.bool_(False), unexplored=jnp.float32(E),
                stats=init_stats())
    f = jax.jit(lambda s: _pull_step(dg, v_pad, False, s))
    ms, _ = timeit(f, st)
    print(f"pull step (full):                   {ms:8.2f} ms")

    # 4. cumsum over frontier degrees (fcap = v_pad)
    fr = jnp.arange(v_pad, dtype=jnp.int32) % g.num_nodes
    f = jax.jit(lambda fr: jnp.cumsum(
        dg.row_offsets[fr + 1] - dg.row_offsets[fr]))
    ms, _ = timeit(f, fr)
    print(f"cumsum degrees (V):                 {ms:8.2f} ms")

    # 5. searchsorted: ends (v_pad) x queries (cap) — the merge-path rank
    ends = jnp.cumsum(jnp.ones((v_pad,), jnp.int32))
    for cap in (1 << 20, 1 << 23, e_pad):
        j = jnp.arange(cap, dtype=jnp.int32)
        f = jax.jit(lambda e: jnp.searchsorted(e, j, side="right"))
        ms, _ = timeit(f, ends)
        print(f"searchsorted V x cap={cap:>9}:      {ms:8.2f} ms")

    # 6. expand() at full cap
    from gunrock_tpu.ops.advance import expand
    f = jax.jit(lambda fr: expand(dg, fr, jnp.int32(g.num_nodes), e_pad).dst.sum())
    ms, _ = timeit(f, fr)
    print(f"expand full (cap=e_pad):            {ms:8.2f} ms")

    # 7. claim dedup at e_pad lanes
    from gunrock_tpu.ops.segment import dedup_winners
    idx = jnp.arange(e_pad, dtype=jnp.int32) % g.num_nodes
    msk = jnp.ones((e_pad,), bool)
    f = jax.jit(lambda i, m: dedup_winners(i, m, v_pad).sum())
    ms, _ = timeit(f, idx, msk)
    print(f"dedup_winners (E lanes):            {ms:8.2f} ms")

    # 8. compact at e_pad lanes
    from gunrock_tpu.ops.segment import compact
    f = jax.jit(lambda i, m: compact(i, m, v_pad)[0].sum())
    ms, _ = timeit(f, idx, msk)
    print(f"compact (E lanes -> V):             {ms:8.2f} ms")

    # 9. one full push step at biggest ladder cap
    from gunrock_tpu.models.bfs import _make_push_branch
    push = _make_push_branch(dg, v_pad, False)
    step = push(e_pad)
    f = jax.jit(lambda s: step(s)[0].sum())
    ms, _ = timeit(f, st)
    print(f"push step (cap=e_pad):              {ms:8.2f} ms")

    # 10. whole DO-BFS for reference
    from gunrock_tpu.models.bfs import bfs_device
    src = g.largest_degree_vertex()
    t0 = time.perf_counter()
    out = jax.block_until_ready(bfs_device(dg, src, direction_optimized=True))
    compile_s = time.perf_counter() - t0
    ms, out = timeit(lambda: bfs_device(dg, src, direction_optimized=True), n=3)
    iters = int(out[2].iteration)
    print(f"DO-BFS total: {ms:8.2f} ms, iters={iters}, "
          f"compile {compile_s:.1f}s")
    trace = np.asarray(out[2].frontier_trace)
    print("frontier trace:", trace[trace >= 0][:20])


if __name__ == "__main__":
    main()
