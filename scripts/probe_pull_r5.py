"""Round-5 decomposition of the blocked value-pull pass on real TPU.

VERDICT r4 item 2: pull_vertex_reduce runs PR/CC/HITS/BC at <10% of HBM
speed-of-light. Split its cost into (a) the in-kernel table-slice scan
(3 VPU ops x rpg_v rows per block), (b) the sample_sorted result
extraction (K*v_pad positions), (c) the K-way combine, plus a raw
grid-step-overhead microbench. Every row is loop-amortized
(probe_deep_r4 harness) so dispatch/compile tails can't contaminate.

    python scripts/probe_pull_r5.py
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

RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])
    return x


def timed_loop(step, init, aux=None, repeat: int = 8):
    # aux is passed as a jit ARGUMENT: closed-over device arrays are
    # serialized into the remote-compile payload (HTTP 413 on big graphs).
    @jax.jit
    def run(x, aux):
        def body(c):
            i, x = c
            return i + 1, step(x, aux)
        return jax.lax.while_loop(lambda c: c[0] < repeat, body,
                                  (jnp.int32(0), x))[1]

    fence(run(init, aux))
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fence(run(init, aux))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / repeat


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import gunrock_tpu as gt
    from gunrock_tpu.graph.device import to_device
    from gunrock_tpu.ops import pallas_kernels as pk

    cdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    g = gt.CsrGraph.read_binary(
        os.path.join(cdir, "rmat_n20_e32.csr.npz"))
    dg = to_device(g, with_edge_values=True, with_blocked_values=True,
                   blocked_cache=os.path.join(cdir,
                                              "rmat_n20_e32.blockedv.npz"))
    K = dg.bcsc_groups
    rpg_v = dg.bcsc_rows_per_group * 32
    Ep = dg.bcsc_src.shape[0]
    emit(probe="layout", K=K, rpg_v=rpg_v, e_blocked=Ep,
         block_rows=dg.bcsc_block_rows, v_pad=dg.v_pad, E=dg.num_edges)

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random(dg.v_pad).astype(np.float32))

    # (1) full pass, PR-shaped (sum, no weights)
    ms = timed_loop(lambda v, a: pk.pull_vertex_reduce(v, a, op="sum"),
                    vals, dg)
    emit(probe="pull_full_sum", ms=round(ms, 2),
         mteps=round(dg.num_edges / ms / 1e3, 1))
    # min+add (SSSP-shaped)
    ms = timed_loop(lambda v, a: pk.pull_vertex_reduce(v, a, op="min",
                                                       wmode="add"),
                    vals, dg)
    emit(probe="pull_full_min_add", ms=round(ms, 2),
         mteps=round(dg.num_edges / ms / 1e3, 1))

    # (2) scan-only: the blocked kernel without sampling/combine
    table = pk.pad_values_table(vals, K, dg.bcsc_rows_per_group, 0.0)
    src2d = dg.bcsc_src.reshape(-1, 128)
    dst2d = dg.bcsc_dst.reshape(-1, 128)
    w2d = jnp.zeros_like(src2d, dtype=jnp.float32)

    def scan_only(v, a):
        table, src2d, dst2d, w2d, gob = a
        t = table + v[0]
        s = pk._blocked_value_2d(t, src2d, dst2d, w2d,
                                 gob, rpg_v=rpg_v,
                                 op="sum", wmode="none",
                                 block_rows=dg.bcsc_block_rows,
                                 interpret=False)
        return v + s[0, :1]

    ms = timed_loop(scan_only, vals[:1],
                    (table, src2d, dst2d, w2d, dg.bcsc_group_of_block))
    emit(probe="scan_only_sum", ms=round(ms, 2))

    # (3) sample-only over a constant E'-scale array
    scan_const = jnp.asarray(rng.random(Ep).astype(np.float32))

    def sample_only(v, a):
        scan_const, pos = a
        s = pk.sample_sorted(scan_const + v[0], pos)
        return v + s[:1]

    ms = timed_loop(sample_only, vals[:1],
                    (scan_const, dg.bcsc_vsample_pos))
    emit(probe="sample_only", ms=round(ms, 2),
         positions=int(dg.bcsc_vsample_pos.shape[0]))

    # (4) combine-only (K-way masked reduce of sampled values)
    samples = jnp.asarray(rng.random(K * dg.v_pad).astype(np.float32))

    def combine_only(v, a):
        samples, valid = a
        per_kv = jnp.where(valid, samples + v[0], 0.0)
        return v + jnp.sum(per_kv.reshape(K, -1), axis=0)[:1]

    ms = timed_loop(combine_only, vals[:1],
                    (samples, dg.bcsc_vsample_valid))
    emit(probe="combine_only", ms=round(ms, 2))

    # (5) pad_values_table alone (concat+reshape at v-scale)
    ms = timed_loop(
        lambda v, a: pk.pad_values_table(v, K, dg.bcsc_rows_per_group,
                                         0.0)[0, :1] + v[:1] * 0 + v,
        vals)
    emit(probe="pad_table_only", ms=round(ms, 2))

    # (6) grid-step overhead: trivial copy kernel, varying tile rows
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NROWS = 8192  # 1M lanes

    def copy_kernel(i_ref, o_ref):
        o_ref[...] = i_ref[...] + 1.0

    for tr in (8, 32, 256, 1024):
        @jax.jit
        def run_copy(x, tr=tr):
            return pl.pallas_call(
                copy_kernel,
                grid=(NROWS // tr,),
                in_specs=[pl.BlockSpec((tr, 128), lambda k: (k, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((tr, 128), lambda k: (k, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NROWS, 128), jnp.float32),
            )(x)

        big = jnp.zeros((NROWS, 128), jnp.float32)
        ms = timed_loop(lambda x, a: run_copy(x), big, repeat=32)
        emit(probe="gridstep_copy", tile_rows=tr, steps=NROWS // tr,
             ms=round(ms, 3),
             us_per_step=round(ms * 1e3 / (NROWS // tr), 2))


if __name__ == "__main__":
    main()
