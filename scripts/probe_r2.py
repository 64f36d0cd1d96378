"""Round-2 kernel design probes.

Q1: cost of take_along_axis(axis=0) from a tall (R,128) VMEM table with a
    per-element (B,128) row index — i.e. a dynamic SUBLANE gather. If this
    is ~O(1)/element, the value-pull gather becomes 1 op with build-time
    lane alignment (place each edge in lane src%128, gather row src//128).
Q2: cost of one-hot build + f32 matmul for a scatter-free segmented sum.
Q3: breakdown of the current pull_vertex_reduce: gather rounds vs sampling.
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
N = 1 << 23          # 8M elements to gather
BLOCK = 512          # rows per grid step (64K elements)


def timeit(f, *args, n=5):
    # wrap so only a scalar crosses the tunnel (full-array np.asarray is
    # ~34MB/s); the scalar read forces execution completion.
    g = jax.jit(lambda *a: jax.tree_util.tree_leaves(f(*a))[0].reshape(-1)[:1])
    float(np.asarray(g(*args))[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(g(*args))[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def make_call(kernel, R, dtype=jnp.float32, extra_in=None):
    in_specs = [pl.BlockSpec((R, LANE), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, LANE), lambda k: (k, 0),
                             memory_space=pltpu.VMEM)]
    if extra_in:
        in_specs.append(pl.BlockSpec((BLOCK, LANE), lambda k: (k, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(N // 128 // BLOCK,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, LANE), dtype),
    )


def k_sublane_ta(t_ref, i_ref, o_ref):
    # out[b, l] = table[idx[b, l], l]  — dynamic sublane gather
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)


def k_copy(t_ref, i_ref, o_ref):
    o_ref[...] = i_ref[...].astype(o_ref.dtype) * 2


def q1():
    rng = np.random.default_rng(0)
    print("== Q1: dynamic sublane gather (take_along_axis axis=0) ==")
    for R in (128, 512, 2048, 8192):
        table = jnp.asarray(rng.standard_normal((R, LANE)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, R, (N // 128, LANE)).astype(np.int32))
        try:
            ms = timeit(make_call(k_sublane_ta, R), table, idx)
            print(f"R={R:5d}: {ms:8.2f} ms  ({N/ms/1e3:8.1f} M elem/s)")
        except Exception as e:
            print(f"R={R:5d}: FAILED: {str(e)[:200]}")
    table = jnp.asarray(rng.standard_normal((128, LANE)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (N // 128, LANE)).astype(np.int32))
    ms = timeit(make_call(k_copy, 128), table, idx)
    print(f"copy baseline: {ms:8.2f} ms")


def k_onehot_matmul(t_ref, i_ref, v_ref, o_ref):
    # per 8-row chunk: one-hot (dst_local == iota) @ identity-ish; cost model
    # for scatter-free 128-wide window reduce: acc[d] += sum val*onehot
    dl = jax.lax.broadcasted_iota(jnp.int32, (8, LANE, LANE), 2)
    acc = jnp.zeros((8, LANE), jnp.float32)
    def body(c, acc):
        idx = i_ref[pl.ds(c * 8, 8), :]     # (8,128)
        val = v_ref[pl.ds(c * 8, 8), :]     # (8,128)
        oh = (idx[:, :, None] == dl).astype(jnp.float32)  # (8,128,128)
        contrib = jax.lax.dot_general(
            val[:, None, :], oh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (8,1,128)
        return acc + contrib[:, 0, :]
    acc = jax.lax.fori_loop(0, BLOCK // 8, body, acc)
    o_ref[...] = jnp.broadcast_to(jnp.sum(acc, axis=0, keepdims=True),
                                  (BLOCK, LANE))


def q2():
    rng = np.random.default_rng(1)
    print("== Q2: one-hot matmul window reduce ==")
    idx = jnp.asarray(rng.integers(0, LANE, (N // 128, LANE)).astype(np.int32))
    val = jnp.asarray(rng.standard_normal((N // 128, LANE)).astype(np.float32))
    table = jnp.asarray(np.zeros((128, LANE), np.float32))
    try:
        ms = timeit(make_call(k_onehot_matmul, 128, extra_in=True),
                    table, idx, val)
        print(f"onehot-matmul: {ms:8.2f} ms ({N/ms/1e3:8.1f} M elem/s)")
    except Exception as e:
        print(f"onehot-matmul FAILED: {str(e)[:300]}")


def q3():
    print("== Q3: current pull_vertex_reduce breakdown (rmat n20 e32) ==")
    import gunrock_tpu as gt
    from gunrock_tpu.ops.pallas_kernels import (
        _blocked_value_2d, sample_sorted, pad_values_table)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    g = gt.CsrGraph.read_binary(os.path.join(cache, "rmat_n20_e32.csr.npz"))
    dg = gt.to_device(g, with_edge_values=True, with_blocked_csc=True,
                      with_blocked_values=True,
                      blocked_cache=os.path.join(cache, "rmat_n20_e32.blockedv.npz"))
    K = dg.bcsc_groups
    rpg_v = dg.bcsc_rows_per_group * 32
    vals = jnp.ones((dg.v_pad,), jnp.float32)
    table = pad_values_table(vals, K, dg.bcsc_rows_per_group, 0.0)
    src2d = dg.bcsc_src.reshape(-1, LANE)
    dst2d = dg.bcsc_dst.reshape(-1, LANE)
    w2d = jnp.zeros_like(src2d, dtype=jnp.float32)
    print(f"K={K} rpg_v={rpg_v} edges'={src2d.size} blocks={src2d.shape[0]//dg.bcsc_block_rows}")

    f_scan = jax.jit(functools.partial(
        _blocked_value_2d, rpg_v=rpg_v, op="sum", wmode="none",
        block_rows=dg.bcsc_block_rows, interpret=False))
    ms = timeit(f_scan, table, src2d, dst2d, w2d, dg.bcsc_group_of_block)
    print(f"scan kernel (gather+segscan): {ms:8.2f} ms")

    scan = f_scan(table, src2d, dst2d, w2d, dg.bcsc_group_of_block).reshape(-1)
    f_samp = jax.jit(lambda s: sample_sorted(s, dg.bcsc_vsample_pos))
    ms2 = timeit(f_samp, scan)
    print(f"sample_sorted (K*V={K*dg.v_pad/1e6:.1f}M samples): {ms2:8.2f} ms")




def q4():
    """Sampler v2 sweep: tile rows x chunk rows x pipeline depth."""
    import gunrock_tpu as gt
    from gunrock_tpu.ops import pallas_kernels as pk
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    g = gt.CsrGraph.read_binary(os.path.join(cache, "rmat_n20_e32.csr.npz"))
    dg = gt.to_device(g, with_edge_values=True, with_blocked_csc=True,
                      with_blocked_values=True,
                      blocked_cache=os.path.join(cache, "rmat_n20_e32.blockedv.npz"))
    scan = jnp.ones((dg.bcsc_src.shape[0],), jnp.float32)
    pos = dg.bcsc_vsample_pos
    print(f"samples={pos.shape[0]/1e6:.1f}M over scan={scan.shape[0]/1e6:.1f}M")
    import itertools, ast
    cfgs = ast.literal_eval(os.environ.get(
        "Q4_CFGS", "[(32,64,2),(64,128,4),(128,256,4)]"))
    for tile, chunk, nbuf in cfgs:
        pk._SAMPLE_TILE_ROWS, pk._CHUNK_ROWS, pk._NBUF = tile, chunk, nbuf
        f = jax.jit(lambda s, tile=tile: pk.sample_sorted(s, pos))
        try:
            ms = timeit(f, scan)
            print(f"tile={tile:4d} chunk={chunk:4d} nbuf={nbuf}: {ms:7.2f} ms")
        except Exception as e:
            print(f"tile={tile:4d} chunk={chunk:4d} nbuf={nbuf}: FAILED {str(e)[:120]}")




def q5():
    """K sweep for the blocked value layout (gather rounds ~ 1/K,
    sampling ~ K*V)."""
    import functools
    import gunrock_tpu as gt
    from gunrock_tpu.ops import pallas_kernels as pk
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    g = gt.CsrGraph.read_binary(os.path.join(cache, "rmat_n20_e32.csr.npz"))
    K = int(os.environ.get("Q5_K", "32"))
    dg = gt.to_device(g, with_edge_values=True, with_blocked_csc=True,
                      with_blocked_values=True, blocked_groups=K,
                      blocked_cache=os.path.join(
                          cache, f"rmat_n20_e32.blockedv{K}.npz"))
    rpg_v = dg.bcsc_rows_per_group * 32
    vals = jnp.ones((dg.v_pad,), jnp.float32)
    table = pk.pad_values_table(vals, K, dg.bcsc_rows_per_group, 0.0)
    src2d = dg.bcsc_src.reshape(-1, 128)
    dst2d = dg.bcsc_dst.reshape(-1, 128)
    w2d = jnp.zeros_like(src2d, dtype=jnp.float32)
    print(f"K={K} rpg_v={rpg_v} edges'={src2d.size} "
          f"blocks={src2d.shape[0]//dg.bcsc_block_rows} "
          f"samples={dg.bcsc_vsample_pos.shape[0]/1e6:.1f}M")
    f_scan = jax.jit(functools.partial(
        pk._blocked_value_2d, rpg_v=rpg_v, op="sum", wmode="none",
        block_rows=dg.bcsc_block_rows, interpret=False))
    ms = timeit(f_scan, table, src2d, dst2d, w2d, dg.bcsc_group_of_block)
    print(f"scan kernel: {ms:7.2f} ms")
    scan = f_scan(table, src2d, dst2d, w2d,
                  dg.bcsc_group_of_block).reshape(-1)
    f_samp = jax.jit(lambda s: pk.sample_sorted(s, dg.bcsc_vsample_pos))
    print(f"sample: {timeit(f_samp, scan):7.2f} ms")
    f_full = jax.jit(lambda v: pk.pull_vertex_reduce(v, dg, op="sum"))
    print(f"full pull_vertex_reduce: {timeit(f_full, vals):7.2f} ms")


if __name__ == "__main__":
    for q in sys.argv[1:] or ["q1", "q2", "q3"]:
        globals()[q]()


def q6():
    """Small-slab sublane take_along_axis: can Mosaic lower
    take_along_axis(slab_(8|16|32)x128, idx, axis=0) cheaply? If yes the
    value-kernel gather loop drops from 3 ops/row to ~4 ops/slab."""
    import jax, functools
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    N = 1 << 23
    BLOCK = 512

    def timeit2(f, *args, n=5):
        g = jax.jit(lambda *a: f(*a).reshape(-1)[:1])
        float(np.asarray(g(*args))[0])
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            float(np.asarray(g(*args))[0])
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    rng = np.random.default_rng(0)
    for R in (8, 16, 32):
        table = jnp.asarray(rng.standard_normal((R, 128)).astype(np.float32))
        # full (row, lane) gather emulation: idx rows in [0,R), lanes free
        rows = jnp.asarray(rng.integers(0, R, (N // 128, 128)).astype(np.int32))
        lanes = jnp.asarray(rng.integers(0, 128, (N // 128, 128)).astype(np.int32))

        def k_ta(t_ref, r_ref, l_ref, o_ref):
            lv = jnp.take_along_axis(
                jnp.broadcast_to(t_ref[...], (R, 128)), l_ref[...][:R], axis=1)
            # first lane-gather per slab row is wrong shape-wise for B>R;
            # simplest honest formulation: out[b,l] = t[r[b,l], l_gathered]
            # do in two steps: rowsel = TA(t, r, axis=0) then lane TA.
            rowv = jnp.take_along_axis(t_ref[...], r_ref[...], axis=0)
            o_ref[...] = jnp.take_along_axis(rowv, l_ref[...], axis=1)

        def k_loop(t_ref, r_ref, l_ref, o_ref):
            rr = r_ref[...]
            ll = l_ref[...]
            shape = rr.shape
            acc = jnp.zeros(shape, jnp.float32)
            for u in range(R):
                rowv = jnp.broadcast_to(t_ref[u:u+1, :], shape)
                rowc = jnp.take_along_axis(rowv, ll, axis=1)
                acc = jnp.where(rr == u, rowc, acc)
            o_ref[...] = acc

        for name, k in (("ta-axis0", k_ta), ("row-loop", k_loop)):
            try:
                f = pl.pallas_call(
                    k,
                    grid=(N // 128 // BLOCK,),
                    in_specs=[pl.BlockSpec((R, 128), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                              pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                              pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((BLOCK, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((N // 128, 128),
                                                   jnp.float32),
                )
                ms = timeit2(f, table, rows, lanes)
                # correctness
                out = np.asarray(f(table, rows, lanes))[:64]
                tn, rn, ln = (np.asarray(x) for x in (table, rows, lanes))
                ok = np.allclose(out, tn[rn[:64], ln[:64]])
                print(f"R={R:3d} {name}: {ms:7.2f} ms ok={ok}")
            except Exception as e:
                print(f"R={R:3d} {name}: FAILED {str(e)[:160]}")
