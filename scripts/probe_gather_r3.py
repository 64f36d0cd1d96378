"""Probe: does Mosaic (jax 0.9) lower a real dynamic gather in-kernel?

Compares candidate VMEM-table gather formulations against the 3-op row
loop that all round-2 kernels use. If any compiles and beats the loop,
every kernel in ops/pallas_kernels.py gets faster.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
R = 256               # table rows (f32 -> 32K values, 128KB)
BR = 512              # block rows
M = 8192              # total index rows  (M*128 = 1M gathers)


def timeit(f, *args, n=5):
    g = jax.jit(lambda *a: jax.tree_util.tree_leaves(f(*a))[0].reshape(-1)[:1])
    np.asarray(g(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def call(kernel, tab, idx):
    return pl.pallas_call(
        kernel,
        grid=(M // BR,),
        in_specs=[pl.BlockSpec((R, LANE), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BR, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, LANE), jnp.float32),
    )(tab, idx)


def k_rowloop(t_ref, i_ref, o_ref):
    ii = i_ref[...]
    row = jax.lax.shift_right_logical(ii, 7)
    lane_i = ii & (LANE - 1)
    shape = ii.shape

    def body(g, acc):
        slab = t_ref[pl.ds(g * 8, 8), :]
        for u in range(8):
            rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
            rowc = jnp.take_along_axis(rowv, lane_i, axis=1)
            acc = jnp.where(row == g * 8 + u, rowc, acc)
        return acc

    o_ref[...] = jax.lax.fori_loop(0, R // 8, body,
                                   jnp.zeros(shape, jnp.float32))


def k_taa0(t_ref, i_ref, o_ref):
    # take_along_axis over axis 0 after lane-gathering? direct: gather
    # full fancy: out[i,j] = t[row[i,j], lane[i,j]]
    ii = i_ref[...]
    row = jax.lax.shift_right_logical(ii, 7)
    lane_i = ii & (LANE - 1)
    t = t_ref[...]
    # two-step: first gather rows with take_along_axis axis=0 needs
    # identical lane -> use full 2D advanced indexing
    o_ref[...] = t[row, lane_i]


def k_take_flat(t_ref, i_ref, o_ref):
    ii = i_ref[...]
    t = t_ref[...].reshape(-1)
    o_ref[...] = jnp.take(t, ii)


def k_onehot_mxu(t_ref, i_ref, o_ref):
    # MXU row-select: one-hot(row) @ table -> per-element row, then
    # lane-gather. Cost: BR*128 x R x 128 matmul per block.
    ii = i_ref[...]
    row = jax.lax.shift_right_logical(ii, 7)
    lane_i = ii & (LANE - 1)
    t = t_ref[...]
    # process in (8,128) sub-tiles to bound the one-hot size
    def body(g, acc):
        rows_g = jax.lax.dynamic_slice(row, (g * 8, 0), (8, LANE))
        oh = (rows_g.reshape(8 * LANE, 1) ==
              jax.lax.broadcasted_iota(jnp.int32, (8 * LANE, R), 1)
              ).astype(jnp.float32)
        sel = jnp.dot(oh, t, preferred_element_type=jnp.float32)
        sel = sel.reshape(8, LANE, LANE)
        lg = jax.lax.dynamic_slice(lane_i, (g * 8, 0), (8, LANE))
        val = jnp.take_along_axis(sel, lg[:, :, None], axis=2)[:, :, 0]
        return jax.lax.dynamic_update_slice(acc, val, (g * 8, 0))
    o_ref[...] = jax.lax.fori_loop(0, BR // 8, body,
                                   jnp.zeros(ii.shape, jnp.float32))


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.random((R, LANE)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R * LANE, (M, LANE)).astype(np.int32))
    want = np.asarray(tab).reshape(-1)[np.asarray(idx)]

    for name, k in [("rowloop", k_rowloop), ("fancy2d", k_taa0),
                    ("take_flat", k_take_flat), ("onehot_mxu", k_onehot_mxu)]:
        try:
            out = np.asarray(call(k, tab, idx))
            ok = np.array_equal(out, want)
            ms = timeit(call, k, tab, idx)
            print(f"{name:12s}: {ms:8.3f} ms  ok={ok}  "
                  f"({ms*1e6/(M*LANE):5.2f} ns/elem)", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:140]
            print(f"{name:12s}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
