"""Isolate pallas grid overhead vs take_along_axis cost; find the right
chunk size."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 23
W = 256

rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 1 << 30, (W, 128)).astype(np.int32))
idx2d = jnp.asarray(rng.integers(0, W * 128, N).astype(np.int32)).reshape(
    N // 128, 128)


def timeit(f, *args, n=3):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        s = f(*args)
        float(np.asarray(s.reshape(-1)[:1][0]))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def make(kernel, chunk_rows):
    return pl.pallas_call(
        kernel,
        grid=(N // 128 // chunk_rows,),
        in_specs=[pl.BlockSpec((W, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk_rows, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk_rows, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
    )


def k_copy(t_ref, i_ref, o_ref):
    o_ref[...] = i_ref[...] * 2


def k_lane_ta(t_ref, i_ref, o_ref):
    ii = i_ref[...] & 127
    row = jnp.broadcast_to(t_ref[0:1, :], ii.shape)
    o_ref[...] = jnp.take_along_axis(row, ii, axis=1)


def k_sub_ta(t_ref, i_ref, o_ref):
    ii = i_ref[...] & 7
    # gather among 8 sublanes, block-shaped
    sub = t_ref[0:8, :]
    r = ii.shape[0] // 8
    src = jnp.tile(sub, (r, 1))
    o_ref[...] = jnp.take_along_axis(src, ii, axis=0)


def k_full(t_ref, i_ref, o_ref):
    """Full (r,c) gather: row-select via 8-sublane tiles + lane TA."""
    ii = i_ref[...]
    r = ii >> 7
    c = ii & 127
    shape = ii.shape
    acc = jnp.zeros(shape, jnp.int32)
    # W rows = W//8 vreg groups of 8 sublanes
    for g in range(W // 8):
        sub = t_ref[g * 8:(g + 1) * 8, :]               # (8,128)
        src = jnp.tile(sub, (shape[0] // 8, 1))          # (chunk,128)
        picked = jnp.take_along_axis(src, r & 7, axis=0)  # sublane sel
        acc = jnp.where((r >> 3) == g, picked, acc)
    o_ref[...] = jnp.take_along_axis(acc, c, axis=1)


for chunk in (64, 512, 4096):
    f = make(k_copy, chunk)
    print(f"copy chunk={chunk*128:>7}: {timeit(f, table, idx2d):9.2f} ms",
          flush=True)

for chunk in (64, 512, 4096):
    f = make(k_lane_ta, chunk)
    print(f"laneTA chunk={chunk*128:>7}: {timeit(f, table, idx2d):9.2f} ms",
          flush=True)

for chunk in (64, 512):
    f = make(k_sub_ta, chunk)
    print(f"subTA chunk={chunk*128:>7}: {timeit(f, table, idx2d):9.2f} ms",
          flush=True)

for chunk in (64, 512):
    f = make(k_full, chunk)
    ms = timeit(f, table, idx2d)
    out = np.asarray(f(table, idx2d)).reshape(-1)
    ref = np.asarray(table).reshape(-1)[np.asarray(idx2d).reshape(-1)]
    print(f"FULL gather chunk={chunk*128:>7}: {ms:9.2f} ms "
          f"correct={np.array_equal(out, ref)}", flush=True)
