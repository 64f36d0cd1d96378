"""Tuning experiments: kernel unroll/block sweep + boundary gather paths."""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = 1 << 20
N = 1 << 26
LANE = 128
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
mask = jnp.asarray(rng.integers(0, 2, V).astype(np.int32))

from gunrock_tpu.ops.pallas_kernels import pack_bitmask, bitmask_gather
words = pack_bitmask(mask)
R = words.shape[0]


def timeit(f, *args, n=3):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        s = f(*args)
        float(np.asarray(s.reshape(-1)[:1][0]))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


# current kernel at different block sizes
for br in (256, 512, 1024, 2048):
    f = jax.jit(functools.partial(bitmask_gather, block_rows=br))
    print(f"gather block_rows={br:>5}: {timeit(f, words, idx):8.2f} ms",
          flush=True)


# unrolled-by-U variant
def make_unrolled(U, block_rows):
    def kern(t_ref, i_ref, o_ref):
        ii = i_ref[...]
        wid = jax.lax.shift_right_logical(ii, 5)
        wrow = jax.lax.shift_right_logical(wid, 7)
        wlane = wid & (LANE - 1)
        bit = ii & 31
        shape = ii.shape

        def body(g, acc):
            for u in range(U):
                r = g * U + u
                rowv = jnp.broadcast_to(t_ref[pl.ds(r, 1), :], shape)
                rowc = jnp.take_along_axis(rowv, wlane, axis=1)
                acc = jnp.where(wrow == r, rowc, acc)
            return acc

        acc = jax.lax.fori_loop(0, R // U, body,
                                jnp.zeros(shape, jnp.int32))
        o_ref[...] = jax.lax.shift_right_logical(acc, bit) & 1

    m = N // 128
    return pl.pallas_call(
        kern,
        grid=(m // block_rows,),
        in_specs=[pl.BlockSpec((R, LANE), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block_rows, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, LANE), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, LANE), jnp.int32),
    )


for U in (4, 8, 16):
    for br in (512,):
        f = jax.jit(lambda i, U=U, br=br: make_unrolled(U, br)(
            words, i.reshape(-1, 128)).reshape(-1))
        ms = timeit(f, idx)
        out = np.asarray(f(idx[:1 << 20]))[:1000] if False else None
        print(f"gather unroll={U} br={br}: {ms:8.2f} ms", flush=True)

# correctness of unroll=8
f = jax.jit(lambda i: make_unrolled(8, 512)(words, i.reshape(-1, 128))
            .reshape(-1))
small = idx[: 1 << 20]
outp = np.asarray(jax.jit(lambda i: bitmask_gather(words, i))(small))
outu = np.asarray(f(idx))[: 1 << 20]
print("unroll8 correct:", np.array_equal(outp, outu), flush=True)

# boundary gathers: 1M sorted positions from a 64M int32 array
run = jnp.cumsum(jnp.ones((N,), jnp.int32))
ends = jnp.sort(jnp.asarray(rng.integers(0, N, V).astype(np.int32)))
f1 = jax.jit(lambda r, e: r[e])
print(f"boundary gather x[idx]:          {timeit(f1, run, ends):8.2f} ms",
      flush=True)
f2 = jax.jit(lambda r, e: jnp.take(r, e, indices_are_sorted=True))
print(f"boundary take(sorted=True):      {timeit(f2, run, ends):8.2f} ms",
      flush=True)
f3 = jax.jit(lambda r, e: jnp.take(r, e, mode="clip",
                                   indices_are_sorted=True))
print(f"boundary take(clip,sorted):      {timeit(f3, run, ends):8.2f} ms",
      flush=True)
