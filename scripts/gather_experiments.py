"""Find the fastest random-gather formulation on TPU.

The naive labels[idx] (60M random scalars from a 4MB VMEM-sized table)
measured 484ms = 1 GB/s. Candidates to beat it, all XLA-expressible:

  A. scalar gather baselines (f32 / int8 table; 1D vs 2D idx shape)
  B. row-gather: table reshaped (V/128, 128); gather whole 128-lane rows
     then select the lane via one-hot dot or take_along_axis
  C. one-hot matmul gather (bf16 MXU)
  D. sorted-index gather (upper bound / locality sensitivity)
  E. cumsum + boundary-gather segment_sum vs jax.ops.segment_sum
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V = 1 << 20
N = 1 << 25  # 33.5M probes (scale down from 60M for faster sweep)


def timeit(fn, *args, n=3):
    jax.block_until_ready(jax.jit(fn)(*args))
    best = float("inf")
    f = jax.jit(fn)
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    idx_sorted = jnp.sort(idx)
    table_f32 = jnp.asarray(rng.random(V).astype(np.float32))
    table_i8 = jnp.asarray(rng.integers(0, 2, V).astype(np.int8))
    table_i32 = jnp.asarray(rng.integers(0, 100, V).astype(np.int32))

    print(f"V={V} N={N} dev={jax.devices()[0].device_kind}", flush=True)

    ms = timeit(lambda t, i: t[i].sum(), table_f32, idx)
    print(f"A1 scalar gather f32 1D idx:      {ms:9.2f} ms", flush=True)

    ms = timeit(lambda t, i: t[i].sum(), table_i8, idx)
    print(f"A2 scalar gather int8:            {ms:9.2f} ms", flush=True)

    idx2d = idx.reshape(-1, 128)
    ms = timeit(lambda t, i: t[i].sum(), table_f32, idx2d)
    print(f"A3 scalar gather f32 2D idx:      {ms:9.2f} ms", flush=True)

    # B: row gather + lane select
    t2d = table_f32.reshape(-1, 128)          # (8192, 128)
    def row_gather(t, i):
        rows = t[i >> 7]                      # (N, 128) row gather
        lane = (i & 127)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], 128), 1)
               == lane[:, None])
        return jnp.sum(jnp.where(sel, rows, 0), axis=1).sum()
    ms = timeit(row_gather, t2d, idx)
    print(f"B1 row-gather f32 + onehot sel:   {ms:9.2f} ms", flush=True)

    t2d8 = table_i8.reshape(-1, 128)
    def row_gather8(t, i):
        rows = t[i >> 7]
        lane = (i & 127)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], 128), 1)
               == lane[:, None])
        return jnp.sum(jnp.where(sel, rows, 0).astype(jnp.int32), axis=1).sum()
    ms = timeit(row_gather8, t2d8, idx)
    print(f"B2 row-gather int8 + onehot sel:  {ms:9.2f} ms", flush=True)

    def row_gather_ta(t, i):
        rows = t[i >> 7]
        return jnp.take_along_axis(rows, (i & 127)[:, None], axis=1).sum()
    ms = timeit(row_gather_ta, t2d, idx)
    print(f"B3 row-gather f32 + take_along:   {ms:9.2f} ms", flush=True)

    # B4: bit-packed table (V bits in (V/32/128, 128) uint32 rows)
    packed = np.zeros(V // 32, np.uint32)
    bits = np.asarray(table_i8)
    on = np.nonzero(bits)[0]
    np.bitwise_or.at(packed, on >> 5, (np.uint32(1) << (on & 31)))
    p2d = jnp.asarray(packed.reshape(-1, 128))  # (256,128) uint32 = 128KB
    def bit_gather(t, i):
        word_row = i >> 12                     # (i>>5) >> 7
        rows = t[word_row]                     # (N,128) uint32
        lane = (i >> 5) & 127
        sel = (jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], 128), 1)
               == lane[:, None])
        word = jnp.sum(jnp.where(sel, rows, 0), axis=1,
                       dtype=jnp.uint32)
        return ((word >> (i.astype(jnp.uint32) & 31)) & 1).sum()
    ms = timeit(bit_gather, p2d, idx)
    print(f"B4 bit-packed row-gather:         {ms:9.2f} ms", flush=True)

    # C: one-hot matmul gather over bit table (256 x 128 bf16 planes)
    def onehot_mm(t, i):
        # t: (256,128) bf16 0/1 plane of packed words won't work for
        # exactness of uint32; use the unpacked bf16 bitmask as (8192,128).
        N_ = i.shape[0]
        ch = 512
        tm = t  # (8192,128) bf16
        def body(c, acc):
            s = c * ch
            ii = jax.lax.dynamic_slice(i, (s,), (ch,))
            oh = (jax.lax.broadcasted_iota(jnp.int32, (ch, 8192), 1)
                  == (ii >> 7)[:, None]).astype(jnp.bfloat16)
            rows = jnp.dot(oh, tm, preferred_element_type=jnp.float32)
            lane = (ii & 127)
            sel = (jax.lax.broadcasted_iota(jnp.int32, (ch, 128), 1)
                   == lane[:, None])
            return acc + jnp.sum(jnp.where(sel, rows, 0))
        return jax.lax.fori_loop(0, N_ // ch, body, jnp.float32(0))
    tbf = table_i8.astype(jnp.bfloat16).reshape(-1, 128)
    ms = timeit(onehot_mm, tbf, idx[: 1 << 22])  # smaller N, extrapolate
    print(f"C1 one-hot MXU gather (N=4M):     {ms:9.2f} ms "
          f"(x8 => {ms*8:9.2f})", flush=True)

    ms = timeit(lambda t, i: t[i].sum(), table_f32, idx_sorted)
    print(f"D1 sorted-idx scalar gather:      {ms:9.2f} ms", flush=True)

    t2 = timeit(row_gather, t2d, idx_sorted)
    print(f"D2 sorted-idx row-gather:         {t2:9.2f} ms", flush=True)

    # E: segmented sum over sorted segments, two ways
    seg = jnp.sort(idx)  # sorted segment ids (like csc_edge_dst)
    vals = jnp.ones((N,), jnp.float32)
    ms = timeit(lambda v: jax.ops.segment_sum(v, seg, V,
                                              indices_are_sorted=True).sum(),
                vals)
    print(f"E1 segment_sum sorted:            {ms:9.2f} ms", flush=True)

    # boundary trick: cumsum + take at row starts
    starts = jnp.searchsorted(seg, jnp.arange(V, dtype=jnp.int32)).astype(jnp.int32)
    def seg_cumsum(v):
        c = jnp.cumsum(v)
        zero = jnp.zeros((1,), v.dtype)
        cpad = jnp.concatenate([zero, c])
        ends = jnp.concatenate([starts[1:], jnp.array([N], jnp.int32)])
        return (cpad[ends] - cpad[starts]).sum()
    ms = timeit(seg_cumsum, vals)
    print(f"E2 cumsum+boundary segsum:        {ms:9.2f} ms", flush=True)

    ms = timeit(lambda v: jnp.cumsum(v).sum(), vals)
    print(f"E3 raw cumsum (N):                {ms:9.2f} ms", flush=True)

    ms = timeit(lambda t: t[starts].sum(), jnp.cumsum(vals))
    print(f"E4 sorted V-gather from E array:  {ms:9.2f} ms", flush=True)

    # F: scatter variants at V scale (1M lanes)
    vidx = jnp.asarray(rng.integers(0, V, V).astype(np.int32))
    vvals = jnp.ones((V,), jnp.float32)
    ms = timeit(lambda i, v: jnp.zeros((V,), jnp.float32).at[i].add(v).sum(),
                vidx, vvals)
    print(f"F1 scatter-add V->V:              {ms:9.2f} ms", flush=True)
    ms = timeit(lambda i, v: jnp.zeros((V,), jnp.float32).at[i].max(v).sum(),
                vidx, vvals)
    print(f"F2 scatter-max V->V:              {ms:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
