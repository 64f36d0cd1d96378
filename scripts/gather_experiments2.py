"""Clean re-measurement: all operands passed as jit arguments, outputs
materialized (not just summed), chunked variants avoid OOM."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V = 1 << 20
N = 1 << 25


def timeit(f, *args, n=5):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    tf = jnp.asarray(rng.random(V).astype(np.float32))
    ti = jnp.asarray(rng.integers(0, 100, V).astype(np.int32))
    print(f"V={V} N={N} dev={jax.devices()[0].device_kind}", flush=True)

    f = jax.jit(lambda t, i: t[i])
    ms = timeit(f, tf, idx)
    print(f"gather f32 -> full (N,) out:    {ms:9.2f} ms "
          f"({(N*8)/ms/1e6:.0f} GB/s)", flush=True)

    f = jax.jit(lambda t, i: t[i])
    ms = timeit(f, ti, idx)
    print(f"gather i32 -> full out:         {ms:9.2f} ms", flush=True)

    f = jax.jit(lambda t, i: t[i].sum())
    ms = timeit(f, tf, idx)
    print(f"gather f32 -> sum:              {ms:9.2f} ms", flush=True)

    # verify correctness of a timed run (ensure it really executes)
    out = jax.jit(lambda t, i: t[i])(tf, idx)
    ref = np.asarray(tf)[np.asarray(idx[:1000])]
    assert np.allclose(np.asarray(out[:1000]), ref), "gather wrong!"
    print("gather correctness: OK", flush=True)

    # scatter / segment variants, args-passed
    vals = jnp.ones((N,), jnp.float32)
    seg_sorted = jnp.sort(idx)
    f = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, V,
                                                 indices_are_sorted=True))
    ms = timeit(f, vals, seg_sorted)
    print(f"segment_sum sorted E->V:        {ms:9.2f} ms", flush=True)

    f = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, V))
    ms = timeit(f, vals, idx)
    print(f"segment_sum random E->V:        {ms:9.2f} ms", flush=True)

    f = jax.jit(lambda v, s: jax.ops.segment_max(v, s, V,
                                                 indices_are_sorted=True))
    ms = timeit(f, vals, seg_sorted)
    print(f"segment_max sorted E->V:        {ms:9.2f} ms", flush=True)

    f = jax.jit(lambda v, s: jnp.zeros((V,), jnp.float32).at[s].add(v))
    ms = timeit(f, vals, idx)
    print(f"scatter-add random E->V:        {ms:9.2f} ms", flush=True)

    f = jax.jit(lambda v, s: jnp.zeros((V,), jnp.float32).at[s].max(v))
    ms = timeit(f, vals, idx)
    print(f"scatter-max random E->V:        {ms:9.2f} ms", flush=True)

    f = jax.jit(lambda v: jnp.cumsum(v))
    ms = timeit(f, vals)
    print(f"cumsum E f32:                   {ms:9.2f} ms", flush=True)

    vi = jnp.ones((N,), jnp.int32)
    f = jax.jit(lambda v: jnp.cumsum(v))
    ms = timeit(f, vi)
    print(f"cumsum E i32:                   {ms:9.2f} ms", flush=True)

    # searchsorted: V ends, N queries (merge-path rank search)
    ends = jnp.cumsum(jnp.full((V,), 32, jnp.int32))
    q = jnp.arange(N, dtype=jnp.int32)
    f = jax.jit(lambda e, j: jnp.searchsorted(e, j, side="right"))
    ms = timeit(f, ends, q)
    print(f"searchsorted V x N:             {ms:9.2f} ms", flush=True)

    # sort of E int32 (for sort-based alternatives)
    f = jax.jit(lambda x: jnp.sort(x))
    ms = timeit(f, idx)
    print(f"sort E i32:                     {ms:9.2f} ms", flush=True)

    # V-scale ops for comparison
    vidx = jnp.asarray(rng.integers(0, V, V).astype(np.int32))
    vv = jnp.ones((V,), jnp.float32)
    f = jax.jit(lambda i, v: jnp.zeros((V,), jnp.float32).at[i].max(v))
    ms = timeit(f, vidx, vv)
    print(f"scatter-max V->V:               {ms:9.2f} ms", flush=True)

    f = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
    ms = timeit(f, vv > 0)
    print(f"cumsum V (compact core):        {ms:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
