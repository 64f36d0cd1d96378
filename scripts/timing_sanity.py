"""Verify timing fidelity on the axon runtime: chained dependent ops
must scale linearly if timing is honest."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

V = 1 << 20
N = 1 << 25
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
tf = jnp.asarray(rng.random(V).astype(np.float32))


def timeit(f, *args, n=3, sync="block"):
    r = f(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        if sync == "np":
            np.asarray(r)
        else:
            jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def chain(k):
    @jax.jit
    def f(t, i):
        acc = jnp.float32(0)
        ii = i
        for _ in range(k):
            x = t[ii]
            s = x.sum()
            acc = acc + s
            # dependent next index: forces serialization
            ii = (ii + s.astype(jnp.int32) % 7 + 1) % V
        return acc
    return f


for k in (1, 2, 4, 8):
    ms_b = timeit(chain(k), tf, idx, sync="block")
    ms_n = timeit(chain(k), tf, idx, sync="np")
    print(f"gather chain k={k}: block={ms_b:8.2f} ms  np={ms_n:8.2f} ms",
          flush=True)

# manual binary search (row_probe style): 20 dependent gather rounds
def manual_ss(ends, q):
    lo = jnp.zeros_like(q)
    hi = jnp.full_like(q, V)
    def body(_, c):
        lo, hi = c
        mid = (lo + hi) // 2
        v = ends[jnp.minimum(mid, V - 1)]
        gr = v <= q
        return jnp.where(gr, mid + 1, lo), jnp.where(gr, hi, mid)
    lo, hi = jax.lax.fori_loop(0, 20, body, (lo, hi))
    return lo

ends = jnp.cumsum(jnp.full((V,), 32, jnp.int32))
q = jnp.asarray(rng.integers(0, 32 * V, N).astype(jnp.int32))
f = jax.jit(manual_ss)
ms = timeit(f, ends, q, sync="np")
# correctness vs np.searchsorted
out = np.asarray(f(ends, q)[:1000])
ref = np.searchsorted(np.asarray(ends), np.asarray(q[:1000]), side="right")
print(f"manual searchsorted 20 rounds: {ms:8.2f} ms  correct={np.array_equal(out, ref)}", flush=True)

# scatter-set small (push-mode scale): 4096 and 64K lanes into V table
for n_lanes in (4096, 1 << 16, 1 << 20):
    si = jnp.asarray(rng.integers(0, V, n_lanes).astype(np.int32))
    sv = jnp.ones((n_lanes,), jnp.int32)
    f = jax.jit(lambda i, v: jnp.zeros((V,), jnp.int32).at[i].set(v))
    ms = timeit(f, si, sv, sync="np")
    print(f"scatter-set {n_lanes:>8} lanes -> V: {ms:8.2f} ms", flush=True)

# segment_sum E->V again with np sync
vals = jnp.ones((N,), jnp.float32)
seg = jnp.sort(idx)
f = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, V, indices_are_sorted=True))
ms = timeit(f, vals, seg, sync="np")
print(f"segment_sum sorted (np sync): {ms:8.2f} ms", flush=True)

# cumsum with np sync
f = jax.jit(lambda v: jnp.cumsum(v))
ms = timeit(f, vals, sync="np")
print(f"cumsum E (np sync): {ms:8.2f} ms", flush=True)

# trivial elementwise op same size (overhead baseline)
f = jax.jit(lambda v: v * 2.0)
ms = timeit(f, vals, sync="np")
print(f"elementwise x2 E (np sync): {ms:8.2f} ms", flush=True)

f = jax.jit(lambda v: v * 2.0)
ms = timeit(f, tf, sync="np")
print(f"elementwise x2 V (np sync): {ms:8.2f} ms", flush=True)
