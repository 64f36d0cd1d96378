"""Scatter/sort/scan primitive costs on the real TPU (floor-subtracted)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
import jax, jax.numpy as jnp, numpy as np
from gunrock_tpu.ops.segment import scatter_min


def timeit(f, *args, n=5):
    g = jax.jit(lambda *a: jax.tree_util.tree_leaves(f(*a))[0].reshape(-1)[:1])
    np.asarray(g(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    V = 1 << 20
    dist = jnp.asarray(rng.uniform(0, 10, V).astype(np.float32))
    floor = timeit(lambda d: d[:1] + 1, dist)
    print(f"dispatch floor: {floor:.2f} ms", flush=True)

    def segmin(d, i, v):
        flags = jnp.concatenate([jnp.ones((1,), jnp.bool_), i[1:] != i[:-1]])
        def op(a, b):
            va, fa = a; vb, fb = b
            return jnp.where(fb, vb, jnp.minimum(va, vb)), fa | fb
        sv, _ = jax.lax.associative_scan(op, (v, flags))
        return sv

    for cap in [1 << 20, 1 << 22, 1 << 23]:
        dstv = jnp.asarray(rng.integers(0, V, cap).astype(np.int32))
        cand = jnp.asarray(rng.uniform(0, 10, cap).astype(np.float32))
        sd = jnp.sort(dstv)
        cases = [
            ("scatter_min_rand", lambda d, i, v: scatter_min(d, i, v),
             dstv),
            ("scatter_min_sorted", lambda d, i, v: scatter_min(d, i, v),
             sd),
            ("sort_pairs", lambda d, i, v: jax.lax.sort((i, v), num_keys=1),
             dstv),
            ("assoc_segmin", segmin, sd),
            ("cumsum", lambda d, i, v: jnp.cumsum(v), sd),
        ]
        for name, f, idx in cases:
            ms = timeit(f, dist, idx, cand)
            print(f"  {name:20s} cap {cap>>20}M: {ms:8.2f} ms "
                  f"({(ms-floor)*1e6/cap:6.1f} ns/lane net)", flush=True)


if __name__ == "__main__":
    main()
