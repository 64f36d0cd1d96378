"""HBM stream bandwidth probe (round 5, session 2).

The pull2 base cost (~30 ms for ~1.3 GB of stream reads) implies
~43 GB/s effective read bandwidth — 5% of v5e's 819 GB/s spec. Is that
the pipeline's DMA tiling or the platform? Measure pure streaming in a
pallas grid at several tile sizes, read-only, write-only, and
read+write, loop-amortized inside one program.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NROWS = 262144          # 128 MB f32 stream


def fence(x):
    np.asarray(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1])
    return x


@functools.partial(jax.jit, static_argnames=("tr", "mode", "repeat"))
def run(big, *, tr, mode, repeat):
    nsteps = NROWS // tr

    def read_kernel(i_ref, o_ref):
        x = i_ref[...]
        o_ref[...] = jnp.broadcast_to(x[0:8, :], (8, LANE))

    def write_kernel(o_ref):
        o_ref[...] = jnp.full((tr, LANE), 1.0, jnp.float32)

    def rw_kernel(i_ref, o_ref):
        o_ref[...] = i_ref[...] + 1.0

    def one(x):
        if mode == "read":
            return pl.pallas_call(
                read_kernel, grid=(nsteps,),
                in_specs=[pl.BlockSpec((tr, LANE), lambda k: (k, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, LANE), lambda k: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32))(x)
        if mode == "write":
            return pl.pallas_call(
                write_kernel, grid=(nsteps,),
                out_specs=pl.BlockSpec((tr, LANE), lambda k: (k, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((NROWS, LANE),
                                               jnp.float32))()
        return pl.pallas_call(
            rw_kernel, grid=(nsteps,),
            in_specs=[pl.BlockSpec((tr, LANE), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tr, LANE), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NROWS, LANE), jnp.float32))(x)

    def body(c):
        i, acc = c
        out = one(big)
        # fold a scalar so the loop can't be elided
        return i + 1, acc + out.reshape(-1)[0]

    return jax.lax.while_loop(lambda c: c[0] < repeat, body,
                              (jnp.int32(0), jnp.float32(0)))[1]


def main():
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.random((NROWS, LANE)).astype(np.float32))
    gb = NROWS * LANE * 4 / 1e9
    for mode in ("read", "write", "rw"):
        for tr in (512, 2048, 8192):
            rep = 8
            fence(run(big, tr=tr, mode=mode, repeat=rep))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(big, tr=tr, mode=mode, repeat=rep))
                best = min(best, time.perf_counter() - t0)
            ms = best * 1e3 / rep
            bw = gb / (ms / 1e3) * (2 if mode == "rw" else 1)
            print(json.dumps({"mode": mode, "tile_rows": tr,
                              "ms": round(ms, 2),
                              "GBps": round(bw, 1)}), flush=True)


if __name__ == "__main__":
    main()
