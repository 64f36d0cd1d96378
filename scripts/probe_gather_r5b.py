"""In-kernel gather strategy A/B (round 5, session 2).

The pull2 ablation decomposed the 102.7 ms full pass into gather ~43 ms
/ extract ~30 ms / base ~30 ms. Hypothesis: the per-ROW
``take_along_axis`` (8 per slab) is ~8 VPU ops each; a binary row-select
tree (7 ``where``s keyed on vrow bits + ONE take per slab) should cut
the gather ~3-4x, and the same restructuring applies to the extract's
32-row visit loop.

Variants, each a (nblocks,) pallas grid doing ONLY the gather at
pull2 scale (block_rows=512, rpg_v=128 rows = 16384-vertex groups):

  rowloop   per slab-row: broadcast + take_along_axis + where   (current)
  bintree8  per 8-row slab: 8 bcast + 7 where + 1 take + acc-where
  bintree16 per 16 rows: 16 bcast + 15 where + 1 take + acc-where
  flat128   no fori: full 127-where tree over all 128 rows + 1 take
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
BR = 512          # block_rows
RPG = 128         # table rows per group
NBLOCKS = 1172


def _rowloop(t_ref, src, shape):
    vrow = jax.lax.shift_right_logical(src, 7)
    vlane = src & (LANE - 1)

    def body(gg, acc):
        slab = t_ref[pl.ds(gg * 8, 8), :]
        for u in range(8):
            rowv = jnp.broadcast_to(slab[u:u + 1, :], shape)
            rowc = jnp.take_along_axis(rowv, vlane, axis=1)
            acc = jnp.where(vrow == gg * 8 + u, rowc, acc)
        return acc
    return jax.lax.fori_loop(0, RPG // 8, body,
                             jnp.zeros(shape, jnp.float32))


def _bintree(t_ref, src, shape, span):
    """span rows selected per fori step with a log2(span) where-tree,
    then ONE take_along_axis."""
    vrow = jax.lax.shift_right_logical(src, 7)
    vlane = src & (LANE - 1)

    def body(gg, acc):
        slab = t_ref[pl.ds(gg * span, span), :]
        rows = [jnp.broadcast_to(slab[u:u + 1, :], shape)
                for u in range(span)]
        level = 0
        cur = rows
        while len(cur) > 1:
            bit = (vrow >> level) & 1
            cur = [jnp.where(bit == 1, cur[i + 1], cur[i])
                   for i in range(0, len(cur), 2)]
            level += 1
        rowc = jnp.take_along_axis(cur[0], vlane, axis=1)
        return jnp.where(jax.lax.shift_right_logical(
            vrow, level) == gg, rowc, acc)
    return jax.lax.fori_loop(0, RPG // span, body,
                             jnp.zeros(shape, jnp.float32))


def make_kernel(variant):
    def kernel(src_ref, t_ref, o_ref):
        src = src_ref[...]
        shape = src.shape
        if variant == "rowloop":
            val = _rowloop(t_ref, src, shape)
        elif variant == "bintree8":
            val = _bintree(t_ref, src, shape, 8)
        elif variant == "bintree16":
            val = _bintree(t_ref, src, shape, 16)
        elif variant == "flat128":
            val = _bintree(t_ref, src, shape, 128)
        o_ref[...] = jnp.broadcast_to(
            jnp.sum(val, axis=0, keepdims=True)[:, :], (8, LANE))
    return kernel


REPS = 4  # 2D grid amortizes the ~20-30 ms per-dispatch tunnel floor


@functools.partial(jax.jit, static_argnames=("variant",))
def run(src2d, table, *, variant):
    kern = make_kernel(variant)
    return pl.pallas_call(
        lambda s, t, o: kern(s, t, o),
        grid=(REPS, NBLOCKS),
        in_specs=[
            pl.BlockSpec((BR, LANE), lambda r, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RPG, LANE), lambda r, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda r, k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
    )(src2d, table)


def fence(x):
    np.asarray(np.asarray(x).reshape(-1)[:1])
    return x


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, RPG * LANE,
                                   (NBLOCKS * BR, LANE)).astype(np.int32))
    table = jnp.asarray(rng.random((RPG, LANE)).astype(np.float32))
    ref = None
    for v in ("rowloop", "bintree8", "bintree16", "flat128"):
        out = run(src, table, variant=v)
        fence(out)
        if ref is None:
            ref = np.asarray(out)
        else:
            ok = bool(np.allclose(ref, np.asarray(out), rtol=1e-5))
            if not ok:
                print(json.dumps({"variant": v, "MISMATCH": True}))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            fence(run(src, table, variant=v))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": v,
                          "ms_per_pass": round(best * 1e3 / REPS, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
