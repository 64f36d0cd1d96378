"""Pull-pass piece costs + pack_bitmask variants (real TPU).

All big arrays passed as explicit jit args (closure-captured device
arrays get inlined as constants and blow the remote-compile request).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gunrock_tpu as gt
from gunrock_tpu.ops import pallas_kernels as pk

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
LANE = 128


def timeit(f, *args, n=5):
    g = jax.jit(lambda *a: jax.tree_util.tree_leaves(f(*a))[0].reshape(-1)[:1])
    float(np.asarray(g(*args))[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(g(*args))[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    g = gt.CsrGraph.read_binary(os.path.join(CACHE, "rmat_n20_e32.csr.npz"))
    dg = gt.to_device(g, with_csc=True, with_blocked_csc=True,
                      blocked_cache=os.path.join(
                          CACHE, "rmat_n20_e32.blocked.npz"))
    rows = dg.bcsc_groups * dg.bcsc_rows_per_group
    labels = jnp.zeros((dg.v_pad,), jnp.int32)
    v_pad = dg.v_pad

    # -- pack variants --
    ms = timeit(lambda lab: pk.pack_bitmask(lab == 0, rows=rows), labels)
    print(f"pack current (weights-mul-sum): {ms:.2f} ms")

    def pack_matmul(lab):
        m = (lab == 0).astype(jnp.float32).reshape(-1, 32)
        w = (2.0 ** jnp.arange(32, dtype=jnp.float32))[:, None]
        words = jnp.dot(m, jnp.broadcast_to(w, (32, 8)),
                        preferred_element_type=jnp.float32)[:, 0]
        out = words.astype(jnp.int64).astype(jnp.int32)
        pad = rows * LANE - out.shape[0]
        out = jnp.concatenate([out, jnp.zeros((pad,), jnp.int32)]) if pad \
            else out
        return out.reshape(rows, LANE)
    ms = timeit(pack_matmul, labels)
    print(f"pack matmul: {ms:.2f} ms")

    def pack_transpose(lab):
        m = (lab == 0).astype(jnp.int32).reshape(-1, 32).T  # (32, nwords)
        acc = jnp.zeros((m.shape[1],), jnp.int32)
        for b in range(32):
            acc = acc | (m[b] << b)
        pad = rows * LANE - acc.shape[0]
        acc = jnp.concatenate([acc, jnp.zeros((pad,), jnp.int32)]) if pad \
            else acc
        return acc.reshape(rows, LANE)
    ms = timeit(pack_transpose, labels)
    print(f"pack transpose-or: {ms:.2f} ms")

    # reference check
    a = np.asarray(pk.pack_bitmask(labels == 0, rows=rows))
    for name, fn in (("matmul", pack_matmul), ("transpose", pack_transpose)):
        b = np.asarray(jax.jit(fn)(labels))
        print(f"  {name} correct: {np.array_equal(a, b)}")

    # -- mask build itself --
    ms = timeit(lambda lab: (lab == 0).astype(jnp.int32), labels)
    print(f"mask build: {ms:.2f} ms")

    # -- scan kernel (explicit args) --
    src2d = dg.bcsc_src.reshape(-1, LANE)
    dst2d = dg.bcsc_dst.reshape(-1, LANE)
    gob = dg.bcsc_group_of_block
    words = pk.pack_bitmask(labels == 0, rows=rows)
    f_scan = functools.partial(pk._blocked_pull_2d,
                               rpg=dg.bcsc_rows_per_group,
                               block_rows=dg.bcsc_block_rows,
                               interpret=False)
    ms = timeit(f_scan, words, src2d, dst2d, gob)
    print(f"blocked_pull_or scan: {ms:.2f} ms  "
          f"({src2d.size/ms/1e3:.0f} M edge/s)")

    scan = f_scan(words, src2d, dst2d, gob).reshape(-1)

    # -- sampling (K rounds of jnp.take at sample positions) --
    K = dg.bcsc_groups
    spos = dg.bcsc_sample_pos
    svalid = dg.bcsc_sample_valid

    def samples(scan_flat, spos, svalid):
        outs = None
        for k in range(K):
            s = jnp.take(scan_flat, spos[k], indices_are_sorted=False)
            s = jnp.where(svalid[k], s, 0)
            outs = s if outs is None else (outs | s)
        return outs
    ms = timeit(samples, scan, spos, svalid)
    print(f"sample words (K={K} XLA takes of {spos.shape[1]/1e3:.0f}K): "
          f"{ms:.2f} ms")

    reach = samples(scan, spos, svalid)
    ms = timeit(lambda r: pk.unpack_bitmask(r, v_pad), reach)
    print(f"unpack_bitmask: {ms:.2f} ms")

    def pull_tail(reach_w, lab, row_offsets):
        new_mask = (lab == jnp.int32(-1)) & pk.unpack_bitmask(reach_w, v_pad)
        lab2 = jnp.where(new_mask, 2, lab)
        n = jnp.sum(new_mask.astype(jnp.int32))
        deg = row_offsets[1:] - row_offsets[:-1]
        m_f = jnp.sum(jnp.where(new_mask, deg, 0))
        return lab2, n, m_f
    ms = timeit(pull_tail, reach, labels, dg.row_offsets)
    print(f"pull tail: {ms:.2f} ms")


if __name__ == "__main__":
    main()
