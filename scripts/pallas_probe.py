"""Probe Mosaic/Pallas gather support on this TPU generation.

P1: take_along_axis among 8 sublanes        (8-entry table per lane)
P2: take_along_axis among 128 lanes         (128-entry table per sublane-row)
P3: full-table scalar gather table[idx]     (arbitrary)
P4: jnp.take 1D
P5: row-select loop + lane barrel shift     (pure roll/select fallback)
Each probe: compile, correctness, timing at N=2^24.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 22
CHUNK = 2048          # indices per grid step
W = 256               # table rows (V = W*128*32 bits = 1M for bitmask)

rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 1 << 30, (W, 128)).astype(np.int32))
idx = jnp.asarray(rng.integers(0, W * 128, N).astype(np.int32))


def timeit(f, *args, n=3):
    r = jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        s = f(*args)
        # chain into scalar + host fetch to force real sync
        v = float(np.asarray(s if s.ndim == 0 else s.reshape(-1)[:1][0]))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, r


def ref_gather(t, i):
    return np.asarray(t).reshape(-1)[np.asarray(i)]


def try_probe(name, fn, check=True):
    try:
        out = jax.block_until_ready(fn(table, idx))
        if check:
            ref = ref_gather(table, idx)
            got = np.asarray(out).reshape(-1)[: ref.size]
            ok = np.array_equal(got, ref)
        else:
            ok = True
        ms, _ = timeit(fn, table, idx)
        print(f"{name}: OK correct={ok} {ms:9.2f} ms", flush=True)
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


# ---- P3: arbitrary full-table gather inside pallas
def p3_kernel(t_ref, i_ref, o_ref):
    ii = i_ref[...]                       # (CHUNK,)
    flat = t_ref[...].reshape(-1)         # (W*128,)
    o_ref[...] = flat[ii]


def p3(t, i):
    return pl.pallas_call(
        p3_kernel,
        grid=(N // CHUNK,),
        in_specs=[pl.BlockSpec((W, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK,), lambda k: (k,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK,), lambda k: (k,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
    )(t, i)


# ---- P2: take_along_axis among lanes, (8,128) blocks
def p2_kernel(t_ref, i_ref, o_ref):
    row = t_ref[0:1, :]                   # (1,128)
    ii = i_ref[...] & 127                 # (CHUNK//128, 128)
    rows = jnp.broadcast_to(row, ii.shape)
    o_ref[...] = jnp.take_along_axis(rows, ii, axis=1)


def p2(t, i):
    return pl.pallas_call(
        p2_kernel,
        grid=(N // CHUNK,),
        in_specs=[pl.BlockSpec((W, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK // 128, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK // 128, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
    )(t, i.reshape(N // 128, 128))


# ---- P1: take_along_axis among sublanes
def p1_kernel(t_ref, i_ref, o_ref):
    sub = t_ref[0:8, :]                   # (8,128)
    ii = i_ref[...] & 7                   # (8,128) per-lane sublane idx
    o_ref[...] = jnp.take_along_axis(sub, ii, axis=0)


def p1(t, i):
    return pl.pallas_call(
        p1_kernel,
        grid=(N // 1024,),
        in_specs=[pl.BlockSpec((W, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
    )(t, i.reshape(N // 128, 128))


# ---- P5: row loop + conditional lane roll (pure fallback)
def p5_kernel(t_ref, i_ref, o_ref):
    ii = i_ref[...]                       # (Bk,128)
    r = ii >> 7
    c = ii & 127
    shape = ii.shape
    lanepos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    acc = jnp.zeros(shape, jnp.int32)

    def row_body(k, acc):
        rowv = jax.lax.dynamic_slice(t_ref[...], (k, 0), (1, 128))
        rows = jnp.broadcast_to(rowv, shape)
        # lane barrel shift: out wants rows[:, c]; rotate by (c - lane)
        sh = (c - lanepos) & 127
        y = rows
        for b in range(7):
            amt = 1 << b
            rolled = pltpu.roll(y, 128 - amt, 1)
            y = jnp.where((sh >> b) & 1 == 1, rolled, y)
        return acc + jnp.where(r == k, y, 0)

    acc = jax.lax.fori_loop(0, W, row_body, acc)
    o_ref[...] = acc


def p5(t, i):
    Bk = CHUNK // 128
    return pl.pallas_call(
        p5_kernel,
        grid=(N // CHUNK,),
        in_specs=[pl.BlockSpec((W, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Bk, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Bk, 128), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
    )(t, i.reshape(N // 128, 128))


print(f"dev={jax.devices()[0].device_kind} N={N} table={W}x128 i32",
      flush=True)
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "xla"):
    f = jax.jit(lambda t, i: t.reshape(-1)[i])
    ms, _ = timeit(f, table, idx)
    print(f"XLA baseline t[idx]: {ms:9.2f} ms", flush=True)
if which in ("all", "p5"):
    try_probe("P5 row-loop + barrel", p5)
if which in ("all", "p2"):
    try_probe("P2 lane take_along", p2, check=False)
if which in ("all", "p1"):
    try_probe("P1 sublane take_along", p1, check=False)
if which in ("all", "p3"):
    try_probe("P3 full-table t[idx]", p3)
