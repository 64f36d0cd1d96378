"""Per-level cost of the deep-regime micro-loops on real hardware.

Times grid1024 BFS / near-far SSSP end-to-end and at bounded iteration
counts (the difference isolates per-micro-round cost from setup), to
answer: is the per-level cost gather-bound (-> route the micro gathers
through sample_sorted) or op-launch-bound (-> fuse ops / batch levels)?

    python scripts/profile_deep_r3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax  # noqa: E402
import numpy as np  # noqa: E402

import gunrock_tpu as gt  # noqa: E402
from gunrock_tpu.models.bfs import bfs_device  # noqa: E402
from gunrock_tpu.models.sssp import sssp_device  # noqa: E402


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0:1])
    return out


def timed(fn, runs=3):
    fence(fn())
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    n = 1024
    idx = np.arange(n * n).reshape(n, n)
    gsrc = np.concatenate([idx[:, :-1].ravel(), idx[:-1, :].ravel()])
    gdst = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
    gg = gt.from_coo(n * n, gsrc, gdst, undirected=True)
    dgg = gt.to_device(gg)

    full = timed(lambda: bfs_device(dgg, 0))
    print(f"bfs grid1024 full: {full:.1f} ms "
          f"({full / 2046 * 1e3:.0f} us/level)")
    for k in (256, 1024):
        ms = timed(lambda k=k: bfs_device(dgg, 0, max_iters=k))
        print(f"bfs first {k} levels: {ms:.1f} ms "
              f"({ms / k * 1e3:.0f} us/level)")

    gg.random_edge_values(seed=1)
    dgw = gt.to_device(gg, with_edge_values=True)
    full = timed(lambda: sssp_device(dgw, 0, mode="nearfar", delta=256.0),
                 runs=2)
    out = fence(sssp_device(dgw, 0, mode="nearfar", delta=256.0))
    iters = int(out[2].iteration)
    print(f"sssp nf grid1024 full: {full:.1f} ms / {iters} rounds "
          f"({full / max(iters, 1) * 1e3:.0f} us/round)")
    for k in (256, 1024):
        ms = timed(lambda k=k: sssp_device(dgw, 0, mode="nearfar",
                                           delta=256.0, max_iters=k),
                   runs=2)
        print(f"sssp first {k} rounds: {ms:.1f} ms "
              f"({ms / k * 1e3:.0f} us/round)")

    # Queue value-carry A/B (models/sssp._make_deep_loop carry=True):
    # trades the per-round big-array gathers for a wider 2-key merge
    # sort. CPU: 2x SLOWER (op-bound); this measures the TPU tradeoff.
    ms = timed(lambda: sssp_device(dgw, 0, mode="nearfar", delta=256.0,
                                   deep_carry=True), runs=2)
    print(f"sssp nf grid1024 deep_carry=True: {ms:.1f} ms")


if __name__ == "__main__":
    main()
