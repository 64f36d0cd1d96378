"""Kernel-C Brandes (ops/pull2.brandes_{fwd,bwd}_levels) parity.

Compares the whole-run VMEM-resident BC route (models/bc._bc_pull2,
interpret mode off-TPU) against the hybrid XLA Brandes loop
(models/bc._bc_jit) on small random undirected graphs — labels, sigma,
and dependencies must agree (reference CPU oracle semantics,
tests/bc/test_bc.cu RefCPUBC).
"""
import numpy as np
import pytest

import gunrock_tpu as gt
from gunrock_tpu.models.bc import _bc_pull2


def _random_undirected(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    # a star component keeps the traversal shallow + connected-ish
    src[: n // 4] = 0
    dst[: n // 4] = rng.integers(1, n, n // 4)
    return gt.from_coo(n, src, dst, undirected=True)


@pytest.mark.parametrize("seed", [0, 3])
def test_bc_pull2_matches_hybrid(seed):
    n = 4096
    g = _random_undirected(n, 18000, seed)
    dg = gt.to_device(g, with_blocked_values=True)
    assert dg.has_pull2 and dg.undirected
    bc2, sig2, lab2, stats2 = _bc_pull2(dg, 0)

    r = gt.bc(g, src=0)      # routes through _bc_pull2 too; use as API
    np.testing.assert_allclose(np.asarray(bc2)[:n] * 0.5, r.bc_values,
                               rtol=1e-5, atol=1e-5)

    # independent oracle: the hybrid XLA loop with the pull2 route off
    from gunrock_tpu.enactor import capacity_ladder
    from gunrock_tpu.models.bc import _bc_jit
    import jax.numpy as jnp
    fcap = dg.v_pad
    caps = tuple(capacity_ladder(dg.e_pad))
    bc1, sig1, lab1, _ = _bc_jit(dg, jnp.int32(0), fcap=fcap, caps=caps)

    np.testing.assert_array_equal(np.asarray(lab2)[:n],
                                  np.asarray(lab1)[:n])
    np.testing.assert_allclose(np.asarray(sig2)[:n],
                               np.asarray(sig1)[:n], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bc2)[:n],
                               np.asarray(bc1)[:n], rtol=1e-4,
                               atol=1e-4)
    assert int(stats2.iteration) == int(np.asarray(lab1)[:n].max())
