"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; like the reference's
``--device=0,0`` trick (two logical GPUs on one physical device,
``CMakeLists.txt:389-421``), we test sharding against
``--xla_force_host_platform_device_count=8`` CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Drop accelerator-tunnel sitecustomize dirs from the inherited
# PYTHONPATH: every subprocess a test spawns is CPU-only and must not
# block dialing a remote backend (the tunnel can be wedged/absent in CI).
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and "axon" not in p)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache: the enactor programs (ladder switch x push/
# pull branches) take tens of seconds to compile on CPU; cache across
# test runs AND across the CLI subprocess tests (env is inherited).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_gunrock_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

# A sitecustomize may have pre-registered an accelerator backend and forced
# jax_platforms before this conftest ran; override after import (backends
# initialize lazily, so this still wins).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import gunrock_tpu as gt  # noqa: E402

REFERENCE_SMALL = "/root/reference/dataset/small"
REFERENCE_EXAMPLE = "/root/reference/simple_example"


def reference_dataset(name: str):
    """Path to a bundled reference dataset, or skip if unavailable."""
    for base in (REFERENCE_SMALL, REFERENCE_EXAMPLE):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return p
    pytest.skip(f"reference dataset {name} not available")


@pytest.fixture(scope="session")
def chesapeake():
    """The reference ctest graph (dataset/small/chesapeake.mtx)."""
    return gt.io.load_market(reference_dataset("chesapeake.mtx"),
                             undirected=True, use_cache=False)


@pytest.fixture(scope="session")
def bips98():
    """The reference simple_example graph (bips98_606.mtx)."""
    return gt.io.load_market(reference_dataset("bips98_606.mtx"),
                             undirected=True, use_cache=False)


@pytest.fixture(scope="session")
def rmat_small():
    """Deterministic small scale-free graph for oracle tests."""
    return gt.io.rmat(scale=10, edge_factor=8, seed=42, undirected=True)


@pytest.fixture(scope="session")
def road_like():
    """Deterministic high-diameter graph (grid), exercising deep BFS."""
    n = 32
    idx = np.arange(n * n).reshape(n, n)
    src = np.concatenate([idx[:, :-1].ravel(), idx[:-1, :].ravel()])
    dst = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
    return gt.from_coo(n * n, src, dst, undirected=True)


@pytest.fixture(scope="session")
def road_big():
    """Grid large enough that the deep-regime micro-loops engage
    (non-DO BFS: fcap >= models.bfs.DEEP_CAP; SSSP:
    fcap >= 2*models.sssp.DEEP_CAP, with fcap ~ v_pad*queue_sizing)."""
    n = 192
    idx = np.arange(n * n).reshape(n, n)
    src = np.concatenate([idx[:, :-1].ravel(), idx[:-1, :].ravel()])
    dst = np.concatenate([idx[:, 1:].ravel(), idx[1:, :].ravel()])
    return gt.from_coo(n * n, src, dst, undirected=True)
