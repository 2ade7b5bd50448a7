"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are
validated on `--xla_force_host_platform_device_count=8` CPU devices as
the driver's dryrun does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the env pre-sets axon (real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
# update below is what actually pins the CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gunrockinst_tpu.graph.coo import CooGraph  # noqa: E402
from gunrockinst_tpu.graph.csr import CsrGraph  # noqa: E402

SMALL = "/root/reference/dataset/small"
BIPS = "/root/reference/simple_example/bips98_606.mtx"


@pytest.fixture(scope="session")
def chesapeake():
    from gunrockinst_tpu.graph.market import load_market
    return load_market(f"{SMALL}/chesapeake.mtx", use_cache=False)


@pytest.fixture(scope="session")
def bips():
    from gunrockinst_tpu.graph.market import load_market
    return load_market(BIPS, use_cache=False)


@pytest.fixture(scope="session")
def small_random():
    """Deterministic 200-vertex random directed graph with weights."""
    rng = np.random.default_rng(7)
    n, m = 200, 1500
    coo = CooGraph(n, rng.integers(0, n, m), rng.integers(0, n, m),
                   rng.integers(1, 64, m).astype(np.float32))
    return CsrGraph.from_coo(coo)


@pytest.fixture(scope="session")
def small_random_ud():
    rng = np.random.default_rng(11)
    n, m = 150, 900
    coo = CooGraph(n, rng.integers(0, n, m), rng.integers(0, n, m),
                   rng.integers(1, 64, m).astype(np.float32))
    return CsrGraph.from_coo(coo, undirected=True)
