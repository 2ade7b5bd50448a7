"""Neighbor sampling tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.ops.sampling import sample_khop, sample_neighbors


def test_sample_neighbors_valid(chesapeake):
    g = DeviceGraph.build(chesapeake, with_csc=False)
    ids = jnp.asarray(np.arange(10, dtype=np.int32))
    nbrs, eids, valid = sample_neighbors(g, ids, jax.random.PRNGKey(0), 8)
    nbrs, eids, valid = map(np.asarray, (nbrs, eids, valid))
    assert nbrs.shape == (10, 8)
    ro, ci = chesapeake.row_offsets, chesapeake.col_indices
    for i in range(10):
        adj = set(ci[ro[i]:ro[i + 1]].tolist())
        for j in range(8):
            assert valid[i, j]
            assert nbrs[i, j] in adj
            assert ci[eids[i, j]] == nbrs[i, j]


def test_sample_isolated_vertex():
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    csr = CsrGraph.from_coo(CooGraph(4, np.array([0]), np.array([1])))
    g = DeviceGraph.build(csr, with_csc=False)
    nbrs, _, valid = sample_neighbors(
        g, jnp.asarray([2, 0], dtype=jnp.int32), jax.random.PRNGKey(1), 4)
    valid = np.asarray(valid)
    assert not valid[0].any()          # vertex 2 has no out-edges
    assert valid[1].all()
    assert (np.asarray(nbrs)[1] == 1).all()


def test_sample_khop_shapes(chesapeake):
    g = DeviceGraph.build(chesapeake, with_csc=False)
    seeds = jnp.asarray([0, 5], dtype=jnp.int32)
    layers = sample_khop(g, seeds, jax.random.PRNGKey(2), k=3, hops=2)
    assert len(layers) == 2
    f0, n0, v0 = layers[0]
    f1, n1, v1 = layers[1]
    assert n0.shape == (2, 3)
    assert n1.shape == (6, 3)


def test_sampling_deterministic_per_key(chesapeake):
    g = DeviceGraph.build(chesapeake, with_csc=False)
    ids = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    a, _, _ = sample_neighbors(g, ids, jax.random.PRNGKey(7), 5)
    b, _, _ = sample_neighbors(g, ids, jax.random.PRNGKey(7), 5)
    c, _, _ = sample_neighbors(g, ids, jax.random.PRNGKey(8), 5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
