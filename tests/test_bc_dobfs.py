"""BC and DOBFS vs oracles."""

import numpy as np
import pytest

from gunrockinst_tpu.oracles import bc_reference, bfs_reference
from gunrockinst_tpu.primitives import bc, dobfs
from gunrockinst_tpu.primitives.base import INF32


def _labels_to_ref(labels):
    out = labels.astype(np.int64)
    out[out == INF32] = -1
    return out.astype(np.int32)


def test_bc_single_source(chesapeake):
    res = bc.run(chesapeake, src=0)
    ref_bc, ref_sigma, ref_labels = bc_reference(chesapeake, src=0)
    np.testing.assert_allclose(res.bc_values, ref_bc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res.sigmas, ref_sigma, rtol=1e-5)
    np.testing.assert_array_equal(_labels_to_ref(res.labels), ref_labels)


def test_bc_test_graph():
    from gunrockinst_tpu.graph.market import load_market
    g = load_market("/root/reference/dataset/small/test_bc.mtx",
                    use_cache=False)
    res = bc.run(g, src=0)
    ref_bc, _, _ = bc_reference(g, src=0)
    np.testing.assert_allclose(res.bc_values, ref_bc, rtol=1e-5, atol=1e-6)


def test_bc_all_sources():
    from gunrockinst_tpu.graph.market import load_market
    g = load_market("/root/reference/dataset/small/test_bc.mtx",
                    use_cache=False)
    res = bc.run(g, src=-1)
    ref_bc, _, _ = bc_reference(g, src=-1)
    np.testing.assert_allclose(res.bc_values, ref_bc, rtol=1e-5, atol=1e-6)


def test_bc_all_sources_batched(small_random):
    # explicit batch size exercising dummy-padded tail lanes + the
    # multi-batch host loop (n not a multiple of batch)
    res = bc.run(small_random, src=-1, batch=8)
    ref_bc, ref_sigma, _ = bc_reference(small_random, src=-1)
    np.testing.assert_allclose(res.bc_values, ref_bc, rtol=1e-4, atol=1e-5)
    # sigmas/labels convention: those of the last source (n-1)
    _, last_sigma, _ = bc_reference(small_random,
                                    src=small_random.num_nodes - 1)
    np.testing.assert_allclose(res.sigmas, last_sigma, rtol=1e-5)


def test_bc_directed(small_random):
    res = bc.run(small_random, src=7)
    ref_bc, ref_sigma, _ = bc_reference(small_random, src=7)
    np.testing.assert_allclose(res.bc_values, ref_bc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res.sigmas, ref_sigma, rtol=1e-5)


# ---------------- DOBFS ----------------

def test_dobfs_matches_bfs(chesapeake):
    res = dobfs.run(chesapeake, 0)
    labels, preds = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(res.labels, labels)
    np.testing.assert_array_equal(res.preds, preds)


def test_dobfs_uses_pull(chesapeake):
    # tiny diameter + dense graph: pull phase must engage with a low alpha
    res = dobfs.run(chesapeake, 0, alpha=1, beta=1)
    labels, _ = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(res.labels, labels)


def test_dobfs_rmat():
    from gunrockinst_tpu.graph.rmat import rmat_graph
    csr = rmat_graph(9, 8, undirected=True, seed=13)
    res = dobfs.run(csr, 0)
    labels, preds = bfs_reference(csr, 0)
    np.testing.assert_array_equal(res.labels, labels)
    np.testing.assert_array_equal(res.preds, preds)
    assert res.pull_levels >= 1  # hub-heavy rmat should trigger pull


def test_dobfs_directed(small_random):
    res = dobfs.run(small_random, 3)
    labels, preds = bfs_reference(small_random, 3)
    np.testing.assert_array_equal(res.labels, labels)
    np.testing.assert_array_equal(res.preds, preds)
