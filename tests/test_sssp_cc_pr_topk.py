"""SSSP / CC / PR / TopK vs CPU oracles."""

import numpy as np
import pytest

from gunrockinst_tpu.oracles import (cc_reference, pagerank_reference,
                                     sssp_reference, topk_degree_reference)
from gunrockinst_tpu.primitives import cc, pr, sssp, topk


# ---------------- SSSP ----------------

@pytest.mark.parametrize("mode", ["delta", "bellman", "sparse"])
def test_sssp_weighted_random(small_random, mode):
    res = sssp.run(small_random, 0, mode=mode)
    dist, preds = sssp_reference(small_random, 0)
    np.testing.assert_array_equal(res.dist, dist)  # bitwise
    np.testing.assert_array_equal(res.preds, preds)


def test_sssp_unweighted(chesapeake):
    res = sssp.run(chesapeake, 5)
    dist, _ = sssp_reference(chesapeake, 5)
    np.testing.assert_array_equal(res.dist, dist)


@pytest.mark.parametrize("delta", [0.5, 3.0, 1e9])
def test_sssp_delta_invariance(small_random_ud, delta):
    res = sssp.run(small_random_ud, 7, delta=delta)
    dist, _ = sssp_reference(small_random_ud, 7)
    np.testing.assert_array_equal(res.dist, dist)


def test_sssp_bips(bips):
    # bips98_606 carries negative (even 1e20) weights — a power-grid
    # matrix, not a shortest-path instance. Use |w| clipped to a sane
    # range like the reference's random-weight tests.
    from gunrockinst_tpu.graph.csr import CsrGraph
    g = CsrGraph(bips.row_offsets, bips.col_indices,
                 np.clip(np.abs(bips.edge_values), 0.1, 1e6)
                 .astype(np.float32))
    res = sssp.run(g, 0, mode="bellman")
    dist, _ = sssp_reference(g, 0)
    np.testing.assert_array_equal(res.dist, dist)


# ---------------- CC ----------------

def test_cc_chesapeake(chesapeake):
    res = cc.run(chesapeake)
    ref = cc_reference(chesapeake)
    np.testing.assert_array_equal(res.component_ids, ref)
    assert res.num_components == len(np.unique(ref))


def test_cc_directed_components(small_random):
    # weakly-connected: direction must not matter
    res = cc.run(small_random)
    ref = cc_reference(small_random)
    np.testing.assert_array_equal(res.component_ids, ref)


def test_cc_many_components():
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    # 3 chains + 2 isolated vertices
    rows = np.array([0, 1, 3, 4, 6, 7])
    cols = np.array([1, 2, 4, 5, 7, 8])
    csr = CsrGraph.from_coo(CooGraph(11, rows, cols))
    res = cc.run(csr)
    ref = cc_reference(csr)
    np.testing.assert_array_equal(res.component_ids, ref)
    assert res.num_components == 5


# ---------------- PR ----------------

def test_pr_undirected(small_random_ud):
    res = pr.run(small_random_ud)
    ref = pagerank_reference(small_random_ud)
    np.testing.assert_allclose(res.ranks, ref, rtol=1e-4, atol=1e-5)


def test_pr_directed_dangling(small_random):
    res = pr.run(small_random)
    ref = pagerank_reference(small_random)
    np.testing.assert_allclose(res.ranks, ref, rtol=1e-4, atol=1e-5)


def test_pr_personalized(chesapeake):
    res = pr.run(chesapeake, src=3)
    ref = pagerank_reference(chesapeake, src=3)
    np.testing.assert_allclose(res.ranks, ref, rtol=1e-4, atol=1e-5)


def test_pr_sorted_order(chesapeake):
    res = pr.run(chesapeake)
    assert (np.diff(res.sorted_ranks) <= 1e-9).all()


# ---------------- TopK ----------------

def test_topk(chesapeake):
    res = topk.run(chesapeake, 10)
    ids, cent, ind, outd = topk_degree_reference(chesapeake, 10)
    np.testing.assert_array_equal(res.node_ids, ids)
    np.testing.assert_array_equal(res.centralities, cent)
    np.testing.assert_array_equal(res.in_degrees, ind)
    np.testing.assert_array_equal(res.out_degrees, outd)


def test_topk_directed(small_random):
    res = topk.run(small_random, 25)
    ids, cent, ind, outd = topk_degree_reference(small_random, 25)
    np.testing.assert_array_equal(res.node_ids, ids)
    np.testing.assert_array_equal(res.in_degrees, ind)


def test_topk_k_larger_than_n(chesapeake):
    res = topk.run(chesapeake, 1000)
    assert len(res.node_ids) == chesapeake.num_nodes


def test_pr_pallas_mode_interpret(chesapeake):
    """PR via the pallas pull-SpMV (interpret on CPU) vs oracle."""
    res = pr.run(chesapeake, mode="pallas")
    ref = pagerank_reference(chesapeake)
    np.testing.assert_allclose(res.ranks, ref, rtol=1e-4, atol=1e-5)


def test_pr_pallas_matches_xla(small_random):
    a = pr.run(small_random, mode="pallas")
    b = pr.run(small_random)
    np.testing.assert_allclose(a.ranks, b.ranks, rtol=1e-5, atol=1e-6)
    ref = pagerank_reference(small_random)
    np.testing.assert_allclose(a.ranks, ref, rtol=1e-4, atol=1e-5)


def test_pr_pallas_personalized(chesapeake):
    res = pr.run(chesapeake, mode="pallas", src=3)
    ref = pagerank_reference(chesapeake, src=3)
    np.testing.assert_allclose(res.ranks, ref, rtol=1e-4, atol=1e-5)
