"""HITS / SALSA / MIS / MST vs oracles."""

import numpy as np
import pytest

from gunrockinst_tpu.oracles import (hits_reference, salsa_reference,
                                     mst_reference_weight, verify_mis,
                                     verify_spanning_tree)
from gunrockinst_tpu.oracles.independent import luby_rounds_reference
from gunrockinst_tpu.primitives import hits, mis, mst, salsa


def test_hits(small_random):
    res = hits.run(small_random, src=0, max_iter=20)
    ref_hub, ref_auth = hits_reference(small_random, 0, max_iter=20)
    np.testing.assert_allclose(res.hub_ranks, ref_hub, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(res.auth_ranks, ref_auth, rtol=1e-4, atol=1e-6)


def test_hits_chesapeake(chesapeake):
    res = hits.run(chesapeake, src=2, max_iter=10)
    ref_hub, ref_auth = hits_reference(chesapeake, 2, max_iter=10)
    np.testing.assert_allclose(res.hub_ranks, ref_hub, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(res.auth_ranks, ref_auth, rtol=1e-4, atol=1e-6)


def test_salsa(small_random):
    res = salsa.run(small_random, max_iter=10)
    ref_hub, ref_auth = salsa_reference(small_random, max_iter=10)
    np.testing.assert_allclose(res.hub_ranks, ref_hub, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(res.auth_ranks, ref_auth, rtol=1e-4, atol=1e-6)


def test_salsa_undirected(chesapeake):
    res = salsa.run(chesapeake, max_iter=5)
    ref_hub, ref_auth = salsa_reference(chesapeake, max_iter=5)
    np.testing.assert_allclose(res.hub_ranks, ref_hub, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(res.auth_ranks, ref_auth, rtol=1e-4, atol=1e-6)


# ---------------- MIS ----------------

def test_mis_valid_and_matches_luby(chesapeake):
    res = mis.run(chesapeake, seed=3)
    assert verify_mis(chesapeake, res.in_set)
    rng = np.random.default_rng(3)
    pr = rng.permutation(chesapeake.num_nodes).astype(np.int32)
    ref_rounds = luby_rounds_reference(chesapeake, pr)
    np.testing.assert_array_equal(res.mis_ids, ref_rounds)


def test_mis_rmat():
    from gunrockinst_tpu.graph.rmat import rmat_graph
    csr = rmat_graph(8, 8, undirected=True, seed=21)
    res = mis.run(csr, seed=1)
    assert verify_mis(csr, res.in_set)


# ---------------- MST ----------------

def test_mst_weight_matches_kruskal(small_random_ud):
    res = mst.run(small_random_ud)
    ref_w = mst_reference_weight_canonical(small_random_ud)
    assert abs(res.total_weight - ref_w) < 1e-3 * max(1.0, abs(ref_w))
    # and it must actually be a spanning forest over canonical edges
    from gunrockinst_tpu.primitives.mst import canonical_edges
    u, v, w = canonical_edges(small_random_ud)
    assert _is_spanning_forest(small_random_ud.num_nodes, u[res.edge_mask],
                               v[res.edge_mask], small_random_ud)


def test_mst_chesapeake(chesapeake):
    res = mst.run(chesapeake)
    ref_w = mst_reference_weight_canonical(chesapeake)
    assert abs(res.total_weight - ref_w) < 1e-6
    assert len(res.edges) == chesapeake.num_nodes - 1  # connected graph


def test_mst_disconnected():
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    rows = np.array([0, 1, 3, 4])
    cols = np.array([1, 2, 4, 5])
    w = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    csr = CsrGraph.from_coo(CooGraph(8, rows, cols, w), undirected=True)
    res = mst.run(csr)
    assert res.total_weight == 10.0
    assert len(res.edges) == 4


# helpers

def mst_reference_weight_canonical(csr):
    """Kruskal over the same canonical undirected edge set the device
    kernel uses (dedup keeps min weight per pair)."""
    from gunrockinst_tpu.primitives.mst import canonical_edges
    u, v, w = canonical_edges(csr)
    order = np.lexsort((np.arange(len(w)), w))
    parent = np.arange(csr.num_nodes)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0.0
    for i in order:
        a, b = find(u[i]), find(v[i])
        if a != b:
            parent[a] = b
            total += float(w[i])
    return total


def _is_spanning_forest(n, mu, mv, csr):
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(mu.tolist(), mv.tolist()):
        ra, rb = find(a), find(b)
        if ra == rb:
            return False
        parent[ra] = rb
    from gunrockinst_tpu.oracles import cc_reference
    ncomp = len(np.unique(cc_reference(csr)))
    return len(mu) == n - ncomp
