"""Property sweep: every primitive vs its oracle over a family of
random graphs (different seeds, shapes, directedness) — the wide-net
equivalent of the reference running each driver over the dataset dir."""

import numpy as np
import pytest

from gunrockinst_tpu.graph.coo import CooGraph
from gunrockinst_tpu.graph.csr import CsrGraph
from gunrockinst_tpu.oracles import (bc_reference, bfs_reference,
                                     cc_reference, hits_reference,
                                     pagerank_reference, salsa_reference,
                                     sssp_reference, topk_degree_reference,
                                     verify_mis)
from gunrockinst_tpu.primitives import (bc, bfs, cc, dobfs, hits, mis, pr,
                                        salsa, sssp, topk)


def make_graph(seed, n=None, density=6, undirected=False, weighted=True):
    rng = np.random.default_rng(seed)
    n = n or int(rng.integers(30, 300))
    m = n * density
    vals = rng.integers(1, 64, m).astype(np.float32) if weighted else None
    return CsrGraph.from_coo(
        CooGraph(n, rng.integers(0, n, m), rng.integers(0, n, m), vals),
        undirected=undirected)


@pytest.mark.parametrize("seed", [11, 22, 33])
@pytest.mark.parametrize("undirected", [False, True])
def test_traversal_family(seed, undirected):
    g = make_graph(seed, undirected=undirected)
    src = seed % g.num_nodes
    ref_l, ref_p = bfs_reference(g, src)
    r = bfs.run(g, src)
    np.testing.assert_array_equal(r.labels, ref_l)
    np.testing.assert_array_equal(r.preds, ref_p)
    d = dobfs.run(g, src)
    np.testing.assert_array_equal(d.labels, ref_l)
    ref_d, ref_dp = sssp_reference(g, src)
    s = sssp.run(g, src)
    np.testing.assert_array_equal(s.dist, ref_d)
    np.testing.assert_array_equal(s.preds, ref_dp)


@pytest.mark.parametrize("seed", [7, 19])
def test_analytics_family(seed):
    g = make_graph(seed, weighted=False)
    np.testing.assert_array_equal(cc.run(g).component_ids, cc_reference(g))
    np.testing.assert_allclose(pr.run(g).ranks, pagerank_reference(g),
                               rtol=1e-4, atol=1e-5)
    ids, cent, _, _ = topk_degree_reference(g, 7)
    t = topk.run(g, 7)
    np.testing.assert_array_equal(t.node_ids, ids)
    src = seed % g.num_nodes
    ref_bc, _, _ = bc_reference(g, src=src)
    np.testing.assert_allclose(bc.run(g, src=src).bc_values, ref_bc,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [5, 23])
def test_rank_family(seed):
    g = make_graph(seed, weighted=False)
    src = (seed * 3) % g.num_nodes
    hub, auth = hits_reference(g, src, max_iter=8)
    h = hits.run(g, src=src, max_iter=8)
    np.testing.assert_allclose(h.hub_ranks, hub, rtol=1e-4, atol=1e-6)
    sh, sa = salsa_reference(g, max_iter=6)
    s = salsa.run(g, max_iter=6)
    np.testing.assert_allclose(s.hub_ranks, sh, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(s.auth_ranks, sa, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("seed", [3, 13])
def test_mis_family(seed):
    g = make_graph(seed, undirected=True, weighted=False)
    res = mis.run(g, seed=seed)
    assert verify_mis(g, res.in_set)
