"""Word/slice-exchange coverage for the rest of the primitive zoo
(round-4: dist_words.{hits,salsa,mis,topk,wtf,mst}_dist_words).

Each must match its single-chip primitive (allclose for f32 slice
reassociation, exact for int combines), be shard-count invariant, and
report a positive modeled ICI byte count that SHRINKS per device as
the mesh grows (the whole point of the owned-slice exchange)."""

import numpy as np
import pytest

from gunrockinst_tpu.graph.rmat import rmat_graph
from gunrockinst_tpu.parallel import edge_mesh
from gunrockinst_tpu.parallel import dist_words as dw


@pytest.fixture(scope="module")
def csr():
    return rmat_graph(8, 8, undirected=True, seed=5)


@pytest.fixture(scope="module")
def directed():
    # directed + likely disconnected: exercises dummy-edge masking on
    # both the dst-owned and src-owned shards
    return rmat_graph(9, 4, undirected=False, seed=31)


def test_hits_dist_words(csr, directed):
    from gunrockinst_tpu.primitives import hits
    for g in (csr, directed):
        ref = hits.run(g, src=0, max_iter=10)
        for nd in (1, 8):
            mesh = edge_mesh(nd)
            hub, auth, traffic = dw.hits_dist_words(g, mesh, src=0,
                                                    max_iter=10)
            n = g.num_nodes
            np.testing.assert_allclose(np.asarray(hub)[:n],
                                       ref.hub_ranks, rtol=1e-4,
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(auth)[:n],
                                       ref.auth_ranks, rtol=1e-4,
                                       atol=1e-6)
            assert traffic > 0


def test_ici_bytes_shrink_with_devices():
    """The owned-slice exchange's per-device bytes must SHRINK as the
    mesh grows (needs a graph big enough that n_loc is not pinned at
    the 4096-alignment floor)."""
    g = rmat_graph(12, 4, undirected=True, seed=2)
    traffics = {}
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        _, _, traffic = dw.hits_dist_words(g, mesh, src=0, max_iter=5)
        traffics[nd] = traffic
    assert traffics[8] < traffics[1]


def test_salsa_dist_words(csr):
    from gunrockinst_tpu.primitives import salsa
    ref = salsa.run(csr, max_iter=8)
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        hub, auth, traffic = dw.salsa_dist_words(csr, mesh, max_iter=8)
        n = csr.num_nodes
        np.testing.assert_allclose(np.asarray(hub)[:n], ref.hub_ranks,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(auth)[:n],
                                   ref.auth_ranks, rtol=1e-4, atol=1e-6)
        assert traffic > 0


def test_mis_dist_words(csr):
    from gunrockinst_tpu.oracles import verify_mis
    rng = np.random.default_rng(0)
    n = csr.num_nodes
    prio = rng.permutation(n).astype(np.int32)
    outs = []
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        sg = dw.shard_graph_by_dst(csr, mesh)
        prio_pad = np.zeros(sg.n_pad, np.int32)
        prio_pad[:n] = prio
        state, rounds, traffic = dw.mis_dist_words(csr, mesh, prio_pad)
        s = np.asarray(state)[:n]
        assert verify_mis(csr, s == 1)
        assert traffic == rounds * (sg.n_loc * 4 + sg.n_loc // 32 * 4)
        outs.append(s)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_mis_dist_words_matches_replicated(csr):
    """Same priorities -> same MIS as the dist_more pmax version."""
    from gunrockinst_tpu.parallel import dist_more
    from gunrockinst_tpu.parallel import shard_graph
    from gunrockinst_tpu.graph.csr import DeviceGraph
    rng = np.random.default_rng(7)
    n = csr.num_nodes
    prio = rng.permutation(n).astype(np.int32)
    mesh = edge_mesh(8)
    sg = shard_graph(DeviceGraph.build(csr, with_csc=False), mesh)
    prio_pad = np.zeros(sg.n_pad, np.int32)
    prio_pad[:n] = prio
    state_rep, _ = dist_more.mis_dist(sg, mesh, prio_pad)
    sgw = dw.shard_graph_by_dst(csr, mesh)
    prio_pad2 = np.zeros(sgw.n_pad, np.int32)
    prio_pad2[:n] = prio
    state_w, _, _ = dw.mis_dist_words(csr, mesh, prio_pad2)
    np.testing.assert_array_equal(np.asarray(state_rep)[:n],
                                  np.asarray(state_w)[:n])


def test_topk_dist_words(csr, directed):
    from gunrockinst_tpu.primitives import topk
    for g in (csr, directed):
        ref = topk.run(g, 10)
        for nd in (1, 8):
            mesh = edge_mesh(nd)
            ids, cent, traffic = dw.topk_dist_words(g, mesh, 10)
            np.testing.assert_array_equal(np.asarray(ids), ref.node_ids)
            np.testing.assert_array_equal(np.asarray(cent),
                                          ref.centralities)
            assert traffic == 10 * 8


def test_wtf_dist_words(csr):
    from gunrockinst_tpu.primitives import wtf
    ref = wtf.run(csr, src=0, alpha=0.2, cot_size=50)
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        rank, ppr, traffic = dw.wtf_dist_words(csr, mesh, src=0,
                                               alpha=0.2, cot_size=50)
        n = csr.num_nodes
        np.testing.assert_allclose(np.asarray(ppr)[:n], ref.ppr_ranks,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rank)[:n], ref.wtf_ranks,
                                   rtol=1e-3, atol=1e-6)
        assert traffic > 0


def test_mst_dist_words():
    from gunrockinst_tpu.primitives import mst
    from gunrockinst_tpu.oracles import mst_reference_weight
    csr = rmat_graph(7, 8, undirected=True, seed=11, with_values=True)
    es, ed, w = mst.canonical_edges(csr)
    ref_w = mst_reference_weight(csr)
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        in_mst, comp, rounds, traffic = dw.mst_dist_words(
            es, ed, w, csr.num_nodes, mesh)
        got_w = float(w[in_mst].sum())
        assert abs(got_w - ref_w) < 1e-3, (got_w, ref_w)
        assert traffic > 0


def test_mst_dist_words_negative_weights():
    """The order-preserving int32 weight key must survive negative
    weights (the sign-flip branch of the monotone transform)."""
    from gunrockinst_tpu.primitives import mst
    from gunrockinst_tpu.graph.csr import CsrGraph
    from gunrockinst_tpu.graph.coo import CooGraph
    rng = np.random.default_rng(3)
    n, m = 64, 400
    es = rng.integers(0, n, m)
    ed = rng.integers(0, n, m)
    keep = es != ed
    es, ed = es[keep], ed[keep]
    w = (rng.random(es.shape[0]) * 4 - 2).astype(np.float32)
    coo = CooGraph(n, es.astype(np.int64), ed.astype(np.int64),
                   values=w)
    csr = CsrGraph.from_coo(coo, undirected=True)
    ces, ced, cw = mst.canonical_edges(csr)
    from gunrockinst_tpu.oracles import mst_reference_weight
    ref_w = mst_reference_weight(csr)
    mesh = edge_mesh(8)
    in_mst, _, _, _ = dw.mst_dist_words(ces, ced, cw, n, mesh)
    got_w = float(cw[in_mst].sum())
    assert abs(got_w - ref_w) < 1e-3, (got_w, ref_w)
