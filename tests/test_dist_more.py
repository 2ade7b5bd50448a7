"""Distributed coverage for the rest of the primitive zoo: each dist
version must match its single-chip primitive (allclose for f32 psum
reassociation, exact for int combines), shard-count invariant."""

import numpy as np
import pytest

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.graph.rmat import rmat_graph
from gunrockinst_tpu.parallel import edge_mesh, shard_graph
from gunrockinst_tpu.parallel import dist_more


@pytest.fixture(scope="module")
def csr():
    return rmat_graph(8, 8, undirected=True, seed=5)


@pytest.fixture(scope="module")
def dg(csr):
    return DeviceGraph.build(csr, with_csc=True)


def _sharded(csr, nd):
    mesh = edge_mesh(nd)
    return shard_graph(DeviceGraph.build(csr, with_csc=False), mesh), mesh


def test_hits_dist(csr, dg):
    from gunrockinst_tpu.primitives import hits
    ref = hits.run(csr, src=0, max_iter=10)
    for nd in (1, 8):
        sg, mesh = _sharded(csr, nd)
        hub, auth = dist_more.hits_dist(sg, mesh, src=0, max_iter=10)
        np.testing.assert_allclose(np.asarray(hub)[: sg.n],
                                   ref.hub_ranks, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(auth)[: sg.n],
                                   ref.auth_ranks, rtol=1e-4, atol=1e-6)


def test_salsa_dist(csr):
    from gunrockinst_tpu.primitives import salsa
    ref = salsa.run(csr, max_iter=8)
    for nd in (1, 8):
        sg, mesh = _sharded(csr, nd)
        hub, auth = dist_more.salsa_dist(sg, mesh, max_iter=8)
        np.testing.assert_allclose(np.asarray(hub)[: sg.n],
                                   ref.hub_ranks, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(auth)[: sg.n],
                                   ref.auth_ranks, rtol=1e-4, atol=1e-6)


def test_mis_dist(csr):
    from gunrockinst_tpu.oracles import verify_mis
    rng = np.random.default_rng(0)
    n = csr.num_nodes
    prio = rng.permutation(n).astype(np.int32)
    outs = []
    for nd in (1, 8):
        sg, mesh = _sharded(csr, nd)
        prio_pad = np.zeros(sg.n_pad, np.int32)
        prio_pad[:n] = prio
        state, rounds = dist_more.mis_dist(sg, mesh, prio_pad)
        s = np.asarray(state)[:n]
        assert verify_mis(csr, s == 1)
        outs.append(s)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_topk_dist(csr):
    from gunrockinst_tpu.primitives import topk
    ref = topk.run(csr, 10)
    for nd in (1, 8):
        sg, mesh = _sharded(csr, nd)
        ids, cent = dist_more.topk_dist(sg, mesh, 10)
        np.testing.assert_array_equal(np.asarray(ids), ref.node_ids)
        np.testing.assert_array_equal(np.asarray(cent),
                                      ref.centralities)


def test_dobfs_dist(csr):
    from gunrockinst_tpu.oracles import bfs_reference
    ref_labels, ref_preds = bfs_reference(csr, 0)
    for nd in (1, 8):
        sg, mesh = _sharded(csr, nd)
        labels, preds, depth, pulls = dist_more.dobfs_dist(sg, 0, mesh)
        np.testing.assert_array_equal(np.asarray(labels)[: sg.n],
                                      ref_labels)
        np.testing.assert_array_equal(np.asarray(preds)[: sg.n],
                                      ref_preds)
        assert pulls >= 1  # dense small-diameter graph: pull engages


def test_bc_dist(csr):
    from gunrockinst_tpu.oracles import bc_reference
    ref_bc, ref_sigma, _ = bc_reference(csr, src=3)
    for nd in (1, 8):
        sg, mesh = _sharded(csr, nd)
        bc_half, sigma, labels, depth = dist_more.bc_dist(sg, 3, mesh)
        np.testing.assert_allclose(np.asarray(bc_half)[: sg.n], ref_bc,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma)[: sg.n], ref_sigma,
                                   rtol=1e-5)


def test_mst_dist():
    from gunrockinst_tpu.primitives import mst
    from gunrockinst_tpu.oracles import mst_reference_weight
    csr = rmat_graph(7, 8, undirected=True, seed=11, with_values=True)
    es, ed, w = mst.canonical_edges(csr)
    ref_w = mst_reference_weight(csr)
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        in_mst, comp, rounds = dist_more.mst_dist(
            es, ed, w, csr.num_nodes, mesh)
        got_w = float(w[in_mst].sum())
        assert abs(got_w - ref_w) < 1e-3, (got_w, ref_w)


def test_wtf_dist(csr):
    from gunrockinst_tpu.primitives import wtf
    ref = wtf.run(csr, src=0, alpha=0.2, cot_size=50)
    for nd in (1, 8):
        sg, mesh = _sharded(csr, nd)
        rank, ppr = dist_more.wtf_dist(sg, mesh, src=0, alpha=0.2,
                                       cot_size=50)
        np.testing.assert_allclose(np.asarray(ppr)[: sg.n],
                                   ref.ppr_ranks, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rank)[: sg.n],
                                   ref.wtf_ranks, rtol=1e-3, atol=1e-6)
