"""Multi-device tests on the virtual 8-device CPU mesh: sharded results
must be bit-identical to single-device results."""

import numpy as np
import jax

from gunrockinst_tpu.graph.rmat import rmat_graph
from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.oracles import bfs_reference
from gunrockinst_tpu.parallel import edge_mesh, shard_graph
from gunrockinst_tpu.parallel.dist import bfs_dist, pagerank_push_dist


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_bfs_dist_matches_oracle(chesapeake):
    mesh = edge_mesh()
    sg = shard_graph(DeviceGraph.build(chesapeake, with_csc=False), mesh)
    labels, preds, depth = bfs_dist(sg, 0, mesh)
    ref_labels, ref_preds = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(np.asarray(labels)[:sg.n], ref_labels)
    np.testing.assert_array_equal(np.asarray(preds)[:sg.n], ref_preds)


def test_bfs_dist_rmat_shard_invariance():
    csr = rmat_graph(8, 8, undirected=True, seed=9)
    ref_labels, ref_preds = bfs_reference(csr, 0)
    for nd in (1, 4, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph(DeviceGraph.build(csr, with_csc=False), mesh)
        labels, preds, _ = bfs_dist(sg, 0, mesh)
        np.testing.assert_array_equal(np.asarray(labels)[:sg.n], ref_labels)
        np.testing.assert_array_equal(np.asarray(preds)[:sg.n], ref_preds)


def test_pagerank_dist_shard_invariance():
    csr = rmat_graph(7, 8, undirected=True, seed=4)
    outs = []
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph(DeviceGraph.build(csr, with_csc=False), mesh)
        outs.append(np.asarray(pagerank_push_dist(sg, mesh))[:sg.n])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5)
    assert np.isfinite(outs[0]).all() and outs[0].max() > 0


def test_sssp_dist_matches_oracle():
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    from gunrockinst_tpu.oracles import sssp_reference
    from gunrockinst_tpu.parallel.dist import sssp_dist
    rng = np.random.default_rng(3)
    n, m = 120, 700
    csr = CsrGraph.from_coo(CooGraph(
        n, rng.integers(0, n, m), rng.integers(0, n, m),
        rng.integers(1, 32, m).astype(np.float32)))
    ref, _ = sssp_reference(csr, 0)
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph(DeviceGraph.build(csr, with_csc=False), mesh)
        dist, it = sssp_dist(sg, 0, mesh)
        np.testing.assert_array_equal(np.asarray(dist)[:n], ref)


def test_cc_dist_matches_oracle(chesapeake):
    from gunrockinst_tpu.oracles import cc_reference
    from gunrockinst_tpu.parallel.dist import cc_dist
    ref = cc_reference(chesapeake)
    for nd in (1, 4, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph(DeviceGraph.build(chesapeake, with_csc=False), mesh)
        comp, it = cc_dist(sg, mesh)
        np.testing.assert_array_equal(np.asarray(comp)[:chesapeake.num_nodes],
                                      ref)


# ---------------- boundary-exchange (word-bitmap) layer ----------------

def test_bfs_dist_words_matches_oracle(chesapeake):
    from gunrockinst_tpu.parallel.dist_words import (bfs_dist_words,
                                                     shard_graph_by_dst)
    ref_labels, ref_preds = bfs_reference(chesapeake, 0)
    for nd in (1, 4, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph_by_dst(chesapeake, mesh)
        labels, preds, depth, traffic = bfs_dist_words(sg, 0, mesh)
        np.testing.assert_array_equal(np.asarray(labels)[:sg.n],
                                      ref_labels)
        np.testing.assert_array_equal(np.asarray(preds)[:sg.n], ref_preds)
        # per-level egress = owned frontier words only
        assert traffic == depth * (sg.n_loc // 32) * 4


def test_bfs_dist_words_rmat_shard_invariance():
    from gunrockinst_tpu.parallel.dist_words import (bfs_dist_words,
                                                     shard_graph_by_dst)
    csr = rmat_graph(10, 8, undirected=True, seed=9)
    src = int(np.argmax(np.diff(csr.row_offsets)))
    ref_labels, ref_preds = bfs_reference(csr, src)
    for nd in (1, 4, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph_by_dst(csr, mesh)
        labels, preds, _, _ = bfs_dist_words(sg, src, mesh)
        np.testing.assert_array_equal(np.asarray(labels)[:sg.n],
                                      ref_labels)
        np.testing.assert_array_equal(np.asarray(preds)[:sg.n], ref_preds)


def test_sssp_dist_words_matches_oracle():
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    from gunrockinst_tpu.oracles import sssp_reference
    from gunrockinst_tpu.parallel.dist_words import (shard_graph_by_dst,
                                                     sssp_dist_words)
    rng = np.random.default_rng(3)
    n, m = 120, 700
    csr = CsrGraph.from_coo(CooGraph(
        n, rng.integers(0, n, m), rng.integers(0, n, m),
        rng.integers(1, 32, m).astype(np.float32)))
    ref, _ = sssp_reference(csr, 0)
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph_by_dst(csr, mesh)
        dist, it, traffic = sssp_dist_words(sg, 0, mesh)
        np.testing.assert_array_equal(np.asarray(dist)[:n], ref)
        assert traffic == it * sg.n_loc * 4


def test_pagerank_dist_words_shard_invariance():
    from gunrockinst_tpu.parallel.dist_words import (pagerank_dist_words,
                                                     shard_graph_by_dst)
    csr = rmat_graph(7, 8, undirected=True, seed=4)
    outs = []
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph_by_dst(csr, mesh)
        rank, traffic = pagerank_dist_words(sg, mesh)
        outs.append(np.asarray(rank)[:sg.n])
        assert traffic > 0
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5)
    assert np.isfinite(outs[0]).all() and outs[0].max() > 0


def test_cc_dist_words_matches_oracle(small_random_ud):
    from gunrockinst_tpu.oracles import cc_reference
    from gunrockinst_tpu.parallel.dist_words import (cc_dist_words,
                                                     shard_graph_by_dst)
    ref = cc_reference(small_random_ud)
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph_by_dst(small_random_ud, mesh)
        comp, it, traffic = cc_dist_words(sg, mesh)
        np.testing.assert_array_equal(np.asarray(comp)[: sg.n], ref)
        # per-round egress: owned label slice + owned changed words
        assert traffic == it * (sg.n_loc * 4 + sg.n_loc // 32 * 4)


def test_bc_dist_words_matches_oracle(chesapeake):
    from gunrockinst_tpu.oracles import bc_reference
    from gunrockinst_tpu.parallel.dist_words import bc_dist_words
    ref, _, _ = bc_reference(chesapeake, src=3)
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        bc, depth, traffic = bc_dist_words(chesapeake, 3, mesh)
        np.testing.assert_allclose(bc, ref, rtol=1e-4, atol=1e-5)
        assert traffic > 0


def test_dobfs_dist_words_directions_agree(chesapeake):
    """The pull direction is a genuinely different computation
    (segment-min over owned in-edges) — forcing all-pull, all-push,
    and the real alpha switch must all give oracle-exact labels+preds,
    and forced runs must actually take the forced direction."""
    from gunrockinst_tpu.parallel.dist_words import (dobfs_dist_words,
                                                     shard_graph_by_dst)
    ref_labels, ref_preds = bfs_reference(chesapeake, 0)
    for nd in (1, 4, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph_by_dst(chesapeake, mesh)
        for alpha, want in ((1e9, "pull"), (0.0, "push"), (6.0, None)):
            labels, preds, depth, pulls, traffic = dobfs_dist_words(
                sg, 0, mesh, alpha=alpha)
            np.testing.assert_array_equal(np.asarray(labels)[:sg.n],
                                          ref_labels)
            np.testing.assert_array_equal(np.asarray(preds)[:sg.n],
                                          ref_preds)
            if want == "pull":
                assert pulls == depth
            elif want == "push":
                assert pulls == 0
            assert traffic == depth * (sg.n_loc // 32) * 4


def test_dobfs_dist_words_rmat_switches():
    """On a power-law graph the default alpha switch should use pull
    for at least one fat level and stay exact across shard counts."""
    from gunrockinst_tpu.parallel.dist_words import (dobfs_dist_words,
                                                     shard_graph_by_dst)
    csr = rmat_graph(10, 8, undirected=True, seed=9)
    src = int(np.argmax(np.diff(csr.row_offsets)))
    ref_labels, _ = bfs_reference(csr, src)
    pulls_seen = []
    for nd in (1, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph_by_dst(csr, mesh)
        labels, preds, depth, pulls, _ = dobfs_dist_words(sg, src, mesh)
        np.testing.assert_array_equal(np.asarray(labels)[:sg.n],
                                      ref_labels)
        pulls_seen.append(pulls)
    assert pulls_seen[0] == pulls_seen[1]   # switch is replicated
    assert 0 < pulls_seen[0] <= depth
