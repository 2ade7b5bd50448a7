"""Road-network graph class (2-D lattice): the high-diameter /
bounded-degree regime from the reference's regression set
(`dataset/large/Makefile`: roadNet-CA, belgium_osm, road_usa) that the
Kronecker tests never exercise.  Validates every BFS traversal mode —
this is the graph class the sparse/auto path exists for — plus SSSP
and CC on weighted/unweighted grids."""

import numpy as np
import pytest

from gunrockinst_tpu.graph.lattice import grid_coo, grid_graph
from gunrockinst_tpu.graph.csr import CsrGraph
from gunrockinst_tpu.oracles import bfs_reference, sssp_reference


def test_grid_structure():
    side = 5
    csr = grid_graph(side)
    n = side * side
    assert csr.num_nodes == n
    # 4-neighbor lattice: 2*side*(side-1) undirected segments, both dirs
    assert csr.num_edges == 2 * 2 * side * (side - 1)
    deg = np.diff(csr.row_offsets)
    assert deg.max() == 4 and deg.min() == 2     # corners have degree 2
    # symmetry: (u,v) present iff (v,u) present
    coo = grid_coo(side)
    fwd = set(zip(coo.rows.tolist(), coo.cols.tolist()))
    assert all((v, u) in fwd for (u, v) in fwd)


def test_grid_diagonal_degrees():
    csr = grid_graph(4, diagonal=True)
    deg = np.diff(csr.row_offsets)
    assert deg.max() == 8 and deg.min() == 3     # corners: 2 ortho + 1 diag


def test_grid_weights_symmetric():
    coo = grid_coo(6, with_values=True, seed=3)
    w = {}
    for u, v, x in zip(coo.rows.tolist(), coo.cols.tolist(),
                       coo.values.tolist()):
        assert w.setdefault((min(u, v), max(u, v)), x) == x


@pytest.mark.parametrize("mode", ["dense", "sparse", "auto"])
def test_grid_bfs_all_modes(mode):
    # diameter 2*(side-1) = 46: dozens of tiny frontiers, the regime
    # where per-level full sweeps are pathological and sparse wins
    from gunrockinst_tpu.primitives import bfs
    side = 24
    csr = grid_graph(side)
    res = bfs.run(csr, 0, traversal_mode=mode)
    ref_labels, ref_preds = bfs_reference(csr, 0)
    np.testing.assert_array_equal(res.labels, ref_labels)
    assert res.stats.search_depth == 2 * (side - 1)


def test_grid_sssp_weighted():
    from gunrockinst_tpu.primitives import sssp
    csr = CsrGraph.from_coo(grid_coo(16, with_values=True, seed=7))
    res = sssp.run(csr, 0)
    ref, _ = sssp_reference(csr, 0)
    np.testing.assert_array_equal(res.dist, ref)


def test_grid_cc_single_component():
    from gunrockinst_tpu.primitives import cc
    csr = grid_graph(12)
    res = cc.run(csr)
    assert res.num_components == 1


def test_grid_bfs_dist_words_deep_exchange():
    """Boundary-exchange BFS on a high-diameter graph: dozens of
    word-exchange rounds (the rmat tests only exercise depth ~4)."""
    from gunrockinst_tpu.oracles import bfs_reference as bfs_ref
    from gunrockinst_tpu.parallel import edge_mesh
    from gunrockinst_tpu.parallel.dist_words import (bfs_dist_words,
                                                     shard_graph_by_dst)
    side = 16
    csr = grid_graph(side)
    ref_labels, ref_preds = bfs_ref(csr, 0)
    for nd in (1, 4, 8):
        mesh = edge_mesh(nd)
        sg = shard_graph_by_dst(csr, mesh)
        labels, preds, depth, traffic = bfs_dist_words(sg, 0, mesh)
        np.testing.assert_array_equal(np.asarray(labels)[:sg.n],
                                      ref_labels)
        np.testing.assert_array_equal(np.asarray(preds)[:sg.n],
                                      ref_preds)
        # dist_words counts exchange ROUNDS: levels plus the trailing
        # empty round that detects termination
        assert depth == 2 * (side - 1) + 1


def test_cli_grid_source(capsys):
    from gunrockinst_tpu.cli import main
    rc = main(["bfs", "grid", "--grid-side=12", "--src=0",
               "--traversal-mode=auto"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "TEST PASSED" in out or "CORRECT" in out or rc == 0
