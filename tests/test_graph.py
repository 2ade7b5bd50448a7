"""Graph core tests: COO/CSR build, .mtx parsing, R-MAT, device padding."""

import numpy as np
import pytest

from gunrockinst_tpu.graph.coo import CooGraph
from gunrockinst_tpu.graph.csr import CsrGraph, DeviceGraph
from gunrockinst_tpu.graph.market import load_market, read_market
from gunrockinst_tpu.graph.rmat import rmat_coo, rmat_graph

SMALL = "/root/reference/dataset/small"
BIPS = "/root/reference/simple_example/bips98_606.mtx"


def test_csr_from_coo_basic():
    coo = CooGraph(4, np.array([0, 0, 1, 2, 3]), np.array([1, 2, 2, 3, 0]))
    csr = CsrGraph.from_coo(coo)
    assert csr.num_nodes == 4 and csr.num_edges == 5
    np.testing.assert_array_equal(csr.row_offsets, [0, 2, 3, 4, 5])
    np.testing.assert_array_equal(csr.col_indices, [1, 2, 2, 3, 0])


def test_csr_dedupe_and_undirected():
    coo = CooGraph(3, np.array([0, 0, 1]), np.array([1, 1, 2]))
    csr = CsrGraph.from_coo(coo, undirected=True)
    # dedup removes the duplicated 0->1; undirected adds reverses
    assert csr.num_edges == 4
    np.testing.assert_array_equal(csr.row_offsets, [0, 1, 3, 4])


def test_csr_transpose_roundtrip(small_random):
    t = small_random.transposed()
    tt = t.transposed()
    np.testing.assert_array_equal(tt.row_offsets, small_random.row_offsets)
    np.testing.assert_array_equal(tt.col_indices, small_random.col_indices)


def test_market_symmetric(chesapeake):
    # chesapeake: 39 nodes, 170 undirected edges -> 340 directed
    assert chesapeake.num_nodes == 39
    assert chesapeake.num_edges == 340
    # symmetric: transpose equals itself
    t = chesapeake.transposed()
    np.testing.assert_array_equal(t.row_offsets, chesapeake.row_offsets)
    np.testing.assert_array_equal(t.col_indices, chesapeake.col_indices)


def test_market_values(bips):
    assert bips.num_nodes == 7135
    assert bips.edge_values is not None


def test_market_direction_convention(tmp_path):
    # reference parses "a b" as edge b-1 -> a-1 (market.cuh:150)
    p = tmp_path / "t.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern general\n"
                 "3 3 2\n1 2\n1 3\n")
    csr = load_market(str(p), use_cache=False)
    # edges: 2->1, 3->1 (1-based) = 1->0, 2->0
    np.testing.assert_array_equal(csr.row_offsets, [0, 0, 1, 2])
    np.testing.assert_array_equal(csr.col_indices, [0, 0])


def test_market_cache(tmp_path):
    p = tmp_path / "c.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern general\n"
                 "3 3 2\n1 2\n2 3\n")
    a = load_market(str(p), use_cache=True)
    assert (tmp_path / "c.mtx.csr.npz").exists()
    b = load_market(str(p), use_cache=True)
    np.testing.assert_array_equal(a.col_indices, b.col_indices)


def test_rmat_shapes():
    coo = rmat_coo(8, 8, seed=3)
    assert coo.num_nodes == 256 and coo.num_edges == 2048
    assert coo.rows.max() < 256 and coo.cols.max() < 256
    csr = rmat_graph(8, 8, seed=3)
    assert csr.num_nodes == 256
    # power-law-ish: max degree far above average
    assert csr.degrees.max() > 4 * csr.average_degree()


def test_degree_histogram(small_random):
    hist = small_random.degree_histogram()
    assert hist.sum() == small_random.num_nodes


def test_device_graph_padding(small_random):
    g = DeviceGraph.build(small_random)
    assert g.n_pad % 128 == 0 and g.m_pad % 128 == 0
    assert g.n_pad >= g.n + 1
    # padding edges point at the dummy vertex
    src = np.asarray(g.edge_src)
    assert (src[g.m:] == g.n).all()
    # degrees beyond n are zero
    assert (np.asarray(g.out_degree)[g.n:] == 0).all()
    # CSC is a permutation of the edge list
    eid = np.asarray(g.csc_edge_id)[:g.m]
    assert sorted(eid.tolist()) == list(range(g.m))
    np.testing.assert_array_equal(
        np.asarray(g.edge_dst)[eid], np.asarray(g.csc_dst)[:g.m])
    np.testing.assert_array_equal(
        np.asarray(g.edge_src)[eid], np.asarray(g.csc_src)[:g.m])


def test_reverse_view(small_random):
    g = DeviceGraph.build(small_random)
    r = g.reverse_view()
    # reverse twice = original edge multiset
    fwd = set(zip(np.asarray(g.edge_src)[:g.m].tolist(),
                  np.asarray(g.edge_dst)[:g.m].tolist()))
    rev = set(zip(np.asarray(r.edge_dst)[:g.m].tolist(),
                  np.asarray(r.edge_src)[:g.m].tolist()))
    assert fwd == rev


def test_save_load(tmp_path, small_random):
    path = str(tmp_path / "g.npz")
    small_random.save(path)
    g2 = CsrGraph.load(path)
    np.testing.assert_array_equal(g2.row_offsets, small_random.row_offsets)
    np.testing.assert_array_equal(g2.edge_values, small_random.edge_values)


def test_native_parser_matches_numpy():
    """The C++ parser (native/graphio.cpp) must agree with the NumPy
    fallback on every fixture file."""
    pytest.importorskip("gunrockinst_tpu.graph._native_io")
    from gunrockinst_tpu.graph import _native_io
    from gunrockinst_tpu.graph.market import _parse_mtx_numpy
    for p in [f"{SMALL}/chesapeake.mtx", f"{SMALL}/test_bc.mtx",
              f"{SMALL}/test_cc.mtx", f"{SMALL}/test_pr.mtx", BIPS]:
        n1, r1, c1, v1, s1 = _native_io.parse_mtx(p)
        n2, r2, c2, v2, s2 = _parse_mtx_numpy(p)
        assert n1 == n2 and s1 == s2
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(c1, c2)
        assert (v1 is None) == (v2 is None)
        if v1 is not None:
            # strtof (direct f32) vs numpy (f64 then cast): 1-ulp slack
            np.testing.assert_allclose(v1, v2, rtol=2e-6)


def test_native_parser_errors(tmp_path):
    pytest.importorskip("gunrockinst_tpu.graph._native_io")
    from gunrockinst_tpu.graph import _native_io
    with pytest.raises(FileNotFoundError):
        _native_io.parse_mtx(str(tmp_path / "missing.mtx"))
    bad = tmp_path / "bad.mtx"
    bad.write_text("%%MatrixMarket matrix coordinate pattern general\n"
                   "3 3 2\n1 x\n2 3\n")
    with pytest.raises(ValueError):
        _native_io.parse_mtx(str(bad))
