"""Scale-boundary validation (round-2 verdict item 8).

Three tiers:

1. Always-on: the mega->v3 VMEM fallback boundary exercised on a SMALL
   graph by shrinking the kernel's VMEM budget (monkeypatch), proving
   the fallback decision in `get_fused_bfs` actually routes to the v3
   sweeper and stays label-exact.  (The real boundary is ~rmat-s24,
   `ops/pallas_mega.py::sweep_fits`; the decision logic is identical.)
2. Opt-in (RUN_LARGE_TESTS=1): a ~10M-edge MatrixMarket file
   round-tripped through the native mmap parser (native/graphio.cpp)
   vs the NumPy reference parser — the reference's own regression tier
   uses soc-LiveJournal-class .mtx inputs
   (/root/reference/dataset/large/Makefile:5).
3. Opt-in (RUN_TPU_SCALE_TESTS=1, real chip): rmat-s22 single-chip BFS
   beyond the mega kernel's comfort zone, exact vs the CPU oracle.
"""

import os

import numpy as np
import pytest

from gunrockinst_tpu.graph.coo import CooGraph
from gunrockinst_tpu.graph.csr import CsrGraph


def _bfs_oracle(csr, src):
    from gunrockinst_tpu.oracles.traversal import bfs_reference
    return bfs_reference(csr, src)


def test_mega_fallback_boundary_routes_to_v3(monkeypatch, small_random_ud):
    """When sweep_fits says the mega step kernel's word maps exceed
    VMEM, get_fused_bfs must route to the grid-stepped v3 sweeper and
    still produce exact labels (pallas_mega.py:341 fallback)."""
    from gunrockinst_tpu.ops import pallas_mega
    from gunrockinst_tpu.primitives import bfs_pallas

    csr = small_random_ud
    # shrink the budget below this graph's residency -> fits is False
    need = pallas_mega.sweep_vmem_bytes(csr.num_nodes)
    monkeypatch.setattr(pallas_mega, "VMEM_LIMIT_BYTES", need - 1)
    assert not pallas_mega.sweep_fits(csr.num_nodes)

    # fresh per-graph cache entry: use_mega resolves to False
    bfs_pallas._fused_cache.pop(csr, None)
    src = 3
    labels, preds, depth, _ = bfs_pallas.bfs_pallas_fused(
        csr, src, mark_preds=True, variant="mega")
    ref_labels, _ = _bfs_oracle(csr, src)
    np.testing.assert_array_equal(labels, ref_labels)
    bfs_pallas._fused_cache.pop(csr, None)


@pytest.mark.skipif(os.environ.get("RUN_LARGE_TESTS") != "1",
                    reason="large .mtx round trip is opt-in "
                           "(RUN_LARGE_TESTS=1); writes ~150 MB")
def test_native_parser_10m_edge_mtx(tmp_path):
    """native/graphio.cpp at regression-dataset scale: a ~10M-edge
    generated .mtx must parse to the same COO/CSR as the NumPy path."""
    pytest.importorskip("gunrockinst_tpu.graph._native_io")
    from gunrockinst_tpu.graph import _native_io
    from gunrockinst_tpu.graph.market import load_market

    rng = np.random.default_rng(123)
    n, m = 1 << 20, 10_000_000
    rows = rng.integers(1, n + 1, m)
    cols = rng.integers(1, n + 1, m)
    vals = rng.random(m).astype(np.float32)
    p = tmp_path / "big.mtx"
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{n} {n} {m}\n")
        np.savetxt(f, np.column_stack(
            [rows, cols, vals.astype(np.float64)]),
            fmt="%d %d %.6g")

    from gunrockinst_tpu.graph.market import _parse_mtx_numpy

    n1, r1, c1, v1, s1 = _native_io.parse_mtx(str(p))
    n2, r2, c2, v2, s2 = _parse_mtx_numpy(str(p))
    assert n1 == n2 == n and r1.shape[0] == r2.shape[0] == m
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert np.allclose(np.asarray(v1), np.asarray(v2))
    assert bool(s1) == bool(s2)
    # and the full CSR build stays consistent end-to-end
    csr = load_market(str(p), use_cache=False)
    assert csr.num_nodes == n and csr.num_edges <= m


@pytest.mark.skipif(os.environ.get("RUN_TPU_SCALE_TESTS") != "1",
                    reason="real-chip s22 validation is opt-in "
                           "(RUN_TPU_SCALE_TESTS=1)")
def test_bfs_s22_on_chip():
    """rmat-s22 (4.2M nodes, ~130M edges) single-chip BFS vs oracle —
    exercises whichever side of the mega VMEM boundary s22 lands on
    with real Mosaic compilation."""
    import jax
    jax.config.update("jax_platforms", "")  # undo the conftest CPU pin
    # The un-pin only takes effect if no backend has initialized yet;
    # inside the full suite (conftest pin + earlier device use) the
    # resolved backend silently stays CPU and the s22 Mosaic-interpret
    # run would hang for hours.  Require a REAL accelerator backend —
    # run this test in its own pytest process.
    if jax.default_backend() == "cpu":
        pytest.skip("backend already initialized as CPU; run this "
                    "test in its own pytest process against the TPU")
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.primitives import bfs_pallas

    csr = rmat_graph(22, 16, undirected=True, seed=42)
    src = int(np.argmax(csr.degrees))
    labels, _, depth, ms = bfs_pallas.bfs_pallas_fused(
        csr, src, mark_preds=False)
    ref_labels, _ = _bfs_oracle(csr, src)
    np.testing.assert_array_equal(labels, ref_labels)


def test_split_mega_plan_exact():
    """Graphs whose packed scalar metadata exceeds the 1 MB SMEM
    budget run source-split sub-plans chained within each level
    (rmat-s22 in production); force the split here by shrinking the
    budget and require oracle-exact labels through both the
    single-search and multi-search drivers."""
    import jax
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.ops import pallas_mega
    from gunrockinst_tpu.primitives import bfs_pallas

    old = pallas_mega.SMEM_META_LIMIT
    pallas_mega.SMEM_META_LIMIT = 2000 * 4   # forces 2-4 parts at s11
    try:
        csr = rmat_graph(11, 8, undirected=True, seed=5)
        # fresh caches: the fused drivers cache per-CsrGraph, so a new
        # graph object guarantees the split path builds here
        for src in (0, int(np.argmax(csr.degrees))):
            labels, _, depth, _ = bfs_pallas.bfs_pallas_fused(
                csr, src, mark_preds=False)
            ref_l, _ = _bfs_oracle(csr, src)
            np.testing.assert_array_equal(labels, ref_l)
        fn = bfs_pallas.get_fused_bfs_multi(csr, reps=2)
        srcs = np.array([3, 200], np.int32)
        deps, vws, _ = fn(srcs)
        for i, s in enumerate(srcs):
            ref_l, _ = _bfs_oracle(csr, int(s))
            vis = fn.visited_of(vws[i])
            np.testing.assert_array_equal(
                vis, ref_l != np.iinfo(np.int32).max)
    finally:
        pallas_mega.SMEM_META_LIMIT = old
