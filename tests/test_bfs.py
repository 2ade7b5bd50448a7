"""BFS vs CPU oracle — the reference's core validation contract
(tests/bfs/test_bfs.cu: GPU labels/preds element-wise vs
SimpleReferenceBfs)."""

import numpy as np
import pytest

from gunrockinst_tpu.oracles import bfs_reference
from gunrockinst_tpu.primitives import bfs
from gunrockinst_tpu.primitives.base import INF32


def check_bfs(csr, src, mode):
    res = bfs.run(csr, src, traversal_mode=mode)
    labels, preds = bfs_reference(csr, src)
    np.testing.assert_array_equal(res.labels, labels)
    np.testing.assert_array_equal(res.preds, preds)
    # stats sanity
    assert res.stats.search_depth == labels[labels != INF32].max()
    assert res.stats.nodes_visited == int((labels != INF32).sum())


@pytest.mark.parametrize("mode", ["dense", "sparse", "auto"])
def test_bfs_chesapeake(chesapeake, mode):
    check_bfs(chesapeake, 0, mode)


@pytest.mark.parametrize("src", [0, 17, 38])
def test_bfs_chesapeake_sources(chesapeake, src):
    check_bfs(chesapeake, src, "dense")


@pytest.mark.parametrize("mode", ["dense", "sparse"])
def test_bfs_bips(bips, mode):
    check_bfs(bips, 0, mode)


def test_bfs_directed_disconnected(small_random):
    res = bfs.run(small_random, 3)
    labels, preds = bfs_reference(small_random, 3)
    np.testing.assert_array_equal(res.labels, labels)
    np.testing.assert_array_equal(res.preds, preds)


def test_bfs_no_preds(chesapeake):
    res = bfs.run(chesapeake, 0, mark_preds=False)
    labels, _ = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(res.labels, labels)
    assert res.preds is None


def test_bfs_isolated_source():
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    # vertex 4 has no edges at all
    coo = CooGraph(5, np.array([0, 1]), np.array([1, 2]))
    csr = CsrGraph.from_coo(coo)
    res = bfs.run(csr, 4)
    assert res.labels[4] == 0
    assert (res.labels[:4] == INF32).all()


def test_bfs_max_depth(chesapeake):
    res = bfs.run(chesapeake, 0, max_depth=1)
    assert res.stats.search_depth == 1
    assert (res.labels[res.labels != INF32] <= 1).all()


def test_bfs_rmat_modes_agree():
    from gunrockinst_tpu.graph.rmat import rmat_graph
    csr = rmat_graph(9, 8, undirected=True, seed=5)
    a = bfs.run(csr, 0, traversal_mode="dense")
    b = bfs.run(csr, 0, traversal_mode="sparse")
    c = bfs.run(csr, 0, traversal_mode="auto")
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.labels, c.labels)
    np.testing.assert_array_equal(a.preds, b.preds)
    labels, preds = bfs_reference(csr, 0)
    np.testing.assert_array_equal(a.labels, labels)
    np.testing.assert_array_equal(a.preds, preds)


def test_bfs_pallas_interpret(chesapeake):
    """Pallas pull-sweep BFS (interpret mode on CPU) vs oracle."""
    from gunrockinst_tpu.primitives.bfs_pallas import bfs_pallas
    labels, preds, depth = bfs_pallas(chesapeake, 0, interpret=True)
    ref_labels, ref_preds = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(labels, ref_labels)
    np.testing.assert_array_equal(preds, ref_preds)


def test_bfs_pallas_rmat_interpret():
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.primitives.bfs_pallas import bfs_pallas
    csr = rmat_graph(9, 8, undirected=True, seed=5)
    labels, preds, _ = bfs_pallas(csr, 0, interpret=True)
    ref_labels, ref_preds = bfs_reference(csr, 0)
    np.testing.assert_array_equal(labels, ref_labels)
    np.testing.assert_array_equal(preds, ref_preds)


def test_pull_plan_v2_interpret():
    """v2 flavor-split sweep (hub/packed) vs a direct reference, in
    interpreter mode."""
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.ops.pallas_advance import pack_bitmap, unpack_bitmap
    from gunrockinst_tpu.ops.pallas_advance_v2 import (PullSweeperV2,
                                                       build_pull_plan_v2)
    import jax.numpy as jnp

    csr = rmat_graph(10, 8, undirected=True, seed=3)
    n = csr.num_nodes
    csc = csr.transposed()
    plan = build_pull_plan_v2(csc.row_offsets, csc.col_indices, n)
    sw = PullSweeperV2(plan, interpret=True)
    rng = np.random.default_rng(0)
    n_pad = ((n + 128) // 128) * 128
    mask_pad = np.zeros(n_pad, bool)
    mask_pad[:n] = rng.random(n) < 0.2
    fw = pack_bitmap(jnp.asarray(mask_pad), plan.n_words)
    out = sw(fw)
    touched = np.asarray(unpack_bitmap(out, n_pad))[:n]
    esrc = np.repeat(np.arange(n), np.diff(csr.row_offsets))
    edst = csr.col_indices
    ref = np.zeros(n, bool)
    np.maximum.at(ref, edst[mask_pad[:n][esrc]], True)
    np.testing.assert_array_equal(touched, ref)


@pytest.mark.parametrize("shape", ["star_in", "star_out", "chain", "empty"])
def test_pallas_v2_shapes_interpret(shape):
    """Plan-builder edge cases: hub-dominated stars, chains (all lane
    chunks), empty graphs."""
    import jax.numpy as jnp
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    from gunrockinst_tpu.ops.pallas_advance import pack_bitmap, unpack_bitmap
    from gunrockinst_tpu.ops.pallas_advance_v2 import (PullSweeperV2,
                                                       build_pull_plan_v2)

    n = 700
    if shape == "star_in":       # all edges point at vertex 0 (hub dst)
        rows = np.arange(1, n)
        cols = np.zeros(n - 1, dtype=np.int64)
    elif shape == "star_out":    # vertex 0 points everywhere (hub src)
        rows = np.zeros(n - 1, dtype=np.int64)
        cols = np.arange(1, n)
    elif shape == "chain":
        rows = np.arange(n - 1)
        cols = np.arange(1, n)
    else:
        rows = np.zeros(0, dtype=np.int64)
        cols = np.zeros(0, dtype=np.int64)
    csr = CsrGraph.from_coo(CooGraph(n, np.asarray(rows), np.asarray(cols)))
    csc = csr.transposed()
    plan = build_pull_plan_v2(csc.row_offsets, csc.col_indices, n)
    sw = PullSweeperV2(plan, interpret=True)
    rng = np.random.default_rng(1)
    n_pad = ((n + 128) // 128) * 128
    mask_pad = np.zeros(n_pad, bool)
    mask_pad[:n] = rng.random(n) < 0.3
    out = sw(pack_bitmap(jnp.asarray(mask_pad), plan.n_words))
    touched = np.asarray(unpack_bitmap(out, n_pad))[:n]
    ref = np.zeros(n, bool)
    if csr.num_edges:
        esrc = np.repeat(np.arange(n), np.diff(csr.row_offsets))
        np.maximum.at(ref, csr.col_indices[mask_pad[:n][esrc]], True)
    np.testing.assert_array_equal(touched, ref)


def test_pallas_v2_region_boundary_interpret():
    """n straddling the 32768-vertex region boundary."""
    import jax.numpy as jnp
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    from gunrockinst_tpu.ops.pallas_advance import pack_bitmap, unpack_bitmap
    from gunrockinst_tpu.ops.pallas_advance_v2 import (PullSweeperV2,
                                                       build_pull_plan_v2)
    n = 32769  # crosses into a second region
    rng = np.random.default_rng(4)
    m = 3000
    # bias edges to touch both regions
    rows = np.concatenate([rng.integers(0, n, m // 2),
                           rng.integers(32000, n, m // 2)])
    cols = np.concatenate([rng.integers(32000, n, m // 2),
                           rng.integers(0, n, m // 2)])
    csr = CsrGraph.from_coo(CooGraph(n, rows, cols))
    csc = csr.transposed()
    plan = build_pull_plan_v2(csc.row_offsets, csc.col_indices, n)
    sw = PullSweeperV2(plan, interpret=True)
    n_pad = ((n + 128) // 128) * 128
    mask_pad = np.zeros(n_pad, bool)
    mask_pad[:n] = rng.random(n) < 0.2
    out = sw(pack_bitmap(jnp.asarray(mask_pad), plan.n_words))
    touched = np.asarray(unpack_bitmap(out, n_pad))[:n]
    esrc = np.repeat(np.arange(n), np.diff(csr.row_offsets))
    ref = np.zeros(n, bool)
    np.maximum.at(ref, csr.col_indices[mask_pad[:n][esrc]], True)
    np.testing.assert_array_equal(touched, ref)


def test_bfs_mega_interpret(chesapeake):
    """Mega-kernel BFS (whole search in one pallas call, interpret on
    CPU) vs oracle, labels + preds through the public run() entry."""
    res = bfs.run(chesapeake, 0, mark_preds=True, traversal_mode="mega")
    ref_labels, ref_preds = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(res.labels, ref_labels)
    np.testing.assert_array_equal(res.preds, ref_preds)


def test_bfs_mega_multiregion_interpret():
    """Mega kernel across >1 source regions (n > 32768): region
    skipping + chunk overshoot must stay exact."""
    from gunrockinst_tpu.graph.rmat import rmat_graph
    csr = rmat_graph(16, 2, undirected=True, seed=11)
    for src in (0, 40000):
        res = bfs.run(csr, src, mark_preds=False, traversal_mode="mega")
        ref_labels, _ = bfs_reference(csr, src)
        np.testing.assert_array_equal(res.labels, ref_labels)


def test_bfs_mega_disconnected_and_tiny():
    """Unreached vertices stay INF; single-vertex frontier converges."""
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    # two components: 0-1-2 chain, 3-4 pair
    u = np.array([0, 1, 3], dtype=np.int64)
    v = np.array([1, 2, 4], dtype=np.int64)
    uu = np.concatenate([u, v]); vv = np.concatenate([v, u])
    csr = CsrGraph.from_coo(CooGraph(5, uu, vv, None))
    res = bfs.run(csr, 0, mark_preds=False, traversal_mode="mega")
    ref_labels, _ = bfs_reference(csr, 0)
    np.testing.assert_array_equal(res.labels, ref_labels)


def test_bfs_mega_relabeled_interpret(monkeypatch):
    """Round-5 degree-sorted relabeling + destination-ordered twin
    plan: exactness of the full fused driver (labels in INPUT ids)
    and of the multi-source dispatch under a forced permutation."""
    monkeypatch.setenv("GT_BFS_RELABEL", "force")
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.primitives import bfs_pallas
    csr = rmat_graph(16, 2, undirected=True, seed=23)  # fresh caches
    from gunrockinst_tpu.graph.relabel import relabeled
    _, perm = relabeled(csr)
    assert perm is not None
    for src in (0, 40000):
        labels, _, _, _ = bfs_pallas.bfs_pallas_fused(
            csr, src, mark_preds=False)
        ref_labels, _ = bfs_reference(csr, src)
        np.testing.assert_array_equal(labels, ref_labels)
    fn = bfs_pallas.get_fused_bfs_multi(csr, reps=2)
    srcs = np.array([5, 40000], np.int32)
    deps, vws, _ = fn(srcs)
    for i, s in enumerate(srcs):
        ref_l, _ = bfs_reference(csr, int(s))
        np.testing.assert_array_equal(fn.visited_of(vws[i]),
                                      ref_l != INF32)


def test_dst_order_plan_invariants():
    """The destination-ordered twin holds the SAME subtile set with
    rs ranges consistent with each subtile's destination region."""
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.ops import pallas_mega as pm
    csr = rmat_graph(16, 2, undirected=True, seed=31)
    csc = csr.transposed()
    plan = pm.build_mega_plan(csc.row_offsets, csc.col_indices,
                              csr.num_nodes)
    twin, hperm, pkperm = pm.dst_order_plan(plan)
    R = plan.n_words // (pm.ROWS_PER_REGION * 128)
    for rs, out_row, nreal in (
            (twin.hub_rs, twin.hub_out_row, int(plan.hub_rs[-1])),
            (twin.pk_rs, twin.pk_out_row, int(plan.pk_rs[-1]))):
        assert rs.shape == (R + 1,) and int(rs[-1]) == nreal
        for r in range(R):
            seg = out_row[int(rs[r]): int(rs[r + 1])]
            assert np.all(seg // pm.ROWS_PER_REGION == r)
    # permutation of the real prefix, identity on the dummy tail
    assert np.array_equal(np.sort(hperm[:int(plan.hub_rs[-1])]),
                          np.arange(int(plan.hub_rs[-1])))
    assert np.array_equal(hperm[int(plan.hub_rs[-1]):],
                          np.arange(int(plan.hub_rs[-1]),
                                    hperm.shape[0]))
    # metadata rows travelled with their subtiles
    hp = hperm.astype(np.int64)
    np.testing.assert_array_equal(twin.hub_row_base,
                                  plan.hub_row_base[hp])
    np.testing.assert_array_equal(
        twin.pk_idx, plan.pk_idx[pkperm.astype(np.int64)])


def test_chain_bfs_kernel_interpret(chesapeake):
    """Whole-search chain kernel (in-kernel level loop + region skip)
    vs oracle, driven directly."""
    from gunrockinst_tpu.ops import pallas_mega as pm
    csc = chesapeake.transposed()
    plan = pm.build_mega_plan(csc.row_offsets, csc.col_indices,
                              chesapeake.num_nodes)
    ch = pm.ChainBfs(plan, planes=6, interpret=True)
    pln, vw, dep = ch(0)
    ref_labels, _ = bfs_reference(chesapeake, 0)
    n = chesapeake.num_nodes
    vis = np.unpackbits(np.asarray(vw).reshape(-1).view(np.uint8),
                        bitorder="little")[:n].astype(bool)
    np.testing.assert_array_equal(vis, ref_labels != INF32)
    # driver convention: the loop exit iteration (which produces an
    # empty level) is counted, like the stepped drivers
    assert int(np.asarray(dep)[0, 0]) == ref_labels[vis].max() + 1
    pln_np = np.asarray(pln).reshape(6, -1)
    labels = np.zeros(n, np.int32)
    for b in range(6):
        labels |= np.unpackbits(
            pln_np[b].view(np.uint8), bitorder="little")[:n].astype(
                np.int32) << b
    labels[~vis] = INF32
    labels[0] = 0
    np.testing.assert_array_equal(labels, ref_labels)


def test_deep_search_chain_path_graph():
    """Depth > 255 routes to the chain kernel in the fused driver; a
    600-vertex path (diameter 599) must come back exact."""
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    from gunrockinst_tpu.primitives import bfs_pallas
    n = 600
    u = np.arange(n - 1, dtype=np.int64)
    v = u + 1
    csr = CsrGraph.from_coo(CooGraph(
        n, np.concatenate([u, v]), np.concatenate([v, u]), None))
    labels, _, depth, _ = bfs_pallas.bfs_pallas_fused(
        csr, 0, mark_preds=False)
    ref_labels, _ = bfs_reference(csr, 0)
    np.testing.assert_array_equal(labels, ref_labels)
    assert depth == n  # exit-iteration counted (stepped convention)


def test_bfs_mega_directed_relabeled(monkeypatch):
    """Directed (asymmetric) graphs through the mega driver: the
    destination-side reach mask degrades to the safe has-in-edges
    superset; labels must stay exact, with and without relabeling."""
    from gunrockinst_tpu.graph.rmat import rmat_graph
    for force in (False, True):
        if force:
            monkeypatch.setenv("GT_BFS_RELABEL", "force")
        csr = rmat_graph(13, 6, undirected=False, seed=41 + force)
        for src in (0, 999):
            res = bfs.run(csr, src, mark_preds=False,
                          traversal_mode="mega")
            ref_labels, _ = bfs_reference(csr, src)
            np.testing.assert_array_equal(res.labels, ref_labels)
