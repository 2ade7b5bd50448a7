"""Value kernel (ops/pallas_value.py) + planes-mode primitives.

Kernel-level sweeps run against numpy oracles in interpret mode;
primitive-level planes modes (sssp/cc/pr) run against the same oracles
the XLA modes use — same answers, different substrate.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gunrockinst_tpu.graph.coo import CooGraph
from gunrockinst_tpu.graph.csr import CsrGraph
from gunrockinst_tpu.graph.rmat import rmat_graph
from gunrockinst_tpu.ops.pallas_value import (
    ValueStepper, build_value_plan, to_bitmajor_np, from_bitmajor_np,
    words_from_mask, mask_from_words)


def _graph(n, m, seed, weights=True, undirected=False):
    rng = np.random.default_rng(seed)
    vals = rng.integers(1, 64, m).astype(np.float32) if weights else None
    coo = CooGraph(n, rng.integers(0, n, m), rng.integers(0, n, m), vals)
    return CsrGraph.from_coo(coo, undirected=undirected)


def test_value_sweep_min_f32():
    csr = _graph(500, 4000, 3)
    csc = csr.transposed()
    plan = build_value_plan(csc.row_offsets, csc.col_indices,
                            csr.num_nodes, weights=csc.edge_values)
    stepper = ValueStepper(plan, mode="min", f32=True, use_active=True,
                           interpret=True)
    n = csr.num_nodes
    rng = np.random.default_rng(4)
    vals = rng.uniform(0, 100, n).astype(np.float32)
    vals[rng.random(n) < 0.3] = np.inf
    changed = rng.random(n) < 0.5
    acc1, ch1 = stepper(
        jnp.asarray(to_bitmajor_np(vals, plan.rows_w)),
        jnp.asarray(words_from_mask(changed, plan.n_words)))
    got = from_bitmajor_np(np.asarray(acc1), n, np.float32)
    esrc = csc.col_indices
    edst = np.repeat(np.arange(n), np.diff(csc.row_offsets))
    cand = np.where(changed[esrc], vals[esrc] + csc.edge_values, np.inf)
    out = vals.copy()
    np.minimum.at(out, edst, cand.astype(np.float32))
    np.testing.assert_array_equal(got, out)   # bitwise
    np.testing.assert_array_equal(mask_from_words(np.asarray(ch1), n),
                                  out < vals)


def test_value_sweep_min_i32_and_hub(monkeypatch):
    # one hub destination word (>= threshold in-region edges); the hub
    # flavor is opt-in since round 5 (GT_VALUE_HUB_T)
    monkeypatch.setenv("GT_VALUE_HUB_T", "64")
    rng = np.random.default_rng(7)
    n = 2000
    es = np.concatenate([rng.integers(0, n, 900), rng.integers(0, n, 800)])
    ed = np.concatenate([np.full(900, 7), rng.integers(0, n, 800)])
    csr = CsrGraph.from_coo(CooGraph(n, es, ed, None))
    csc = csr.transposed()
    plan = build_value_plan(csc.row_offsets, csc.col_indices, n)
    assert int(plan.hub_rs[-1]) > 0   # REAL hub subtiles exercised
    stepper = ValueStepper(plan, mode="min", f32=False, use_active=True,
                           interpret=True)
    labels = np.arange(n, dtype=np.int32)
    acc1, _ = stepper(
        jnp.asarray(to_bitmajor_np(labels, plan.rows_w)),
        jnp.asarray(words_from_mask(np.ones(n, bool), plan.n_words)))
    got = from_bitmajor_np(np.asarray(acc1), n)
    esrc = csc.col_indices
    edst = np.repeat(np.arange(n), np.diff(csc.row_offsets))
    out = labels.copy()
    np.minimum.at(out, edst, labels[esrc])
    np.testing.assert_array_equal(got, out)


def test_value_sweep_add_f32():
    csr = _graph(400, 3000, 5, weights=False)
    csc = csr.transposed()
    plan = build_value_plan(csc.row_offsets, csc.col_indices,
                            csr.num_nodes)
    stepper = ValueStepper(plan, mode="add", f32=True, use_active=False,
                           zero_acc=True, track_changed=False,
                           interpret=True)
    n = csr.num_nodes
    rng = np.random.default_rng(6)
    contrib = rng.uniform(0, 1, n).astype(np.float32)
    acc1, _ = stepper(
        jnp.asarray(to_bitmajor_np(contrib, plan.rows_w)),
        jnp.full((plan.rows_w, 128), -1, jnp.int32))
    got = from_bitmajor_np(np.asarray(acc1), n, np.float32)
    esrc = csc.col_indices
    edst = np.repeat(np.arange(n), np.diff(csc.row_offsets))
    out = np.zeros(n, np.float32)
    np.add.at(out, edst, contrib[esrc])
    np.testing.assert_allclose(got, out, rtol=1e-6, atol=1e-6)


def test_value_sweep_multi_region():
    # > 1 source region (REGION_V) exercises region ranges + rel select
    csr = _graph(40000, 3000, 11)
    csc = csr.transposed()
    plan = build_value_plan(csc.row_offsets, csc.col_indices,
                            csr.num_nodes, weights=csc.edge_values)
    assert plan.num_regions > 1
    stepper = ValueStepper(plan, mode="min", f32=True, use_active=True,
                           interpret=True)
    n = csr.num_nodes
    rng = np.random.default_rng(12)
    vals = rng.uniform(0, 50, n).astype(np.float32)
    changed = rng.random(n) < 0.7
    acc1, _ = stepper(
        jnp.asarray(to_bitmajor_np(vals, plan.rows_w)),
        jnp.asarray(words_from_mask(changed, plan.n_words)))
    got = from_bitmajor_np(np.asarray(acc1), n, np.float32)
    esrc = csc.col_indices
    edst = np.repeat(np.arange(n), np.diff(csc.row_offsets))
    cand = np.where(changed[esrc], vals[esrc] + csc.edge_values, np.inf)
    out = vals.copy()
    np.minimum.at(out, edst, cand.astype(np.float32))
    np.testing.assert_array_equal(got, out)


# ---------------- primitive planes modes ----------------

def test_sssp_planes(small_random):
    from gunrockinst_tpu.oracles.traversal import sssp_reference
    from gunrockinst_tpu.primitives import sssp
    res = sssp.run(small_random, 0, mode="planes")
    dist, preds = sssp_reference(small_random, 0)
    np.testing.assert_array_equal(res.dist, dist)   # bitwise
    np.testing.assert_array_equal(res.preds, preds)


def test_sssp_planes_unweighted(chesapeake):
    from gunrockinst_tpu.oracles.traversal import sssp_reference
    from gunrockinst_tpu.primitives import sssp
    res = sssp.run(chesapeake, 5, mode="planes")
    dist, _ = sssp_reference(chesapeake, 5)
    np.testing.assert_array_equal(res.dist, dist)


def test_cc_planes(small_random_ud):
    from gunrockinst_tpu.oracles.components import cc_reference
    from gunrockinst_tpu.primitives import cc
    res = cc.run(small_random_ud, mode="planes")
    ref = cc_reference(small_random_ud)
    np.testing.assert_array_equal(res.component_ids, ref)


def test_cc_planes_directed(small_random):
    # weak connectivity of a directed graph (symmetrized internally)
    from gunrockinst_tpu.oracles.components import cc_reference
    from gunrockinst_tpu.primitives import cc
    res = cc.run(small_random, mode="planes")
    ref = cc_reference(small_random)
    np.testing.assert_array_equal(res.component_ids, ref)


def test_pr_planes(chesapeake):
    from gunrockinst_tpu.primitives import pr
    ref = pr.run(chesapeake, mode="xla")
    res = pr.run(chesapeake, mode="planes")
    np.testing.assert_allclose(res.ranks, ref.ranks, rtol=1e-4,
                               atol=1e-5)
    assert res.stats.search_depth == ref.stats.search_depth


def test_pr_planes_personalized(small_random):
    from gunrockinst_tpu.primitives import pr
    ref = pr.run(small_random, src=3, mode="xla")
    res = pr.run(small_random, src=3, mode="planes")
    np.testing.assert_allclose(res.ranks, ref.ranks, rtol=1e-4,
                               atol=1e-5)


def test_hits_planes_matches_oracle():
    from gunrockinst_tpu.oracles import hits_reference
    from gunrockinst_tpu.primitives import hits
    for und, seed in ((True, 5), (False, 9)):
        csr = rmat_graph(8, 8, undirected=und, seed=seed)
        ref_hub, ref_auth = hits_reference(csr, 2, max_iter=10)
        res = hits.run(csr, src=2, max_iter=10, mode="planes")
        np.testing.assert_allclose(res.hub_ranks, ref_hub,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(res.auth_ranks, ref_auth,
                                   rtol=1e-4, atol=1e-6)


def test_salsa_planes_matches_oracle():
    from gunrockinst_tpu.oracles import salsa_reference
    from gunrockinst_tpu.primitives import salsa
    for und, seed in ((True, 5), (False, 9)):
        csr = rmat_graph(8, 8, undirected=und, seed=seed)
        ref_hub, ref_auth = salsa_reference(csr, max_iter=8)
        res = salsa.run(csr, max_iter=8, mode="planes")
        np.testing.assert_allclose(res.hub_ranks, ref_hub,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(res.auth_ranks, ref_auth,
                                   rtol=1e-4, atol=1e-6)


def test_wtf_planes_matches_oracle():
    from gunrockinst_tpu.oracles.wtf import wtf_reference
    from gunrockinst_tpu.primitives import wtf
    for und, seed in ((True, 5), (False, 9)):
        csr = rmat_graph(8, 8, undirected=und, seed=seed)
        src = 2
        ref_rank, ref_cot, ref_ppr = wtf_reference(csr, src, alpha=0.2,
                                                   cot_size=50)
        res = wtf.run(csr, src=src, alpha=0.2, cot_size=50,
                      mode="planes")
        np.testing.assert_allclose(res.ppr_ranks, ref_ppr,
                                   rtol=1e-3, atol=1e-6)
        # PPR ties permute the CoT order; require score-equivalence
        # per position (the reference's own rank comparisons are
        # tolerance-based for the same reason)
        np.testing.assert_allclose(ref_ppr[res.cot], ref_ppr[ref_cot],
                                   rtol=1e-3, atol=1e-6)
        # phase 3/4 checked exactly against the oracle PINNED to the
        # same circle of trust
        ref_rank2, _, _ = wtf_reference(csr, src, alpha=0.2,
                                        cot_size=50, cot=res.cot)
        np.testing.assert_allclose(res.wtf_ranks, ref_rank2,
                                   rtol=1e-3, atol=1e-6)


def test_value_kernel_randomized_modes():
    """Randomized mini-fuzz across graph shapes x kernel modes: the
    round-4 layout (word-row-major acc, row-pair supercells, block
    RMW, min-mode subtile skip) must stay exact against brute-force
    numpy combines for several rounds with evolving changed sets."""
    rng = np.random.default_rng(42)
    for trial in range(3):
        n = int(rng.integers(40, 600))
        m = int(rng.integers(n, n * 8))
        esrc = rng.integers(0, n, m).astype(np.int64)
        edst = rng.integers(0, n, m).astype(np.int64)
        w = rng.random(m).astype(np.float32) + 0.1
        from gunrockinst_tpu.graph.coo import CooGraph
        csr = CsrGraph.from_coo(CooGraph(n, esrc, edst, values=w))
        csc = csr.transposed()
        plan = build_value_plan(csc.row_offsets, csc.col_indices, n,
                                weights=csc.edge_values.astype(
                                    np.float32))
        stepper = ValueStepper(plan, mode="min", f32=True,
                               use_active=True, interpret=True)
        # brute-force oracle: one Jacobi min-plus round over changed
        es = np.repeat(np.arange(n), np.diff(csr.row_offsets))
        ed = csr.col_indices
        ww = csr.edge_values.astype(np.float32)
        dist = rng.random(n).astype(np.float32) * 10
        changed = rng.random(n) < 0.3
        acc = jnp.asarray(to_bitmajor_np(dist, plan.rows_w))
        ch = jnp.asarray(words_from_mask(changed, plan.n_words))
        for _ in range(2):
            acc, ch = stepper(acc, ch)
            exp = dist.copy()
            np.minimum.at(exp, ed[changed[es]],
                          (dist[es] + ww)[changed[es]])
            got = from_bitmajor_np(np.asarray(acc), n, np.float32)
            np.testing.assert_array_equal(got, exp)
            got_ch = mask_from_words(np.asarray(ch), n)
            np.testing.assert_array_equal(got_ch, exp < dist)
            dist, changed = exp, exp < dist


def test_planes_relabeled_exactness(monkeypatch):
    """Round-5: planes modes over the degree-sorted internal
    relabeling (ValuePlan.perm) must return results in INPUT ids —
    sssp distances bitwise, cc representatives (min input id), pr and
    hits ranks allclose, wtf ranks allclose."""
    monkeypatch.setenv("GT_BFS_RELABEL", "force")
    from gunrockinst_tpu.primitives import cc, hits, pr, sssp
    from gunrockinst_tpu.oracles import (cc_reference, hits_reference,
                                         pagerank_reference,
                                         sssp_reference)
    csr = _graph(700, 5000, 77, weights=True, undirected=True)
    from gunrockinst_tpu.ops.pallas_value import get_unweighted_plan
    assert get_unweighted_plan(csr).perm is not None

    res = sssp.run(csr, 0, mode="planes", mark_preds=False)
    ref_d, _ = sssp_reference(csr, 0)
    np.testing.assert_array_equal(res.dist, ref_d)

    rc = cc.run(csr, mode="planes")
    np.testing.assert_array_equal(rc.component_ids, cc_reference(csr))

    rp = pr.run(csr, max_iter=8, mode="planes")
    np.testing.assert_allclose(
        rp.ranks, pagerank_reference(csr, max_iter=8),
        rtol=1e-4, atol=1e-6)

    rh = hits.run(csr, src=2, max_iter=6, mode="planes")
    ref_hub, ref_auth = hits_reference(csr, 2, max_iter=6)
    np.testing.assert_allclose(rh.hub_ranks, ref_hub, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(rh.auth_ranks, ref_auth, rtol=1e-4,
                               atol=1e-6)


@pytest.mark.parametrize("force_relabel", [False, True])
def test_bc_planes_exactness(monkeypatch, force_relabel):
    """Round-5 BC fast path: level-gated value-plane sweeps must match
    Brandes (values allclose, sigma and labels exact), with and
    without the internal degree relabeling."""
    if force_relabel:
        monkeypatch.setenv("GT_BFS_RELABEL", "force")
    from gunrockinst_tpu.primitives import bc
    from gunrockinst_tpu.oracles import bc_reference
    csr = _graph(600, 4500, 13 + force_relabel, weights=False,
                 undirected=True)
    for src in (0, 99):
        res = bc.run(csr, src=src, mode="planes")
        ref_bc, ref_sigma, ref_labels = bc_reference(csr, src)
        np.testing.assert_allclose(res.bc_values, ref_bc, rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_array_equal(res.sigmas, ref_sigma)
        got = np.where(res.labels == np.iinfo(np.int32).max, -1,
                       res.labels)
        np.testing.assert_array_equal(got, ref_labels)


def test_bc_planes_disconnected():
    """Unreached vertices: sigma 0, label INF, delta 0."""
    from gunrockinst_tpu.primitives import bc
    from gunrockinst_tpu.oracles import bc_reference
    u = np.array([0, 1, 2, 4], dtype=np.int64)
    v = np.array([1, 2, 3, 5], dtype=np.int64)
    uu = np.concatenate([u, v]); vv = np.concatenate([v, u])
    csr = CsrGraph.from_coo(CooGraph(6, uu, vv, None))
    res = bc.run(csr, src=0, mode="planes")
    ref_bc, ref_sigma, ref_labels = bc_reference(csr, 0)
    np.testing.assert_allclose(res.bc_values, ref_bc, rtol=1e-5,
                               atol=1e-7)
    got = np.where(res.labels == np.iinfo(np.int32).max, -1,
                   res.labels)   # oracle marks unreached with -1
    np.testing.assert_array_equal(got, ref_labels)
    assert np.all(res.sigmas[ref_labels < 0] == 0)


def test_value_hub_flavor_exactness(monkeypatch):
    """The hub flavor (GT_VALUE_HUB_T>0) is off by default since
    round 5 but must stay exact — ADD sweep vs oracle here; the min
    hub path is covered by test_value_sweep_min_i32_and_hub."""
    monkeypatch.setenv("GT_VALUE_HUB_T", "64")
    csr = _graph(900, 40000, 21, weights=False, undirected=True)
    csc = csr.transposed()
    plan = build_value_plan(csc.row_offsets, csc.col_indices,
                            csr.num_nodes)
    assert int(plan.hub_rs[-1]) > 0        # flavor actually exercised
    n = csr.num_nodes
    rows_w = plan.rows_w
    rng = np.random.default_rng(5)
    vals = rng.uniform(0.1, 10, n).astype(np.float32)
    st = ValueStepper(plan, mode="add", f32=True, use_active=False,
                      zero_acc=True, track_changed=False,
                      interpret=True)
    acc, _ = st(jnp.asarray(to_bitmajor_np(vals.view(np.int32), rows_w)),
                jnp.full((rows_w, 128), -1, jnp.int32))
    got = from_bitmajor_np(np.asarray(acc), n, np.float32)
    esrc = np.repeat(np.arange(n), np.diff(csr.row_offsets))
    # oracle: out[dst] = sum over in-edges of vals[src]
    ref = np.zeros(n, np.float64)
    np.add.at(ref, csr.col_indices, vals[esrc].astype(np.float64))
    np.testing.assert_allclose(got, ref.astype(np.float32), rtol=1e-5,
                               atol=1e-5)
