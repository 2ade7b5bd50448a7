"""Dev harness: value-plane kernel vs numpy oracle (CPU interpret)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from gunrockinst_tpu.graph.coo import CooGraph
from gunrockinst_tpu.graph.csr import CsrGraph
from gunrockinst_tpu.ops.pallas_value import (
    ValueStepper, build_value_plan, to_bitmajor_np, from_bitmajor_np,
    words_from_mask, mask_from_words)


def make_graph(n, m, seed, weights=True):
    rng = np.random.default_rng(seed)
    vals = rng.integers(1, 64, m).astype(np.float32) if weights else None
    coo = CooGraph(n, rng.integers(0, n, m), rng.integers(0, n, m), vals)
    return CsrGraph.from_coo(coo)


def test_min_f32(n=500, m=4000, seed=3):
    csr = make_graph(n, m, seed)
    csc = csr.transposed()
    plan = build_value_plan(csc.row_offsets, csc.col_indices, n,
                            weights=csc.edge_values)
    rows_w = plan.rows_w
    stepper = ValueStepper(plan, mode="min", f32=True,
                           use_active=True, interpret=True)

    rng = np.random.default_rng(seed + 1)
    vals = rng.uniform(0, 100, n).astype(np.float32)
    vals[rng.random(n) < 0.3] = np.inf
    changed = rng.random(n) < 0.5

    acc0 = to_bitmajor_np(vals, rows_w)
    ch0 = words_from_mask(changed, plan.n_words)
    acc1, ch1 = stepper(jnp.asarray(acc0), jnp.asarray(ch0))
    got = from_bitmajor_np(np.asarray(acc1), n, np.float32)
    got_ch = mask_from_words(np.asarray(ch1), n)

    # oracle
    esrc = csc.col_indices
    edst = np.repeat(np.arange(n), np.diff(csc.row_offsets))
    w = csc.edge_values
    cand = np.where(changed[esrc], vals[esrc] + w, np.inf)
    out = vals.copy()
    np.minimum.at(out, edst, cand.astype(np.float32))
    np.testing.assert_array_equal(got, out)
    np.testing.assert_array_equal(got_ch, out < vals)
    print("min_f32 OK")


def test_min_i32(n=300, m=2500, seed=9):
    csr = make_graph(n, m, seed, weights=False)
    # symmetrize for CC-style label prop
    und = CsrGraph.from_coo(csr.to_coo(), undirected=True) \
        if hasattr(csr, "to_coo") else csr
    csc = csr.transposed()
    plan = build_value_plan(csc.row_offsets, csc.col_indices, n)
    rows_w = plan.rows_w
    stepper = ValueStepper(plan, mode="min", f32=False,
                           use_active=True, interpret=True)
    labels = np.arange(n, dtype=np.int32)
    changed = np.ones(n, bool)
    acc0 = to_bitmajor_np(labels, rows_w)
    ch0 = words_from_mask(changed, plan.n_words)
    acc1, ch1 = stepper(jnp.asarray(acc0), jnp.asarray(ch0))
    got = from_bitmajor_np(np.asarray(acc1), n)
    esrc = csc.col_indices
    edst = np.repeat(np.arange(n), np.diff(csc.row_offsets))
    out = labels.copy()
    np.minimum.at(out, edst, labels[esrc])
    np.testing.assert_array_equal(got, out)
    print("min_i32 OK")


def test_add_f32(n=400, m=3000, seed=5):
    csr = make_graph(n, m, seed, weights=False)
    csc = csr.transposed()
    plan = build_value_plan(csc.row_offsets, csc.col_indices, n)
    rows_w = plan.rows_w
    stepper = ValueStepper(plan, mode="add", f32=True,
                           use_active=False, zero_acc=True,
                           track_changed=False, interpret=True)
    rng = np.random.default_rng(seed + 2)
    contrib = rng.uniform(0, 1, n).astype(np.float32)
    acc0 = to_bitmajor_np(contrib, rows_w)
    ch0 = np.full((rows_w, 128), -1, np.int32)   # all regions active
    acc1, _ = stepper(jnp.asarray(acc0), jnp.asarray(ch0))
    got = from_bitmajor_np(np.asarray(acc1), n, np.float32)
    esrc = csc.col_indices
    edst = np.repeat(np.arange(n), np.diff(csc.row_offsets))
    out = np.zeros(n, np.float32)
    np.add.at(out, edst, contrib[esrc])
    # summation order differs from the oracle's: allclose, tight
    np.testing.assert_allclose(got, out, rtol=1e-6, atol=1e-6)
    print("add_f32 OK (max rel err %.2e)" % (
        np.max(np.abs(got - out) / np.maximum(out, 1e-9))))


if __name__ == "__main__":
    test_min_f32()
    test_min_i32()
    test_add_f32()
    print("all OK")
