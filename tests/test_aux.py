"""Aux subsystems: instrumentation, checkpoint/resume, flat-array API."""

import numpy as np

from gunrockinst_tpu import api
from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.oracles import bfs_reference, cc_reference
from gunrockinst_tpu.primitives.base import INF32
from gunrockinst_tpu.utils.instrument import (ProgressTracer, SteppedBfs,
                                              load_state, save_state)


def test_stepped_bfs_matches_oracle(chesapeake):
    g = DeviceGraph.build(chesapeake, with_csc=False)
    tracer = ProgressTracer()
    s = SteppedBfs(g, 0, slice_depth=1, tracer=tracer)
    labels = s.run_to_completion()
    ref, _ = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(labels, ref)
    assert tracer.summary()["iterations"] >= 2
    assert all(r.kernel == "advance" for r in tracer.records)


def test_stepped_bfs_checkpoint_resume(tmp_path, chesapeake):
    g = DeviceGraph.build(chesapeake, with_csc=False)
    s = SteppedBfs(g, 0, slice_depth=1)
    s.step()                       # run one level
    ckpt = str(tmp_path / "bfs_state.npz")
    s.checkpoint(ckpt)
    # resume in a "new process" and finish
    r = SteppedBfs.resume(g, ckpt)
    labels = r.run_to_completion()
    ref, _ = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(labels, ref)


def test_save_load_state_roundtrip(tmp_path):
    p = str(tmp_path / "s.npz")
    save_state(p, a=np.arange(5), b=np.float32(3.5))
    out = load_state(p)
    np.testing.assert_array_equal(out["a"], np.arange(5))
    assert out["b"] == np.float32(3.5)


# ---------------- flat-array API (C API analog) ----------------

def test_api_bfs(chesapeake):
    labels, preds = api.bfs(chesapeake.row_offsets, chesapeake.col_indices,
                            src=0, mark_preds=True)
    ref_labels, ref_preds = bfs_reference(chesapeake, 0)
    np.testing.assert_array_equal(labels, ref_labels)
    np.testing.assert_array_equal(preds, ref_preds)


def test_api_cc(chesapeake):
    comp, ncomp = api.cc(chesapeake.row_offsets, chesapeake.col_indices)
    np.testing.assert_array_equal(comp, cc_reference(chesapeake))
    assert ncomp == 1


def test_api_pagerank(chesapeake):
    ids, ranks = api.pagerank(chesapeake.row_offsets,
                              chesapeake.col_indices)
    assert len(ids) == chesapeake.num_nodes
    assert (np.diff(ranks) <= 1e-9).all()


def test_api_sssp_topk_bc(small_random):
    dist, _ = api.sssp(small_random.row_offsets, small_random.col_indices,
                       small_random.edge_values, src=0)
    assert np.isfinite(dist[0]) and dist[0] == 0
    ids, cent, ind, outd = api.topk(small_random.row_offsets,
                                    small_random.col_indices, 5)
    assert len(ids) == 5 and (np.diff(cent) <= 0).all()
    bc_vals = api.bc(small_random.row_offsets, small_random.col_indices,
                     src=3)
    assert bc_vals.shape == (small_random.num_nodes,)


def test_stepped_sssp_cc_and_duty(small_random):
    from gunrockinst_tpu.primitives.base import device_graph
    from gunrockinst_tpu.utils.instrument import (ProgressTracer,
                                                  SteppedCc, SteppedSssp)
    from gunrockinst_tpu.oracles import cc_reference, sssp_reference
    g = device_graph(small_random)
    tracer = ProgressTracer()
    s = SteppedSssp(g, 0, tracer=tracer)
    dist = s.run_to_completion()
    ref, _ = sssp_reference(small_random, 0)
    np.testing.assert_array_equal(dist, ref)
    # avg_duty: device time is a sub-share of wall time, in (0, 1]
    assert 0.0 < tracer.avg_duty <= 1.0
    assert tracer.summary()["device_ms"] > 0

    tracer2 = ProgressTracer()
    c = SteppedCc(g, tracer=tracer2)
    comp = c.run_to_completion()
    np.testing.assert_array_equal(comp, cc_reference(small_random))
    assert len(tracer2.records) >= 1
