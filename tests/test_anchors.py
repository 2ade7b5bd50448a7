"""BASELINE.md correctness anchors (reference CTest analog).

The reference's CTest block (root CMakeLists.txt, add_test tail)
asserts stdout regexes like ``Node_ID.*0.*: BC.*0.500000``.  NOTE: the
reference's own CTest invocations are broken — every driver is invoked
with NO graph argument (e.g. ``add_test(NAME TestPR COMMAND test_pr
--undirected)``), which hits ``Usage()`` and exits 1
(tests/pr/test_pr.cu:545-549, tests/bfs/test_bfs.cu:727-733), so the
regexes never actually ran upstream.  The anchor VALUES are still
meaningful against the small datasets the repo ships; we assert the
reproducible ones here:

  * BFS  label[2] == 1    (test_cc.mtx, src=0)
  * BC   bc[0] == 0.5     (test_bc.mtx, ALL sources — the reference
                           computes every source when --src=-1,
                           tests/bc/test_bc.cu:81,153)
  * CC   comp[1] == 0     (test_cc.mtx)
  * TopK node 2: in 3 / out 3  (test_cc.mtx)
  * SimpleExample prints TEST PASSED (bips98_606.mtx, CC+BFS+BC)

Unreproducible anchors, documented rather than asserted:
  * TestPR ``Page Rank 0.402378``: depends on the reference's exact
    zero-degree-compaction iteration schedule on an unknown default
    graph; with no graph argument test_pr cannot run at all.
  * TestSSSP ``Label 39``: requires the unknown weighted default graph
    (the shipped .mtx files are pattern-only; weights would be
    randomized at load, tests/sssp/test_sssp.cu).
"""

import subprocess
import sys

import numpy as np
import pytest

import jax

SMALL = "/root/reference/dataset/small"
BIPS = "/root/reference/simple_example/bips98_606.mtx"


@pytest.fixture(scope="module")
def test_cc_graph():
    from gunrockinst_tpu.graph.market import load_market
    return load_market(f"{SMALL}/test_cc.mtx")


def test_anchor_bfs_label(test_cc_graph):
    from gunrockinst_tpu.primitives import bfs
    res = bfs.run(test_cc_graph, 0, mark_preds=False)
    assert res.labels[2] == 1          # "Node_ID 2: Label 1"


def test_anchor_bc_all_sources():
    from gunrockinst_tpu.graph.market import load_market
    from gunrockinst_tpu.primitives import bc
    csr = load_market(f"{SMALL}/test_bc.mtx", undirected=True)
    res = bc.run(csr, src=-1)          # all sources, reference default
    assert res.bc_values[0] == pytest.approx(0.5)  # "Node_ID 0: BC 0.5"


def test_anchor_cc_component(test_cc_graph):
    from gunrockinst_tpu.primitives import cc
    res = cc.run(test_cc_graph)
    assert res.component_ids[1] == 0   # "Node_ID 1: Component_ID 0"


def test_anchor_topk_degrees(test_cc_graph):
    from gunrockinst_tpu.primitives import topk
    res = topk.run(test_cc_graph, test_cc_graph.num_nodes)
    pos = list(res.node_ids).index(2)
    assert res.in_degrees[pos] == 3    # "Node ID 2: in_degrees 3
    assert res.out_degrees[pos] == 3   #  : out_degrees 3"


def test_anchor_simple_example():
    p = subprocess.run(
        [sys.executable, "examples/simple_example.py", BIPS],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
        cwd="/root/repo")
    assert p.returncode == 0, p.stderr
    assert "TEST PASSED" in p.stdout
