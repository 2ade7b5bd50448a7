"""Determinism: the framework's replacement of atomics with
scatter-combines must make every primitive bit-reproducible run-to-run
(the reference is nondeterministic under atomics; SURVEY §5.2)."""

import numpy as np

from gunrockinst_tpu.primitives import bc, bfs, cc, pr, sssp


def test_bfs_deterministic(chesapeake):
    a = bfs.run(chesapeake, 0)
    b = bfs.run(chesapeake, 0)
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.preds, b.preds)


def test_sssp_deterministic(small_random):
    a = sssp.run(small_random, 0)
    b = sssp.run(small_random, 0)
    np.testing.assert_array_equal(a.dist, b.dist)
    np.testing.assert_array_equal(a.preds, b.preds)


def test_pr_bitwise_deterministic(small_random_ud):
    a = pr.run(small_random_ud)
    b = pr.run(small_random_ud)
    np.testing.assert_array_equal(a.ranks, b.ranks)  # bitwise, not allclose


def test_bc_bitwise_deterministic(chesapeake):
    a = bc.run(chesapeake, src=0)
    b = bc.run(chesapeake, src=0)
    np.testing.assert_array_equal(a.bc_values, b.bc_values)
