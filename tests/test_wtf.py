"""WTF vs oracle."""

import numpy as np

from gunrockinst_tpu.oracles.wtf import wtf_reference
from gunrockinst_tpu.primitives import wtf


def test_wtf_chesapeake(chesapeake):
    res = wtf.run(chesapeake, src=0)
    ref_rank, ref_cot, ref_ppr = wtf_reference(chesapeake, 0)
    np.testing.assert_allclose(res.ppr_ranks, ref_ppr, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(res.cot, ref_cot)
    np.testing.assert_allclose(res.wtf_ranks, ref_rank, rtol=1e-4, atol=1e-6)


def test_wtf_directed(small_random):
    res = wtf.run(small_random, src=11, cot_size=50)
    ref_rank, ref_cot, _ = wtf_reference(small_random, 11, cot_size=50)
    np.testing.assert_array_equal(res.cot, ref_cot)
    np.testing.assert_allclose(res.wtf_ranks, ref_rank, rtol=1e-4, atol=1e-6)


def test_wtf_src_scores_positive(chesapeake):
    res = wtf.run(chesapeake, src=5)
    # the personalization source must carry rank mass
    assert res.wtf_ranks[5] > 0
