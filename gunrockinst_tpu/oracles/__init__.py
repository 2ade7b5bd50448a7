"""CPU reference oracles (pure NumPy).

Capability parity with the reference's per-driver CPU validators
(SimpleReferenceBfs `tests/bfs/test_bfs.cu:258`, Boost-based references
for cc/bc/pr/sssp/mst, `tests/*/test_*.cu`): each primitive gets an
independent host implementation used by the test suite for element-wise
comparison (`gunrock/util/test_utils.h:280 CompareResults` analog).
"""

from gunrockinst_tpu.oracles.traversal import bfs_reference, sssp_reference  # noqa: F401
from gunrockinst_tpu.oracles.components import cc_reference  # noqa: F401
from gunrockinst_tpu.oracles.ranking import (  # noqa: F401
    pagerank_reference, hits_reference, topk_degree_reference,
    salsa_reference,
)
from gunrockinst_tpu.oracles.centrality import bc_reference  # noqa: F401
from gunrockinst_tpu.oracles.spanning import mst_reference_weight, verify_spanning_tree  # noqa: F401
from gunrockinst_tpu.oracles.independent import verify_mis  # noqa: F401
