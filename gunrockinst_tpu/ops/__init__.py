"""Frontier operators (reference L2/L3 analog): advance, filter,
frontier representations, scatter-combines, neighbor sampling, and the
Pallas fast-path kernels."""

from gunrockinst_tpu.ops.advance import (  # noqa: F401
    advance_dense, advance_sparse, degree_sum, expand_frontier,
    neighborhood_reduce)
from gunrockinst_tpu.ops.filter import filter_frontier  # noqa: F401
from gunrockinst_tpu.ops.frontier import (  # noqa: F401
    bitmap_from_ids, compact, empty_bitmap, frontier_size,
    singleton_bitmap)
from gunrockinst_tpu.ops.sampling import (  # noqa: F401
    sample_khop, sample_neighbors)
