"""The primitive zoo — all 12 of the reference's graph primitives
(SURVEY.md §2.3), each a TPU-native re-design with a CPU oracle:

bfs, dobfs, sssp, cc, bc, pr, topk, hits, salsa, wtf, mis, mst
"""

from gunrockinst_tpu.primitives import (  # noqa: F401
    bc, bfs, cc, dobfs, hits, mis, mst, pr, salsa, sssp, topk, wtf)
