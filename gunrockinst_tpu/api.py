"""Stable flat-array API.

Parity with the reference's public C API (gunrock/gunrock.h:51-152:
`GunrockGraph` + `gunrock_{bfs,bc,cc,sssp,pr,topk}_func` and the
dispatch/run pattern in app/*/_app.cu): each function takes raw CSR
arrays (row_offsets, col_indices[, values]) plus a config and returns
plain NumPy arrays — no framework types needed by the caller. The
shared-lib C clients of the reference (shared_lib_tests/test_*.c)
translate to exactly these calls.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gunrockinst_tpu.graph.csr import CsrGraph


def _graph(row_offsets, col_indices, edge_values=None) -> CsrGraph:
    return CsrGraph(
        row_offsets=np.asarray(row_offsets),
        col_indices=np.asarray(col_indices, dtype=np.int32),
        edge_values=(None if edge_values is None
                     else np.asarray(edge_values, dtype=np.float32)))


def bfs(row_offsets, col_indices, src: int, mark_preds: bool = False,
        traversal_mode: str = "dense"
        ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """gunrock_bfs_func analog. Returns (labels, preds|None)."""
    from gunrockinst_tpu.primitives import bfs as m
    res = m.run(_graph(row_offsets, col_indices), src,
                mark_preds=mark_preds, traversal_mode=traversal_mode)
    return res.labels, res.preds


def sssp(row_offsets, col_indices, edge_values, src: int,
         mark_preds: bool = False
         ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """gunrock_sssp_func analog. Returns (distances, preds|None)."""
    from gunrockinst_tpu.primitives import sssp as m
    res = m.run(_graph(row_offsets, col_indices, edge_values), src,
                mark_preds=mark_preds)
    return res.dist, res.preds


def cc(row_offsets, col_indices) -> Tuple[np.ndarray, int]:
    """gunrock_cc_func analog. Returns (component_ids, num_components)."""
    from gunrockinst_tpu.primitives import cc as m
    res = m.run(_graph(row_offsets, col_indices))
    return res.component_ids, res.num_components


def bc(row_offsets, col_indices, src: int = -1) -> np.ndarray:
    """gunrock_bc_func analog. Returns bc values."""
    from gunrockinst_tpu.primitives import bc as m
    return m.run(_graph(row_offsets, col_indices), src=src).bc_values


def pagerank(row_offsets, col_indices, delta: float = 0.85,
             threshold: float = 0.01, max_iter: int = 50, src: int = -1
             ) -> Tuple[np.ndarray, np.ndarray]:
    """gunrock_pr_func analog. Returns (node_ids desc-by-rank, ranks)."""
    from gunrockinst_tpu.primitives import pr as m
    res = m.run(_graph(row_offsets, col_indices), delta=delta,
                threshold=threshold, max_iter=max_iter, src=src)
    return res.node_ids, res.sorted_ranks


def topk(row_offsets, col_indices, k: int):
    """gunrock_topk_func analog. Returns (node_ids, centralities,
    in_degrees, out_degrees)."""
    from gunrockinst_tpu.primitives import topk as m
    res = m.run(_graph(row_offsets, col_indices), k)
    return (res.node_ids, res.centralities, res.in_degrees,
            res.out_degrees)
