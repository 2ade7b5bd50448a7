"""2-D grid (lattice) graph generator — the road-network graph class.

The reference's regression set pairs power-law Kronecker graphs with
road networks (`dataset/large/Makefile`: roadNet-CA / belgium_osm /
road_usa): bounded degree (<= 4 here), huge diameter (~2*side), tiny
frontiers.  This is the graph class where a full edge sweep per level
is pathological (O(diameter * m) total work) and the compacted
sparse/auto BFS path (`primitives/bfs.bfs_sparse`) earns its keep —
total expanded lanes sum to O(m) over the whole search regardless of
depth.

No counterpart generator exists in the reference (it ships the road
graphs as downloaded .mtx files); this generator stands in for that
dataset class offline.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gunrockinst_tpu.graph.coo import CooGraph
from gunrockinst_tpu.graph.csr import CsrGraph


def grid_coo(side: int, diagonal: bool = False,
             with_values: bool = False, seed: int = 0) -> CooGraph:
    """side x side 4-neighbor lattice as a directed COO edge list
    (both directions of every lattice edge, like an undirected road
    segment).  ``diagonal=True`` adds 8-neighborhood edges.  Vertex id
    of cell (r, c) is r*side + c."""
    if side < 2:
        raise ValueError("grid side must be >= 2")
    n = side * side
    idx = np.arange(n, dtype=np.int64)
    r, c = idx // side, idx % side

    srcs, dsts = [], []

    def link(mask, dst):
        srcs.append(idx[mask])
        dsts.append(dst[mask])

    link(c + 1 < side, idx + 1)          # east
    link(c > 0, idx - 1)                 # west
    link(r + 1 < side, idx + side)       # south
    link(r > 0, idx - side)              # north
    if diagonal:
        link((r + 1 < side) & (c + 1 < side), idx + side + 1)
        link((r + 1 < side) & (c > 0), idx + side - 1)
        link((r > 0) & (c + 1 < side), idx - side + 1)
        link((r > 0) & (c > 0), idx - side - 1)

    rows = np.concatenate(srcs)
    cols = np.concatenate(dsts)
    values = None
    if with_values:
        # symmetric weights: both directions of a road segment get the
        # same length (keyed on the unordered vertex pair)
        rng = np.random.default_rng(seed)
        lo = np.minimum(rows, cols)
        hi = np.maximum(rows, cols)
        seg_w = rng.integers(1, 64, size=2 * n).astype(np.float32)
        values = seg_w[(lo * 4 + (hi - lo == 1)) % (2 * n)]
    return CooGraph(n, rows, cols, values)


def grid_graph(side: int, diagonal: bool = False,
               with_values: bool = False, seed: int = 0,
               cache_dir: Optional[str] = None) -> CsrGraph:
    """Build (or load from ``cache_dir``) the CSR for a side x side grid."""
    import os
    tag = (f"grid_s{side}_d{int(diagonal)}_v{int(with_values)}"
           f"_seed{seed}.npz")
    if cache_dir:
        path = os.path.join(cache_dir, tag)
        if os.path.exists(path):
            return CsrGraph.load(path)
    csr = CsrGraph.from_coo(grid_coo(side, diagonal=diagonal,
                                     with_values=with_values, seed=seed))
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        csr.save(os.path.join(cache_dir, tag))
    return csr
