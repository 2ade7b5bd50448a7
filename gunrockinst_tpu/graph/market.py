"""MatrixMarket (.mtx) reader with binary cache.

Capability parity with the reference's `gunrock/graphio/market.cuh`
(`ReadMarketStream` :57, `BuildMarketGraph` :250/301, binary `.csr`
cache :222): parses coordinate-format .mtx (pattern or real, general or
symmetric, with or without the banner line), 1-based ids, optional
undirected/reversed handling, and caches the built CSR next to the file.

A native C++ fast parser is used when the `gunrockinst_tpu` native
extension is built (see native/graphio.cpp); NumPy fallback otherwise.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gunrockinst_tpu.graph.coo import CooGraph
from gunrockinst_tpu.graph.csr import CsrGraph


def _parse_mtx_numpy(path: str):
    """Parse .mtx into (n, rows, cols, values|None, symmetric)."""
    symmetric = False
    pattern = True
    header_seen = False
    with open(path, "r") as f:
        first = f.readline()
        if first.startswith("%%MatrixMarket"):
            tokens = first.lower().split()
            symmetric = "symmetric" in tokens or "skew-symmetric" in tokens
            pattern = "pattern" in tokens
            header_seen = True
        else:
            f.seek(0)
        # skip comments, read size line
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        parts = line.split()
        nrows, ncols, nnz = int(parts[0]), int(parts[1]), int(parts[2])
        n = max(nrows, ncols)
        data = np.loadtxt(f, ndmin=2, dtype=np.float64, max_rows=nnz)
    if data.size == 0:
        data = data.reshape(0, 2)
    # Direction convention: the reference parses each line as
    # "col row [value]" (market.cuh:150 sscanf reads ll_col first), i.e.
    # a line "a b" is the edge (b-1) -> (a-1). We match it so that
    # published per-node anchor values (BASELINE.md CTest regexes) agree.
    rows = data[:, 1].astype(np.int64) - 1
    cols = data[:, 0].astype(np.int64) - 1
    values: Optional[np.ndarray] = None
    if data.shape[1] >= 3 and (header_seen and not pattern):
        values = data[:, 2].astype(np.float32)
    elif data.shape[1] >= 3 and not header_seen:
        values = data[:, 2].astype(np.float32)
    return n, rows, cols, values, symmetric


def read_market(path: str) -> CooGraph:
    """Read a .mtx file into a COO edge list (symmetric files get both
    edge directions, like ReadMarketStream's undirected branch)."""
    try:
        from gunrockinst_tpu.graph import _native_io
        parsed = _native_io.parse_mtx(path)
    except Exception:
        parsed = None
    if parsed is not None:
        n, rows, cols, values, symmetric = parsed
    else:
        n, rows, cols, values, symmetric = _parse_mtx_numpy(path)
    coo = CooGraph(int(n), rows.astype(np.int64), cols.astype(np.int64), values)
    if symmetric:
        coo = coo.with_reverse_edges()
    return coo


def load_market(path: str, undirected: bool = False,
                use_cache: bool = True, dedupe: bool = True) -> CsrGraph:
    """Build (or load from cache) a CSR graph from a .mtx file.

    `undirected=True` adds reverse edges even for `general` files
    (reference --undirected flag). The binary cache mirrors the
    reference's `.csr` side file (market.cuh:301-331).
    """
    cache = path + (".ud" if undirected else "") + ".csr.npz"
    if use_cache and os.path.exists(cache) and (
            os.path.getmtime(cache) >= os.path.getmtime(path)):
        return CsrGraph.load(cache)
    coo = read_market(path)
    csr = CsrGraph.from_coo(coo, undirected=undirected, dedupe=dedupe)
    if use_cache:
        try:
            csr.save(cache)
        except OSError:
            pass
    return csr
