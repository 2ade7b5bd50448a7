"""Betweenness centrality host reference (Brandes).

Parity: the reference validates per-source BC against Boost
`brandes_betweenness_centrality`-style references and halves the
accumulated values at the end (`tests/bc/test_bc.cu`).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from gunrockinst_tpu.graph.csr import CsrGraph


def bc_reference(csr: CsrGraph, src: int = -1):
    """Brandes BC. src >= 0: single-source accumulation (like the
    reference's per-source enactor); src == -1: all sources.

    Returns (bc_values float32 (n,), sigmas float32 (n,) for the last
    source, labels int32 (n,) for the last source).
    Final bc values are halved (test_bc.cu convention).
    """
    n = csr.num_nodes
    ro, ci = csr.row_offsets, csr.col_indices
    bc = np.zeros(n, dtype=np.float64)
    sources = range(n) if src < 0 else [src]
    sigmas = np.zeros(n, dtype=np.float64)
    labels = np.full(n, -1, dtype=np.int32)
    for s in sources:
        sigma = np.zeros(n, dtype=np.float64)
        dist = np.full(n, -1, dtype=np.int32)
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for e in range(ro[u], ro[u + 1]):
                v = int(ci[e])
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = np.zeros(n, dtype=np.float64)
        for u in reversed(order):
            for e in range(ro[u], ro[u + 1]):
                v = int(ci[e])
                if dist[v] == dist[u] + 1 and sigma[v] > 0:
                    delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
            if u != s:
                bc[u] += delta[u]
        sigmas, labels = sigma, dist
    return ((bc * 0.5).astype(np.float32), sigmas.astype(np.float32), labels)
