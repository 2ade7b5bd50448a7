"""Neighbor sampling.

BASELINE.json's north star includes neighbor sampling alongside the
primitive zoo (the building block the reference's frontier machinery is
typically extended with for GNN workloads). TPU-native design: fully
static shapes — every frontier vertex draws exactly `k` samples (with
replacement) from its adjacency via random offsets into the CSR
segment; isolated vertices yield the dummy vertex with a validity mask.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph


@functools.partial(jax.jit, static_argnames=("k",))
def sample_neighbors(graph: DeviceGraph, vertex_ids, key,
                     k: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Uniform-with-replacement k-neighbor sampling.

    vertex_ids: (B,) int32 (dummy id graph.n allowed — masked out).
    Returns (neighbors (B,k) int32, edge_ids (B,k) int32,
    valid (B,k) bool).
    """
    B = vertex_ids.shape[0]
    deg = graph.out_degree[vertex_ids]                     # (B,)
    start = graph.row_offsets[vertex_ids]
    u = jax.random.uniform(key, (B, k))
    off = jnp.floor(u * jnp.maximum(deg, 1)[:, None]).astype(jnp.int32)
    off = jnp.minimum(off, jnp.maximum(deg - 1, 0)[:, None])
    eid = start[:, None] + off
    valid = jnp.broadcast_to(
        (deg > 0)[:, None] & (vertex_ids != graph.n)[:, None], (B, k))
    eid = jnp.where(valid, eid, graph.m_pad - 1)
    nbrs = jnp.where(valid, graph.edge_dst[eid], graph.n)
    return nbrs, eid, valid


@functools.partial(jax.jit, static_argnames=("k", "hops"))
def sample_khop(graph: DeviceGraph, seeds, key, k: int,
                hops: int):
    """Multi-hop fanout sampling (GraphSAGE-style): returns a list of
    per-hop (vertices, neighbors, valid) layers; layer i expands every
    vertex of layer i-1 by k samples. Output widths are static:
    |seeds| * k^i."""
    layers = []
    frontier = seeds
    for h in range(hops):
        key, sub = jax.random.split(key)
        nbrs, eids, valid = sample_neighbors(graph, frontier, sub, k)
        layers.append((frontier, nbrs, valid))
        frontier = nbrs.reshape(-1)
    return layers
