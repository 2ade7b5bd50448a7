"""Betweenness centrality (Brandes).

Re-expression of gunrock/app/bc: forward BFS accumulating path counts
(sigma, atomicAdd in bc_functor.cuh ForwardFunctor) then the backward
level replay accumulating dependencies (BackwardFunctor/-2,
bc_functor.cuh:147-253). The reference records per-level frontier
offsets in a host vector (bc_enactor.cuh:260-390 forward_queue_offsets)
to replay levels; here the labels array itself drives the replay — the
backward pass masks edges by `labels[u]+1 == labels[v]` inside a
device-side countdown loop, so the whole per-source computation is one
compiled program.

Final bc values are halved (test_bc.cu convention for undirected
double-counting).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.ops import frontier as fr
from gunrockinst_tpu.primitives.base import (GraphLike, Stats, Timer,
                                             device_graph, sync)

INT_MAX = jnp.iinfo(jnp.int32).max


@jax.jit
def bc_source_kernel(graph: DeviceGraph, src):
    """One Brandes source. Returns (delta (n_pad,) f32 dependency
    scores, sigma (n_pad,) f32, labels (n_pad,) i32, depth)."""
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst

    labels0 = jnp.full((n_pad,), INT_MAX, jnp.int32).at[src].set(0)
    sigma0 = jnp.zeros((n_pad,), jnp.float32).at[src].set(1.0)
    frontier0 = fr.singleton_bitmap(src, n_pad)

    def fcond(carry):
        labels, sigma, frontier, depth = carry
        return jnp.any(frontier) & (depth <= graph.n)

    def fbody(carry):
        labels, sigma, frontier, depth = carry
        active = frontier[esrc]
        cand = active & (labels[edst] == INT_MAX)
        touched = jnp.zeros((n_pad,), jnp.bool_).at[edst].max(cand)
        newf = touched & (labels == INT_MAX)
        labels = jnp.where(newf, depth + 1, labels)
        # path counts: sigma[v] += sigma[u] over tree-level edges
        sadd = jnp.zeros((n_pad,), jnp.float32).at[edst].add(
            jnp.where(cand, sigma[esrc], 0.0))
        sigma = jnp.where(newf, sadd, sigma)
        return labels, sigma, newf, depth + 1

    labels, sigma, _, depth = jax.lax.while_loop(
        fcond, fbody, (labels0, sigma0, frontier0, jnp.int32(0)))

    # backward dependency accumulation, deepest level first
    lab_s, lab_d = labels[esrc], labels[edst]
    sig_safe = jnp.maximum(sigma, 1e-30)

    def bcond(carry):
        delta, d = carry
        return d > 0

    def bbody(carry):
        delta, d = carry
        mask_e = (lab_s == d - 1) & (lab_d == d)
        contrib = jnp.where(
            mask_e, sigma[esrc] / sig_safe[edst] * (1.0 + delta[edst]), 0.0)
        delta = delta.at[esrc].add(contrib)
        return delta, d - 1

    delta, _ = jax.lax.while_loop(
        bcond, bbody, (jnp.zeros((n_pad,), jnp.float32), depth - 1))
    delta = delta.at[src].set(0.0)
    return delta, sigma, labels, depth


@dataclasses.dataclass
class BcResult:
    bc_values: np.ndarray
    sigmas: np.ndarray
    labels: np.ndarray
    stats: Stats


def run(graph: GraphLike, src: int = -1) -> BcResult:
    """Host entry. src >= 0: single-source accumulation (the reference
    enactor is per-source; its test loops sources); src == -1: all
    sources."""
    g = device_graph(graph)
    sources = range(g.n) if src < 0 else [src]
    out = bc_source_kernel(g, sources[0] if src >= 0 else 0)
    sync(out[3])
    bc = np.zeros(g.n_pad, dtype=np.float64)
    with Timer() as t:
        sigma = labels = None
        depth = 0
        for s in sources:
            delta, sigma, labels, d = bc_source_kernel(g, s)
            bc += np.asarray(delta, dtype=np.float64)
            depth = max(depth, int(d))
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=depth,
                  nodes_visited=g.n,
                  edges_visited=g.m * len(list(sources)))
    return BcResult(
        bc_values=(bc[: g.n] * 0.5).astype(np.float32),
        sigmas=np.asarray(sigma)[: g.n],
        labels=np.asarray(labels)[: g.n],
        stats=stats,
    )
