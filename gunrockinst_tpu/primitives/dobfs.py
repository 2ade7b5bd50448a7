"""Direction-optimizing BFS (push/pull switching).

Re-expression of gunrock/app/dobfs (dobfs_problem/functor/enactor): the
three-phase enactor (normal BFS -> prep bitmap/unvisited queue ->
backward pull advance -> back to normal, dobfs_enactor.cuh:206-600)
becomes a single while_loop whose body picks push (CSR, frontier-out)
or pull (CSC, check in-neighbors of unvisited vertices) per level with
the alpha/beta heuristics of Beamer et al. that the reference
hard-codes (switch when frontier edges exceed unvisited edges / alpha;
switch back when the frontier shrinks below n / beta). The frontier
bitmap IS the reference's d_frontier_map_in/out; no prep passes are
needed because the bitmap is always maintained.

Labels (and min-id preds) are identical to plain BFS by construction.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.ops import frontier as fr
from gunrockinst_tpu.primitives.base import (GraphLike, INF32, Stats, Timer,
                                             device_graph, sync)

INT_MAX = jnp.iinfo(jnp.int32).max


@functools.partial(jax.jit, static_argnames=("mark_preds",))
def dobfs_kernel(graph: DeviceGraph, src, alpha, beta,
                 mark_preds: bool = True):
    """Returns (labels, preds, depth, pull_levels)."""
    if not graph.has_csc:
        raise ValueError("DOBFS requires a graph built with_csc=True")
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    csrc, cdst = graph.csc_src, graph.csc_dst

    labels0 = jnp.full((n_pad,), INT_MAX, jnp.int32).at[src].set(0)
    preds0 = jnp.full((n_pad,), -1, jnp.int32)
    frontier0 = fr.singleton_bitmap(src, n_pad)
    m_total = jnp.int32(graph.m)

    def cond(carry):
        labels, preds, frontier, depth, pulls = carry
        return jnp.any(frontier) & (depth <= graph.n)

    def push(args):
        labels, frontier = args
        active = frontier[esrc]
        cand = active & (labels[edst] == INT_MAX)
        touched = jnp.zeros((n_pad,), jnp.bool_).at[edst].max(cand)
        pmin = jnp.full((n_pad,), INT_MAX, jnp.int32).at[edst].min(
            jnp.where(cand, esrc, INT_MAX))
        return touched, pmin

    def pull(args):
        labels, frontier = args
        # reverse phase (ReverseBFSFunctor, dobfs_functor.cuh:45-213):
        # unvisited v scans in-neighbors; any in frontier claims it
        cand = frontier[csrc] & (labels[cdst] == INT_MAX)
        touched = jnp.zeros((n_pad,), jnp.bool_).at[cdst].max(cand)
        pmin = jnp.full((n_pad,), INT_MAX, jnp.int32).at[cdst].min(
            jnp.where(cand, csrc, INT_MAX))
        return touched, pmin

    def body(carry):
        labels, preds, frontier, depth, pulls = carry
        unvisited = labels == INT_MAX
        frontier_edges = jnp.sum(jnp.where(frontier, graph.out_degree, 0))
        unvisited_edges = jnp.sum(jnp.where(
            unvisited, graph.in_degree, 0))
        frontier_n = fr.frontier_size(frontier)
        # Beamer heuristic (reference alpha/beta switch points,
        # dobfs_enactor.cuh:397,569)
        use_pull = (frontier_edges * alpha > unvisited_edges) & (
            frontier_n * beta > jnp.int32(1))
        touched, pmin = jax.lax.cond(use_pull, pull, push,
                                     (labels, frontier))
        newf = touched & (labels == INT_MAX)
        labels = jnp.where(newf, depth + 1, labels)
        if mark_preds:
            preds = jnp.where(newf, pmin, preds)
        pulls = pulls + use_pull.astype(jnp.int32)
        return labels, preds, newf, depth + 1, pulls

    labels, preds, frontier, depth, pulls = jax.lax.while_loop(
        cond, body, (labels0, preds0, frontier0, jnp.int32(0),
                     jnp.int32(0)))
    return labels, preds, depth, pulls


@dataclasses.dataclass
class DobfsResult:
    labels: np.ndarray
    preds: Optional[np.ndarray]
    pull_levels: int
    stats: Stats


def run(graph: GraphLike, src: int, alpha: float = 6.0, beta: float = 2.0,
        mark_preds: bool = True) -> DobfsResult:
    g = device_graph(graph, with_csc=True)
    if not (0 <= src < g.n):
        raise ValueError(f"source vertex {src} out of range [0, {g.n})")
    out = dobfs_kernel(g, src, jnp.int32(alpha), jnp.int32(beta),
                       mark_preds=mark_preds)
    sync(out[2])
    with Timer() as t:
        labels, preds, depth, pulls = dobfs_kernel(
            g, src, jnp.int32(alpha), jnp.int32(beta),
            mark_preds=mark_preds)
        sync(depth)
    labels_np = np.asarray(labels)[: g.n]
    visited = labels_np != INF32
    deg = np.asarray(g.out_degree)[: g.n]
    stats = Stats(
        elapsed_ms=t.elapsed_ms,
        search_depth=int(labels_np[visited].max()) if visited.any() else 0,
        nodes_visited=int(visited.sum()),
        edges_visited=int(deg[visited].sum()),
    )
    return DobfsResult(labels=labels_np,
                       preds=np.asarray(preds)[: g.n] if mark_preds else None,
                       pull_levels=int(pulls), stats=stats)
