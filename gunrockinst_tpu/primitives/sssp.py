"""Single-source shortest paths (delta-stepping near/far buckets).

Re-expression of gunrock/app/sssp (sssp_problem/functor/enactor) and
the near-far priority queue (gunrock/priority_queue/kernel.cuh): the
atomicMin relax (sssp_functor.cuh:64) becomes scatter-min; the
Bisect/Compact near-far split (priority_queue/kernel.cuh:161-405)
becomes bucket masks `dist // delta == level` on the pending bitmap —
no compaction queues needed.

Two modes:
  * "delta"   — near/far delta-stepping (the reference's strategy).
  * "bellman" — relax the whole pending set each round (frontier
    Bellman-Ford); fewer, heavier rounds — often better on TPU where
    sweep cost is flat in frontier size.

Both converge to the unique least fixpoint of the float32 Bellman
operator, so distances match the Dijkstra oracle bitwise.
Predecessors are derived post-hoc from final distances with min-vertex
-id tie-break (deterministic, unlike the reference's atomics).
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
from gunrockinst_tpu.primitives.base import (GraphLike, Stats, Timer,
                                             device_graph, sync)

F_INF = jnp.float32(jnp.inf)
INT_MAX = jnp.iinfo(jnp.int32).max


@functools.partial(jax.jit, static_argnames=("mode", "max_iter"))
def sssp_kernel(graph: DeviceGraph, src, delta,
                mode: str = "delta", max_iter: Optional[int] = None):
    """Returns (dist (n_pad,) f32, preds (n_pad,) i32, iterations)."""
    n_pad = graph.n_pad
    esrc, edst, w = graph.edge_src, graph.edge_dst, graph.edge_w
    limit = max_iter if max_iter is not None else 4 * graph.n + 8

    dist0 = jnp.full((n_pad,), F_INF).at[src].set(0.0)
    pending0 = fr.singleton_bitmap(src, n_pad)

    def cond(carry):
        dist, pending, level, it = carry
        return jnp.any(pending) & (it < limit)

    def relax_set(dist, pending, active):
        cand = active[esrc]
        vals = jnp.where(cand, dist[esrc] + w, F_INF)
        relaxed = jnp.full((n_pad,), F_INF).at[edst].min(vals)
        newdist = jnp.minimum(dist, relaxed)
        changed = newdist < dist
        pending = (pending & ~active) | changed
        return newdist, pending

    def body(carry):
        dist, pending, level, it = carry
        if mode == "bellman":
            newdist, pending = relax_set(dist, pending, pending)
            return newdist, pending, level, it + 1
        # delta-stepping: near/far bucket split (ops/priority.py)
        from gunrockinst_tpu.ops.priority import near_far_split
        near, _far = near_far_split(pending, dist, level, delta)
        has_near = jnp.any(near)

        def do_relax(args):
            dist, pending, level = args
            newdist, pending = relax_set(dist, pending, near)
            return newdist, pending, level

        def bump_level(args):
            dist, pending, level = args
            # jump straight to the bucket of the nearest pending vertex
            # (one level-bump per iteration would stall for tiny delta)
            from gunrockinst_tpu.ops.priority import next_nonempty_level
            return dist, pending, next_nonempty_level(pending, dist,
                                                      level, delta)

        dist, pending, level = jax.lax.cond(
            has_near, do_relax, bump_level, (dist, pending, level))
        return dist, pending, level, it + 1

    dist, pending, level, it = jax.lax.while_loop(
        cond, body, (dist0, pending0, jnp.int32(0), jnp.int32(0)))

    # post-hoc deterministic predecessors from final distances
    achieves = jnp.isfinite(dist[esrc]) & (dist[esrc] + w == dist[edst])
    preds = jnp.full((n_pad,), INT_MAX, jnp.int32).at[edst].min(
        jnp.where(achieves, esrc, INT_MAX))
    preds = jnp.where(jnp.isfinite(dist) & (preds != INT_MAX), preds, -1)
    preds = preds.at[src].set(-1)
    return dist, preds, it


@dataclasses.dataclass
class SsspResult:
    dist: np.ndarray
    preds: np.ndarray
    stats: Stats


def run(graph: GraphLike, src: int, delta: Optional[float] = None,
        mode: str = "delta", mark_preds: bool = True) -> SsspResult:
    """Host entry (run_sssp analog, app/sssp/sssp_app.cu)."""
    g = device_graph(graph)
    if not (0 <= src < g.n):
        raise ValueError(f"source vertex {src} out of range [0, {g.n})")
    # negative weights: neither delta-stepping nor the reference's
    # atomicMin relax (sssp_functor.cuh:64) terminates meaningfully on
    # negative cycles, and the Dijkstra oracle is undefined — reject
    # loudly instead of converging to garbage
    if bool(jnp.any(g.edge_w < 0)):
        raise ValueError("SSSP requires non-negative edge weights")
    if delta is None:
        # near/far split granularity: mean edge weight (the reference
        # exposes --delta-factor; auto default here)
        mean_w = float(jnp.sum(g.edge_w) / max(g.m, 1))
        delta = max(mean_w, 1e-6)
    out = sssp_kernel(g, src, jnp.float32(delta), mode=mode)
    sync(out[2])
    with Timer() as t:
        dist, preds, it = sssp_kernel(g, src, jnp.float32(delta), mode=mode)
        sync(it)
    dist_np = np.asarray(dist)[: g.n]
    visited = np.isfinite(dist_np)
    deg = np.asarray(g.out_degree)[: g.n]
    stats = Stats(
        elapsed_ms=t.elapsed_ms,
        search_depth=int(it),
        nodes_visited=int(visited.sum()),
        edges_visited=int(deg[visited].sum()),
    )
    return SsspResult(dist=dist_np,
                      preds=np.asarray(preds)[: g.n] if mark_preds else None,
                      stats=stats)
