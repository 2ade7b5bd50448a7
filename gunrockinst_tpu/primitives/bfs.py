"""Breadth-first search.

Re-expression of the reference BFS primitive
(gunrock/app/bfs/{bfs_problem,bfs_functor,bfs_enactor}.cuh): labels +
optional predecessors, advance(V2V) + filter per level until the
frontier empties. The atomicCAS child-claim (bfs_functor.cuh:56-58)
becomes a deterministic scatter-min of parent ids; the mapped-memory
`done` flag handshake becomes a `lax.while_loop` condition on the
frontier bitmap; the entire search runs as ONE compiled program with no
host round-trips.

Three traversal strategies (the --traversal-mode analog):
  * "dense"  — O(m) edge-centric sweep per level (LB-at-the-limit).
  * "sparse" — compacted frontier + LB-style lane expansion, capacity
    tiers chosen per level inside the loop via `lax.cond`
    (light/heavy split analog).
  * "auto"   — sparse for light levels, dense for heavy ones.
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


@functools.partial(jax.jit, static_argnames=("mark_preds", "max_depth"))
def bfs_dense(graph: DeviceGraph, src, mark_preds: bool = True,
              max_depth: Optional[int] = None):
    """Whole-search BFS as one while_loop of dense sweeps.

    Returns (labels, preds, depth, total_queued). labels[v] = INT_MAX
    if unreachable; preds = -1 where undefined (and everywhere if
    mark_preds=False).
    """
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    limit = max_depth if max_depth is not None else graph.n + 1

    labels0 = jnp.full((n_pad,), INT_MAX, jnp.int32).at[src].set(0)
    preds0 = jnp.full((n_pad,), -1, jnp.int32)
    frontier0 = fr.singleton_bitmap(src, n_pad)

    def cond(carry):
        labels, preds, frontier, depth, queued = carry
        return jnp.any(frontier) & (depth < limit)

    def body(carry):
        labels, preds, frontier, depth, queued = carry
        active = frontier[esrc]
        cand = active & (labels[edst] == INT_MAX)
        touched = jnp.zeros((n_pad,), jnp.bool_).at[edst].max(cand)
        newf = touched & (labels == INT_MAX)
        labels = jnp.where(newf, depth + 1, labels)
        if mark_preds:
            pmin = jnp.full((n_pad,), INT_MAX, jnp.int32).at[edst].min(
                jnp.where(cand, esrc, INT_MAX))
            preds = jnp.where(newf, pmin, preds)
        # total_queued counts expanded frontier out-edges (the
        # reference's pre-filter advance enqueues — one per scanned
        # edge — so redundant work % compares enqueues against useful
        # edge visits, app/bfs/bfs_app.cu:115; deterministic dedup
        # makes it ~0 here)
        queued = queued + jnp.sum(active.astype(jnp.int32))
        return labels, preds, newf, depth + 1, queued

    labels, preds, frontier, depth, queued = jax.lax.while_loop(
        cond, body, (labels0, preds0, frontier0, jnp.int32(0),
                     jnp.int32(1)))
    return labels, preds, depth, queued


@functools.partial(jax.jit,
                   static_argnames=("mark_preds", "max_depth", "mode"))
def bfs_sparse(graph: DeviceGraph, src, mark_preds: bool = True,
               max_depth: Optional[int] = None, mode: str = "auto"):
    """BFS with compacted frontiers and tiered lane expansion.

    Each level compacts the frontier bitmap to an id list, then picks
    an expansion capacity tier (powers of 4 up to m_pad) matching the
    frontier's total out-degree; `lax.switch` executes only the chosen
    tier. mode="auto" falls back to the dense sweep for heavy levels
    (neighbor count > m_pad/4).

    Measured status (scripts/bench_road.py): this path does NOT beat
    the dense sweep anywhere we can measure.  Per level it pays an
    O(n) bitmap compaction + O(n) scatter floor, so on bounded-degree
    graphs (road networks, m ~= 4n) the dense sweep's single O(m)
    pass is cheaper (grid side=256: dense 249 ms vs auto 547 ms on
    CPU); and on power-law graphs the light levels where LB expansion
    should win are drowned by the axon backend's 10-100x-off-roofline
    sparse XLA primitives (nonzero/searchsorted/scatter — see
    CLAUDE.md).  It is kept as the LB-advance parity mode
    (`edge_map_partitioned/kernel.cuh`, CLI --traversal-mode=sparse)
    and because `ops.advance.advance_sparse` is the engine of SSSP's
    winning sparse mode, where the relax set is pre-masked and the
    compaction amortizes over 3-5x fewer fat rounds.
    """
    from gunrockinst_tpu.ops.advance import advance_sparse, degree_sum

    n_pad, m_pad = graph.n_pad, graph.m_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    limit = max_depth if max_depth is not None else graph.n + 1

    # capacity tiers: 4^k * 512 lanes, capped by m_pad (light/heavy split)
    tiers = []
    t = min(512, m_pad)
    while t < m_pad:
        tiers.append(t)
        t *= 4
    tiers.append(m_pad)
    v_cap = n_pad  # frontier id capacity

    labels0 = jnp.full((n_pad,), INT_MAX, jnp.int32).at[src].set(0)
    preds0 = jnp.full((n_pad,), -1, jnp.int32)
    frontier0 = fr.singleton_bitmap(src, n_pad)

    def edge_fn(s, d, w, eid, state):
        labels = state
        return labels[d] == INT_MAX, s

    def tier_branch(cap):
        def run(args):
            ids, num, labels = args
            pmin, touched = advance_sparse(
                graph, ids, num, edge_fn, state=labels, combine="min",
                payload_dtype=jnp.int32, e_cap=cap)
            return pmin, touched
        return run

    def dense_branch(args):
        ids, num, labels = args
        frontier = fr.bitmap_from_ids(
            jnp.where(jnp.arange(v_cap, dtype=jnp.int32)
                      < num, ids, graph.n), n_pad)
        active = frontier[esrc]
        cand = active & (labels[edst] == INT_MAX)
        touched = jnp.zeros((n_pad,), jnp.bool_).at[edst].max(cand)
        pmin = jnp.full((n_pad,), INT_MAX, jnp.int32).at[edst].min(
            jnp.where(cand, esrc, INT_MAX))
        return pmin, touched

    branches = [tier_branch(c) for c in tiers]
    if mode == "auto":
        # replace the heaviest tiers with the dense sweep
        branches = [dense_branch if c > m_pad // 4 else tier_branch(c)
                    for c in tiers]

    tier_bounds = jnp.asarray(tiers, dtype=jnp.int32)

    def cond(carry):
        labels, preds, frontier, depth, queued = carry
        return jnp.any(frontier) & (depth < limit)

    def body(carry):
        labels, preds, frontier, depth, queued = carry
        ids, num = fr.compact(frontier, v_cap, graph.n)
        need = degree_sum(graph, frontier).astype(jnp.int32)
        tier = jnp.searchsorted(tier_bounds, need, side="left")
        tier = jnp.clip(tier, 0, len(branches) - 1)
        pmin, touched = jax.lax.switch(tier, branches, (ids, num, labels))
        newf = touched & (labels == INT_MAX)
        labels = jnp.where(newf, depth + 1, labels)
        if mark_preds:
            preds = jnp.where(newf, pmin, preds)
        # expanded out-edges of the frontier (see bfs_dense's note)
        queued = queued + need
        return labels, preds, newf, depth + 1, queued

    labels, preds, frontier, depth, queued = jax.lax.while_loop(
        cond, body, (labels0, preds0, frontier0, jnp.int32(0),
                     jnp.int32(1)))
    return labels, preds, depth, queued


@dataclasses.dataclass
class BfsResult:
    labels: np.ndarray
    preds: Optional[np.ndarray]
    stats: Stats


def run(graph: GraphLike, src: int, mark_preds: bool = True,
        traversal_mode: str = "dense",
        max_depth: Optional[int] = None) -> BfsResult:
    """Host entry (run_bfs analog, app/bfs/bfs_app.cu:241).

    traversal_mode="auto" picks the fastest applicable path, like the
    reference's default mode selection: the mega kernel when a host
    CsrGraph was given, the whole search fits its VMEM word maps, and
    no depth cap was requested; the XLA light/heavy heuristic
    otherwise."""
    if traversal_mode == "auto" and max_depth is None:
        from gunrockinst_tpu.graph.csr import CsrGraph as _C
        from gunrockinst_tpu.ops.pallas_mega import sweep_fits as _sf
        if isinstance(graph, _C) and _sf(graph.num_nodes):
            traversal_mode = "mega"
    if traversal_mode in ("pallas", "mega"):
        from gunrockinst_tpu.graph.csr import CsrGraph
        from gunrockinst_tpu.primitives.bfs_pallas import bfs_pallas_fused
        if not isinstance(graph, CsrGraph):
            raise TypeError(f"traversal_mode='{traversal_mode}' needs a "
                            "host CsrGraph (the pull plan is built from it)")
        if not (0 <= src < graph.num_nodes):
            raise ValueError(f"source vertex {src} out of range "
                             f"[0, {graph.num_nodes})")
        # "mega" = whole search in one kernel; "pallas" = per-level v2
        # sweeps fused in a lax.while_loop
        variant = "mega" if traversal_mode == "mega" else "fused"
        out = bfs_pallas_fused(graph, src, mark_preds=False,
                               variant=variant)  # warm-up
        # timed: device traversal only (reference times Enact(); Extract
        # runs outside the GpuTimer, tests/bfs/test_bfs.cu:402-431)
        labels_np, _, depth, device_ms = bfs_pallas_fused(
            graph, src, mark_preds=False, variant=variant)
        preds_np = None
        if mark_preds:
            _, preds_np, _, _ = bfs_pallas_fused(graph, src,
                                                 mark_preds=True,
                                                 variant=variant)
        visited = labels_np != INF32
        deg = np.diff(graph.row_offsets)
        stats = Stats(
            elapsed_ms=device_ms,
            search_depth=(int(labels_np[visited].max())
                          if visited.any() else 0),
            nodes_visited=int(visited.sum()),
            edges_visited=int(deg[visited].sum()),
            # pull kernel: every visited vertex's out-edges are scanned
            # exactly once from the frontier side, dedup is exact (bit
            # OR) — enqueue count == useful edge visits, 0% redundant
            total_queued=int(deg[visited].sum()),
        )
        return BfsResult(labels=labels_np, preds=preds_np, stats=stats)

    g = device_graph(graph)
    if not (0 <= src < g.n):
        raise ValueError(f"source vertex {src} out of range [0, {g.n})")
    fn = {"dense": bfs_dense,
          "sparse": functools.partial(bfs_sparse, mode="sparse"),
          "auto": functools.partial(bfs_sparse, mode="auto")}[traversal_mode]
    # warm-up compile, then timed run (reference averages over
    # --iteration-num runs after a cold start; we time the warm run)
    out = fn(g, src, mark_preds=mark_preds, max_depth=max_depth)
    sync(out[2])
    with Timer() as t:
        labels, preds, depth, queued = fn(g, src, mark_preds=mark_preds,
                                          max_depth=max_depth)
        sync(depth)
    labels_np = np.asarray(labels)[: g.n]
    visited = labels_np != INF32
    deg = np.asarray(g.out_degree)[: g.n]
    stats = Stats(
        elapsed_ms=t.elapsed_ms,
        search_depth=int(labels_np[visited].max()) if visited.any() else 0,
        nodes_visited=int(visited.sum()),
        edges_visited=int(deg[visited].sum()),
        total_queued=int(queued),
    )
    return BfsResult(
        labels=labels_np,
        preds=np.asarray(preds)[: g.n] if mark_preds else None,
        stats=stats,
    )
