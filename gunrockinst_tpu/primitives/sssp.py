"""Single-source shortest paths (delta-stepping near/far buckets).

Re-expression of gunrock/app/sssp (sssp_problem/functor/enactor) and
the near-far priority queue (gunrock/priority_queue/kernel.cuh): the
atomicMin relax (sssp_functor.cuh:64) becomes scatter-min; the
Bisect/Compact near-far split (priority_queue/kernel.cuh:161-405)
becomes bucket masks `dist // delta == level` on the pending bitmap —
no compaction queues needed.

Three modes:
  * "delta"   — near/far delta-stepping (the reference's strategy).
  * "bellman" — relax the whole pending set each round (frontier
    Bellman-Ford); fewer, heavier rounds.
  * "sparse"  — Bellman rounds with a per-round size switch: rounds
    whose pending out-edges fit E_CAP run an LB expand over only those
    edges (work proportional to the frontier, not m); fat rounds fall
    back to the full gather.  The default: 3-5x faster end-to-end on
    power-law graphs where only 1-2 rounds are fat.

All converge to the unique least fixpoint of the float32 Bellman
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

    # sparse-round machinery (mode="sparse"): LB expand of ONLY the
    # pending vertices' out-edges (GetEdgeCounts -> Scan -> BinarySearch,
    # edge_map_partitioned/kernel.cuh:242-559) when they fit the static
    # caps; a full edge gather otherwise.  At rmat-s20 most Bellman
    # rounds after the hub wave touch <1% of m, but the dense relax
    # costs a full 31.5M-edge gather+scatter (~1 s on this backend) —
    # sparse rounds cut those to E_CAP-bounded work.
    V_CAP = int(min(1 << 16, n_pad))
    E_CAP = int(min(1 << 18, graph.m_pad))
    m_pad = graph.m_pad

    def relax_sparse(dist, pending):
        ids = jnp.nonzero(pending, size=V_CAP,
                          fill_value=n_pad - 1)[0].astype(jnp.int32)
        ok = pending[ids]
        dg = jnp.where(ok, graph.out_degree[ids], 0)
        cum = jnp.cumsum(dg)
        st = jnp.where(ok, graph.row_offsets[ids], 0)
        j = jnp.arange(E_CAP, dtype=jnp.int32)
        k = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        k = jnp.minimum(k, V_CAP - 1)
        base = jnp.where(k > 0, cum[jnp.maximum(k - 1, 0)], 0)
        eidx = jnp.clip(st[k] + (j - base), 0, m_pad - 1)
        valid = j < cum[-1]
        dstv = jnp.where(valid, edst[eidx], graph.n)
        vals = jnp.where(valid, dist[ids[k]] + w[eidx], F_INF)
        relaxed = jnp.full((n_pad,), F_INF).at[dstv].min(vals)
        newdist = jnp.minimum(dist, relaxed)
        return newdist, newdist < dist

    def body(carry):
        dist, pending, level, it = carry
        if mode == "bellman":
            newdist, pending = relax_set(dist, pending, pending)
            return newdist, pending, level, it + 1
        if mode == "sparse":
            pcount = jnp.sum(pending.astype(jnp.int32))
            pedges = jnp.sum(jnp.where(pending, graph.out_degree, 0))
            use_sparse = (pcount <= V_CAP) & (pedges <= E_CAP)
            newdist, pending = jax.lax.cond(
                use_sparse,
                lambda a: relax_sparse(*a),
                lambda a: relax_set(a[0], a[1], a[1]),
                (dist, pending))
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


import time as _time
import weakref

_planes_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_sssp_planes(csr, interpret=None):
    """Per-graph cached fused Bellman driver over the value-plane min
    kernel (ops/pallas_value.py): whole relax loop is ONE jitted
    lax.while_loop of full min-plus sweeps; distances/candidates stay
    f32-bit-exact, so the fixpoint equals the Dijkstra oracle bitwise.
    Changed-source words give BFS-style region skipping per round.
    Re-expression of the reference's atomicMin relax rounds
    (gunrock/app/sssp/sssp_functor.cuh:64, sssp_enactor.cuh:253-376)
    without the near-far queue: a full-sweep round costs ~one BFS sweep
    here, so bucketing buys nothing on this substrate.

    Returns fn(src) -> (dist (n,) f32 np, iterations, device_ms)."""
    import jax
    import jax.numpy as jnp
    from gunrockinst_tpu.ops.pallas_value import (
        ValueStepper, _build_fitting_plan, _with_perm,
        get_unweighted_plan, layout_words, unlayout_vals,
        bitmajor_fill_np)
    from gunrockinst_tpu.graph.relabel import relabeled

    hit = _planes_cache.get(csr)
    if hit is not None:
        return hit
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = csr.num_nodes
    csr_p, _rperm = relabeled(csr)
    csc = csr_p.transposed()
    w = (csc.edge_values.astype(np.float32)
         if csc.edge_values is not None
         else np.ones(csc.col_indices.shape[0], np.float32))
    # uniform weights (the unweighted-graph case): add the constant
    # in-kernel instead of streaming a weight tile per edge tile —
    # halves both the one-time host->HBM plan transfer over the tunnel
    # and the per-sweep DMA traffic
    uniform = w.size == 0 or bool(np.all(w == w.flat[0]))
    if uniform:
        plan = get_unweighted_plan(csr)   # shared with pr/cc planes
        const_w = float(w.flat[0]) if w.size else 1.0
    else:
        plan = _with_perm(
            _build_fitting_plan(csc.row_offsets, csc.col_indices, n,
                                weights=w), _rperm)
        const_w = None
    stepper = ValueStepper(plan, mode="min", f32=True,
                           use_active=True, const_w=const_w,
                           interpret=interpret)
    rows_w = plan.rows_w
    inf_acc = jnp.asarray(bitmajor_fill_np(float("inf"), rows_w))
    limit = 4 * n + 8

    @jax.jit
    def loop(scal, hbm, acc0, ch0):
        def cond(c):
            acc, ch, it = c
            return jnp.any(ch != 0) & (it < limit)

        def body(c):
            acc, ch, it = c
            acc2, ch2 = stepper.step_with(scal, hbm, acc, ch)
            return acc2, ch2, it + 1

        acc, ch, it = jax.lax.while_loop(cond, body,
                                         (acc0, ch0, jnp.int32(0)))
        return acc, it

    def fn(src):
        # source staging: dist[src]=0.0 in word-row-major layout
        # (vertex v lives at row (v//4096)*32 + (v%32),
        #  lane (v//32)%128; 0.0f bits == 0) — in LAYOUT ids, i.e.
        # after the plan's internal degree relabeling
        ls = int(src) if plan.perm is None else int(plan.perm[src])
        acc0 = inf_acc.at[(ls // 4096) * 32 + (ls % 32),
                          (ls // 32) % 128].set(0)
        chm = np.zeros(n, bool)
        chm[src] = True
        ch0 = jnp.asarray(layout_words(plan, chm))
        t0 = _time.perf_counter()
        acc, it = loop(stepper.scal_args, stepper.hbm_args, acc0, ch0)
        it = int(it)   # scalar fetch forces completion (axon quirk)
        device_ms = (_time.perf_counter() - t0) * 1e3
        dist = unlayout_vals(plan, np.asarray(acc), n, np.float32)
        return dist, it, device_ms

    _planes_cache[csr] = fn
    return fn


@dataclasses.dataclass
class SsspResult:
    dist: np.ndarray
    preds: np.ndarray
    stats: Stats


def run(graph: GraphLike, src: int, delta: Optional[float] = None,
        mode: str = "sparse", mark_preds: bool = True) -> SsspResult:
    """Host entry (run_sssp analog, app/sssp/sssp_app.cu).
    mode="planes" routes through the fused value-plane min-plus kernel
    (needs a host CsrGraph; distances still bitwise == Dijkstra)."""
    if mode == "planes":
        from gunrockinst_tpu.graph.csr import CsrGraph
        if not isinstance(graph, CsrGraph):
            raise TypeError("mode='planes' needs a host CsrGraph")
        if not (0 <= src < graph.num_nodes):
            raise ValueError(
                f"source vertex {src} out of range [0, {graph.num_nodes})")
        if (graph.edge_values is not None
                and np.any(graph.edge_values < 0)):
            raise ValueError("SSSP requires non-negative edge weights")
        fn = get_sssp_planes(graph)
        fn(src)  # warm-up (compile)
        dist_np, it, device_ms = fn(src)
        preds_np = None
        if mark_preds:
            g = device_graph(graph)
            n_pad = g.n_pad
            dist_pad = jnp.asarray(np.pad(
                dist_np, (0, n_pad - graph.num_nodes),
                constant_values=np.inf))
            achieves = jnp.isfinite(dist_pad[g.edge_src]) & (
                dist_pad[g.edge_src] + g.edge_w == dist_pad[g.edge_dst])
            preds = jnp.full((n_pad,), INT_MAX, jnp.int32).at[
                g.edge_dst].min(jnp.where(achieves, g.edge_src, INT_MAX))
            preds = jnp.where(jnp.isfinite(dist_pad) & (preds != INT_MAX),
                              preds, -1)
            preds = preds.at[src].set(-1)
            preds_np = np.asarray(preds)[: graph.num_nodes]
        visited = np.isfinite(dist_np)
        deg = np.diff(graph.row_offsets)
        stats = Stats(elapsed_ms=device_ms, search_depth=int(it),
                      nodes_visited=int(visited.sum()),
                      edges_visited=int(deg[visited].sum()))
        return SsspResult(dist=dist_np, preds=preds_np, stats=stats)
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
