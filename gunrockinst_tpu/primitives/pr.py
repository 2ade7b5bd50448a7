"""PageRank (Gunrock semantics).

Re-expression of gunrock/app/pr: rank init (1-delta)
(pr_problem.cuh:407), per-round push rank/deg with both-endpoints-live
guard (pr_functor.cuh:49-64), damping applied in the filter stage with
optional personalization source (pr_functor.cuh:84-88), frontier =
vertices whose rank moved more than `threshold`, and the
RemoveZeroDegreeNode dangling pre-pass (pr_enactor.cuh:247-300) run as
an on-device fixpoint. atomicAdd becomes scatter-add (deterministic).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.primitives.base import (GraphLike, Stats, Timer,
                                             device_graph, sync)


@jax.jit
def effective_degrees(graph: DeviceGraph):
    """Dangling-removal fixpoint: a vertex's effective out-degree counts
    only edges to vertices that still have outgoing edges themselves."""
    esrc, edst = graph.edge_src, graph.edge_dst
    deg0 = graph.out_degree

    def cond(carry):
        deg, changed = carry
        return changed

    def body(carry):
        deg, _ = carry
        live_edge = (deg[edst] > 0) & (deg[esrc] > 0)
        newdeg = jnp.zeros_like(deg).at[esrc].add(live_edge.astype(deg.dtype))
        newdeg = jnp.where(deg > 0, newdeg, 0)
        return (newdeg, jnp.any(newdeg != deg))

    deg, _ = jax.lax.while_loop(cond, body, (deg0, jnp.bool_(True)))
    return deg


@functools.partial(jax.jit, static_argnames=("max_iter",))
def pr_kernel(graph: DeviceGraph, delta, threshold, src,
              max_iter: int = 50):
    """Returns (rank (n_pad,) f32, iterations)."""
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    deg = effective_degrees(graph)
    degf = jnp.maximum(deg.astype(jnp.float32), 1.0)
    real = jnp.arange(n_pad, dtype=jnp.int32) < graph.n
    personal = jnp.where(src < 0, real.astype(jnp.float32),
                         (jnp.arange(n_pad, dtype=jnp.int32) == src
                          ).astype(jnp.float32))
    rank0 = jnp.where(real, 1.0 - delta, 0.0)
    active0 = (deg > 0) & real

    def cond(carry):
        rank, active, it = carry
        return jnp.any(active) & (it <= max_iter)

    def body(carry):
        rank, active, it = carry
        contrib = jnp.where(active, rank / degf, 0.0)
        ok = (deg[esrc] > 0) & (deg[edst] > 0)
        nxt = jnp.zeros((n_pad,), jnp.float32).at[edst].add(
            jnp.where(ok, contrib[esrc], 0.0))
        nxt = jnp.where(real, delta * nxt + (1.0 - delta) * personal, 0.0)
        active = (jnp.abs(nxt - rank) > threshold) & real
        return nxt, active, it + 1

    rank, active, it = jax.lax.while_loop(
        cond, body, (rank0, active0, jnp.int32(0)))
    return rank, it


import weakref

_spmv_cache = weakref.WeakKeyDictionary()  # csr -> SpmvSweeper


def get_spmv_sweeper(csr, interpret=None):
    """Per-graph cached pallas pull-SpMV sweeper (PR fast mode).
    Keyed weakly by the CsrGraph object (like the BFS caches,
    bfs_pallas.py) so entries die with the graph — no id() reuse."""
    from gunrockinst_tpu.ops.pallas_spmv import (SpmvSweeper,
                                                 build_spmv_plan,
                                                 spmv_fits)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    hit = _spmv_cache.get(csr)
    if hit is not None:
        return hit
    csc = csr.transposed()
    plan = build_spmv_plan(csc.row_offsets, csc.col_indices, csr.num_nodes)
    if not interpret and not spmv_fits(plan):
        raise ValueError(
            f"spmv plan metadata ({plan.num_hub} hub / {plan.num_packed} "
            "packed subtiles) exceeds the SMEM scalar-prefetch budget; "
            "use mode='xla'")
    sweeper = SpmvSweeper(plan, interpret=interpret)
    _spmv_cache[csr] = sweeper
    return sweeper


def pr_pallas(csr, delta: float = 0.85, threshold: float = 0.01,
              max_iter: int = 50, src: int = -1, interpret=None):
    """PageRank with the pallas pull-SpMV as the push kernel (exact
    f32 — same update rule as pr_kernel, summation order differs).
    Returns (rank (n,) np.float32, iterations, device_ms)."""
    from gunrockinst_tpu.oracles.ranking import remove_dangling_degrees

    n = csr.num_nodes
    n_pad = ((n + 128) // 128) * 128
    sweeper = get_spmv_sweeper(csr, interpret=interpret)
    deg_np = remove_dangling_degrees(csr)
    deg = jnp.asarray(np.pad(deg_np.astype(np.float32),
                             (0, n_pad - n)))
    real = jnp.arange(n_pad, dtype=jnp.int32) < n
    live = (deg > 0) & real
    personal = jnp.where(
        src < 0, real.astype(jnp.float32),
        (jnp.arange(n_pad, dtype=jnp.int32) == src).astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("max_iter",))
    def run_loop(hub_args, pk_args, max_iter: int):
        rank0 = jnp.where(real, 1.0 - delta, 0.0)
        active0 = live

        def cond(c):
            rank, active, it = c
            return jnp.any(active) & (it <= max_iter)

        def body(c):
            rank, active, it = c
            contrib = jnp.where(active, rank / jnp.maximum(deg, 1.0), 0.0)
            sums = sweeper.sweep_with(hub_args, pk_args, contrib)[:n_pad]
            sums = jnp.where(live, sums, 0.0)   # dst-side dead-end filter
            nxt = jnp.where(real, delta * sums + (1.0 - delta) * personal,
                            0.0)
            active = (jnp.abs(nxt - rank) > threshold) & real
            return nxt, active, it + 1

        rank, active, it = jax.lax.while_loop(
            cond, body, (rank0, active0, jnp.int32(0)))
        return rank, it

    t0 = time.perf_counter()
    rank, it = run_loop(sweeper.hub_args, sweeper.pk_args, max_iter)
    it = int(it)   # scalar fetch: forces loop completion (axon quirk)
    device_ms = (time.perf_counter() - t0) * 1e3
    return np.asarray(rank)[:n], it, device_ms


_planes_pr_cache = weakref.WeakKeyDictionary()


def get_pr_planes(csr, interpret=None):
    """Per-graph cached PageRank driver over the value-plane ADD kernel
    (ops/pallas_value.py) — the round-3 replacement for the SMEM-bound
    pallas_spmv path, which cannot build a plan at rmat-s20.  The whole
    iteration loop is ONE jitted lax.while_loop; rank / degree /
    personalization state lives in the kernel's bit-major layout, so no
    device-side transposes ever run — conversion happens once on the
    host at exit.  Exact f32 in a fixed summation order (same update
    rule as pr_kernel; gunrock/app/pr/pr_functor.cuh:49-88).

    Region skip rides the active-frontier words: converged regions'
    contributions are all zero, so skipping them is exact — the TPU
    analog of the reference's shrinking PR frontier.

    Returns fn(delta, threshold, src, max_iter) -> (ranks, it, ms)."""
    from gunrockinst_tpu.oracles.ranking import remove_dangling_degrees
    from gunrockinst_tpu.ops.pallas_value import (
        ValueStepper, get_unweighted_plan, layout_vals, unlayout_vals)

    hit = _planes_pr_cache.get(csr)
    if hit is not None:
        return hit
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = csr.num_nodes
    plan = get_unweighted_plan(csr)   # shared with sssp/cc planes
    stepper = ValueStepper(plan, mode="add", f32=True, use_active=False,
                           zero_acc=True, track_changed=False,
                           interpret=interpret)
    rows_w = plan.rows_w

    deg_np = remove_dangling_degrees(csr).astype(np.float32)

    def stage_f32(v):
        return jax.lax.bitcast_convert_type(
            jnp.asarray(layout_vals(plan, v)), jnp.float32)

    deg_bm = stage_f32(np.maximum(deg_np, 1.0))
    live_bm = stage_f32((deg_np > 0).astype(np.float32))
    real_bm = stage_f32(np.ones(n, np.float32))
    iota32 = jnp.arange(32, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("max_iter",))
    def loop(scal, hbm, personal_bm, delta, threshold, max_iter: int):
        rank0 = real_bm * (1.0 - delta)
        active0 = live_bm

        def cond(c):
            rank, active, it = c
            return jnp.any(active > 0) & (it <= max_iter)

        def body(c):
            rank, active, it = c
            contrib = jnp.where(active > 0, rank / deg_bm, 0.0)
            acc_in = jax.lax.bitcast_convert_type(contrib, jnp.int32)
            # word-row-major: rows r*32+g -> word bits pack over the
            # 32-row minor group
            a_i = (active > 0).astype(jnp.int32).reshape(rows_w, 32, 128)
            words = jnp.sum(a_i << iota32[None, :, None], axis=1)
            acc_out, _ = stepper.step_with(scal, hbm, acc_in, words)
            sums = jax.lax.bitcast_convert_type(acc_out, jnp.float32)
            sums = jnp.where(live_bm > 0, sums, 0.0)
            nxt = jnp.where(real_bm > 0,
                            delta * sums + (1.0 - delta) * personal_bm,
                            0.0)
            active = ((jnp.abs(nxt - rank) > threshold)
                      & (real_bm > 0)).astype(jnp.float32)
            return nxt, active, it + 1

        rank, active, it = jax.lax.while_loop(
            cond, body, (rank0, active0, jnp.int32(0)))
        return rank, it

    def fn(delta=0.85, threshold=0.01, src=-1, max_iter=50):
        if src is None or src < 0:
            personal_bm = real_bm
        else:
            p = np.zeros(n, np.float32)
            p[src] = 1.0
            personal_bm = stage_f32(p)
        t0 = time.perf_counter()
        rank_bm, it = loop(stepper.scal_args, stepper.hbm_args,
                           personal_bm, jnp.float32(delta),
                           jnp.float32(threshold), max_iter)
        it = int(it)   # scalar fetch forces completion (axon quirk)
        device_ms = (time.perf_counter() - t0) * 1e3
        acc = jax.lax.bitcast_convert_type(rank_bm, jnp.int32)
        ranks = unlayout_vals(plan, np.asarray(acc), n, np.float32)
        return ranks, it, device_ms

    _planes_pr_cache[csr] = fn
    return fn


@dataclasses.dataclass
class PrResult:
    ranks: np.ndarray         # per-vertex rank
    node_ids: np.ndarray      # vertices sorted by descending rank
    sorted_ranks: np.ndarray  # ranks in that order
    stats: Stats


def run(graph: GraphLike, delta: float = 0.85, threshold: float = 0.01,
        max_iter: int = 50, src: int = -1,
        normalize: bool = False, mode: str = "xla") -> PrResult:
    """Host entry (run_pr analog, app/pr/pr_app.cu). src >= 0 enables
    personalized PageRank. normalize=True rescales ranks to sum 1.
    mode="pallas" routes the push through the pull-SpMV kernel
    (ops/pallas_spmv.py) — exact f32 but SMEM-bound (fails to plan at
    rmat-s20); mode="planes" routes through the value-plane ADD kernel
    (ops/pallas_value.py) — exact f32 at any size the VMEM maps fit."""
    if mode == "planes":
        from gunrockinst_tpu.graph.csr import CsrGraph
        if not isinstance(graph, CsrGraph):
            raise TypeError("mode='planes' needs a host CsrGraph")
        fn = get_pr_planes(graph)
        fn(delta, threshold, src, max_iter)  # warm-up (compile)
        ranks, it, device_ms = fn(delta, threshold, src, max_iter)
        if normalize and ranks.sum() > 0:
            ranks = ranks / ranks.sum()
        n = graph.num_nodes
        order = np.lexsort((np.arange(n), -ranks))
        stats = Stats(elapsed_ms=device_ms, search_depth=int(it),
                      nodes_visited=n,
                      edges_visited=graph.num_edges * int(it))
        return PrResult(ranks=ranks, node_ids=order.astype(np.int32),
                        sorted_ranks=ranks[order], stats=stats)
    if mode == "pallas":
        from gunrockinst_tpu.graph.csr import CsrGraph
        if not isinstance(graph, CsrGraph):
            raise TypeError("mode='pallas' needs a host CsrGraph")
        ranks_np, _, _ = pr_pallas(graph, delta=delta, threshold=threshold,
                                   max_iter=max_iter, src=src)  # warm-up
        # timed: device loop only (Enact convention; extraction excluded)
        ranks_np, it, device_ms = pr_pallas(graph, delta=delta,
                                            threshold=threshold,
                                            max_iter=max_iter, src=src)
        ranks = ranks_np
        if normalize and ranks.sum() > 0:
            ranks = ranks / ranks.sum()
        n = graph.num_nodes
        order = np.lexsort((np.arange(n), -ranks))
        stats = Stats(elapsed_ms=device_ms, search_depth=int(it),
                      nodes_visited=n, edges_visited=graph.num_edges * int(it))
        return PrResult(ranks=ranks, node_ids=order.astype(np.int32),
                        sorted_ranks=ranks[order], stats=stats)

    g = device_graph(graph)
    out = pr_kernel(g, jnp.float32(delta), jnp.float32(threshold),
                    jnp.int32(src), max_iter=max_iter)
    sync(out[1])
    with Timer() as t:
        rank, it = pr_kernel(g, jnp.float32(delta), jnp.float32(threshold),
                             jnp.int32(src), max_iter=max_iter)
        sync(it)
    ranks = np.asarray(rank)[: g.n]
    if normalize and ranks.sum() > 0:
        ranks = ranks / ranks.sum()
    order = np.lexsort((np.arange(g.n), -ranks))
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=int(it),
                  nodes_visited=g.n, edges_visited=g.m * int(it))
    return PrResult(ranks=ranks, node_ids=order.astype(np.int32),
                    sorted_ranks=ranks[order], stats=stats)
