"""Who-To-Follow (Twitter WTF: personalized PR + circle of trust +
personalized-SALSA).

Re-expression of gunrock/app/wtf (wtf_problem/functor/enactor): the
four phases (PrFunctor loop, rank sort, CotFunctor in-degree count,
Auth/Hub advances with NormalizeRank swaps — wtf_enactor.cuh:280-530)
run as three jitted programs plus a device sort. The exact (quirky)
swap placement of the reference is preserved — see
oracles/wtf.py for the step-by-step spec the implementation and oracle
share.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.primitives.base import (GraphLike, Stats, Timer,
                                             device_graph, sync)
from gunrockinst_tpu.primitives.pr import pr_kernel


@functools.partial(jax.jit, static_argnames=("salsa_iters",))
def wtf_salsa_kernel(graph: DeviceGraph, in_cot, src, alpha,
                     salsa_iters: int):
    """Phases 3+4: CoT in-degree count then the Auth/Hub loop."""
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    outdeg = graph.out_degree.astype(jnp.float32)
    so = jnp.maximum(outdeg, 1.0)

    cot_edge = in_cot[esrc]
    cot_indeg = jnp.zeros((n_pad,), jnp.int32).at[edst].add(
        cot_edge.astype(jnp.int32))
    si = jnp.maximum(cot_indeg.astype(jnp.float32), 1.0)

    is_src_e = (esrc == src).astype(jnp.float32)

    def body(_, carry):
        rank_curr, ref_curr, ref_next = carry
        per_edge = (is_src_e * alpha / so[esrc]
                    + (1.0 - alpha) * ref_curr[edst] / si[edst])
        rank_next = jnp.zeros((n_pad,), jnp.float32).at[esrc].add(
            jnp.where(cot_edge, per_edge, 0.0))
        ref_curr = ref_next
        ref_next = jnp.zeros((n_pad,), jnp.float32).at[edst].add(
            jnp.where(cot_edge, rank_curr[esrc] / so[esrc], 0.0))
        return rank_next, ref_curr, ref_next

    zeros = jnp.zeros((n_pad,), jnp.float32)
    rank, ref_curr, _ = jax.lax.fori_loop(
        0, salsa_iters, body, (zeros, zeros, zeros))
    return rank, ref_curr


@dataclasses.dataclass
class WtfResult:
    wtf_ranks: np.ndarray     # final who-to-follow scores
    cot: np.ndarray           # circle-of-trust vertex ids
    ppr_ranks: np.ndarray     # phase-1 personalized PageRank
    stats: Stats


def run(graph: GraphLike, src: int, alpha: float = 0.2,
        delta: float = 0.85, threshold: float = 0.01,
        max_iter: int = 50, cot_size: int = 1000) -> WtfResult:
    g = device_graph(graph)
    if not (0 <= src < g.n):
        raise ValueError(f"source vertex {src} out of range [0, {g.n})")
    salsa_iters = int(1.0 / alpha)
    cot_size = min(cot_size, g.n)

    # warm-up: trace/compile both jitted phases outside the timing
    # window (every other primitive does the same — the reference's
    # GpuTimer never includes nvcc's work either)
    ppr_w, _ = pr_kernel(g, jnp.float32(delta), jnp.float32(threshold),
                         jnp.int32(src), max_iter=max_iter)
    sync(ppr_w[0])
    warm_cot = np.zeros(g.n_pad, dtype=bool)
    warm_cot[: min(cot_size, g.n)] = True
    rank_w, _ = wtf_salsa_kernel(g, jnp.asarray(warm_cot),
                                 jnp.int32(src), jnp.float32(alpha),
                                 salsa_iters)
    sync(rank_w[0])

    with Timer() as t:
        ppr, _ = pr_kernel(g, jnp.float32(delta), jnp.float32(threshold),
                           jnp.int32(src), max_iter=max_iter)
        ppr_np = np.asarray(ppr)[: g.n]
        order = np.lexsort((np.arange(g.n), -ppr_np))
        cot = order[:cot_size].astype(np.int32)
        in_cot = np.zeros(g.n_pad, dtype=bool)
        in_cot[cot] = True
        rank, _ = wtf_salsa_kernel(g, jnp.asarray(in_cot), jnp.int32(src),
                                   jnp.float32(alpha), salsa_iters)
        sync(rank[0])
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=salsa_iters,
                  nodes_visited=g.n, edges_visited=g.m * salsa_iters)
    return WtfResult(wtf_ranks=np.asarray(rank)[: g.n], cot=cot,
                     ppr_ranks=ppr_np, stats=stats)
