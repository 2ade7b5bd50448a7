"""Maximal independent set (Luby rounds with static random priorities).

Re-expression of gunrock/app/mis: the advance-with-neighborhood-reduce
(REDUCE MAXIMUM over undecided neighbors' random labels,
mis_enactor.cuh:234-357) + filter join test (mis_functor.cuh:84-89:
node joins round `v` iff its priority >= the reduced max) becomes one
scatter-max per round over the edge list. The output `mis_ids[v]` is
the round at which v was decided — round 0 is a maximal independent
set, and each round's set is independent among the vertices undecided
when it began (a Jones-Plassmann-style coloring), exactly the
reference's semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.primitives.base import (GraphLike, Stats, Timer,
                                             device_graph, sync)

INT_MIN = jnp.iinfo(jnp.int32).min


@jax.jit
def mis_kernel(graph: DeviceGraph, priorities):
    """Returns (mis_ids (n_pad,) int32 round numbers, rounds)."""
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    real = jnp.arange(n_pad, dtype=jnp.int32) < graph.n
    rounds0 = jnp.where(real, -1, 0)  # padding counts as decided

    def cond(carry):
        rounds, r = carry
        return jnp.any(rounds < 0) & (r <= graph.n)

    def body(carry):
        rounds, r = carry
        und = rounds < 0

        # advance with neighborhood reduce (REDUCE_TYPE VERTEX, MAXIMUM
        # — the mgpu SegReduceCsr path, mis_enactor.cuh:234-357): max
        # undecided-neighbor priority per source vertex
        def edge_fn(s, d, w, eid, state):
            return und[d], priorities[d]

        from gunrockinst_tpu.ops.advance import neighborhood_reduce
        nbmax = neighborhood_reduce(graph, und, edge_fn, combine="max",
                                    payload_dtype=jnp.int32)
        join = und & (priorities >= nbmax)
        rounds = jnp.where(join, r, rounds)
        return rounds, r + 1

    rounds, r = jax.lax.while_loop(cond, body, (rounds0, jnp.int32(0)))
    return rounds, r


@jax.jit
def luby_kernel(graph: DeviceGraph, priorities):
    """Classic Luby MIS (with neighbor exclusion — unlike the
    reference's rounds, this yields a truly MAXIMAL independent set).
    States: 0 undecided, 1 in MIS, 2 excluded."""
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    real = jnp.arange(n_pad, dtype=jnp.int32) < graph.n
    state0 = jnp.where(real, 0, 2)

    def cond(carry):
        state, r = carry
        return jnp.any(state == 0) & (r <= graph.n)

    def body(carry):
        state, r = carry
        und = state == 0
        cand_e = und[esrc] & und[edst]
        nbmax = jnp.full((n_pad,), INT_MIN, jnp.int32).at[esrc].max(
            jnp.where(cand_e, priorities[edst], INT_MIN))
        join = und & (priorities >= nbmax)
        # exclude undecided neighbors of freshly joined vertices
        excl = jnp.zeros((n_pad,), jnp.bool_).at[edst].max(join[esrc])
        excl = excl.at[esrc].max(join[edst])
        state = jnp.where(join, 1, jnp.where(und & excl, 2, state))
        return state, r + 1

    state, r = jax.lax.while_loop(cond, body, (state0, jnp.int32(0)))
    return state == 1, r


@dataclasses.dataclass
class MisResult:
    mis_ids: np.ndarray       # round each vertex was decided (reference parity)
    in_set: np.ndarray        # bool: member of a maximal independent set (Luby)
    stats: Stats


def run(graph: GraphLike, seed: int = 0,
        priorities: Optional[np.ndarray] = None) -> MisResult:
    """Host entry. Priorities default to a random permutation (distinct
    values -> a true independent set per round, unlike the reference's
    random ints which can tie)."""
    g = device_graph(graph)
    if priorities is None:
        rng = np.random.default_rng(seed)
        priorities = rng.permutation(g.n).astype(np.int32)
    pr_pad = np.full(g.n_pad, INT_MIN, dtype=np.int32)
    pr_pad[: g.n] = priorities
    pr_dev = jnp.asarray(pr_pad)
    out = mis_kernel(g, pr_dev)
    sync(out[1])
    with Timer() as t:
        rounds, r = mis_kernel(g, pr_dev)
        sync(r)
    in_set, _ = luby_kernel(g, pr_dev)
    mis_ids = np.asarray(rounds)[: g.n]
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=int(r),
                  nodes_visited=g.n, edges_visited=g.m * int(r))
    return MisResult(mis_ids=mis_ids, in_set=np.asarray(in_set)[: g.n],
                     stats=stats)
