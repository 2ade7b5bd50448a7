"""HITS (the reference's v0.2 variant with a personalization term).

Re-expression of gunrock/app/hits: the auth advance over CSC then hub
advance over CSR with atomicAdds (hits_functor.cuh:61-65,108-111,
hits_enactor.cuh:217-330) become two scatter-adds per iteration:

    auth[v] = sum_{u->v} hub[u] / max(outdeg(u), 1)
    hub[u]  = sum_{u->v} ([u==src] * delta/outdeg(u)
                          + (1-delta) * auth[v]/indeg(v))

Auth is refreshed first and hub reads the new auth (the reference's
SwapRank between the two advances). Fixed iteration count.
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


@functools.partial(jax.jit, static_argnames=("max_iter",))
def hits_kernel(graph: DeviceGraph, src, delta, max_iter: int = 50):
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    outdeg = graph.out_degree.astype(jnp.float32)
    indeg = (graph.in_degree if graph.in_degree is not None
             else jnp.zeros((n_pad,), jnp.int32).at[edst].add(
                 (esrc != graph.n).astype(jnp.int32))).astype(jnp.float32)
    so = jnp.maximum(outdeg, 1.0)
    si = jnp.maximum(indeg, 1.0)
    is_src_e = (esrc == src).astype(jnp.float32)

    def body(_, carry):
        hub, auth = carry
        auth = jnp.zeros((n_pad,), jnp.float32).at[edst].add(
            hub[esrc] / so[esrc])
        per_edge = (is_src_e * delta / so[esrc]
                    + (1.0 - delta) * auth[edst] / si[edst])
        hub = jnp.zeros((n_pad,), jnp.float32).at[esrc].add(per_edge)
        return hub, auth

    hub0 = jnp.zeros((n_pad,), jnp.float32)
    auth0 = jnp.zeros((n_pad,), jnp.float32)
    hub, auth = jax.lax.fori_loop(0, max_iter, body, (hub0, auth0))
    return hub, auth


@dataclasses.dataclass
class HitsResult:
    hub_ranks: np.ndarray
    auth_ranks: np.ndarray
    stats: Stats


def run(graph: GraphLike, src: int = 0, delta: float = 0.85,
        max_iter: int = 50) -> HitsResult:
    g = device_graph(graph)
    out = hits_kernel(g, jnp.int32(src), jnp.float32(delta),
                      max_iter=max_iter)
    sync(out[0][0])
    with Timer() as t:
        hub, auth = hits_kernel(g, jnp.int32(src), jnp.float32(delta),
                                max_iter=max_iter)
        sync(hub[0])
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=max_iter,
                  nodes_visited=g.n, edges_visited=g.m * max_iter)
    return HitsResult(hub_ranks=np.asarray(hub)[: g.n],
                      auth_ranks=np.asarray(auth)[: g.n], stats=stats)
