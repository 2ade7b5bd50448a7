"""SALSA (stochastic approach for link-structure analysis).

Re-expression of gunrock/app/salsa: the four-advance pipeline
(HForward/AForward storing per-edge predecessors, then HBackward/
ABackward E2V advances redistributing rank through two-hop walks,
salsa_functor.cuh:61-213, salsa_enactor.cuh:230-420) reduces to two
scatter-add pairs per iteration once the edge-predecessor indirection
is folded away:

    hub'[u]  = sum_{e=(u,v)} (1/indeg v) * sum_{w->v} hub[w]/outdeg(w)
    auth'[v] = sum_{e=(u,v)} (1/outdeg u) * sum_{u->z} auth[z]/indeg(z)

init hub = 1/#(outdeg>0), auth = 1/#(indeg>0)
(salsa_problem.cuh:414-415); fixed iteration count.
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
def salsa_kernel(graph: DeviceGraph, max_iter: int = 50):
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    real_e = esrc != graph.n
    outdeg = graph.out_degree.astype(jnp.float32)
    indeg = (graph.in_degree if graph.in_degree is not None
             else jnp.zeros((n_pad,), jnp.int32).at[edst].add(
                 real_e.astype(jnp.int32))).astype(jnp.float32)
    so = jnp.maximum(outdeg, 1.0)
    si = jnp.maximum(indeg, 1.0)
    out_nodes = jnp.maximum(jnp.sum((outdeg > 0).astype(jnp.float32)), 1.0)
    in_nodes = jnp.maximum(jnp.sum((indeg > 0).astype(jnp.float32)), 1.0)

    # strictly < n: the dummy vertex (id n) must start at 0 (it would be
    # zeroed by the outdeg/indeg masks after one iteration anyway, but
    # keep the invariant that pad state is always 0)
    hub0 = jnp.where(jnp.arange(n_pad) < graph.n, 1.0 / out_nodes, 0.0
                     ).astype(jnp.float32)
    auth0 = jnp.where(jnp.arange(n_pad) < graph.n, 1.0 / in_nodes, 0.0
                      ).astype(jnp.float32)

    def body(_, carry):
        hub, auth = carry
        x = jnp.zeros((n_pad,), jnp.float32).at[edst].add(hub[esrc] / so[esrc])
        new_hub = jnp.zeros((n_pad,), jnp.float32).at[esrc].add(
            x[edst] / si[edst])
        y = jnp.zeros((n_pad,), jnp.float32).at[esrc].add(auth[edst] / si[edst])
        new_auth = jnp.zeros((n_pad,), jnp.float32).at[edst].add(
            y[esrc] / so[esrc])
        new_hub = jnp.where(outdeg > 0, new_hub, 0.0)
        new_auth = jnp.where(indeg > 0, new_auth, 0.0)
        return new_hub, new_auth

    hub, auth = jax.lax.fori_loop(0, max_iter, body, (hub0, auth0))
    return hub, auth


@dataclasses.dataclass
class SalsaResult:
    hub_ranks: np.ndarray
    auth_ranks: np.ndarray
    stats: Stats


def run(graph: GraphLike, max_iter: int = 50) -> SalsaResult:
    g = device_graph(graph)
    out = salsa_kernel(g, max_iter=max_iter)
    sync(out[0][0])
    with Timer() as t:
        hub, auth = salsa_kernel(g, max_iter=max_iter)
        sync(hub[0])
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=max_iter,
                  nodes_visited=g.n, edges_visited=g.m * max_iter)
    return SalsaResult(hub_ranks=np.asarray(hub)[: g.n],
                       auth_ranks=np.asarray(auth)[: g.n], stats=stats)
