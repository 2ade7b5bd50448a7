"""Top-K degree centrality.

Re-expression of gunrock/app/topk (topk_enactor.cuh:245-285): degree
centrality = in-degree + out-degree, CUBRadixSort descending becomes a
two-key `lax.sort` (descending centrality, ascending vertex id for a
deterministic tie-break).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.primitives.base import (GraphLike, Stats, Timer,
                                             device_graph, sync)


@jax.jit
def topk_kernel(graph: DeviceGraph):
    """Returns (sorted vertex ids, centralities, in_deg, out_deg) over
    all n_pad slots (padding sorts last: centrality 0, id large)."""
    n_pad = graph.n_pad
    out_deg = graph.out_degree
    in_deg = (graph.in_degree if graph.in_degree is not None
              else jnp.zeros_like(out_deg)
              .at[graph.edge_dst].add(
                  (graph.edge_src != graph.n).astype(jnp.int32)))
    cent = in_deg + out_deg
    ids = jnp.arange(n_pad, dtype=jnp.int32)
    neg_cent, sorted_ids = jax.lax.sort((-cent, ids), num_keys=2)
    return (sorted_ids, -neg_cent, in_deg[sorted_ids], out_deg[sorted_ids])


@dataclasses.dataclass
class TopkResult:
    node_ids: np.ndarray
    centralities: np.ndarray
    in_degrees: np.ndarray
    out_degrees: np.ndarray
    stats: Stats


def run(graph: GraphLike, k: int) -> TopkResult:
    """Host entry (run_topk analog, app/topk/topk_app.cu)."""
    g = device_graph(graph)
    k = min(k, g.n)
    out = topk_kernel(g)
    sync(out[0][0])
    with Timer() as t:
        ids, cent, ind, outd = topk_kernel(g)
        sync(ids[0])
    stats = Stats(elapsed_ms=t.elapsed_ms, nodes_visited=g.n,
                  edges_visited=g.m)
    return TopkResult(
        node_ids=np.asarray(ids)[:k],
        centralities=np.asarray(cent)[:k],
        in_degrees=np.asarray(ind)[:k],
        out_degrees=np.asarray(outd)[:k],
        stats=stats,
    )
