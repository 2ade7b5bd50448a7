"""Minimum spanning tree (Boruvka).

Re-expression of gunrock/app/mst — the reference's 10-functor
supervertex pipeline (mark segments, mgpu ReduceByKey min-edge per
vertex, successor hooking, cycle removal, pointer-jump, radix-sort
edge-list contraction, mst_enactor.cuh:255-832) collapses to classic
Boruvka on static-shape arrays:

  per round:  min-(w, edge-id) cross edge per component (two
              scatter-mins), mark it, then hook+pointer-jump the
              component labels over all marked edges to a fixpoint
              (the PJmpFunctor analog) — no edge-list contraction is
              needed because scatter-min over the full edge list with a
              cross-component mask already ignores intra-component
              edges (the contraction existed to keep the GPU kernels'
              work-lists small).

The lexicographic (weight, edge-id) selection makes the result
deterministic; cycles are impossible under a total order. Edges are
canonicalized to undirected (u < v) pairs on the host first, so each
undirected edge is selected and counted once.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import CsrGraph, LANE, _round_up
from gunrockinst_tpu.primitives.base import GraphLike, Stats, Timer, sync

INT_MAX = jnp.iinfo(jnp.int32).max
F_INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_pad",))
def mst_kernel(esrc, edst, w, n_pad: int):
    """Boruvka over canonical undirected edges. Returns
    (in_mst (m_pad,) bool, comp (n_pad,) int32, rounds)."""
    m_pad = esrc.shape[0]
    real_e = esrc < n_pad  # padding edges use src = n_pad
    eids = jnp.arange(m_pad, dtype=jnp.int32)

    comp0 = jnp.arange(n_pad, dtype=jnp.int32)
    in_mst0 = jnp.zeros((m_pad,), jnp.bool_)

    def compress(comp, mask):
        """Hook + pointer-jump comp labels over masked edges to fixpoint."""
        def ccond(carry):
            c, changed = carry
            return changed

        def cbody(carry):
            c, _ = carry
            cs = jnp.where(mask, c[jnp.clip(esrc, 0, n_pad - 1)], INT_MAX)
            cd = jnp.where(mask, c[jnp.clip(edst, 0, n_pad - 1)], INT_MAX)
            nc = c.at[jnp.clip(edst, 0, n_pad - 1)].min(cs)
            nc = nc.at[jnp.clip(esrc, 0, n_pad - 1)].min(cd)
            nc = nc[nc]
            nc = nc[nc]
            return nc, jnp.any(nc != c)

        comp, _ = jax.lax.while_loop(ccond, cbody, (comp, jnp.bool_(True)))
        return comp

    def cond(carry):
        comp, in_mst, rounds, go = carry
        return go & (rounds < 64)

    def body(carry):
        comp, in_mst, rounds, _ = carry
        c1 = comp[jnp.clip(esrc, 0, n_pad - 1)]
        c2 = comp[jnp.clip(edst, 0, n_pad - 1)]
        cross = (c1 != c2) & real_e
        wq = jnp.where(cross, w, F_INF)
        minw = jnp.full((n_pad,), F_INF).at[c1].min(wq).at[c2].min(wq)
        ach = cross & ((w == minw[c1]) | (w == minw[c2]))
        sel = jnp.full((n_pad,), INT_MAX, jnp.int32)
        sel = sel.at[c1].min(jnp.where(ach & (w == minw[c1]), eids, INT_MAX))
        sel = sel.at[c2].min(jnp.where(ach & (w == minw[c2]), eids, INT_MAX))
        has = sel != INT_MAX
        in_mst = in_mst.at[jnp.where(has, sel, m_pad)].max(has, mode="drop")
        comp = compress(comp, in_mst)
        go = jnp.any(cross)
        return comp, in_mst, rounds + 1, go

    comp, in_mst, rounds, _ = jax.lax.while_loop(
        cond, body, (comp0, in_mst0, jnp.int32(0), jnp.bool_(True)))
    return in_mst, comp, rounds


@dataclasses.dataclass
class MstResult:
    edge_mask: np.ndarray   # over canonical undirected edges
    edges: np.ndarray       # (k, 2) selected (u, v) pairs
    total_weight: float
    stats: Stats


def canonical_edges(csr: CsrGraph):
    """Undirected (u < v) canonical edge list with weights; duplicate
    pairs keep the minimum weight."""
    n = csr.num_nodes
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(csr.row_offsets))
    dst = csr.col_indices.astype(np.int64)
    w = (csr.edge_values if csr.edge_values is not None
         else np.ones(csr.num_edges, dtype=np.float32)).astype(np.float32)
    u = np.minimum(src, dst)
    v = np.maximum(src, dst)
    keep = u != v
    u, v, w = u[keep], v[keep], w[keep]
    order = np.lexsort((w, v, u))
    u, v, w = u[order], v[order], w[order]
    first = np.ones(len(u), dtype=bool)
    first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
    return u[first].astype(np.int32), v[first].astype(np.int32), w[first]


def run(graph: GraphLike) -> MstResult:
    """Host entry (run_mst analog). Accepts a CsrGraph (weights default
    to 1)."""
    csr = graph if isinstance(graph, CsrGraph) else None
    if csr is None:
        raise TypeError("mst.run expects a host CsrGraph")
    n_pad = _round_up(csr.num_nodes + 1, LANE)
    u, v, w = canonical_edges(csr)
    m = len(u)
    m_pad = _round_up(max(m, 1), LANE)
    eu = np.full(m_pad, n_pad, dtype=np.int32)
    ev = np.full(m_pad, n_pad, dtype=np.int32)
    ew = np.full(m_pad, np.inf, dtype=np.float32)
    eu[:m], ev[:m], ew[:m] = u, v, w
    eu_d, ev_d, ew_d = jnp.asarray(eu), jnp.asarray(ev), jnp.asarray(ew)

    out = mst_kernel(eu_d, ev_d, ew_d, n_pad)
    sync(out[2])
    with Timer() as t:
        in_mst, comp, rounds = mst_kernel(eu_d, ev_d, ew_d, n_pad)
        sync(rounds)
    mask = np.asarray(in_mst)[:m]
    total = float(w[mask].sum())
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=int(rounds),
                  nodes_visited=csr.num_nodes, edges_visited=m)
    return MstResult(
        edge_mask=mask,
        edges=np.stack([u[mask], v[mask]], axis=1),
        total_weight=total,
        stats=stats,
    )
