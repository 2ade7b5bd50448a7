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


import time as _time
import weakref

_planes_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_hits_planes(csr, interpret=None):
    """HITS over the value-plane ADD kernel (ops/pallas_value.py) —
    the round-3 verdict's missing fast path for the rank zoo (item 3):
    the auth scatter-add runs as a pull-ADD sweep over the forward
    plan, the hub scatter-add as a pull-ADD sweep over the REVERSE
    plan (gunrock/app/hits alternates advances over CSR and CSC the
    same way, hits_enactor.cuh:97-116).  On symmetric graphs the two
    plans — and their device upload and compiled kernel — are the
    same object, shared with PR/SSSP/CC planes.  The whole iteration
    loop is one jitted fori_loop; the hub personalization term
    factors out of the sweep exactly: sum over u's out-edges of
    [u==s]*delta/so[u] == [u==s]*delta*(outdeg[u]>0).

    Returns fn(src, delta, max_iter) -> (hub, auth, device_ms)."""
    import functools
    from gunrockinst_tpu.ops.pallas_value import (
        get_add_stepper, get_reverse_plan, get_unweighted_plan,
        layout_vals, unlayout_vals)

    hit = _planes_cache.get(csr)
    if hit is not None:
        return hit
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = csr.num_nodes
    plan_f = get_unweighted_plan(csr)    # auth: into dsts
    plan_r = get_reverse_plan(csr)       # hub: into srcs
    st_f = get_add_stepper(plan_f, interpret)
    st_r = get_add_stepper(plan_r, interpret)
    rows_w = plan_f.rows_w

    outdeg = np.diff(csr.row_offsets).astype(np.int64)
    indeg = np.bincount(csr.col_indices, minlength=n).astype(np.int64)

    def stage_f32(v):
        return jax.lax.bitcast_convert_type(
            jnp.asarray(layout_vals(plan_f, v.astype(np.float32))),
            jnp.float32)

    inv_so = stage_f32(1.0 / np.maximum(outdeg, 1))
    inv_si = stage_f32(1.0 / np.maximum(indeg, 1))
    has_out = stage_f32((outdeg > 0).astype(np.float32))
    ones_words = jnp.full((rows_w, 128), -1, jnp.int32)

    def as_bits(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def as_f32(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("max_iter",))
    def loop(sf, hf, sr, hr, pers, delta, max_iter: int):
        def body(_, carry):
            hub, auth = carry
            auth = as_f32(st_f.step_with(
                sf, hf, as_bits(hub * inv_so), ones_words)[0])
            hub = (delta * pers * has_out
                   + (1.0 - delta) * as_f32(st_r.step_with(
                       sr, hr, as_bits(auth * inv_si), ones_words)[0]))
            return hub, auth

        z = jnp.zeros((32 * rows_w, 128), jnp.float32)
        return jax.lax.fori_loop(0, max_iter, body, (z, z))

    def fn(src=0, delta=0.85, max_iter=50):
        p = np.zeros(n, np.float32)
        if 0 <= src < n:
            p[src] = 1.0
        pers = stage_f32(p)
        t0 = _time.perf_counter()
        hub_bm, auth_bm = loop(st_f.scal_args, st_f.hbm_args,
                               st_r.scal_args, st_r.hbm_args, pers,
                               jnp.float32(delta), max_iter)
        float(hub_bm[0, 0])   # scalar fetch forces the loop (axon)
        device_ms = (_time.perf_counter() - t0) * 1e3
        # extraction outside the Enact window (reference convention)
        hub = unlayout_vals(plan_f, np.asarray(as_bits(hub_bm)), n,
                               np.float32)
        auth = unlayout_vals(plan_f, np.asarray(as_bits(auth_bm)), n,
                                np.float32)
        return hub, auth, device_ms

    _planes_cache[csr] = fn
    return fn


@dataclasses.dataclass
class HitsResult:
    hub_ranks: np.ndarray
    auth_ranks: np.ndarray
    stats: Stats


def run(graph: GraphLike, src: int = 0, delta: float = 0.85,
        max_iter: int = 50, mode: str = "xla") -> HitsResult:
    if mode == "planes":
        from gunrockinst_tpu.graph.csr import CsrGraph
        if not isinstance(graph, CsrGraph):
            raise TypeError("mode='planes' needs a host CsrGraph")
        fn = get_hits_planes(graph)
        fn(src, delta, max_iter)   # warm-up (compile)
        hub, auth, device_ms = fn(src, delta, max_iter)
        stats = Stats(elapsed_ms=device_ms, search_depth=max_iter,
                      nodes_visited=graph.num_nodes,
                      edges_visited=graph.num_edges * max_iter)
        return HitsResult(hub_ranks=hub, auth_ranks=auth, stats=stats)
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
