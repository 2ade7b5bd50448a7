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


import time as _time
import weakref

_planes_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_salsa_planes(csr, interpret=None):
    """SALSA over the value-plane ADD kernel: the four scatter-adds
    per iteration become two forward pull-ADD sweeps (into dsts) and
    two reverse sweeps (into srcs) — same plan/kernel/upload sharing
    as hits planes (gunrock/app/salsa/salsa_enactor.cuh:240-415).
    Returns fn(max_iter) -> (hub, auth, device_ms)."""
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
    plan_f = get_unweighted_plan(csr)
    plan_r = get_reverse_plan(csr)
    st_f = get_add_stepper(plan_f, interpret)
    st_r = get_add_stepper(plan_r, interpret)
    rows_w = plan_f.rows_w

    outdeg = np.diff(csr.row_offsets).astype(np.int64)
    indeg = np.bincount(csr.col_indices, minlength=n).astype(np.int64)
    out_nodes = max(int((outdeg > 0).sum()), 1)
    in_nodes = max(int((indeg > 0).sum()), 1)

    def stage_f32(v):
        return jax.lax.bitcast_convert_type(
            jnp.asarray(layout_vals(plan_f, v.astype(np.float32))),
            jnp.float32)

    inv_so = stage_f32(1.0 / np.maximum(outdeg, 1))
    inv_si = stage_f32(1.0 / np.maximum(indeg, 1))
    has_out = stage_f32((outdeg > 0).astype(np.float32))
    has_in = stage_f32((indeg > 0).astype(np.float32))
    hub0 = stage_f32(np.full(n, 1.0 / out_nodes, np.float32))
    auth0 = stage_f32(np.full(n, 1.0 / in_nodes, np.float32))
    ones_words = jnp.full((rows_w, 128), -1, jnp.int32)

    def as_bits(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def as_f32(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("max_iter",))
    def loop(sf, hf, sr, hr, max_iter: int):
        def sweep_f(v):
            return as_f32(st_f.step_with(sf, hf, as_bits(v),
                                         ones_words)[0])

        def sweep_r(v):
            return as_f32(st_r.step_with(sr, hr, as_bits(v),
                                         ones_words)[0])

        def body(_, carry):
            hub, auth = carry
            x = sweep_f(hub * inv_so)
            new_hub = sweep_r(x * inv_si) * has_out
            y = sweep_r(auth * inv_si)
            new_auth = sweep_f(y * inv_so) * has_in
            return new_hub, new_auth

        return jax.lax.fori_loop(0, max_iter, body, (hub0, auth0))

    def fn(max_iter=50):
        t0 = _time.perf_counter()
        hub_bm, auth_bm = loop(st_f.scal_args, st_f.hbm_args,
                               st_r.scal_args, st_r.hbm_args, max_iter)
        float(hub_bm[0, 0])   # scalar fetch forces the loop (axon)
        device_ms = (_time.perf_counter() - t0) * 1e3
        hub = unlayout_vals(plan_f, np.asarray(as_bits(hub_bm)), n,
                               np.float32)
        auth = unlayout_vals(plan_f, np.asarray(as_bits(auth_bm)), n,
                                np.float32)
        return hub, auth, device_ms

    _planes_cache[csr] = fn
    return fn


@dataclasses.dataclass
class SalsaResult:
    hub_ranks: np.ndarray
    auth_ranks: np.ndarray
    stats: Stats


def run(graph: GraphLike, max_iter: int = 50,
        mode: str = "xla") -> SalsaResult:
    if mode == "planes":
        from gunrockinst_tpu.graph.csr import CsrGraph
        if not isinstance(graph, CsrGraph):
            raise TypeError("mode='planes' needs a host CsrGraph")
        fn = get_salsa_planes(graph)
        fn(max_iter)   # warm-up (compile)
        hub, auth, device_ms = fn(max_iter)
        stats = Stats(elapsed_ms=device_ms, search_depth=max_iter,
                      nodes_visited=graph.num_nodes,
                      edges_visited=graph.num_edges * max_iter)
        return SalsaResult(hub_ranks=hub, auth_ranks=auth, stats=stats)
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
