"""Connected components (hook + pointer-jump).

Re-expression of gunrock/app/cc (Soman et al. hooking/pointer-jumping,
cc_functor.cuh:19-367, cc_enactor.cuh:240-560): the seven filter-only
functor passes (HookInit/HookMin/HookMax/PtrJump/PtrJumpMask/
PtrJumpUnmask/UpdateMask) collapse into a single fixpoint of

    hook:  comp[v] <- min(comp[v], min over neighbors comp[u])
    jump:  comp    <- comp[comp]   (twice per round)

which is monotone (comp[v] <= v invariant) and converges in
O(log diameter) rounds to the min vertex id of each weakly-connected
component — exactly the canonical labeling of the CPU oracle, so no
relabeling is needed for comparison. The per-round host flag copy of
the reference (cc_enactor.cuh:443-489) stays on device as the
while_loop condition.
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
def cc_kernel(graph: DeviceGraph):
    """Returns (comp (n_pad,) int32, iterations)."""
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    comp0 = jnp.arange(n_pad, dtype=jnp.int32)

    def cond(carry):
        comp, changed, it = carry
        return changed & (it < graph.n + 2)

    def body(carry):
        comp, _, it = carry
        cs, cd = comp[esrc], comp[edst]
        hook = comp.at[edst].min(cs).at[esrc].min(cd)
        hook = hook[hook]
        hook = hook[hook]
        return hook, jnp.any(hook != comp), it + 1

    comp, _, it = jax.lax.while_loop(
        cond, body, (comp0, jnp.bool_(True), jnp.int32(0)))
    return comp, it


import time as _time
import weakref

_planes_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_cc_planes(csr, interpret=None):
    """Per-graph cached fused min-label propagation over the value-
    plane kernel (ops/pallas_value.py): comp[v] <- min over undirected
    neighbors of comp[u], whole fixpoint in ONE jitted lax.while_loop
    of full min sweeps.  Converges in eccentricity(min-vertex) rounds —
    small on the power-law graphs the reference benchmarks CC on — and
    the changed-word bitmap skips settled regions, so late rounds cost
    ~nothing.  Same fixpoint as the hook+jump cc_kernel (and the
    reference's Soman hooking, gunrock/app/cc/cc_functor.cuh:19-367):
    min vertex id per weakly-connected component.

    Returns fn() -> (comp (n,) i32 np, iterations, device_ms)."""
    import jax
    import jax.numpy as jnp
    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    from gunrockinst_tpu.ops.pallas_value import (
        ValueStepper, _build_fitting_plan, _with_perm,
        get_unweighted_plan, layout_vals, layout_words, unlayout_vals)
    from gunrockinst_tpu.graph.relabel import relabeled

    hit = _planes_cache.get(csr)
    if hit is not None:
        return hit
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = csr.num_nodes
    # weak connectivity: symmetrize (the reference's CC also treats the
    # edge list as undirected, cc_app.cu)
    esrc = np.repeat(np.arange(n, dtype=np.int64),
                     np.diff(csr.row_offsets))
    edst = csr.col_indices.astype(np.int64)
    und = CsrGraph.from_coo(CooGraph(n, esrc, edst), undirected=True)
    if (und.row_offsets.shape == csr.row_offsets.shape
            and np.array_equal(und.row_offsets, csr.row_offsets)
            and np.array_equal(und.col_indices, csr.col_indices)):
        # graph was already symmetric & canonical: share the plan (and
        # its one-time ~300 MB tunnel upload) with sssp/pr planes
        plan = get_unweighted_plan(csr)
    else:
        und_p, uperm = relabeled(und)
        ucsc = und_p.transposed()
        plan = _with_perm(
            _build_fitting_plan(ucsc.row_offsets, ucsc.col_indices, n),
            uperm)
    stepper = ValueStepper(plan, mode="min", f32=False,
                           use_active=True, interpret=interpret)
    rows_w = plan.rows_w
    # pad vertices (>= n) have no edges: never gathered (their changed
    # bits stay 0), never written — init value is irrelevant
    # min-label propagation runs over ORIGINAL vertex ids staged into
    # layout positions, so the component representatives (min input id)
    # are unchanged by the plan's internal degree relabeling
    comp0_np = layout_vals(plan, np.arange(n, dtype=np.int32))
    ch0_np = layout_words(plan, np.ones(n, bool))
    limit = n + 2

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

    acc0 = jnp.asarray(comp0_np)
    ch0 = jnp.asarray(ch0_np)

    def fn():
        t0 = _time.perf_counter()
        acc, it = loop(stepper.scal_args, stepper.hbm_args, acc0, ch0)
        it = int(it)   # scalar fetch forces completion (axon quirk)
        device_ms = (_time.perf_counter() - t0) * 1e3
        comp = unlayout_vals(plan, np.asarray(acc), n)
        return comp, it, device_ms

    _planes_cache[csr] = fn
    return fn


@dataclasses.dataclass
class CcResult:
    component_ids: np.ndarray
    num_components: int
    stats: Stats


def run(graph: GraphLike, mode: str = "xla") -> CcResult:
    """Host entry (run_cc analog, app/cc/cc_app.cu).  mode="planes"
    routes through the fused value-plane min-label kernel (needs a host
    CsrGraph; ~10-20x on large graphs, same canonical labels)."""
    if mode == "planes":
        from gunrockinst_tpu.graph.csr import CsrGraph
        if not isinstance(graph, CsrGraph):
            raise TypeError("mode='planes' needs a host CsrGraph")
        fn = get_cc_planes(graph)
        fn()  # warm-up (compile)
        comp_np, it, device_ms = fn()
        roots = int((comp_np == np.arange(graph.num_nodes)).sum())
        stats = Stats(elapsed_ms=device_ms, search_depth=int(it),
                      nodes_visited=graph.num_nodes,
                      edges_visited=graph.num_edges)
        return CcResult(component_ids=comp_np, num_components=roots,
                        stats=stats)
    g = device_graph(graph)
    out = cc_kernel(g)
    sync(out[1])
    with Timer() as t:
        comp, it = cc_kernel(g)
        sync(it)
    comp_np = np.asarray(comp)[: g.n]
    roots = int((comp_np == np.arange(g.n)).sum())
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=int(it),
                  nodes_visited=g.n, edges_visited=g.m)
    return CcResult(component_ids=comp_np, num_components=roots, stats=stats)
