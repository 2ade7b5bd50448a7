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


@dataclasses.dataclass
class CcResult:
    component_ids: np.ndarray
    num_components: int
    stats: Stats


def run(graph: GraphLike) -> CcResult:
    """Host entry (run_cc analog, app/cc/cc_app.cu)."""
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
