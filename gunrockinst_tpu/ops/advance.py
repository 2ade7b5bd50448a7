"""The advance operator — frontier neighbor expansion.

TPU-native re-expression of the reference's advance dispatch
(oprtr/advance/kernel.cuh:101-765, modes TWC_FORWARD / TWC_BACKWARD /
LB / LB_BACKWARD). Instead of per-thread dynamic scheduling and atomic
queue scatters, we offer two execution strategies with identical
semantics:

  * dense sweep (`advance_dense`) — edge-centric pass over ALL m_pad
    edges: gather frontier membership at edge sources, evaluate the
    functor, scatter-combine payloads at destinations. O(m) per call
    but perfectly regular: pure gathers + segment combines, no
    load-imbalance — the TPU analog of the LB kernel's "every lane owns
    an equal slice of edges" philosophy taken to its limit.

  * sparse gather (`expand_frontier`) — the reference's LB pipeline
    (GetEdgeCounts -> scan -> per-lane binary search,
    edge_map_partitioned/kernel.cuh:202-559) mapped 1:1 onto XLA:
    degrees of frontier vertices -> exclusive cumsum -> `searchsorted`
    maps each of E_cap output lanes to its source vertex and edge id.
    O(E_cap) per call; capacity tiers replace the light/heavy kernel
    split (LIGHT_EDGE_THRESHOLD, advance/kernel.cuh:319).

Backward (pull) advance = `advance_dense` on `graph.reverse_view()`.

Functor contract (vectorized Cond/Apply pair, doc/programming_model.md):
    edge_fn(src_ids, dst_ids, w, eids, state) -> (cond_mask, payload)
applied to every edge lane; payloads of passing edges are combined at
the destination with a deterministic reduction (`combine`).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.ops.segment import combine_fn


def advance_dense(
    graph: DeviceGraph,
    frontier,                      # (n_pad,) bool or None (= all vertices)
    edge_fn: Callable,
    state=None,
    combine: str = "or",
    payload_dtype=None,
    reverse: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full-edge advance. Returns (combined (n_pad,), touched (n_pad,) bool).

    `touched[v]` is True iff some passing edge ended at v — the raw
    output frontier before filtering. `combined[v]` is the reduction of
    payloads over passing edges into v (identity elsewhere).
    """
    if reverse:
        graph = graph.reverse_view()
    src, dst, w = graph.edge_src, graph.edge_dst, graph.edge_w
    eids = None
    cond, payload = edge_fn(src, dst, w, eids, state)
    if frontier is not None:
        cond = cond & frontier[src]
    scatter, ident_of = combine_fn(combine)
    touched = jnp.zeros((graph.n_pad,), jnp.bool_).at[dst].max(cond)
    if payload is None:
        return touched, touched
    dt = payload_dtype or payload.dtype
    ident = jnp.asarray(ident_of(jnp.dtype(dt)), dtype=dt)
    vals = jnp.where(cond, payload.astype(dt), ident)
    combined = scatter(jnp.full((graph.n_pad,), ident, dtype=dt), dst, vals)
    return combined, touched


def expand_frontier(
    graph: DeviceGraph,
    frontier_ids,                  # (cap,) int32, padded with graph.n
    num_frontier,                  # scalar int32
    e_cap: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """LB-style frontier expansion into per-edge lanes.

    Returns (lane_src, lane_dst, lane_eid, lane_valid), each (e_cap,).
    Lanes beyond the total neighbor count are invalid and point at the
    dummy vertex. If the frontier's neighbor count exceeds e_cap the
    tail is truncated — callers pick e_cap via `degree_sum` first (the
    queue-sizing analog; overflow detection mirrors
    cta_work_progress.cuh:182 SetOverflow).
    """
    n_dummy = graph.n
    cap = frontier_ids.shape[0]
    lane_pos = jnp.arange(cap, dtype=jnp.int32)
    valid_src = lane_pos < num_frontier
    deg = jnp.where(valid_src, graph.out_degree[frontier_ids], 0)
    offs = jnp.cumsum(deg) - deg          # exclusive scan (mgpu Scan analog)
    total = jnp.sum(deg)
    lanes = jnp.arange(e_cap, dtype=jnp.int32)
    # binary search: which frontier slot owns this lane
    # (RelaxPartitionedEdges2's smem BinarySearch,
    #  edge_map_partitioned/kernel.cuh:369)
    slot = jnp.searchsorted(offs, lanes, side="right").astype(jnp.int32) - 1
    slot = jnp.clip(slot, 0, cap - 1)
    lane_valid = lanes < total
    src = jnp.where(lane_valid, frontier_ids[slot], n_dummy)
    eid = graph.row_offsets[src] + (lanes - offs[slot])
    eid = jnp.where(lane_valid, eid, graph.m_pad - 1)
    dst = jnp.where(lane_valid, graph.edge_dst[eid], n_dummy)
    return src, dst, eid, lane_valid


def advance_sparse(
    graph: DeviceGraph,
    frontier_ids,
    num_frontier,
    edge_fn: Callable,
    state=None,
    combine: str = "or",
    payload_dtype=None,
    e_cap: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse advance over a compacted frontier; same contract as
    advance_dense but cost O(e_cap) instead of O(m_pad)."""
    if e_cap is None:
        e_cap = graph.m_pad
    src, dst, eid, lane_valid = expand_frontier(
        graph, frontier_ids, num_frontier, e_cap)
    w = graph.edge_w[eid]
    cond, payload = edge_fn(src, dst, w, eid, state)
    cond = cond & lane_valid
    scatter, ident_of = combine_fn(combine)
    touched = jnp.zeros((graph.n_pad,), jnp.bool_).at[dst].max(cond)
    if payload is None:
        return touched, touched
    dt = payload_dtype or payload.dtype
    ident = jnp.asarray(ident_of(jnp.dtype(dt)), dtype=dt)
    vals = jnp.where(cond, payload.astype(dt), ident)
    combined = scatter(jnp.full((graph.n_pad,), ident, dtype=dt), dst, vals)
    return combined, touched


def neighborhood_reduce(
    graph: DeviceGraph,
    frontier,                      # (n_pad,) bool or None
    edge_fn: Callable,
    state=None,
    combine: str = "add",
    payload_dtype=None,
) -> jax.Array:
    """Per-SOURCE reduction over each vertex's outgoing edges — the
    post-advance neighborhood reduce the reference runs via mgpu
    SegReduceCsr (advance/kernel.cuh:733-760, REDUCE_TYPE VERTEX).
    Returns (n_pad,) combined values (identity for sources with no
    passing edge)."""
    src, dst, w = graph.edge_src, graph.edge_dst, graph.edge_w
    cond, payload = edge_fn(src, dst, w, None, state)
    if frontier is not None:
        cond = cond & frontier[src]
    scatter, ident_of = combine_fn(combine)
    dt = payload_dtype or payload.dtype
    ident = jnp.asarray(ident_of(jnp.dtype(dt)), dtype=dt)
    vals = jnp.where(cond, payload.astype(dt), ident)
    return scatter(jnp.full((graph.n_pad,), ident, dtype=dt), src, vals)


def degree_sum(graph: DeviceGraph, frontier) -> jax.Array:
    """Total out-degree of a frontier bitmap (the LB scan total the
    reference copies D2H each iteration, advance/kernel.cuh:315-317 —
    here it stays on device)."""
    return jnp.sum(jnp.where(frontier, graph.out_degree, 0))
