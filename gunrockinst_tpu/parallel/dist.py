"""Distributed primitives over an edge-partitioned mesh.

Each step: local edge-centric advance on the shard's edges, then one
all-reduce merges vertex-state partials. Convergence checks are global
values inside the compiled loop (the reference's host `done`-flag
handshake becomes `jnp.any` over the replicated frontier — no host
round-trip, no per-iteration D2H).

Distributed BFS and a distributed PageRank-style push are provided;
other primitives compose the same pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from gunrockinst_tpu.parallel.mesh import EDGE_AXIS
from gunrockinst_tpu.parallel.partition import ShardedGraph

INT_MAX = jnp.iinfo(jnp.int32).max


def bfs_dist(graph: ShardedGraph, src, mesh: Mesh,
             mark_preds: bool = True):
    """Whole-search distributed BFS. Same semantics/results as
    primitives.bfs.bfs_dense — the scatter-min + pmin composition is
    order-independent, so shard count never changes the answer."""
    n_pad = graph.n_pad

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_rep=False)
    def search(esrc, edst, src_v):
        labels0 = jnp.full((n_pad,), INT_MAX, jnp.int32).at[src_v[0]].set(0)
        preds0 = jnp.full((n_pad,), -1, jnp.int32)
        frontier0 = jnp.zeros((n_pad,), jnp.bool_).at[src_v[0]].set(True)

        def cond(carry):
            labels, preds, frontier, depth = carry
            return jnp.any(frontier) & (depth <= graph.n)

        def body(carry):
            labels, preds, frontier, depth = carry
            active = frontier[esrc]
            cand = active & (labels[edst] == INT_MAX)
            touched_l = jnp.zeros((n_pad,), jnp.int32).at[edst].max(
                cand.astype(jnp.int32))
            # boundary frontier exchange: one all-reduce over ICI
            touched = jax.lax.pmax(touched_l, EDGE_AXIS) > 0
            newf = touched & (labels == INT_MAX)
            labels = jnp.where(newf, depth + 1, labels)
            if mark_preds:
                pmin_l = jnp.full((n_pad,), INT_MAX, jnp.int32).at[edst].min(
                    jnp.where(cand, esrc, INT_MAX))
                pmin = jax.lax.pmin(pmin_l, EDGE_AXIS)
                preds = jnp.where(newf, pmin, preds)
            return labels, preds, newf, depth + 1

        labels, preds, frontier, depth = jax.lax.while_loop(
            cond, body, (labels0, preds0, frontier0, jnp.int32(0)))
        return labels, preds, depth

    fn = jax.jit(search)
    return fn(graph.edge_src, graph.edge_dst,
              jnp.asarray([src], dtype=jnp.int32))


def sssp_dist(graph: ShardedGraph, src, mesh: Mesh, weights=None):
    """Distributed SSSP (frontier Bellman-Ford): local scatter-min
    relaxations + pmin merge per round. Distances equal the
    single-chip/Dijkstra fixpoint bitwise."""
    n_pad = graph.n_pad

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P()),
        out_specs=(P(), P()),
        check_rep=False)
    def search(esrc, edst, w, src_v):
        inf = jnp.float32(jnp.inf)
        dist0 = jnp.full((n_pad,), inf).at[src_v[0]].set(0.0)
        pending0 = jnp.zeros((n_pad,), jnp.bool_).at[src_v[0]].set(True)

        def cond(c):
            dist, pending, it = c
            return jnp.any(pending) & (it < 4 * graph.n + 8)

        def body(c):
            dist, pending, it = c
            cand = pending[esrc]
            vals = jnp.where(cand, dist[esrc] + w, inf)
            relaxed_l = jnp.full((n_pad,), inf).at[edst].min(vals)
            relaxed = jax.lax.pmin(relaxed_l, EDGE_AXIS)
            newdist = jnp.minimum(dist, relaxed)
            changed = newdist < dist
            return newdist, changed, it + 1

        dist, pending, it = jax.lax.while_loop(
            cond, body, (dist0, pending0, jnp.int32(0)))
        return dist, it

    w = graph.edge_w if weights is None else weights
    return jax.jit(search)(graph.edge_src, graph.edge_dst, w,
                           jnp.asarray([src], dtype=jnp.int32))


def cc_dist(graph: ShardedGraph, mesh: Mesh):
    """Distributed connected components: shard-local min-hooking +
    pmin merge, then pointer jumping on the replicated labels."""
    n_pad = graph.n_pad

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=(P(), P()),
        check_rep=False)
    def run(esrc, edst):
        comp0 = jnp.arange(n_pad, dtype=jnp.int32)

        def cond(c):
            comp, changed, it = c
            return changed & (it < graph.n + 2)

        def body(c):
            comp, _, it = c
            hook_l = comp.at[edst].min(comp[esrc]).at[esrc].min(comp[edst])
            hook = jax.lax.pmin(hook_l, EDGE_AXIS)
            hook = hook[hook]
            hook = hook[hook]
            return hook, jnp.any(hook != comp), it + 1

        comp, _, it = jax.lax.while_loop(
            cond, body, (comp0, jnp.bool_(True), jnp.int32(0)))
        return comp, it

    return jax.jit(run)(graph.edge_src, graph.edge_dst)


def pagerank_push_dist(graph: ShardedGraph, mesh: Mesh,
                       delta: float = 0.85, threshold: float = 0.01,
                       max_iter: int = 50):
    """Distributed Gunrock-semantics PageRank: local partial push sums
    + one psum per iteration."""
    n_pad = graph.n_pad

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P()),
        out_specs=P(),
        check_rep=False)
    def pr(esrc, edst, deg):
        degf = jnp.maximum(deg.astype(jnp.float32), 1.0)
        real = jnp.arange(n_pad, dtype=jnp.int32) < graph.n
        rank0 = jnp.where(real, 1.0 - delta, 0.0)
        active0 = (deg > 0) & real

        def cond(carry):
            rank, active, it = carry
            return jnp.any(active) & (it < max_iter)

        def body(carry):
            rank, active, it = carry
            contrib = jnp.where(active, rank / degf, 0.0)
            ok = (deg[esrc] > 0) & (deg[edst] > 0)
            part = jnp.zeros((n_pad,), jnp.float32).at[edst].add(
                jnp.where(ok, contrib[esrc], 0.0))
            nxt = jax.lax.psum(part, EDGE_AXIS)
            nxt = jnp.where(real, delta * nxt + (1.0 - delta), 0.0)
            new_active = (jnp.abs(nxt - rank) > threshold) & real
            return nxt, new_active, it + 1

        rank, active, it = jax.lax.while_loop(
            cond, body, (rank0, active0, jnp.int32(0)))
        return rank

    return jax.jit(pr)(graph.edge_src, graph.edge_dst, graph.out_degree)
