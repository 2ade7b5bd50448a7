"""BFS over the Pallas pull-sweep kernel (traversal_mode="pallas").

Level loop runs on host (one kernel launch + one n-sized XLA update
per level); the O(m) frontier expansion — the reference's hot kernel —
runs in the hand-written pull-sweep kernel (ops/pallas_advance.py).
Predecessors are derived post-hoc from final labels (deterministic
min-id tie-break), like the SSSP primitive does.
"""

from __future__ import annotations

import functools
import weakref
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import CsrGraph
from gunrockinst_tpu.ops.pallas_advance import (PullPlan, PullSweeper,
                                                build_pull_plan, pack_bitmap,
                                                unpack_bitmap)

INT_MAX = jnp.iinfo(jnp.int32).max

_sweeper_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_pull_sweeper(csr: CsrGraph,
                     interpret: Optional[bool] = None) -> PullSweeper:
    """Build (and cache per-CsrGraph) the pull plan + compiled sweeper.

    interpret=None auto-selects interpreter mode on the CPU backend
    (Mosaic only compiles for TPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    key = csr
    hit = _sweeper_cache.get(key)
    if hit is not None:
        return hit
    csc = csr.transposed()
    plan = build_pull_plan(csc.row_offsets, csc.col_indices, csr.num_nodes)
    sweeper = PullSweeper(plan, interpret=interpret)
    _sweeper_cache[key] = sweeper
    return sweeper


@functools.partial(jax.jit, static_argnames=("n_words",))
def _level_update(labels, touched_words, depth, n_words: int):
    n_pad = labels.shape[0]
    touched = unpack_bitmap(touched_words, n_pad)
    newf = touched & (labels == INT_MAX)
    labels = jnp.where(newf, depth + 1, labels)
    new_words = pack_bitmap(newf, n_words)
    return labels, new_words, jnp.sum(newf.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_pad",))
def _post_preds(labels, esrc, edst, n_pad: int):
    cand = (labels[esrc] != INT_MAX) & (labels[edst] == labels[esrc] + 1)
    preds = jnp.full((n_pad,), INT_MAX, jnp.int32).at[edst].min(
        jnp.where(cand, esrc, INT_MAX))
    return jnp.where(preds == INT_MAX, -1, preds)


_fused_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_fused_bfs(csr: CsrGraph):
    """Whole-search BFS as ONE jitted program: `lax.while_loop` around
    (pull sweep -> label update -> repack). Avoids the per-level host
    dispatch latency entirely (the reference's per-iteration kernel
    launches + D2H queue-length reads collapse into a single launch)."""
    hit = _fused_cache.get(csr)
    if hit is not None:
        return hit
    n = csr.num_nodes
    n_pad = ((n + 128) // 128) * 128
    sweeper = get_pull_sweeper(csr)
    n_words = sweeper.n_words

    # light-level path: LB-style sparse expansion in XLA for small
    # frontiers (a full pull sweep costs O(m) no matter how small the
    # frontier — the reference's light/heavy split, re-applied).
    g = csr.to_device(with_csc=False)
    light_cap = max(min(g.m_pad // 8, 1 << 17), 512)

    @jax.jit
    def bfs_full_impl(src, g, srb, drow, dlane, src_tiles,
                      dstrel_tiles):
        from gunrockinst_tpu.ops import frontier as fr
        from gunrockinst_tpu.ops.advance import expand_frontier

        labels0 = jnp.full((n_pad,), INT_MAX, jnp.int32).at[src].set(0)
        f0 = jnp.zeros((n_pad,), jnp.bool_).at[src].set(True)

        def cond(c):
            labels, frontier, depth, cont = c
            return cont & (depth < n)

        def heavy(args):
            labels, frontier = args
            fw = pack_bitmap(frontier, n_words)
            tw = sweeper.sweep_with(srb, drow, dlane, src_tiles,
                                    dstrel_tiles, fw)
            return unpack_bitmap(tw, n_pad)

        def light(args):
            labels, frontier = args
            ids, num = fr.compact(frontier, n_pad, g.n)
            _, dst, _, lane_valid = expand_frontier(g, ids, num, light_cap)
            return jnp.zeros((n_pad,), jnp.bool_).at[dst].max(lane_valid)

        def body(c):
            labels, frontier, depth, _ = c
            fe = jnp.sum(jnp.where(frontier, g.out_degree, 0))
            touched = jax.lax.cond(fe < light_cap, light, heavy,
                                   (labels, frontier))
            newf = touched & (labels == INT_MAX)
            labels = jnp.where(newf, depth + 1, labels)
            return labels, newf, depth + 1, jnp.any(newf)

        labels, frontier, depth, _ = jax.lax.while_loop(
            cond, body, (labels0, f0, jnp.int32(0), jnp.bool_(True)))
        return labels, depth

    def bfs_full(src):
        return bfs_full_impl(src, g, *sweeper.tiles)

    _fused_cache[csr] = bfs_full
    return bfs_full


def bfs_pallas_fused(csr: CsrGraph, src: int, mark_preds: bool = True
                     ) -> Tuple[np.ndarray, Optional[np.ndarray], int]:
    n = csr.num_nodes
    n_pad = ((n + 128) // 128) * 128
    fn = get_fused_bfs(csr)
    labels, depth = fn(src)
    labels_np = np.asarray(labels)[:n]
    preds_np = None
    if mark_preds:
        esrc = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32),
                                     np.diff(csr.row_offsets)))
        edst = jnp.asarray(csr.col_indices.astype(np.int32))
        preds_np = np.array(_post_preds(labels, esrc, edst, n_pad))[:n]
        if 0 <= src < n:
            preds_np[src] = -1
    return labels_np, preds_np, int(depth)


def bfs_pallas(csr: CsrGraph, src: int, mark_preds: bool = True,
               max_depth: Optional[int] = None,
               interpret: Optional[bool] = None
               ) -> Tuple[np.ndarray, Optional[np.ndarray], int]:
    """Returns (labels (n,), preds (n,)|None, depth)."""
    n = csr.num_nodes
    n_pad = ((n + 128) // 128) * 128
    sweeper = get_pull_sweeper(csr, interpret=interpret)
    n_words = sweeper.n_words

    labels = jnp.full((n_pad,), INT_MAX, jnp.int32).at[src].set(0)
    frontier = jnp.zeros((n_pad,), jnp.bool_).at[src].set(True)
    fw = pack_bitmap(frontier, n_words)
    depth = 0
    limit = max_depth if max_depth is not None else n + 1
    while depth < limit:
        touched_words = sweeper(fw)
        labels, fw, count = _level_update(labels, touched_words,
                                          jnp.int32(depth), n_words)
        depth += 1
        if int(count) == 0:
            depth -= 1
            break
    labels_np = np.asarray(labels)[:n]
    preds_np = None
    if mark_preds:
        esrc = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32),
                                     np.diff(csr.row_offsets)))
        edst = jnp.asarray(csr.col_indices.astype(np.int32))
        preds = _post_preds(labels, esrc, edst, n_pad)
        preds_np = np.array(preds)[:n]  # copy: we patch the source entry
        if 0 <= src < n:
            preds_np[src] = -1
    return labels_np, preds_np, depth
