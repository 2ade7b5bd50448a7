"""Betweenness centrality (Brandes).

Re-expression of gunrock/app/bc: forward BFS accumulating path counts
(sigma, atomicAdd in bc_functor.cuh ForwardFunctor) then the backward
level replay accumulating dependencies (BackwardFunctor/-2,
bc_functor.cuh:147-253). The reference records per-level frontier
offsets in a host vector (bc_enactor.cuh:260-390 forward_queue_offsets)
to replay levels; here the labels array itself drives the replay — the
backward pass masks edges by `labels[u]+1 == labels[v]` inside a
device-side countdown loop, so the whole per-source computation is one
compiled program.

Final bc values are halved (test_bc.cu convention for undirected
double-counting).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.ops import frontier as fr
from gunrockinst_tpu.primitives.base import (GraphLike, Stats, Timer,
                                             device_graph, sync)

INT_MAX = jnp.iinfo(jnp.int32).max


def _bc_source(graph: DeviceGraph, src):
    """One Brandes source. Returns (delta (n_pad,) f32 dependency
    scores, sigma (n_pad,) f32, labels (n_pad,) i32, depth)."""
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst

    labels0 = jnp.full((n_pad,), INT_MAX, jnp.int32).at[src].set(0)
    sigma0 = jnp.zeros((n_pad,), jnp.float32).at[src].set(1.0)
    frontier0 = fr.singleton_bitmap(src, n_pad)

    def fcond(carry):
        labels, sigma, frontier, depth = carry
        return jnp.any(frontier) & (depth <= graph.n)

    def fbody(carry):
        labels, sigma, frontier, depth = carry
        active = frontier[esrc]
        cand = active & (labels[edst] == INT_MAX)
        touched = jnp.zeros((n_pad,), jnp.bool_).at[edst].max(cand)
        newf = touched & (labels == INT_MAX)
        labels = jnp.where(newf, depth + 1, labels)
        # path counts: sigma[v] += sigma[u] over tree-level edges
        sadd = jnp.zeros((n_pad,), jnp.float32).at[edst].add(
            jnp.where(cand, sigma[esrc], 0.0))
        sigma = jnp.where(newf, sadd, sigma)
        return labels, sigma, newf, depth + 1

    labels, sigma, _, depth = jax.lax.while_loop(
        fcond, fbody, (labels0, sigma0, frontier0, jnp.int32(0)))

    # backward dependency accumulation, deepest level first.
    # inv_sigma is a SAFE reciprocal: unreachable vertices (sigma=0)
    # get 0, never 1/tiny=inf — under vmap on TPU the select can fuse
    # into arithmetic masking, so an inf in the untaken branch poisons
    # the result (inf*0=nan); keep every intermediate finite.
    lab_s, lab_d = labels[esrc], labels[edst]
    inv_sigma = jnp.where(sigma > 0.0,
                          1.0 / jnp.where(sigma > 0.0, sigma, 1.0), 0.0)

    def bcond(carry):
        delta, d = carry
        return d > 0

    def bbody(carry):
        delta, d = carry
        mask_e = (lab_s == d - 1) & (lab_d == d)
        contrib = jnp.where(
            mask_e, sigma[esrc] * inv_sigma[edst] * (1.0 + delta[edst]),
            0.0)
        delta = delta.at[esrc].add(contrib)
        return delta, d - 1

    delta, _ = jax.lax.while_loop(
        bcond, bbody, (jnp.zeros((n_pad,), jnp.float32), depth - 1))
    delta = delta.at[src].set(0.0)
    return delta, sigma, labels, depth


bc_source_kernel = jax.jit(_bc_source)


@jax.jit
def bc_batch_kernel(graph: DeviceGraph, srcs):
    """K Brandes sources in ONE compiled program, natively batched:
    (K, n_pad) state arrays, ONE shared forward while_loop (runs to the
    max depth over the batch; finished lanes have empty frontiers so
    their updates are no-ops) and one shared backward countdown (levels
    a lane never reached match no edges).  Replaces the reference's
    host loop of per-source enactor launches (tests/bc/test_bc.cu
    src=-1 path) where each launch costs ~µs; here a launch costs a
    3-30 ms tunnel round-trip, so batching is what makes full-graph BC
    feasible.  Written without vmap: the vmapped-while_loop form
    miscompiled on the axon TPU backend (backward scatter produced
    zeros).  srcs: (K,) int32, dummy-padded with `n` (a dummy source
    contributes an all-zero delta).  Returns (bc_partial (n_pad,) f32
    summed over lanes, sigma (K,n_pad), labels (K,n_pad), max depth)."""
    n_pad = graph.n_pad
    esrc, edst = graph.edge_src, graph.edge_dst
    K = srcs.shape[0]
    lanes = jnp.arange(K)

    labels0 = jnp.full((K, n_pad), INT_MAX, jnp.int32).at[
        lanes, srcs].set(0)
    sigma0 = jnp.zeros((K, n_pad), jnp.float32).at[lanes, srcs].set(1.0)
    frontier0 = jnp.zeros((K, n_pad), jnp.bool_).at[
        lanes, srcs].set(True)

    def fcond(carry):
        labels, sigma, frontier, depth = carry
        return jnp.any(frontier) & (depth <= graph.n)

    def fbody(carry):
        labels, sigma, frontier, depth = carry
        active = frontier[:, esrc]
        cand = active & (labels[:, edst] == INT_MAX)
        touched = jnp.zeros((K, n_pad), jnp.bool_).at[:, edst].max(cand)
        newf = touched & (labels == INT_MAX)
        labels = jnp.where(newf, depth + 1, labels)
        sadd = jnp.zeros((K, n_pad), jnp.float32).at[:, edst].add(
            jnp.where(cand, sigma[:, esrc], 0.0))
        sigma = jnp.where(newf, sadd, sigma)
        return labels, sigma, newf, depth + 1

    labels, sigma, _, depth = jax.lax.while_loop(
        fcond, fbody, (labels0, sigma0, frontier0, jnp.int32(0)))

    # backward: one countdown from the batch-max depth; safe reciprocal
    # keeps every intermediate finite (see _bc_source).  The four
    # loop-invariant (K, m_pad) edge gathers are HOISTED out of the
    # loop: besides saving work, in-loop batched gathers of
    # loop-invariant arrays miscompile on the axon TPU backend (the
    # loop silently produces zeros; only the carry gather
    # delta[:, edst] may stay inside).  _auto_batch accounts for the
    # 16 B/edge/lane these cost.
    inv_sigma = jnp.where(sigma > 0.0,
                          1.0 / jnp.where(sigma > 0.0, sigma, 1.0), 0.0)
    lab_s, lab_d = labels[:, esrc], labels[:, edst]
    sig_s, inv_d = sigma[:, esrc], inv_sigma[:, edst]

    def bcond(carry):
        delta, d = carry
        return d > 0

    def bbody(carry):
        delta, d = carry
        mask_e = (lab_s == d - 1) & (lab_d == d)
        contrib = jnp.where(
            mask_e, sig_s * inv_d * (1.0 + delta[:, edst]), 0.0)
        delta = delta.at[:, esrc].add(contrib)
        return delta, d - 1

    delta, _ = jax.lax.while_loop(
        bcond, bbody, (jnp.zeros((K, n_pad), jnp.float32), depth - 1))
    delta = delta.at[lanes, srcs].set(0.0)
    valid = srcs < graph.n
    bc_part = jnp.sum(jnp.where(valid[:, None], delta, 0.0), axis=0)
    return bc_part, sigma, labels, depth - 1


def _auto_batch(g: DeviceGraph) -> int:
    """Largest power-of-two source batch whose ~22*m_pad B/lane of edge
    arrays (16 B hoisted backward gathers + ~6 B forward temporaries)
    stays within a ~2 GiB scratch budget (v5e HBM 16 GB), clamped to
    [1, 128]."""
    per_lane = 22 * g.m_pad
    k = max(1, (2 << 30) // max(per_lane, 1))
    return 1 << min(max(k.bit_length() - 1, 0), 7)


import time as _time
import weakref

_planes_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_bc_planes(csr, interpret=None, level_cap: int = 64):
    """Single-source Brandes over the value-plane ADD kernel (round-4
    verdict item 3: the XLA full-edge gathers/scatters path took 16.4 s
    at rmat-s20 on a backend measured 10-100x off roofline).

    Forward: one LEVEL-GATED pull-ADD sweep per level accumulates
    sigma into the next level (contrib[v] = sum of sigma over frontier
    in-neighbors; the nonzero pattern of contrib IS the touched set,
    so BFS labels fall out of the same sweep).  Backward: one gated
    reverse-plan ADD sweep per level, deepest first, accumulates the
    dependency sum t[u] = sum over level-(d+1) out-neighbors of
    (1+delta)/sigma, then delta[u at level d] += sigma[u] * t[u] —
    exactly BackwardFunctor's per-edge term
    (gunrock/app/bc/bc_functor.cuh:147-253) with the level replay the
    reference drives from forward_queue_offsets
    (bc_enactor.cuh:260-390) driven here by the recorded level words.
    Both sweeps ride the shared plans/kernels of pr/sssp/cc planes;
    level gating makes each sweep cost ~ the edges adjacent to that
    level's regions (use_active + region skip).

    Returns fn(src) -> (delta, sigma, labels (all (n,) input ids),
    depth, device_ms)."""
    from gunrockinst_tpu.ops.pallas_value import (
        get_add_stepper, get_reverse_plan, get_unweighted_plan,
        layout_vals, layout_words, unlayout_vals)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    key = (bool(interpret), int(level_cap))
    hit = _planes_cache.get(csr)
    if hit is not None and key in hit:
        return hit[key]
    n = csr.num_nodes
    plan_f = get_unweighted_plan(csr)
    plan_r = get_reverse_plan(csr)
    st_f = get_add_stepper(plan_f, interpret, gated=True)
    st_r = get_add_stepper(plan_r, interpret, gated=True)
    rows_w = plan_f.rows_w
    iota32 = jnp.arange(32, dtype=jnp.int32)

    def words_of_nonzero(arr):
        """layout f32 (32*rows_w,128) -> (rows_w,128) word bitmap of
        nonzero entries (word-row-major: rows r*32+g pack over the
        32-row minor group, same fold as pr planes)."""
        b = (arr != 0.0).astype(jnp.int32).reshape(rows_w, 32, 128)
        return jnp.sum(b << iota32[None, :, None], axis=1)

    def expand_words(w):
        """(rows_w,128) words -> layout f32 0/1 mask."""
        bits = (w[:, None, :] >> iota32[None, :, None]) & 1
        return bits.reshape(32 * rows_w, 128).astype(jnp.float32)

    def as_bits(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def as_f32(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    impls = {}

    def make_impl(cap: int):
        @jax.jit
        def program(sf, hf, sr, hr, x0, f0w):
            z = jnp.zeros((32 * rows_w, 128), jnp.float32)
            lvl0 = jnp.zeros((cap, rows_w, 128), jnp.int32)
            lvl0 = lvl0.at[0].set(f0w)

            # ---- forward: sigma + level words ----
            def fcond(c):
                sigma, x, fw, vw, lvl, d, cont = c
                return cont & (d + 1 < cap)

            def fbody(c):
                sigma, x, fw, vw, lvl, d, _ = c
                contrib = as_f32(st_f.step_with(sf, hf, as_bits(x),
                                                fw)[0])
                tw = words_of_nonzero(contrib)
                nfw = tw & ~vw
                nm = expand_words(nfw)
                sigma = sigma + contrib * nm
                x = contrib * nm
                vw = vw | nfw
                lvl = jax.lax.dynamic_update_slice(
                    lvl, nfw[None], (d + 1, 0, 0))
                return (sigma, x, nfw, vw, lvl, d + 1,
                        jnp.any(nfw != 0))

            sigma, _, _, vw, lvl, depth, cont = jax.lax.while_loop(
                fcond, fbody, (x0, x0, f0w, f0w, lvl0, jnp.int32(0),
                               jnp.bool_(True)))
            depth = depth - jnp.int32(~cont)  # last level was empty

            # ---- backward: delta, deepest level first ----
            inv_sigma = jnp.where(sigma > 0.0,
                                  1.0 / jnp.where(sigma > 0.0, sigma,
                                                  1.0), 0.0)

            def bbody(i, delta):
                dd = depth - i          # child level, from depth .. 1
                cw = jax.lax.dynamic_slice(
                    lvl, (dd, 0, 0), (1, rows_w, 128))[0]
                y = expand_words(cw) * (1.0 + delta) * inv_sigma
                t = as_f32(st_r.step_with(sr, hr, as_bits(y), cw)[0])
                pw = jax.lax.dynamic_slice(
                    lvl, (dd - 1, 0, 0), (1, rows_w, 128))[0]
                return delta + expand_words(pw) * sigma * t

            delta = jax.lax.fori_loop(0, jnp.maximum(depth, 0), bbody,
                                      z)
            return delta, sigma, lvl, depth

        return program

    def fn(src):
        chm = np.zeros(n, bool)
        chm[int(src)] = True
        f0w = jnp.asarray(layout_words(plan_f, chm))
        x0_np = np.zeros(n, np.float32)
        x0_np[int(src)] = 1.0
        x0 = as_f32(jnp.asarray(layout_vals(plan_f, x0_np)))
        cap = level_cap
        while True:
            if cap not in impls:
                impls[cap] = make_impl(cap)
            program = impls[cap]
            t0 = _time.perf_counter()
            delta, sigma, lvl, depth = program(
                st_f.scal_args, st_f.hbm_args, st_r.scal_args,
                st_r.hbm_args, x0, f0w)
            depth = int(depth)   # scalar fetch forces completion
            device_ms = (_time.perf_counter() - t0) * 1e3
            if depth + 1 < cap:
                break
            cap = max(cap * 4, 256)   # deep graph: recompile higher
        delta_np = unlayout_vals(plan_f, np.asarray(as_bits(delta)), n,
                                 np.float32)
        sigma_np = unlayout_vals(plan_f, np.asarray(as_bits(sigma)), n,
                                 np.float32)
        # labels from the recorded level words (extraction, outside
        # the Enact window)
        lvl_np = np.asarray(lvl[: depth + 1])
        labels = np.full(n, INF32_NP, np.int32)
        for d in range(depth + 1):
            bits = np.unpackbits(
                lvl_np[d].reshape(-1).view(np.uint8),
                bitorder="little")[:n].astype(bool)
            labels[bits] = d
        if plan_f.perm is not None:
            labels = labels[plan_f.perm]
        labels[int(src)] = 0
        delta_np[int(src)] = 0.0
        return delta_np, sigma_np, labels, depth, device_ms

    _planes_cache.setdefault(csr, {})[key] = fn
    return fn


INF32_NP = np.iinfo(np.int32).max


@dataclasses.dataclass
class BcResult:
    bc_values: np.ndarray
    sigmas: np.ndarray
    labels: np.ndarray
    stats: Stats


def run(graph: GraphLike, src: int = -1,
        batch: Optional[int] = None, mode: str = "xla") -> BcResult:
    """Host entry. src >= 0: single-source accumulation (the reference
    enactor is per-source; its test loops sources); src == -1: all
    sources, computed `batch` sources per kernel call (auto-sized to
    the graph when None).  sigmas/labels in the result are those of the
    last source, matching the reference test's convention.
    mode="planes" (src >= 0 only) rides the value-plane ADD kernel —
    get_bc_planes."""
    if mode == "planes":
        from gunrockinst_tpu.graph.csr import CsrGraph
        if not isinstance(graph, CsrGraph):
            raise TypeError("mode='planes' needs a host CsrGraph")
        if src < 0:
            raise ValueError("mode='planes' is single-source")
        fn = get_bc_planes(graph)
        fn(src)   # warm-up/compile
        delta, sigma, labels, depth, device_ms = fn(src)
        stats = Stats(elapsed_ms=device_ms, search_depth=depth,
                      nodes_visited=graph.num_nodes,
                      edges_visited=graph.num_edges)
        return BcResult(bc_values=(delta * 0.5).astype(np.float32),
                        sigmas=sigma, labels=labels, stats=stats)
    g = device_graph(graph)
    if src >= 0:
        out = bc_source_kernel(g, src)   # warm
        sync(out[3])
        with Timer() as t:
            delta, sigma, labels, d = bc_source_kernel(g, src)
            bc = np.asarray(delta, dtype=np.float64)
        depth = int(d)
        n_sources = 1
    else:
        K = batch or _auto_batch(g)
        srcs0 = jnp.arange(min(K, g.n), dtype=jnp.int32)
        if srcs0.shape[0] < K:
            srcs0 = jnp.concatenate(
                [srcs0, jnp.full((K - srcs0.shape[0],), g.n, jnp.int32)])
        out = bc_batch_kernel(g, srcs0)  # warm (one compile for all)
        sync(out[3])
        depth = 0
        parts = []
        with Timer() as t:
            # Enact window: device batches only — the int(d) scalar
            # fetch forces each batch's completion (axon quirk); the
            # host-side accumulation happens AFTER the timer, like the
            # reference's Extract after GpuTimer::Stop
            # (tests/bc/test_bc.cu).
            for b0 in range(0, g.n, K):
                ids = np.arange(b0, b0 + K, dtype=np.int32)
                ids[ids >= g.n] = g.n            # dummy-pad the tail
                part, sig_b, lab_b, d = bc_batch_kernel(
                    g, jnp.asarray(ids))
                parts.append(part)
                depth = max(depth, int(d))
            last = (g.n - 1) % K
            sigma, labels = sig_b[last], lab_b[last]
        bc = np.zeros(g.n_pad, dtype=np.float64)
        for part in parts:
            bc += np.asarray(part)
        n_sources = g.n
    stats = Stats(elapsed_ms=t.elapsed_ms, search_depth=depth,
                  nodes_visited=g.n,
                  edges_visited=g.m * n_sources)
    return BcResult(
        bc_values=(bc[: g.n] * 0.5).astype(np.float32),
        sigmas=np.asarray(sigma)[: g.n],
        labels=np.asarray(labels)[: g.n],
        stats=stats,
    )
