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


_sweeper_v2_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_pull_sweeper_v2(csr: CsrGraph, interpret: Optional[bool] = None):
    """v2 flavor-split sweeper (hub/packed tiling) — ~10x the v1 sweep
    throughput on power-law graphs (measured 2.67 G edges/s vs 0.28 at
    rmat s20 on v5e)."""
    from gunrockinst_tpu.ops.pallas_advance_v2 import (PullSweeperV2,
                                                       build_pull_plan_v2)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    hit = _sweeper_v2_cache.get(csr)
    if hit is not None:
        return hit
    csc = csr.transposed()
    plan = build_pull_plan_v2(csc.row_offsets, csc.col_indices,
                              csr.num_nodes)
    sweeper = PullSweeperV2(plan, interpret=interpret)
    _sweeper_v2_cache[csr] = sweeper
    return sweeper


_sweeper_v3_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_pull_sweeper_v3(csr: CsrGraph, interpret: Optional[bool] = None):
    """v3 sweeper (suffix-OR runs + per-lane singles) — same contract
    as v2 with ~18% fewer tiles on power-law graphs
    (ops/pallas_advance_v3.py)."""
    from gunrockinst_tpu.ops.pallas_advance_v3 import (PullSweeperV3,
                                                       build_pull_plan_v3)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    hit = _sweeper_v3_cache.get(csr)
    if hit is not None:
        return hit
    csc = csr.transposed()
    plan = build_pull_plan_v3(csc.row_offsets, csc.col_indices,
                              csr.num_nodes)
    sweeper = PullSweeperV3(plan, interpret=interpret)
    _sweeper_v3_cache[csr] = sweeper
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
    a per-level direction choice (the reference DOBFS insight,
    dobfs_enactor.cuh:397):

      * LIGHT level (frontier out-edges <= E_CAP): XLA push — compact
        the frontier bitmap, expand edges by scanned-degree
        searchsorted (the LB GetEdgeCounts->Scan->BinarySearch shape,
        edge_map_partitioned/kernel.cuh:242-559), scatter dst bits.
        Costs O(n + E_CAP) instead of an O(m) sweep: on rmat-s20 the
        source level and the low-degree tail levels (|F| 41K but only
        49K out-edges) stop paying 229 MB full sweeps.
      * HEAVY level: the v2 Pallas pull sweep.

    Avoids per-level host dispatch entirely (the reference's
    per-iteration kernel launches + D2H queue-length reads collapse
    into a single launch)."""
    hit = _fused_cache.get(csr)
    if hit is not None:
        return hit
    n = csr.num_nodes
    m = csr.num_edges
    n_pad = ((n + 128) // 128) * 128
    sweeper = get_pull_sweeper_v3(csr)
    n_words = sweeper.n_words

    # light-level capacities: a level whose frontier fits both goes
    # through the XLA push branch
    V_CAP = int(min(1 << 16, n_pad))
    E_CAP = int(min(1 << 17, max(m, 1)))

    # push-side CSR (device args — never closure-captured: big arrays
    # inline as constants and blow the remote compile, CLAUDE.md).
    # degree is laid out BIT-PLANE-MAJOR (32, rows, 128):
    # deg_planes[b, r, l] = out-degree of vertex (r*128+l)*32 + b, so
    # frontier-masked degree sums never leave the 128-minor layout
    # (a canonical (n_pad,) unpack costs ~25 ms at s20 — the 32-minor
    # relayout — and would dominate the whole search).
    deg_np = np.pad(np.diff(csr.row_offsets), (0, n_words * 32 - n))
    rowsN = n_words // 128
    deg_planes_np = np.ascontiguousarray(
        deg_np.reshape(rowsN, 128, 32).transpose(2, 0, 1)).astype(np.int32)
    push_args = (
        jnp.asarray(csr.row_offsets[:-1].astype(np.int32)),  # starts (n,)
        jnp.asarray(csr.col_indices.astype(np.int32)),       # dsts (m,)
        jnp.asarray(deg_planes_np),                          # (32,rows,128)
    )

    # label depths are stored as PLANES bit-plane word bitmaps so the
    # whole level loop runs in word space; the planes are unpacked to
    # per-vertex labels once, after convergence (on the host).
    PLANES = max((n + 1).bit_length(), 1)

    @jax.jit
    def bfs_full_impl(src, hub_args, pk_args, push):
        starts, dsts, deg_planes = push
        rows = n_words // 128
        f0 = jnp.zeros((n_pad,), jnp.bool_).at[src].set(True)
        fw0 = pack_bitmap(f0, n_words)
        planes0 = jnp.zeros((PLANES, rows, 128), jnp.int32)
        bidx = jnp.arange(32, dtype=jnp.int32)

        def fw_bits(fw):
            """(rows,128) words -> (32,rows,128) 0/1 planes; stays in
            128-minor layout (no relayout)."""
            return (fw[None, :, :] >> bidx[:, None, None]) & 1

        def push_level(fw):
            """One LIGHT level: compact -> LB expand -> plane scatter.
            All id math is in plane-major flat order
            p = b*rows*128 + word, so nonzero/scatter never touch the
            canonical vertex order."""
            fbits = fw_bits(fw)
            flat = fbits.reshape(32 * rows * 128)
            p = jnp.nonzero(flat, size=V_CAP,
                            fill_value=32 * rows * 128)[0].astype(jnp.int32)
            b = p // (rows * 128)
            w = p - b * (rows * 128)
            ids = w * 32 + b                     # vertex ids (or >= n)
            ok = ids < n
            idc = jnp.minimum(ids, n - 1)
            dg = jnp.where(ok, deg_planes.reshape(
                32 * rows * 128)[jnp.minimum(p, 32 * rows * 128 - 1)], 0)
            cum = jnp.cumsum(dg)
            total = cum[-1]
            st = jnp.where(ok, starts[idc], 0)
            j = jnp.arange(E_CAP, dtype=jnp.int32)
            k = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
            k = jnp.minimum(k, V_CAP - 1)
            base = jnp.where(k > 0, cum[jnp.maximum(k - 1, 0)], 0)
            eidx = st[k] + (j - base)
            valid = j < total
            dst = jnp.where(valid, dsts[jnp.clip(eidx, 0, m - 1)], 0)
            dpos = (dst % 32) * (rows * 128) + dst // 32
            tflat = jnp.zeros((32 * rows * 128,), jnp.int32).at[dpos].max(
                valid.astype(jnp.int32))
            tplanes = tflat.reshape(32, rows, 128)
            # plane-major pack: words = OR_b plane[b] << b
            tw = jnp.zeros((rows, 128), jnp.int32)
            for bb in range(32):
                tw = tw | (tplanes[bb] << bb)
            return tw

        def cond(c):
            planes, fw, vw, depth, cont = c
            return cont & (depth < n)

        def body(c):
            planes, fw, vw, depth, _ = c
            fbits = fw_bits(fw)
            push_edges = jnp.sum(fbits * deg_planes)
            fcount = jnp.sum(fbits)
            light = (push_edges <= E_CAP) & (fcount <= V_CAP)
            tw = jax.lax.cond(
                light, push_level,
                lambda w: sweeper.sweep_with(hub_args, pk_args, w), fw)
            nfw = tw & ~vw             # next frontier, in word space
            vw = vw | nfw
            d = depth + 1
            bits = (d >> jnp.arange(PLANES, dtype=jnp.int32)) & 1
            planes = planes | (nfw[None, :, :] * bits[:, None, None])
            return planes, nfw, vw, d, jnp.any(nfw != 0)

        planes, fw, vw, depth, _ = jax.lax.while_loop(
            cond, body, (planes0, fw0, fw0, jnp.int32(0), jnp.bool_(True)))
        return planes, vw, depth

    def _host_unpack_words(words_np, n):
        """(rows,128) int32 words -> (n,) uint8 bits, on the host.
        np.unpackbits over the little-endian byte view yields exactly
        vertex order (bit b of word w = vertex w*32+b)."""
        return np.unpackbits(words_np.reshape(-1).view(np.uint8),
                             bitorder="little")[:n]

    def bfs_full(src):
        import time as _time
        t0 = _time.perf_counter()
        planes, vw, depth = bfs_full_impl(src, sweeper.hub_args,
                                          sweeper.pk_args, push_args)
        # scalar fetch forces the whole while_loop to complete (axon
        # block_until_ready returns early; see primitives/base.py::sync)
        depth = int(depth)
        device_ms = (_time.perf_counter() - t0) * 1e3
        # final label assembly on host (device-side bit unpack pays a
        # costly 32-minor-dim relayout; numpy does it in milliseconds);
        # only planes up to bit_length(depth) can be nonzero
        # -- extraction, outside the Enact timing window (the reference
        # times Enact() only; Extract runs after the GpuTimer stops,
        # tests/bfs/test_bfs.cu:402-431)
        planes_np = np.asarray(planes)
        visited = _host_unpack_words(np.asarray(vw), n).astype(bool)
        labels = np.zeros(n, dtype=np.int32)
        for b in range(min(max(depth, 1).bit_length(), PLANES)):
            labels |= _host_unpack_words(planes_np[b], n).astype(
                np.int32) << b
        labels[~visited] = INF32_NP
        if 0 <= int(src) < n:
            labels[int(src)] = 0
        return labels, depth, device_ms

    _fused_cache[csr] = bfs_full
    return bfs_full


INF32_NP = np.iinfo(np.int32).max


_mega_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def get_mega_bfs(csr: CsrGraph):
    """Whole-search mega-kernel BFS (ops/pallas_mega.py): ONE pallas
    call runs the entire level loop in-kernel with manual HBM->VMEM
    edge streaming and source-region frontier skipping. Same contract
    as get_fused_bfs: fn(src) -> (labels, depth, device_ms)."""
    hit = _mega_cache.get(csr)
    if hit is not None:
        return hit
    from gunrockinst_tpu.ops.pallas_mega import (MegaBfs, build_mega_plan,
                                                 mega_fits)
    n = csr.num_nodes
    if jax.default_backend() != "cpu" and not mega_fits(n):
        # graph too big for the mega kernel's VMEM-resident state —
        # fall back to the fused v2 path (same contract) rather than
        # fail the Mosaic compile
        import warnings
        warnings.warn(f"mega BFS over VMEM budget at n={n}; "
                      "falling back to fused v2 sweep")
        fn = get_fused_bfs(csr)
        _mega_cache[csr] = fn
        return fn
    csc = csr.transposed()
    plan = build_mega_plan(csc.row_offsets, csc.col_indices, n)
    mb = MegaBfs(plan, interpret=jax.default_backend() == "cpu")
    rows = plan.n_words // 128

    def _unpack(words_np):
        return np.unpackbits(words_np.reshape(-1).view(np.uint8),
                             bitorder="little")[:n]

    def bfs_full(src):
        import time as _time
        t0 = _time.perf_counter()
        planes, vw, depth = mb(int(src))
        depth = int(np.asarray(depth)[0, 0])   # scalar fetch = sync
        device_ms = (_time.perf_counter() - t0) * 1e3
        # extraction (outside the Enact timing window, like the
        # reference's problem->Extract)
        planes_np = np.asarray(planes)
        visited = _unpack(np.asarray(vw)).astype(bool)
        labels = np.zeros(n, dtype=np.int32)
        for b in range(min(max(depth, 1).bit_length(), plan.planes)):
            labels |= _unpack(planes_np[b * rows:(b + 1) * rows]).astype(
                np.int32) << b
        labels[~visited] = INF32_NP
        if 0 <= int(src) < n:
            labels[int(src)] = 0
        return labels, depth, device_ms

    _mega_cache[csr] = bfs_full
    return bfs_full


def bfs_pallas_fused(csr: CsrGraph, src: int, mark_preds: bool = True,
                     variant: str = "mega"
                     ) -> Tuple[np.ndarray, Optional[np.ndarray], int, float]:
    """Returns (labels, preds|None, depth, device_ms) — device_ms is
    the Enact-equivalent traversal time (extraction excluded)."""
    n = csr.num_nodes
    n_pad = ((n + 128) // 128) * 128
    fn = get_mega_bfs(csr) if variant == "mega" else get_fused_bfs(csr)
    labels_np, depth, device_ms = fn(src)
    preds_np = None
    if mark_preds:
        esrc = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32),
                                     np.diff(csr.row_offsets)))
        edst = jnp.asarray(csr.col_indices.astype(np.int32))
        labels_pad = jnp.asarray(np.pad(labels_np, (0, n_pad - n),
                                        constant_values=INF32_NP))
        preds_np = np.array(_post_preds(labels_pad, esrc, edst, n_pad))[:n]
        if 0 <= src < n:
            preds_np[src] = -1
    return labels_np, preds_np, int(depth), device_ms


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
