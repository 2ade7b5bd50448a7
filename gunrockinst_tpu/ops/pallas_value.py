"""Value mega kernel — per-destination MIN / ADD over all edges.

The round-2 verdict's three missing fast paths (PageRank at s20, a
weighted SSSP sweep, a CC sweep) are all the same operation the BFS
pull sweep performs with values instead of bits:

    out[dst]  <-  comb over in-edges of  value[src] (+ w)   comb = min|add

The blocker was always the VALUE GATHER: `value[src]` for 1024 random
sources needs dynamic addressing Mosaic only offers as a lane gather on
(8,128) operands, so the addressable window per select-tree row is
tiny.  The resolution is the WORD-ROW-MAJOR accumulator layout
(round 4 — replacing round 3's bit-major layout):

    acc[(v // 4096) * 32 + (v % 32),  (v // 32) % 128] = value[v]

i.e. each 4096-vertex word-row owns 32 CONSECUTIVE acc rows, one per
position-in-word.  Gather: for a 4096-vertex source region, bit group
g contributes exactly one row (q*32+g), so a full exact 32-bit value
gather is a 32-step select tree over single rows — width-independent:
f32 and int cost the same.  Scatter: the 32 rows of one destination
word-row are CONTIGUOUS, so the whole per-subtile output lands in ONE
dynamic (32,128) block read-modify-write instead of round 3's 32
chained single-row RMWs (measured 62 ms/sweep at rmat-s20, dominated
by exactly those RMWs + the doubled 64-step gather of the 8192-vertex
regions; see scripts/profile_value_r4.py).

Tile geometry is pallas_advance_v2's hub/packed packer on cells
(source region, destination word): region 4096 costs packing density
(~0.44 slot utilization on rmat-s20) but the sweep is compute-bound,
so cheap gathers win.  Subtiles whose gathered candidates are ALL the
comb identity skip the entire reduce/route/RMW half (`pl.when`) — on
late sparse rounds (SSSP/CC tails, converged PR regions) most
subtiles skip, which is exact: combining the identity is a no-op.
Streaming is pallas_mega.py's: grid=(1,), 4-deep manual
`make_async_copy` chunks, subtile ranges per DMA SUPER-region
(DMA_REGS fine regions each, so the copy pipeline stays deep) — with
one change: chunk lists are PADDED to CHUNK multiples instead of
letting chunks overshoot into the next super-region (overshoot
re-processes subtiles, which is only correct for idempotent combines;
ADD is not).

Modes (one kernel, static config):
  * min + weights, f32 — SSSP Bellman relax round: gathers reassemble
    the exact f32 pattern and the add/min run in f32, so the fixpoint
    equals the Dijkstra oracle bitwise.
    (gunrock/app/sssp/sssp_functor.cuh:64 — atomicMin(dist[src]+w).)
  * min, i32 — CC min-label propagation round.
    (gunrock/app/cc/cc_functor.cuh:19-367 hooking collapses to this.)
  * add, f32 — PageRank's rank/deg accumulate, exact f32 in a fixed
    (deterministic) summation order.
    (gunrock/app/pr/pr_functor.cuh:49-64.)

Rounds are Jacobi: candidates read a round-start snapshot (`vals`) while
the RMW updates `accv`, so results are order-independent and match the
numpy oracles exactly.  Delta work-saving rides a `changed` word bitmap
exactly like the BFS frontier: min modes gather candidates only from
sources whose value changed last round (exact — comb is monotone over
the carried acc), add mode skips regions whose staged contributions are
all zero (adding zero is exact); the next round's bitmap is produced
in-kernel by the RMW (old > new).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrockinst_tpu.ops.pallas_advance_v2 import (
    HUB_T, SHIFT_BITS, SRC_MASK, LANES_USED, BLOCKS)

REGION_V = 4096     # source vertices per region = ONE word-row.  Each
                    # bit group's value row is then unique per region,
                    # so the gather tree is exactly 32 steps (round 3's
                    # 8192 regions paid 64).
RPG = REGION_V // 4096   # word rows per region (1)
PAIR_W = 256        # destination words per pk supercell = a ROW PAIR.
                    # Measured at rmat-s20: one-row supercells leave
                    # ~half a tile of boundary waste each (91.8K pk
                    # subtiles, 0.29 slot utilization); pairing rows
                    # halves the supercell count and the pair's 64 acc
                    # rows stay CONTIGUOUS for the single block RMW.
DMA_REGS = 8        # regions per DMA super-region (32768 sources).
                    # The copy pipeline needs several CHUNKs in flight;
                    # per-4096-region chunk lists starved it (the mega
                    # kernel hit the same wall — 10x slowdown).
NUM_LSEL = 6        # independent lane-placement idx rows per tile per
                    # word (a word may own this many 8-slot lane chunks
                    # in one tile before deferring to the next)
import os as _os_env
# subtiles per DMA chunk (GT_VALUE_CHUNK knob: larger chunks thin the
# per-chunk wait/start branches at the cost of VMEM buffers; measured
# a wash at 64.  Read once at import so plans and steppers stay
# consistent; clamped to the 256-subtile dummy tail so chunk padding
# can never outrun it.)
try:
    CHUNK = min(256, max(8, int(_os_env.environ.get("GT_VALUE_CHUNK",
                                                    "32"))))
except ValueError:
    CHUNK = 32
SLOTS = 4
VMEM_LIMIT_BYTES = 14 * 1024 * 1024
SMEM_META_LIMIT = 3 * 256 * 1024   # per-subtile scalar metadata budget

I32_MAX = np.int32(2**31 - 1)
DUMMY_PACKED = np.int64(SRC_MASK)  # src field all-ones: no real vertex
EMPTY_BYTE4 = np.int64(0x7F7F7F7F)  # 4 bytes of lane 127 (reads IDENT)


def _cdiv(a, b):
    return -(-a // b)


# --------------------------------------------------------------------
# plan
# --------------------------------------------------------------------

@dataclasses.dataclass
class ValuePlan:
    n: int
    m: int
    n_words: int
    num_regions: int
    has_weights: bool
    # hub flavor: one destination WORD (32 vertices) per subtile
    hub_tiles: np.ndarray       # (Th*8, 128) int32 src|shift<<26
    hub_meta: np.ndarray        # (Th,) int32: q<<19 | row<<7 | lane
    hub_rs: np.ndarray          # (Rd+1,) int32 DMA-super-region ranges
    hub_w: Optional[np.ndarray]  # (Th*8, 128) int32 (f32 bits)
    # packed flavor: one destination row PAIR (8192 verts) per subtile
    pk_tiles: np.ndarray
    pk_meta: np.ndarray         # (Tp,) int32: q<<12 | pair
    pk_idx: np.ndarray          # (Tp*4, 128) BYTE-packed placement
                                # maps: 14 maps [g,l0..l5] x {row0,
                                # row1}; map j at row j//4, bits
                                # 8*(j%4)
    pk_rs: np.ndarray
    pk_w: Optional[np.ndarray]
    # degree-sorted internal relabeling (graph/relabel.py): layout
    # position of input vertex v is the standard position of perm[v];
    # inv is the inverse map.  None = identity.  Round-5 measured
    # effect at rmat-s20: subtiles 72.5K -> 50.3K (util 0.425 -> 0.613)
    # because consecutive new ids have similar degrees and cells
    # fatten; min-mode region skipping also concentrates late-round
    # changed sets into edge-poor regions.  Callers convert through
    # layout_vals / unlayout_vals / layout_words, which honor perm.
    perm: Optional[np.ndarray] = None
    inv: Optional[np.ndarray] = None
    # hub tiles class-placed: every hub slot sits at sublane
    # low3(src & 31), so the value gather is 4 direct (8,128) takes
    # instead of the 32-step select tree.  Unlike the BFS hub
    # class-placement (DOA, pallas_mega.py:120-126 — that class was
    # the frontier ROW, capacity 128/tile, badly skewed), this class
    # is position-in-word mod 8: per-tile capacity is 128 PER CLASS
    # and cell class mixes are near-uniform, so utilization is
    # essentially unchanged (measured at s20: hub subtiles 22368 ->
    # 23136, +3.4%).  NOTE: measured a WASH on chip vs the select tree
    # (the sweep is reduce-bound), and the hub flavor itself is off by
    # default since round 5 (all-pk packing measured 8% faster).
    hub_classed: bool = True

    @property
    def rows_w(self):
        return self.n_words // 128

    @property
    def num_subtiles(self):
        return self.hub_meta.shape[0] + self.pk_meta.shape[0]


def build_value_plan(adj_row_offsets: np.ndarray,
                     adj_col_indices: np.ndarray, n: int,
                     weights: Optional[np.ndarray] = None,
                     hub_min: Optional[int] = None) -> ValuePlan:
    """Hub/packed value tiles from the pull-direction adjacency (CSC:
    row = dst, col = src).  pallas_advance_v2.build_pull_plan_v2's cell
    geometry and packer with (a) 4096-vertex source regions, (b)
    per-edge weight tiles aligned slot-for-slot with the edge tiles,
    (c) row-PAIR pk supercells (PAIR_W words) for packing density +
    a contiguous (64,128) block RMW, (d) subtile ranges per DMA
    super-region padded to CHUNK multiples, (e) per-subtile metadata
    packed into one int32 each."""
    m = int(adj_col_indices.shape[0])
    dst = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(adj_row_offsets)).astype(np.int64)
    src = adj_col_indices.astype(np.int64)
    # regions padded to a DMA-super-region multiple (also keeps rows_w
    # even for the row-pair supercells)
    num_regions = _cdiv(max(1, _cdiv(n + 1, REGION_V)),
                        DMA_REGS) * DMA_REGS
    n_words = num_regions * (REGION_V // 32)
    has_w = weights is not None
    wbits = (np.ascontiguousarray(weights, np.float32).view(np.int32)
             if has_w else None)

    region = src // REGION_V
    word = dst // 32
    packed_val = (src | ((dst % 32) << SHIFT_BITS)).astype(np.int64)

    order = np.lexsort((word, region))
    region, word = region[order], word[order]
    packed_val = packed_val[order]
    wsorted = wbits[order] if has_w else None

    if m:
        cell_change = np.ones(m, dtype=bool)
        cell_change[1:] = ((region[1:] != region[:-1])
                           | (word[1:] != word[:-1]))
        cell_start = np.nonzero(cell_change)[0]
        cell_count = np.diff(np.append(cell_start, m))
        cell_region = region[cell_start]
        cell_word = word[cell_start]
    else:
        cell_start = cell_count = cell_region = cell_word = np.zeros(
            0, np.int64)

    def take_edges(start, cnt, cap):
        pv = np.full(cap, DUMMY_PACKED, np.int64)
        pv[:cnt] = packed_val[start: start + cnt]
        if has_w:
            wv = np.zeros(cap, np.int32)
            wv[:cnt] = wsorted[start: start + cnt]
        else:
            wv = None
        return pv, wv

    # ---------------- hub flavor (class-placed) ----------------
    # every slot sits at sublane low3(src & 31): the kernel's value
    # gather becomes 4 direct takes (ValuePlan.hub_classed).  Tiles
    # take up to 128 edges PER CLASS from the cell's class buckets, so
    # a tile is short only when the cell's remaining class mix is
    # skewed — near-uniform in practice (class = src mod 8 within the
    # word, uncorrelated with degree even after relabeling).
    import os as _os
    # Default 0 since round 5: dense cells run as full 64-slot pk
    # group chunks instead of hub tiles — measured 8% faster at
    # rmat-s20 (PR sweep 226.3 -> 207.5 ms/5-iter run, A/B within
    # minutes to dodge axon session variance; the flavor probe had
    # already shown pk at 715 vs hub 850 cycles/subtile).  Same
    # compiled kernel either way (the hub stream is just empty);
    # GT_VALUE_HUB_T=<count> (or the hub_min argument) restores the
    # hub flavor.
    if hub_min is None:
        try:
            hub_min = int(_os.environ.get("GT_VALUE_HUB_T", "0"))
        except ValueError:
            hub_min = 0
    hub_cell = (cell_count >= hub_min if hub_min > 0
                else np.zeros_like(cell_count, dtype=bool))
    hub_tiles_list, hub_w_list, hub_meta = [], [], []
    for c in np.nonzero(hub_cell)[0]:
        s, cnt = int(cell_start[c]), int(cell_count[c])
        w = int(cell_word[c])
        q = int(cell_region[c])
        pv_all = packed_val[s: s + cnt]
        cls = (pv_all & 7).astype(np.int64)
        order = np.argsort(cls, kind="stable")
        pv_all = pv_all[order]
        wv_all = wsorted[s: s + cnt][order] if has_w else None
        bounds = np.searchsorted(cls[order], np.arange(9))
        ptr = bounds[:8].copy()
        remaining = cnt
        while remaining > 0:
            tile = np.full((8, 128), DUMMY_PACKED, np.int64)
            wtile = np.zeros((8, 128), np.int32) if has_w else None
            for cc in range(8):
                take = min(128, int(bounds[cc + 1] - ptr[cc]))
                if take > 0:
                    tile[cc, :take] = pv_all[ptr[cc]: ptr[cc] + take]
                    if has_w:
                        wtile[cc, :take] = wv_all[ptr[cc]:
                                                  ptr[cc] + take]
                    ptr[cc] += take
                    remaining -= take
            hub_tiles_list.append(tile)
            hub_w_list.append(wtile)
            hub_meta.append((q, w // 128, w % 128))

    # ---------------- packed flavor ----------------
    # group chunks only when they come out FULL (64 slots): a 64-slot
    # group holding a 10-edge cell is 16% utilization, and with small
    # source regions most cells are small — everything else goes to
    # 8-slot lane chunks.  A word may own up to NUM_LSEL lane chunks in
    # ONE tile (idx rows 1..NUM_LSEL are independent placement maps),
    # so medium cells no longer cascade across tiles.
    chunks = []
    for c in np.nonzero(~hub_cell & (cell_count > 0))[0]:
        s, cnt = int(cell_start[c]), int(cell_count[c])
        w = int(cell_word[c])
        super_key = (int(cell_region[c]), w // PAIR_W)
        wl = w % PAIR_W
        cls, off = 0, 0
        while cnt - off >= 64:
            chunks.append((super_key, cls, True, wl, s + off, 64))
            off += 64
            cls += 1
        while cnt - off > 0:
            take = min(8, cnt - off)
            chunks.append((super_key, cls, False, wl, s + off, take))
            off += take
            cls += 1

    from collections import defaultdict, deque
    by_super = defaultdict(lambda: ([], []))
    for ch in chunks:
        (by_super[ch[0]][0] if ch[2] else by_super[ch[0]][1]).append(ch)


    def pack_idx(maps):
        """14 byte-valued (128,) maps ([g, l0..l5] for each row of the
        pair) -> (4,128) int32 rows; map j lands at row j//4, bits
        8*(j%4).  The idx stream is pure upload/DMA overhead — byte
        packing cuts it 4x (tunnel host->HBM runs at ~0.2-4 MB/s)."""
        rows = np.full((4, 128), EMPTY_BYTE4, np.int64)
        for j, mp in enumerate(maps):
            rows[j // 4] &= ~(np.int64(0xFF) << (8 * (j % 4)))
            rows[j // 4] |= mp.astype(np.int64) << (8 * (j % 4))
        return rows.astype(np.int32)

    pk_tiles_list, pk_w_list, pk_meta = [], [], []
    pk_idx_rows_list = []   # per tile: (4, 128) byte-packed idx rows
    for super_key, (gchunks, lchunks) in sorted(by_super.items()):
        q, pair = super_key
        gq, lq = deque(gchunks), deque(lchunks)
        while gq or lq:
            tile = np.full((8, 128), DUMMY_PACKED, np.int64)
            wtile = np.zeros((8, 128), np.int32) if has_w else None
            # per-word maps over the PAIR_W words of the row pair
            idx_g = np.full(PAIR_W, 120, np.int32)
            idx_ls = [np.full(PAIR_W, 127, np.int32)
                      for _ in range(NUM_LSEL)]
            used_g = set()
            used_l = [set() for _ in range(NUM_LSEL)]
            defer = []
            block = 0
            while block < BLOCKS and gq:
                ch = gq.popleft()
                wl = ch[3]
                if wl in used_g:
                    defer.append(ch)
                    continue
                _, _, _, _, es, cnt = ch
                pv, wv = take_edges(es, cnt, 64)
                lanes = slice(8 * block, 8 * block + 8)
                tile[:, lanes] = pv.reshape(8, 8)
                if has_w:
                    wtile[:, lanes] = wv.reshape(8, 8)
                idx_g[wl] = 8 * block
                used_g.add(wl)
                block += 1
            defer.reverse()
            gq.extendleft(defer)
            defer = []
            lane_cursor = 8 * block
            while lane_cursor < LANES_USED and lq:
                ch = lq.popleft()
                wl = ch[3]
                row = next((r for r in range(NUM_LSEL)
                            if wl not in used_l[r]), None)
                if row is None:
                    defer.append(ch)
                    continue
                _, _, _, _, es, cnt = ch
                pv, wv = take_edges(es, cnt, 8)
                tile[:, lane_cursor] = pv
                if has_w:
                    wtile[:, lane_cursor] = wv
                idx_ls[row][wl] = lane_cursor
                used_l[row].add(wl)
                lane_cursor += 1
            defer.reverse()
            lq.extendleft(defer)
            pk_tiles_list.append(tile)
            pk_w_list.append(wtile)
            pk_meta.append((q, pair))
            maps0 = [idx_g[:128]] + [ls[:128] for ls in idx_ls]
            maps1 = [idx_g[128:]] + [ls[128:] for ls in idx_ls]
            pk_idx_rows_list.append(pack_idx(maps0 + maps1))

    # ---- DMA-super-region CHUNK padding + super-region ranges ----
    R = num_regions // DMA_REGS    # DMA super-regions
    dummy_tile = np.full((8, 128), DUMMY_PACKED, np.int64)
    dummy_w = np.zeros((8, 128), np.int32)

    dummy_idx = pack_idx([np.full(128, 120, np.int32)]
                         + [np.full(128, 127, np.int32)] * 6
                         + [np.full(128, 120, np.int32)]
                         + [np.full(128, 127, np.int32)] * 6)

    def finalize(tiles_list, w_list, meta_list, idx_list, is_hub):
        regions_of = np.asarray([mt[0] // DMA_REGS
                                 for mt in meta_list], np.int64)
        bounds = np.searchsorted(regions_of, np.arange(R + 1))
        out_tiles, out_w, out_meta, out_idx = [], [], [], []
        rs = [0]
        for r in range(R):
            lo, hi = int(bounds[r]), int(bounds[r + 1])
            cnt = hi - lo
            padded = _cdiv(cnt, CHUNK) * CHUNK if cnt else 0
            out_tiles += tiles_list[lo:hi] + [dummy_tile] * (padded - cnt)
            if has_w:
                out_w += w_list[lo:hi] + [dummy_w] * (padded - cnt)
            if is_hub:
                out_meta += [(q << 19) | (row << 7) | lane
                             for q, row, lane in meta_list[lo:hi]]
            else:
                out_meta += [(q << 12) | row
                             for q, row in meta_list[lo:hi]]
            out_meta += [0] * (padded - cnt)
            if idx_list is not None:
                out_idx += idx_list[lo:hi] + [dummy_idx] * (padded - cnt)
            rs.append(rs[-1] + padded)
        # trailing dummy CHUNK: traced DMA slice shapes must fit the
        # operand even for flavors/regions that never run
        out_tiles += [dummy_tile] * CHUNK
        out_meta += [0] * CHUNK
        if has_w:
            out_w += [dummy_w] * CHUNK
        if idx_list is not None:
            out_idx += [dummy_idx] * CHUNK
        tiles = np.concatenate(out_tiles, axis=0).astype(np.int32)
        meta = np.asarray(out_meta, np.int32)
        rs_a = np.asarray(rs, np.int32)
        wt = (np.concatenate(out_w, axis=0) if has_w else None)
        idx = (None if idx_list is None else
               np.concatenate(out_idx, axis=0).astype(np.int32))
        return tiles, meta, rs_a, wt, idx

    hub_tiles, hub_meta_a, hub_rs, hub_w, _ = finalize(
        hub_tiles_list, hub_w_list, hub_meta, None, True)
    pk_tiles, pk_meta_a, pk_rs, pk_w, pk_idx = finalize(
        pk_tiles_list, pk_w_list, pk_meta, pk_idx_rows_list, False)

    return ValuePlan(
        n=n, m=m, n_words=n_words, num_regions=num_regions,
        has_weights=has_w,
        hub_tiles=hub_tiles, hub_meta=hub_meta_a, hub_rs=hub_rs,
        hub_w=hub_w,
        pk_tiles=pk_tiles, pk_meta=pk_meta_a, pk_idx=pk_idx, pk_rs=pk_rs,
        pk_w=pk_w,
    )


import weakref

_unweighted_plan_cache: "weakref.WeakKeyDictionary" = \
    weakref.WeakKeyDictionary()


def _with_perm(plan: "ValuePlan", perm) -> "ValuePlan":
    if perm is not None:
        plan.perm = np.asarray(perm)
        inv = np.empty_like(plan.perm)
        inv[plan.perm] = np.arange(plan.perm.shape[0],
                                   dtype=plan.perm.dtype)
        plan.inv = inv
    return plan


def layout_vals(plan: "ValuePlan", vals: np.ndarray) -> np.ndarray:
    """(n,) vertex-major in INPUT ids -> word-row-major layout array,
    honoring the plan's internal relabeling."""
    v = np.asarray(vals)
    if plan.perm is not None:
        v = v[plan.inv]
    return to_bitmajor_np(v, plan.rows_w)


def unlayout_vals(plan: "ValuePlan", acc: np.ndarray, n: int,
                  dtype=np.int32) -> np.ndarray:
    """Layout array -> (n,) vertex-major in INPUT ids."""
    out = from_bitmajor_np(acc, n, dtype)
    return out if plan.perm is None else out[plan.perm]


def layout_words(plan: "ValuePlan", mask: np.ndarray) -> np.ndarray:
    """(n,) bool in INPUT ids -> (n_words/128, 128) frontier words in
    layout space."""
    m = np.asarray(mask)
    if plan.perm is not None:
        m = m[plan.inv]
    return words_from_mask(m, plan.n_words)


def get_unweighted_plan(csr) -> "ValuePlan":
    """Shared unweighted pull plan per CsrGraph.  SSSP-with-uniform-
    weights, PageRank, CC (when the graph is already symmetric), and
    the HITS/SALSA forward sweeps run over identical tiles, so they
    share ONE host-side build and — via the device-array cache
    ValueStepper keeps on the plan — ONE host->HBM upload (~300 MB at
    rmat-s20 over a ~1-4 MB/s tunnel) instead of several.  Built over
    the degree-sorted relabeling when worthwhile (ValuePlan.perm)."""
    from gunrockinst_tpu.graph.relabel import relabeled
    hit = _unweighted_plan_cache.get(csr)
    if hit is not None:
        return hit
    csr_p, perm = relabeled(csr)
    csc = csr_p.transposed()
    plan = _with_perm(_build_fitting_plan(
        csc.row_offsets, csc.col_indices, csr.num_nodes), perm)
    _unweighted_plan_cache[csr] = plan
    return plan


def _build_fitting_plan(ro, ci, n, weights=None):
    """build_value_plan under the current flavor default, retried
    WITH the hub flavor when the all-pk plan busts the SMEM subtile
    budget (a pk tile holds one group chunk per destination word, so
    a graph with extreme hub words can need far more pk tiles than
    hub tiles; the hub flavor is the safety net)."""
    plan = build_value_plan(ro, ci, n, weights=weights)
    if not value_fits(plan) and not plan.hub_rs[-1]:
        retry = build_value_plan(ro, ci, n, weights=weights,
                                 hub_min=HUB_T)
        if value_fits(retry):
            return retry
    return plan


_reverse_plan_cache: "weakref.WeakKeyDictionary" = \
    weakref.WeakKeyDictionary()


def get_reverse_plan(csr) -> "ValuePlan":
    """Pull plan over the REVERSE graph (accumulate into SOURCES over
    their out-edges) — the hub-side sweep of HITS/SALSA/WTF
    (gunrock/app/hits keeps both CSR and CSC for the same reason,
    hits_problem.cuh:53-58).  For symmetric graphs this IS the forward
    plan, so the build + upload + kernel compile are all shared."""
    from gunrockinst_tpu.graph.relabel import is_symmetric, relabeled
    hit = _reverse_plan_cache.get(csr)
    if hit is not None:
        return hit
    if is_symmetric(csr):
        plan = get_unweighted_plan(csr)
    else:
        csr_p, perm = relabeled(csr)
        plan = _with_perm(
            _build_fitting_plan(csr_p.row_offsets, csr_p.col_indices,
                                csr.num_nodes), perm)
    _reverse_plan_cache[csr] = plan
    return plan


# --------------------------------------------------------------------
# word-row-major layout helpers (host)
# --------------------------------------------------------------------

def to_bitmajor_np(vals: np.ndarray, rows_w: int) -> np.ndarray:
    """(N,) int32/f32 vertex-major -> (32*rows_w, 128) int32
    word-row-major: out[r*32 + g, l] = vals[(r*128 + l)*32 + g].
    (The name predates the round-4 relayout; every caller goes through
    these helpers, so only the kernel and this pair know the order.)"""
    total = rows_w * 128 * 32
    v = np.zeros(total, np.int32)
    x = np.ascontiguousarray(vals)
    if x.dtype != np.int32:
        x = x.astype(np.float32).view(np.int32)
    v[: x.shape[0]] = x
    return np.ascontiguousarray(
        v.reshape(rows_w, 128, 32).transpose(0, 2, 1)
    ).reshape(32 * rows_w, 128)


def from_bitmajor_np(acc: np.ndarray, n: int,
                     dtype=np.int32) -> np.ndarray:
    """(32*rows_w, 128) int32 word-row-major -> (n,) vertex-major."""
    rows_w = acc.shape[0] // 32
    v = np.ascontiguousarray(
        acc.reshape(rows_w, 32, 128).transpose(0, 2, 1)).reshape(-1)
    v = v[:n]
    if dtype == np.float32:
        return v.view(np.float32).copy()
    return v.copy()


def words_from_mask(mask: np.ndarray, n_words: int) -> np.ndarray:
    """(n,) bool -> (n_words/128, 128) int32 frontier-word bitmap."""
    bits = np.zeros(n_words * 32, np.uint8)
    bits[: mask.shape[0]] = mask.astype(np.uint8)
    words = np.packbits(bits, bitorder="little").view(np.int32)
    return words.reshape(-1, 128)


def mask_from_words(words: np.ndarray, n: int) -> np.ndarray:
    return np.unpackbits(words.reshape(-1).view(np.uint8),
                         bitorder="little")[:n].astype(bool)


def bitmajor_fill_np(value, rows_w: int) -> np.ndarray:
    x = (np.float32(value).view(np.int32) if isinstance(value, float)
         else np.int32(value))
    return np.full((32 * rows_w, 128), x, np.int32)


# --------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------

def _make_value_kernel(R: int, rows_w: int, mode: str, f32: bool,
                       has_w: bool, use_active: bool, zero_acc: bool,
                       track_changed: bool, const_w=None,
                       hub_classed: bool = True):
    """One comb sweep per pallas call.  See module docstring."""
    assert mode in ("min", "add")
    is_min = mode == "min"
    if is_min:
        IDENT = np.float32(np.inf) if f32 else I32_MAX
    else:
        IDENT = np.float32(0.0) if f32 else np.int32(0)

    # min modes carry shrinking changed sets -> per-subtile skip pays;
    # add mode stays branchless (see the measured tradeoff in
    # hub_subtile).  The skip is EXACT only when use_active gates
    # candidates on the changed words (ract[q] == 0 then implies every
    # candidate is the identity); a min stepper without active gating
    # must stay branchless or it would drop relaxations.
    # BRANCHLESS by default since round 5: under the relabeled all-pk
    # plans the round-4 tradeoff flipped (same-session A/B at s20:
    # SSSP 151.8 -> 110.0 ms, CC 132.7 -> 124.1 ms without the skip —
    # the dead-subtile mix the skip exploited is already gone because
    # changed sets now concentrate into skippable REGIONS).
    # GT_VALUE_MINSKIP=1 restores the per-subtile skip.
    import os as _osk
    subtile_skip = (is_min and use_active
                    and _osk.environ.get("GT_VALUE_MINSKIP",
                                         "0") == "1")

    def comb(a, b):
        return jnp.minimum(a, b) if is_min else a + b

    def as_val(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32) \
            if f32 else x

    def as_bits(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32) if f32 else x

    def kernel(hmeta, hrs, pmeta, prs, ract,               # scalars
               hub_hbm, pk_hbm, pkidx_hbm, *rest):
        if has_w:
            hw_hbm, pw_hbm, acc_hbm, ch_ref = rest[:4]
            rest = rest[4:]
        else:
            acc_hbm, ch_ref = rest[:2]
            rest = rest[2:]
        acc_out, chout_ref = rest[:2]
        scratch = rest[2:]
        if has_w:
            (vals, accv, hbuf, pbuf, pibuf, hwbuf, pwbuf,
             sems, csem) = scratch
        else:
            vals, accv, hbuf, pbuf, pibuf, sems, csem = scratch
            hwbuf = pwbuf = None

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        g_iota32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)

        # ---- prologue: round-start snapshot + RMW target ----
        cp = pltpu.make_async_copy(acc_hbm, vals, csem.at[0])
        cp.start()
        cp.wait()
        if zero_acc:
            accv[:] = jnp.zeros_like(accv)
        else:
            cp2 = pltpu.make_async_copy(acc_hbm, accv, csem.at[1])
            cp2.start()
            cp2.wait()
        chout_ref[:] = jnp.zeros_like(chout_ref)

        def _finish_candidate(src, vbits, wtile, q, lane, gsrc):
            v = as_val(vbits)
            if has_w:
                v = v + as_val(wtile)
            elif const_w is not None:
                v = v + (jnp.float32(const_w) if f32
                         else jnp.int32(const_w))
            if use_active:
                crow = jnp.broadcast_to(
                    ch_ref[pl.ds(q, 1), :], (8, 128))
                cw = jnp.take_along_axis(crow, lane, axis=1)
                a = (cw >> gsrc) & 1
                v = jnp.where(a == 1, v, IDENT)
            # padding slots carry src == SRC_MASK (no real vertex)
            return jnp.where(src == SRC_MASK, IDENT, v)

        def candidate(packed, wtile, q):
            src = packed & SRC_MASK
            shift = packed >> SHIFT_BITS
            lane = (src >> 5) & 127
            gsrc = src & 31
            # word-row-major gather: bit group g of region q lives in
            # the single row q*32+g — a 32-step select tree
            vbits = jnp.zeros((8, 128), jnp.int32)
            for gs in range(32):
                rw = jnp.broadcast_to(
                    vals[pl.ds(q * 32 + gs, 1), :], (8, 128))
                vbits = jnp.where(
                    gsrc == gs,
                    jnp.take_along_axis(rw, lane, axis=1), vbits)
            return _finish_candidate(src, vbits, wtile, q, lane,
                                     gsrc), shift

        def candidate_classed(packed, wtile, q):
            """Class-placed tiles (slot sublane == low3(src & 31)):
            rows q*32+8k..+8 of the value plane ARE the (8,128)
            operand for the k-th take — 4 direct takes replace the
            32-step tree."""
            src = packed & SRC_MASK
            shift = packed >> SHIFT_BITS
            lane = (src >> 5) & 127
            hi2 = (src >> 3) & 3
            vbits = jnp.zeros((8, 128), jnp.int32)
            for k in range(4):
                op = vals[pl.ds(q * 32 + 8 * k, 8), :]
                vbits = jnp.where(
                    hi2 == k,
                    jnp.take_along_axis(op, lane, axis=1), vbits)
            gsrc = (hi2 << 3) | jax.lax.broadcasted_iota(
                jnp.int32, (8, 128), 0)
            return _finish_candidate(src, vbits, wtile, q, lane,
                                     gsrc), shift

        def _fold_changed(bits32):
            r16 = bits32[0:16, :] | bits32[16:32, :]
            r8 = r16[0:8, :] | r16[8:16, :]
            r4 = r8[0:4, :] | r8[4:8, :]
            r2 = r4[0:2, :] | r4[2:4, :]
            return r2[0:1, :] | r2[1:2, :]

        def block_rmw(row, placed32):
            """Combine the subtile's (32,128) result into the
            CONTIGUOUS 32-row acc block of destination word-row `row`
            — one dynamic block read + comb + write (round 3 paid 32
            chained single-row RMWs here, the sweep's dominant cost).
            Also derives the changed-word row in one 5-step OR fold."""
            arow = pl.ds(row * 32, 32)
            old = as_val(accv[arow, :])
            new = comb(old, placed32)
            accv[arow, :] = as_bits(new)
            if track_changed:
                bits = (old > new).astype(jnp.int32) << g_iota32
                crow = pl.ds(row, 1)
                chout_ref[crow, :] = (chout_ref[crow, :]
                                      | _fold_changed(bits))

        def block_rmw_pair(pair, placed64):
            """Row-PAIR RMW: the 64 acc rows of two adjacent word-rows
            are contiguous, so a pk supercell covering 256 destination
            words still costs one block read + comb + write."""
            arow = pl.ds(pair * 64, 64)
            old = as_val(accv[arow, :])
            new = comb(old, placed64)
            accv[arow, :] = as_bits(new)
            if track_changed:
                chg = (old > new).astype(jnp.int32)
                ch2 = jnp.concatenate(
                    [_fold_changed(chg[0:32, :] << g_iota32),
                     _fold_changed(chg[32:64, :] << g_iota32)], axis=0)
                crow = pl.ds(pair * 2, 2)
                chout_ref[crow, :] = chout_ref[crow, :] | ch2

        def fold8(x):
            y = comb(x[0:4, :], x[4:8, :])
            y = comb(y[0:2, :], y[2:4, :])
            return comb(y[0:1, :], y[1:2, :])

        # ---- hub subtile: one destination word ----
        def hub_subtile(t, k, buf, wbuf):
            meta = hmeta[t]
            q = meta >> 19
            row = (meta >> 7) & 0xFFF
            lane_o = meta & 127
            # Per-subtile work-skip policy, MEASURED both ways at
            # rmat-s20: a scalar-SMEM-flag pl.when costs ~40 us/sweep
            # in lost pipelining but skips whole subtiles on sparse
            # rounds.  MIN modes (SSSP/CC: shrinking changed sets)
            # net-win with the skip (222 vs 243 ms, 247 vs 264 ms);
            # ADD mode (PR: everything active until convergence)
            # net-wins branchless (45.5 vs 48.7 ms/iter).
            def hub_body():
                packed = buf[pl.ds(8 * k, 8), :]
                wtile = wbuf[pl.ds(8 * k, 8), :] if has_w else None
                cand, shift = (candidate_classed if hub_classed
                               else candidate)(packed, wtile, q)
                groups = []
                for gb in range(4):
                    red = jnp.concatenate(
                        [fold8(jnp.where(shift == gb * 8 + j, cand,
                                         IDENT))
                         for j in range(8)], axis=0)      # (8,128)
                    for sh in (64, 32, 16, 8, 4, 2, 1):
                        red = comb(red, as_val(
                            pltpu.roll(as_bits(red), sh, axis=1)))
                    groups.append(red)
                red32 = jnp.concatenate(groups, axis=0)   # (32,128)
                placed = jnp.where(lane_iota == lane_o, red32, IDENT)
                block_rmw(row, placed)

            if subtile_skip:
                pl.when(ract[q] != 0)(hub_body)
            else:
                hub_body()

        # ---- packed subtile: one destination row PAIR ----
        def pk_subtile(t, k, buf, ibuf, wbuf):
            meta = pmeta[t]
            q = meta >> 12
            pair = meta & 0xFFF

            def pk_body():
                packed = buf[pl.ds(8 * k, 8), :]
                wtile = wbuf[pl.ds(8 * k, 8), :] if has_w else None
                cand, shift = candidate(packed, wtile, q)
                raw = ibuf[pl.ds(4 * k, 4), :]      # byte-packed maps

                def idx_map(j):
                    return jnp.broadcast_to(
                        (raw[j // 4:j // 4 + 1, :]
                         >> (8 * (j % 4))) & 0xFF, (8, 128))

                idxg = [idx_map(0), idx_map(7)]
                idxls = [[idx_map(1 + i) for i in range(NUM_LSEL)],
                         [idx_map(8 + i) for i in range(NUM_LSEL)]]
                halves = [[], []]
                for gb in range(4):
                    red = jnp.concatenate(
                        [fold8(jnp.where(shift == gb * 8 + j, cand,
                                         IDENT))
                         for j in range(8)], axis=0)      # (8,128)
                    redg = red
                    for sh in (1, 2, 4):
                        redg = comb(redg, as_val(
                            pltpu.roll(as_bits(redg), 128 - sh,
                                       axis=1)))
                    rg_bits = as_bits(redg)
                    rbits = as_bits(red)
                    # the fold/roll work is shared; only the placement
                    # gathers run once per row of the pair
                    for h in range(2):
                        placed = as_val(jnp.take_along_axis(
                            rg_bits, idxg[h], axis=1))
                        for idxl in idxls[h]:
                            placed = comb(placed, as_val(
                                jnp.take_along_axis(rbits, idxl,
                                                    axis=1)))
                        halves[h].append(placed)
                placed64 = jnp.concatenate(halves[0] + halves[1],
                                           axis=0)        # (64,128)
                block_rmw_pair(pair, placed64)

            if subtile_skip:
                pl.when(ract[q] != 0)(pk_body)
            else:
                pk_body()

        # ---- streaming loops (pallas_mega.py structure) ----
        def dma(arr, buf, bank, start, c, slot, rows_per=8):
            return pltpu.make_async_copy(
                arr.at[pl.ds((start + c * CHUNK) * rows_per,
                             CHUNK * rows_per), :],
                buf.at[slot], sems.at[bank, slot])

        def hub_region(start, nchunks):
            for i in range(SLOTS):
                @pl.when(i < nchunks)
                def _():
                    dma(hub_hbm, hbuf, 0, start, i, i).start()
                    if has_w:
                        dma(hw_hbm, hwbuf, 3, start, i, i).start()

            def body(j, _):
                c = j // CHUNK
                k = j - c * CHUNK
                slot = c % SLOTS

                @pl.when(k == 0)
                def _():
                    dma(hub_hbm, hbuf, 0, start, c, slot).wait()
                    if has_w:
                        dma(hw_hbm, hwbuf, 3, start, c, slot).wait()

                hub_subtile(start + c * CHUNK + k, k, hbuf.at[slot],
                            hwbuf.at[slot] if has_w else None)

                @pl.when(k == CHUNK - 1)
                def _():
                    @pl.when(c + SLOTS < nchunks)
                    def _():
                        dma(hub_hbm, hbuf, 0, start, c + SLOTS,
                            slot).start()
                        if has_w:
                            dma(hw_hbm, hwbuf, 3, start, c + SLOTS,
                                slot).start()
                return 0
            jax.lax.fori_loop(0, nchunks * CHUNK, body, 0)

        def pk_region(start, nchunks):
            for i in range(SLOTS):
                @pl.when(i < nchunks)
                def _():
                    dma(pk_hbm, pbuf, 1, start, i, i).start()
                    dma(pkidx_hbm, pibuf, 2, start, i, i, rows_per=4).start()
                    if has_w:
                        dma(pw_hbm, pwbuf, 4, start, i, i).start()

            def body(j, _):
                c = j // CHUNK
                k = j - c * CHUNK
                slot = c % SLOTS

                @pl.when(k == 0)
                def _():
                    dma(pk_hbm, pbuf, 1, start, c, slot).wait()
                    dma(pkidx_hbm, pibuf, 2, start, c, slot, rows_per=4).wait()
                    if has_w:
                        dma(pw_hbm, pwbuf, 4, start, c, slot).wait()

                pk_subtile(start + c * CHUNK + k, k, pbuf.at[slot],
                           pibuf.at[slot],
                           pwbuf.at[slot] if has_w else None)

                @pl.when(k == CHUNK - 1)
                def _():
                    @pl.when(c + SLOTS < nchunks)
                    def _():
                        dma(pk_hbm, pbuf, 1, start, c + SLOTS,
                            slot).start()
                        dma(pkidx_hbm, pibuf, 2, start, c + SLOTS,
                            slot, rows_per=4).start()
                        if has_w:
                            dma(pw_hbm, pwbuf, 4, start, c + SLOTS,
                                slot).start()
                return 0
            jax.lax.fori_loop(0, nchunks * CHUNK, body, 0)

        def region(r, _):
            # r indexes DMA super-regions (DMA_REGS word-rows each);
            # the skip test is a scalar OR of the XLA-computed per-row
            # activity flags (one branch per super-region is fine;
            # per-subtile branches cost ~0.3 us each)
            reg_any = ract[r * DMA_REGS]
            for rr in range(1, DMA_REGS):
                reg_any = reg_any | ract[r * DMA_REGS + rr]
            reg_any = reg_any != 0

            @pl.when(reg_any)
            def _():
                hs, he = hrs[r], hrs[r + 1]
                hub_region(hs, (he - hs) // CHUNK)
                ps, pe = prs[r], prs[r + 1]
                pk_region(ps, (pe - ps) // CHUNK)
            return 0

        jax.lax.fori_loop(0, R, region, 0)

        # ---- epilogue: acc back to HBM ----
        cp_out = pltpu.make_async_copy(accv, acc_out, csem.at[0])
        cp_out.start()
        cp_out.wait()

    return kernel


def value_vmem_bytes(n: int, has_w: bool) -> int:
    num_regions = _cdiv(max(1, _cdiv(n + 1, REGION_V)),
                        DMA_REGS) * DMA_REGS
    rows_w = num_regions * (REGION_V // 32) // 128
    state = 2 * 32 * rows_w * 128 * 4          # vals + accv
    bufs = SLOTS * CHUNK * 8 * 128 * 4 * (2 + (2 if has_w else 0)) \
        + SLOTS * CHUNK * 4 * 128 * 4
    ch = 2 * rows_w * 128 * 4
    return state + bufs + ch


def value_fits(plan: "ValuePlan") -> bool:
    if value_vmem_bytes(plan.n, plan.has_weights) > VMEM_LIMIT_BYTES:
        return False
    # hub_meta + pk_meta are disjoint: one packed int32 per subtile
    return plan.num_subtiles * 4 <= SMEM_META_LIMIT


def get_add_stepper(plan: "ValuePlan", interpret: bool = False,
                    gated: bool = False) -> "ValueStepper":
    """f32 ADD stepper cached ON the plan: PR, HITS, SALSA and WTF all
    use the identical config (add, f32, no active gating, zero acc, no
    changed tracking), so they share one compiled kernel, one jit
    cache, and the plan's device tile upload.  gated=True gathers only
    from sources whose `ch` word bit is set (BC's per-level sigma and
    delta sweeps: exact because the staged values are zero outside the
    level anyway, and the region skip then prunes quiet regions)."""
    cache = getattr(plan, "_add_steppers", None)
    if cache is None:
        cache = {}
        plan._add_steppers = cache
    st = cache.get((interpret, gated))
    if st is None:
        st = ValueStepper(plan, mode="add", f32=True,
                          use_active=gated, zero_acc=True,
                          track_changed=False, interpret=interpret)
        cache[(interpret, gated)] = st
    return st


class ValueStepper:
    """Compiled comb sweep: (acc bit-major, changed words) ->
    (acc', changed').  One full Jacobi sweep per call.

    mode: "min" | "add".  f32: values are f32 bit patterns (exact IEEE
    min/add in-kernel); otherwise int32.  use_active: gather candidates
    only from sources whose changed bit is set.  zero_acc: accumulate
    from comb-identity instead of the carried acc (add mode).
    """

    def __init__(self, plan: ValuePlan, mode: str, f32: bool,
                 use_active: bool = True, zero_acc: bool = False,
                 track_changed: bool = True, const_w=None,
                 interpret: bool = False):
        if not interpret and not value_fits(plan):
            raise ValueError(
                f"value kernel does not fit (n={plan.n}: VMEM "
                f"{value_vmem_bytes(plan.n, plan.has_weights)} B, "
                f"{plan.num_subtiles} subtiles of scalar metadata); "
                "use the XLA mode")
        self.plan = plan
        self.mode = mode
        self.f32 = f32
        rows_w = plan.rows_w
        self.rows_w = rows_w
        R = plan.num_regions // DMA_REGS    # DMA super-regions
        has_w = plan.has_weights

        # device arrays are cached ON the plan: several steppers
        # (sssp min / pr add / cc min) over one shared plan upload the
        # tiles across the tunnel exactly once
        dev = getattr(plan, "_dev_cache", None)
        if dev is None:
            scal = (
                jax.device_put(plan.hub_meta),
                jax.device_put(plan.hub_rs),
                jax.device_put(plan.pk_meta),
                jax.device_put(plan.pk_rs),
            )
            hbm = [jax.device_put(plan.hub_tiles),
                   jax.device_put(plan.pk_tiles),
                   jax.device_put(plan.pk_idx)]
            if has_w:
                hbm += [jax.device_put(plan.hub_w),
                        jax.device_put(plan.pk_w)]
            dev = (scal, tuple(hbm))
            plan._dev_cache = dev
        self.scal_args, self.hbm_args = dev

        kernel = _make_value_kernel(
            R, rows_w, mode, f32, has_w, use_active, zero_acc,
            track_changed, const_w=const_w,
            hub_classed=getattr(plan, "hub_classed", True))

        n_streams = 5 if has_w else 3
        scratch = [
            pltpu.VMEM((32 * rows_w, 128), jnp.int32),       # vals
            pltpu.VMEM((32 * rows_w, 128), jnp.int32),       # accv
            pltpu.VMEM((SLOTS, CHUNK * 8, 128), jnp.int32),  # hbuf
            pltpu.VMEM((SLOTS, CHUNK * 8, 128), jnp.int32),  # pbuf
            pltpu.VMEM((SLOTS, CHUNK * 4, 128), jnp.int32),  # pibuf
        ]
        if has_w:
            scratch += [
                pltpu.VMEM((SLOTS, CHUNK * 8, 128), jnp.int32),
                pltpu.VMEM((SLOTS, CHUNK * 8, 128), jnp.int32),
            ]
        scratch += [
            pltpu.SemaphoreType.DMA((n_streams, SLOTS)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * (3 + (
            2 if has_w else 0))
        in_specs += [pl.BlockSpec(memory_space=pltpu.ANY),   # acc
                     pl.BlockSpec(memory_space=pltpu.VMEM)]  # changed
        self.fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(1,),
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),    # acc out
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # changed out
                ],
                scratch_shapes=scratch,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((32 * rows_w, 128), jnp.int32),
                jax.ShapeDtypeStruct((rows_w, 128), jnp.int32),
            ],
            interpret=interpret,
        )

        def step_with(scal, hbm, acc, ch):
            # per-region activity flags for the kernel's scalar
            # work-skip (any changed word in the region's row?) —
            # computed here so every caller gets the skip for free
            ract = jnp.any(ch != 0, axis=1).astype(jnp.int32)
            return self.fn(*scal, ract, *hbm, acc, ch)

        self.step_with = step_with
        self._jit = jax.jit(step_with)

    def __call__(self, acc, ch):
        """acc (32*rows_w,128) i32, ch (rows_w,128) i32 ->
        (acc', changed')."""
        return self._jit(self.scal_args, self.hbm_args, acc, ch)
