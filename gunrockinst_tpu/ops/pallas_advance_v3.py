"""Pull-sweep kernel v3 — suffix-OR runs + per-lane singles.

v2's packed flavor (pallas_advance_v2.py) loses ~54% of its slots: any
cell with >=8 edges gets 64-slot group chunks *partially filled* (a
10-edge chunk burns a full block at 16% utilization) and a word's
multiple group chunks must land in different tiles.  v3 keeps v2's two
placement ideas (whole-block gather, single-lane gather) but replaces
the whole-block operand with a per-lane SUFFIX-OR within each 8-lane
block, which unifies three chunk granularities (measured slot
utilization 0.46 -> ~0.67 on rmat-s20, scripts/sim_packing.py):

  * full group chunk   — 64 edges, a whole block; gather sfx[8b]
    (the suffix-OR at the block start IS the block OR).
  * suffix run         — 9..56-edge remainders as ceil(r/8) lanes at
    the END of a block: gather sfx[8b+8-k].  The leading 8-k lanes of
    the same block stay addressable for other words' singles.
  * single-lane chunk  — <=8-edge cells in ONE lane; gather red8[l]
    (the per-lane 8-slot OR), any lane individually.

Per-word placement slots per tile: two suffix-operand slots (g0, g1 —
each a full block or a suffix run) and one single-lane slot (l).  The
per-tile metadata is ONE (1,128) int32 row:  g0 | g1<<8 | l<<16
(7-bit gather lanes; 127 = empty — lanes 120..127 are reserved dummy
so empty gathers read zero).

Hub cells (>=512 edges to one output word) contribute only FULL
1024-edge tiles to the hub flavor; remainders < 512 flow into the
packed chunks of the same word.

The per-edge encoding (src | (dst%32)<<26), the hub kernel, and the
8-row region frontier gather are shared with v2.  Reference parity:
this is the TPU re-expression of the reference's load-balanced advance
(oprtr/edge_map_partitioned/kernel.cuh:242-559) — the scanned-degree
binary search that maps edge lanes to sources becomes a build-time
placement; the atomic output-queue scatter becomes a precomputed
gather.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import defaultdict
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrockinst_tpu.ops.pallas_advance_v2 import (
    HUB_T, REGION, ROWS_PER_REGION, SHIFT_BITS, SRC_MASK, _gather_active,
    _hub_kernel)

TILE_E = 1024
LANES_USED = 120
BLOCKS = LANES_USED // 8     # 15
SUBTILES = 8                 # subtiles per grid step; the (S,128) idx
                             # block requires S % 8 == 0 (TPU sublane
                             # tiling), and 8 amortizes the pipeline
                             # step floor better than v2's 4 anyway
EMPTY = 127                  # gather lane that always reads zero


def _cdiv(a, b):
    return -(-a // b)


@dataclasses.dataclass
class PullPlanV3:
    n: int
    m: int
    n_words: int
    # hub flavor (same layout as v2)
    hub_tiles: np.ndarray        # (Th*8, 128) int32 src|shift<<26
    hub_row_base: np.ndarray     # (Th,)
    hub_out_row: np.ndarray
    hub_out_lane: np.ndarray
    # packed flavor
    pk_tiles: np.ndarray         # (Tp*8, 128) int32 src|shift<<26
    pk_row_base: np.ndarray      # (Tp,)
    pk_out_row: np.ndarray       # (Tp,)
    pk_idx: np.ndarray           # (Tp, 128) int32 g0|g1<<8|l<<16
    subtiles: int = SUBTILES

    @property
    def num_hub(self):
        return self.hub_row_base.shape[0]

    @property
    def num_packed(self):
        return self.pk_row_base.shape[0]


def build_pull_plan_v3(adj_row_offsets: np.ndarray,
                       adj_col_indices: np.ndarray, n: int,
                       subtiles: int = SUBTILES,
                       gather_region: int = REGION,
                       hub_class_placed: bool = False) -> PullPlanV3:
    """Build v3 hub/packed tile sets from the pull-direction adjacency
    (pass the CSC: rows = destination, cols = source).

    gather_region = source vertices addressable by one subtile's
    row_base.  32768 (default) = 8 frontier rows, read in-kernel by an
    8-step select tree; 4096 = ONE row, read by a single lane-gather
    (~3x less VPU work per subtile at a small cell-fragmentation cost —
    rmat-s20 slots actually drop 47.1M -> 44M).  row_base is emitted in
    frontier-ROW units either way, so kernels pick the gather by
    rows-per-region = gather_region // 4096."""
    m = int(adj_col_indices.shape[0])
    dst = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(adj_row_offsets)).astype(np.int64)
    src = adj_col_indices.astype(np.int64)
    num_regions = max(1, _cdiv(n + 1, REGION))
    n_words = num_regions * (REGION // 32)
    dummy = np.int64(n)   # frontier bit of vertex n is never set
    rows_per_reg = gather_region // 4096   # frontier rows per region

    region = src // gather_region
    word = dst // 32
    packed_val = (src | ((dst % 32) << SHIFT_BITS)).astype(np.int64)

    order = np.lexsort((word, region))
    region, word, packed_val = (region[order], word[order],
                                packed_val[order])

    if m:
        change = np.ones(m, dtype=bool)
        change[1:] = (region[1:] != region[:-1]) | (word[1:] != word[:-1])
        cell_start = np.nonzero(change)[0]
        cell_count = np.diff(np.append(cell_start, m))
        cell_region = region[cell_start]
        cell_word = word[cell_start]
    else:
        cell_start = cell_count = cell_region = cell_word = np.zeros(
            0, np.int64)

    hub_tiles_list, hub_meta = [], []
    # per-supercell queues: (region, out_row) ->
    #   groups:   [(wl, edge_start, 64-or-less-count)]  (full blocks)
    #   suffixes: [(wl, k_lanes 2..7, edge_start, count)]
    #   singles:  [(wl, edge_start, count<=8)]
    supers = defaultdict(lambda: ([], [], []))

    for c in range(len(cell_count)):
        s, cnt = int(cell_start[c]), int(cell_count[c])
        w = int(cell_word[c])
        reg = int(cell_region[c])
        wl = w % 128
        sk = (reg, w // 128)
        if cnt >= HUB_T:
            if hub_class_placed and rows_per_reg == 8:
                # round-4 mega fast gather: slot sublane == source
                # frontier-row class (rel = (src>>12) - row_base), so
                # the in-kernel gather is ONE stacked 8-row take
                # instead of the 8-step select tree.  Bucket the
                # cell's edges by class and fill <=128 per class per
                # tile; skewed classes spill to further tiles (a few %
                # utilization at rmat-s20), and the sub-HUB_T tail
                # still flows to the packed chunks.
                ev = packed_val[s: s + cnt]
                rel = ((ev & ((1 << SHIFT_BITS) - 1)) >> 12)                     - reg * rows_per_reg
                buckets = [ev[rel == c] for c in range(8)]
                pos = [0] * 8
                remaining = cnt
                while remaining >= HUB_T:
                    tile = np.full((8, 128), dummy, np.int64)
                    took = 0
                    for c in range(8):
                        avail = len(buckets[c]) - pos[c]
                        take = min(128, avail)
                        if take > 0:
                            tile[c, :take] = buckets[c][
                                pos[c]: pos[c] + take]
                            pos[c] += take
                            took += take
                    if took == 0:
                        break
                    remaining -= took
                    hub_tiles_list.append(tile.reshape(-1))
                    hub_meta.append((reg * rows_per_reg, w // 128, wl))
                if remaining > 0:
                    # tail (< HUB_T or class-starved): re-pack the
                    # leftovers contiguously for the packed chunks
                    # (in-place permutation of this cell's own range —
                    # the order within a cell is free)
                    left = np.concatenate(
                        [buckets[c][pos[c]:] for c in range(8)])
                    packed_val[s: s + remaining] = left
                    cnt = remaining
                else:
                    continue
            else:
                full, rem = divmod(cnt, TILE_E)
                for t in range(full):
                    hub_tiles_list.append(
                        packed_val[s + t * TILE_E: s + (t + 1) * TILE_E])
                    hub_meta.append((reg * rows_per_reg, w // 128, wl))
                s += full * TILE_E
                if rem >= HUB_T:
                    tile = np.full(TILE_E, dummy, np.int64)
                    tile[:rem] = packed_val[s: s + rem]
                    hub_tiles_list.append(tile)
                    hub_meta.append((reg * rows_per_reg, w // 128, wl))
                    continue
                cnt = rem        # remainder flows into packed chunks
                if cnt == 0:
                    continue
        groups, suffixes, singles = supers[sk]
        g, rr = divmod(cnt, 64)
        off = s
        if rr > 56:              # 57..63: treat as one more (partial) group
            g, rr = g + 1, 0
        for i in range(g):
            take = min(64, cnt - (off - s))
            groups.append((wl, off, take))
            off += take
        if rr > 8:
            k = (rr + 7) // 8
            suffixes.append((wl, k, off, rr))
        elif rr >= 1:
            singles.append((wl, off, rr))

    Th = len(hub_tiles_list)
    if Th:
        hub_tiles = np.stack(hub_tiles_list).reshape(Th * 8, 128)
        hub_row_base, hub_out_row, hub_out_lane = map(
            lambda a: np.asarray(a, np.int32), zip(*hub_meta))
    else:
        hub_tiles = np.zeros((0, 128), np.int64)
        hub_row_base = hub_out_row = hub_out_lane = np.zeros(0, np.int32)

    # ---- packed tile assembly per supercell ----
    pk_tiles_list, pk_meta, pk_idx_list = [], [], []

    for sk in sorted(supers):
        reg, out_row = sk
        groups, suffixes, singles = supers[sk]
        gq = list(reversed(groups))
        sq = list(reversed(suffixes))
        lq = list(reversed(singles))
        while gq or sq or lq:
            tile = np.full((8, 128), dummy, np.int64)
            # idx slots per word: 0 = g0, 1 = g1 (suffix-op), 2 = l
            idx_val = np.full((128, 3), EMPTY, np.int64)
            nsfx = np.zeros(128, np.int64)   # suffix-op slots used
            block = 0
            free_lanes = []                  # addressable single lanes
            defer = []
            while block < BLOCKS and gq:     # full blocks first
                wl, es, take = gq.pop()
                if nsfx[wl] >= 2:
                    defer.append((wl, es, take))
                    continue
                buf = np.full(64, dummy, np.int64)
                buf[:take] = packed_val[es: es + take]
                tile[:, 8 * block: 8 * block + 8] = buf.reshape(8, 8).T
                idx_val[wl, nsfx[wl]] = 8 * block
                nsfx[wl] += 1
                block += 1
            gq.extend(reversed(defer))
            defer = []
            while block < BLOCKS and sq:     # suffix runs at block ends
                wl, k, es, r = sq.pop()
                if nsfx[wl] >= 2:
                    defer.append((wl, k, es, r))
                    continue
                b0 = 8 * block
                buf = np.full(8 * k, dummy, np.int64)
                buf[:r] = packed_val[es: es + r]
                tile[:, b0 + 8 - k: b0 + 8] = buf.reshape(k, 8).T
                idx_val[wl, nsfx[wl]] = b0 + 8 - k
                nsfx[wl] += 1
                free_lanes.extend(range(b0, b0 + 8 - k))
                block += 1
            sq.extend(reversed(defer))
            # leftover whole blocks are all single-addressable
            free_lanes.extend(range(8 * block, 8 * BLOCKS))
            fl = 0
            while fl < len(free_lanes) and lq:
                wl, es, r = lq.pop()
                lane = free_lanes[fl]
                fl += 1
                buf = np.full(8, dummy, np.int64)
                buf[:r] = packed_val[es: es + r]
                tile[:, lane] = buf
                idx_val[wl, 2] = lane
            idx = (idx_val[:, 0] | (idx_val[:, 1] << 8)
                   | (idx_val[:, 2] << 16))
            pk_tiles_list.append(tile)
            pk_meta.append((reg * rows_per_reg, out_row))
            pk_idx_list.append(idx)

    empty_idx = np.full(128, EMPTY | (EMPTY << 8) | (EMPTY << 16),
                        np.int64)
    while pk_tiles_list and len(pk_tiles_list) % subtiles:
        pk_tiles_list.append(np.full((8, 128), dummy, np.int64))
        pk_meta.append((0, 0))
        pk_idx_list.append(empty_idx)
    while Th and Th % subtiles:
        hub_tiles = np.concatenate(
            [hub_tiles, np.full((8, 128), dummy, np.int64)])
        hub_row_base = np.append(hub_row_base, np.int32(0))
        hub_out_row = np.append(hub_out_row, np.int32(0))
        hub_out_lane = np.append(hub_out_lane, np.int32(0))
        Th += 1

    Tp = len(pk_tiles_list)
    if Tp:
        pk_tiles = np.concatenate(pk_tiles_list, axis=0)
        pk_row_base, pk_out_row = map(
            lambda a: np.asarray(a, np.int32), zip(*pk_meta))
        pk_idx = np.stack(pk_idx_list).astype(np.int32)
    else:
        pk_tiles = np.zeros((0, 128), np.int64)
        pk_row_base = pk_out_row = np.zeros(0, np.int32)
        pk_idx = np.zeros((0, 128), np.int32)

    return PullPlanV3(
        n=n, m=m, n_words=n_words,
        hub_tiles=hub_tiles.astype(np.int32),
        hub_row_base=hub_row_base,
        hub_out_row=hub_out_row.astype(np.int32),
        hub_out_lane=hub_out_lane.astype(np.int32),
        pk_tiles=pk_tiles.astype(np.int32),
        pk_row_base=pk_row_base,
        pk_out_row=pk_out_row.astype(np.int32),
        pk_idx=pk_idx,
        subtiles=subtiles,
    )


def _v3_consts():
    """Constant tiles for the v3 placement gather."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % 8
    mle = {d: jnp.where(lane <= 7 - d, -1, 0) for d in (1, 2, 4)}
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    # idx-extraction shift per op row: row0=g0(<<0), row1=g1(<<8),
    # row4=l(<<16); unused rows forced to EMPTY by `dead`
    shifts = (jnp.where(sub_iota == 1, 8, 0)
              + jnp.where(sub_iota == 4, 16, 0))
    used = (sub_iota == 0) | (sub_iota == 1) | (sub_iota == 4)
    dead = jnp.where(used, 0, EMPTY)
    return mle, sub_iota, shifts, dead


def _v3_subtile(packed, idx_row, row_base, fr_ref, mle, sub_iota,
                shifts, dead):
    """One 1024-edge packed subtile -> (1,128) output-word OR values."""
    src = packed & SRC_MASK
    shift = packed >> SHIFT_BITS
    active = _gather_active(src, row_base, fr_ref)
    bitval = active << shift
    red8 = bitval[0:4, :] | bitval[4:8, :]
    red8 = red8[0:2, :] | red8[2:4, :]
    red8 = red8[0:1, :] | red8[1:2, :]           # (1,128) per-lane OR
    # suffix-OR within each 8-lane block: pltpu.roll(x,s)[l] = x[l-s]
    sfx = red8
    for d in (1, 2, 4):
        sfx = sfx | (pltpu.roll(sfx, 128 - d, axis=1) & mle[d])
    # op rows 0..3 = suffix-OR, rows 4..7 = per-lane OR
    op = jnp.where(sub_iota < 4, jnp.broadcast_to(sfx, (8, 128)),
                   jnp.broadcast_to(red8, (8, 128)))
    vb = jnp.broadcast_to(idx_row, (8, 128))
    idx = ((vb >> shifts) & 127) | dead
    res = jnp.take_along_axis(op, idx, axis=1)
    return res[0:1, :] | res[1:2, :] | res[4:5, :]


def _packed_kernel_v3(row_base_ref, out_row_ref, tile_ref, idx_ref,
                      words_ref, out_ref, *, subtiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    mle, sub_iota, shifts, dead = _v3_consts()
    for k in range(subtiles):
        t = i * subtiles + k
        packed = tile_ref[8 * k: 8 * (k + 1), :]
        idx_row = idx_ref[k: k + 1, :]
        placed = _v3_subtile(packed, idx_row, row_base_ref[t], words_ref,
                             mle, sub_iota, shifts, dead)
        r = out_row_ref[t]
        out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] | placed


class PullSweeperV3:
    """Compiled v3 sweep: frontier words -> touched words."""

    def __init__(self, plan: PullPlanV3, interpret: bool = False):
        self.plan = plan
        self.n_words = plan.n_words
        rows = plan.n_words // 128
        self.rows = rows
        S = plan.subtiles

        self.hub_args = (
            jax.device_put(plan.hub_row_base),
            jax.device_put(plan.hub_out_row),
            jax.device_put(plan.hub_out_lane),
            jax.device_put(plan.hub_tiles),
        )
        self.pk_args = (
            jax.device_put(plan.pk_row_base),
            jax.device_put(plan.pk_out_row),
            jax.device_put(plan.pk_tiles),
            jax.device_put(plan.pk_idx),
        )

        out_shape = jax.ShapeDtypeStruct((rows, 128), jnp.int32)

        self.hub_fn = None
        if plan.num_hub:
            self.hub_fn = pl.pallas_call(
                functools.partial(_hub_kernel, subtiles=S),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(plan.num_hub // S,),
                    in_specs=[
                        pl.BlockSpec((8 * S, 128), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
                out_shape=out_shape, interpret=interpret)

        self.pk_fn = None
        if plan.num_packed:
            self.pk_fn = pl.pallas_call(
                functools.partial(_packed_kernel_v3, subtiles=S),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(plan.num_packed // S,),
                    in_specs=[
                        pl.BlockSpec((8 * S, 128), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((S, 128), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
                out_shape=out_shape, interpret=interpret)

        def sweep_with(hub_args, pk_args, fw):
            outs = []
            if self.hub_fn is not None:
                outs.append(self.hub_fn(*hub_args, fw))
            if self.pk_fn is not None:
                outs.append(self.pk_fn(*pk_args, fw))
            if not outs:
                return jnp.zeros((rows, 128), jnp.int32)
            acc = outs[0]
            for o in outs[1:]:
                acc = acc | o
            return acc

        self.sweep_with = sweep_with
        self._jit = jax.jit(lambda h, p, fw: sweep_with(h, p, fw))

    def __call__(self, frontier_words):
        return self._jit(self.hub_args, self.pk_args, frontier_words)
