"""Pallas pull-SpMV — f32 per-destination sums (PageRank's hot op).

The PR push `next[d] += contrib[src]` over all edges is the same
structure as the BFS pull sweep (ops/pallas_advance_v2.py) with three
changes, so this module mirrors its hub/packed flavor design:

  * values are exact f32: `contrib` is staged as two half-word planes
    (hi/lo 16 bits, two vertices per int32 word) in 4096-vertex source
    regions (16+16 rows each) so the region select tree stays
    affordable; the kernel reassembles `(hi<<16)|lo` and bitcasts.
  * cells are (source region, DESTINATION) — per-vertex granularity —
    and the combine is ADD: sublane folds and group rolls become adds,
    the masked lane write becomes an accumulate.
  * output is an (n_pad/128, 128) f32 row grid; a packed subtile's 15
    8-lane blocks hold either one 64-slot destination group or 8
    single-destination lanes, placed by a streamed index tile exactly
    like v2.

Throughput: ~0.3-0.5 us per 1024-edge subtile; packing utilization on
power-law graphs ~20-60% (cells are small), still ~20x the XLA
scatter-add path. Used by primitives/pr.py `mode="pallas"`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 1024
REGION_F = 4096                      # source vertices per region (f32)
HALF_ROWS = REGION_F // 2 // 128     # 16 rows per half-plane
HUB_T = 512
SHIFT_BITS = 26                      # (unused bits reserved; src fits)
LANES_USED = 120
BLOCKS = LANES_USED // 8             # 15
SUBTILES = 4     # default; tunable per plan (build_spmv_plan(subtiles=)).
                 # 4 = measured optimum on v5e for the v2-style unroll
                 # (bigger unrolls hit scheduling/regalloc limits)


def _cdiv(a, b):
    return -(-a // b)


# Per-tile metadata rides in scalar-prefetch (SMEM, ~1 MiB/core on
# v5e).  Large power-law graphs (rmat s20: ~1.1M packed subtiles) blow
# that budget; callers must check fits and fall back to the XLA
# scatter-add path.
SMEM_SCALAR_BUDGET = 512 * 1024


def spmv_fits(plan: "SpmvPlan") -> bool:
    hub_b = 3 * plan.num_hub * 4
    pk_b = 2 * plan.num_packed * 4
    return max(hub_b, pk_b) <= SMEM_SCALAR_BUDGET


@dataclasses.dataclass
class SpmvPlan:
    n: int
    m: int
    num_regions: int
    out_rows: int                 # n_pad/128 output f32 rows
    # hub flavor: one destination per subtile
    hub_tiles: np.ndarray         # (Th*8, 128) int32 src ids
    hub_row_base: np.ndarray      # (Th,) int32: region * 32 (plane rows)
    hub_out_row: np.ndarray       # (Th,) int32
    hub_out_lane: np.ndarray      # (Th,) int32
    # packed flavor
    pk_tiles: np.ndarray          # (Tp*8, 128) int32 src ids
    pk_row_base: np.ndarray       # (Tp,) int32
    pk_out_row: np.ndarray        # (Tp,) int32
    pk_idx: np.ndarray            # (Tp*8, 128) rows 0/1 = group/lane idx
    subtiles: int = SUBTILES      # must match the padding multiple used
                                  # when the tile lists were built

    @property
    def num_hub(self):
        return self.hub_row_base.shape[0]

    @property
    def num_packed(self):
        return self.pk_row_base.shape[0]


def build_spmv_plan(adj_row_offsets, adj_col_indices, n: int,
                    subtiles: int = SUBTILES) -> SpmvPlan:
    """Build from the pull-direction adjacency (CSC: row = dst,
    col = src)."""
    SUBTILES = subtiles  # shadow module default (plan-local batch size)
    m = int(adj_col_indices.shape[0])
    dst = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(adj_row_offsets)).astype(np.int64)
    src = adj_col_indices.astype(np.int64)
    num_regions = max(1, _cdiv(n + 1, REGION_F))
    n_pad = _cdiv(n + 1, 128) * 128
    out_rows = n_pad // 128
    dummy = n  # contrib[dummy] staged as 0

    region = src // REGION_F
    order = np.lexsort((dst, region))
    region, dsts, srcs = region[order], dst[order], src[order]

    if m:
        cell_change = np.ones(m, dtype=bool)
        cell_change[1:] = (region[1:] != region[:-1]) | (dsts[1:] != dsts[:-1])
        cell_start = np.nonzero(cell_change)[0]
        cell_count = np.diff(np.append(cell_start, m))
        cell_region = region[cell_start]
        cell_dst = dsts[cell_start]
    else:
        cell_start = cell_count = cell_region = cell_dst = np.zeros(
            0, np.int64)

    # ---- hub flavor ----
    hub_cell = cell_count >= HUB_T
    hub_tiles_list, hub_meta = [], []
    for c in np.nonzero(hub_cell)[0]:
        s, cnt = int(cell_start[c]), int(cell_count[c])
        d = int(cell_dst[c])
        for off in range(0, cnt, TILE_E):
            chunk = srcs[s + off: s + min(off + TILE_E, cnt)]
            tile = np.full(TILE_E, dummy, np.int64)
            tile[: len(chunk)] = chunk
            hub_tiles_list.append(tile)
            hub_meta.append((int(cell_region[c]) * 2 * HALF_ROWS,
                             d // 128, d % 128))
    while hub_tiles_list and len(hub_tiles_list) % SUBTILES:
        hub_tiles_list.append(np.full(TILE_E, dummy, np.int64))
        hub_meta.append((0, 0, 0))
    Th = len(hub_tiles_list)
    if Th:
        hub_tiles = np.stack(hub_tiles_list).reshape(Th * 8, 128)
        hub_row_base, hub_out_row, hub_out_lane = map(
            lambda a: np.asarray(a, np.int32), zip(*hub_meta))
    else:
        hub_tiles = np.zeros((0, 128), np.int64)
        hub_row_base = hub_out_row = hub_out_lane = np.zeros(0, np.int32)

    # ---- packed flavor ----
    chunks = []   # (super_key, cls, is_group, dst_lane, start, count)
    for c in np.nonzero(~hub_cell & (cell_count > 0))[0]:
        s, cnt = int(cell_start[c]), int(cell_count[c])
        d = int(cell_dst[c])
        super_key = (int(cell_region[c]), d // 128)
        dl = d % 128
        cls = 0
        off = 0
        while cnt - off >= 8:
            take = min(64, cnt - off)
            chunks.append((super_key, cls, True, dl, s + off, take))
            off += take
            cls += 1
        if cnt - off > 0:
            chunks.append((super_key, cls, False, dl, s + off, cnt - off))

    from collections import defaultdict
    by_bin = defaultdict(lambda: ([], []))
    for ch in chunks:
        (by_bin[(ch[0], ch[1])][0] if ch[2]
         else by_bin[(ch[0], ch[1])][1]).append(ch)

    pk_tiles_list, pk_meta, idx_g_list, idx_l_list = [], [], [], []
    for (super_key, cls), (gchunks, lchunks) in sorted(
            by_bin.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        reg, out_row = super_key
        gi, li = 0, 0
        while gi < len(gchunks) or li < len(lchunks):
            tile = np.full((8, 128), dummy, np.int64)
            idx_g = np.full(128, 120, np.int32)   # empty block group-sum = 0
            idx_l = np.full(128, 127, np.int32)   # empty lane = 0
            block = 0
            while block < BLOCKS and gi < len(gchunks):
                _, _, _, dl, es, cnt = gchunks[gi]
                vals = srcs[es: es + cnt]
                buf = np.full(64, dummy, np.int64)
                buf[:cnt] = vals
                tile[:, 8 * block: 8 * block + 8] = buf.reshape(8, 8)
                idx_g[dl] = 8 * block
                gi += 1
                block += 1
            lane_cursor = 8 * block
            while lane_cursor < LANES_USED and li < len(lchunks):
                _, _, _, dl, es, cnt = lchunks[li]
                buf = np.full(8, dummy, np.int64)
                buf[:cnt] = srcs[es: es + cnt]
                tile[:, lane_cursor] = buf
                idx_l[dl] = lane_cursor
                li += 1
                lane_cursor += 1
            pk_tiles_list.append(tile)
            pk_meta.append((reg * 2 * HALF_ROWS, out_row))
            idx_g_list.append(idx_g)
            idx_l_list.append(idx_l)
    while pk_tiles_list and len(pk_tiles_list) % SUBTILES:
        pk_tiles_list.append(np.full((8, 128), dummy, np.int64))
        pk_meta.append((0, 0))
        idx_g_list.append(np.full(128, 120, np.int32))
        idx_l_list.append(np.full(128, 127, np.int32))
    Tp = len(pk_tiles_list)
    if Tp:
        pk_tiles = np.concatenate(pk_tiles_list, axis=0)
        pk_row_base, pk_out_row = map(
            lambda a: np.asarray(a, np.int32), zip(*pk_meta))
        pk_idx = np.full((Tp, 8, 128), 127, np.int32)
        pk_idx[:, 0, :] = np.stack(idx_g_list)
        pk_idx[:, 1, :] = np.stack(idx_l_list)
        pk_idx = pk_idx.reshape(Tp * 8, 128)
    else:
        pk_tiles = np.zeros((0, 128), np.int64)
        pk_row_base = pk_out_row = np.zeros(0, np.int32)
        pk_idx = np.zeros((0, 128), np.int32)

    return SpmvPlan(
        n=n, m=m, num_regions=num_regions, out_rows=out_rows,
        hub_tiles=hub_tiles.astype(np.int32), hub_row_base=hub_row_base,
        hub_out_row=hub_out_row.astype(np.int32),
        hub_out_lane=hub_out_lane.astype(np.int32),
        pk_tiles=pk_tiles.astype(np.int32), pk_row_base=pk_row_base,
        pk_out_row=pk_out_row.astype(np.int32), pk_idx=pk_idx,
        subtiles=subtiles,
    )


def stage_contrib(contrib, num_regions: int):
    """(n_pad,) f32 -> (num_regions*32, 128) int32 half-word planes:
    per region, rows 0..15 hold hi16 of 4096 values (2 per word),
    rows 16..31 hold lo16."""
    total = num_regions * REGION_F
    c = jnp.zeros((total,), jnp.float32).at[: contrib.shape[0]].set(contrib)
    bits = jax.lax.bitcast_convert_type(c, jnp.int32)
    hi = (bits >> 16) & 0xFFFF
    lo = bits & 0xFFFF
    def pack(h):
        pairs = h.reshape(-1, 2)
        return (pairs[:, 0] | (pairs[:, 1] << 16)).reshape(
            num_regions, HALF_ROWS, 128)
    hi_w = pack(hi)
    lo_w = pack(lo)
    planes = jnp.concatenate([hi_w, lo_w], axis=1)   # (R, 32, 128)
    return planes.reshape(num_regions * 2 * HALF_ROWS, 128)


def _gather_f32(src, row_base, planes_ref):
    """Reassemble f32 contrib for an (8,128) tile of src ids."""
    half = src >> 1                     # global half-word pair index
    lane = half & 127
    rel = ((src % REGION_F) >> 8)       # 0..15 row within the region
    shift = (src & 1) << 4              # 0 or 16 within the packed word
    hi = jnp.zeros((8, 128), jnp.int32)
    lo = jnp.zeros((8, 128), jnp.int32)
    for r in range(HALF_ROWS):
        hrow = jnp.broadcast_to(
            planes_ref[pl.ds(row_base + r, 1), :], (8, 128))
        lrow = jnp.broadcast_to(
            planes_ref[pl.ds(row_base + HALF_ROWS + r, 1), :], (8, 128))
        sel = rel == r
        hi = jnp.where(sel, jnp.take_along_axis(hrow, lane, axis=1), hi)
        lo = jnp.where(sel, jnp.take_along_axis(lrow, lane, axis=1), lo)
    hi16 = (hi >> shift) & 0xFFFF
    lo16 = (lo >> shift) & 0xFFFF
    return jax.lax.bitcast_convert_type((hi16 << 16) | lo16, jnp.float32)


def _hub_kernel(row_base_ref, out_row_ref, out_lane_ref,
                tile_ref, planes_ref, out_ref, *, subtiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for k in range(subtiles):
        t = i * subtiles + k
        src = tile_ref[8 * k: 8 * (k + 1), :]
        vals = _gather_f32(src, row_base_ref[t], planes_ref)
        v = vals[0:4, :] + vals[4:8, :]
        v = v[0:2, :] + v[2:4, :]
        v = v[0:1, :] + v[1:2, :]
        for sh in (64, 32, 16, 8, 4, 2, 1):
            v = v + pltpu.roll(v, sh, axis=1)     # all lanes = total sum
        placed = jnp.where(lane_iota == out_lane_ref[t], v, 0.0)
        r = out_row_ref[t]
        out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] + placed


def _packed_kernel(row_base_ref, out_row_ref, tile_ref, idx_ref,
                   planes_ref, out_ref, *, subtiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for k in range(subtiles):
        t = i * subtiles + k
        src = tile_ref[8 * k: 8 * (k + 1), :]
        vals = _gather_f32(src, row_base_ref[t], planes_ref)
        red8 = vals[0:4, :] + vals[4:8, :]
        red8 = red8[0:2, :] + red8[2:4, :]
        red8 = red8[0:1, :] + red8[1:2, :]        # (1,128) per-lane sum
        redg = red8
        for sh in (1, 2, 4):
            redg = redg + pltpu.roll(redg, 128 - sh, axis=1)
        idx = idx_ref[8 * k: 8 * (k + 1), :]
        gsel = jnp.take_along_axis(jnp.broadcast_to(redg, (8, 128)),
                                   idx, axis=1)
        lsel = jnp.take_along_axis(jnp.broadcast_to(red8, (8, 128)),
                                   idx, axis=1)
        placed = gsel[0:1, :] + lsel[1:2, :]
        r = out_row_ref[t]
        out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] + placed


class SpmvSweeper:
    """Compiled pull-SpMV: contrib planes -> per-destination sums."""

    def __init__(self, plan: SpmvPlan, interpret: bool = False):
        self.plan = plan
        self.num_regions = plan.num_regions
        SUBTILES = plan.subtiles  # shadow module default
        out_shape = jax.ShapeDtypeStruct((plan.out_rows, 128), jnp.float32)

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

        self.hub_fn = None
        if plan.num_hub:
            self.hub_fn = pl.pallas_call(
                functools.partial(_hub_kernel, subtiles=SUBTILES),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(plan.num_hub // SUBTILES,),
                    in_specs=[
                        pl.BlockSpec((8 * SUBTILES, 128),
                                     lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
                out_shape=out_shape, interpret=interpret)
        self.pk_fn = None
        if plan.num_packed:
            self.pk_fn = pl.pallas_call(
                functools.partial(_packed_kernel, subtiles=SUBTILES),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(plan.num_packed // SUBTILES,),
                    in_specs=[
                        pl.BlockSpec((8 * SUBTILES, 128),
                                     lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((8 * SUBTILES, 128),
                                     lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
                out_shape=out_shape, interpret=interpret)

        def sweep_with(hub_args, pk_args, contrib):
            planes = stage_contrib(contrib, self.num_regions)
            outs = []
            if self.hub_fn is not None:
                outs.append(self.hub_fn(*hub_args, planes))
            if self.pk_fn is not None:
                outs.append(self.pk_fn(*pk_args, planes))
            if not outs:
                return jnp.zeros((plan.out_rows * 128,), jnp.float32)
            acc = outs[0]
            for o in outs[1:]:
                acc = acc + o
            return acc.reshape(-1)

        self.sweep_with = sweep_with
        self._jit = jax.jit(lambda h, p, c: sweep_with(h, p, c))

    def __call__(self, contrib):
        """contrib (n_pad,) f32 -> sums (out_rows*128,) f32."""
        return self._jit(self.hub_args, self.pk_args, contrib)
