"""Pull-sweep kernel v2 — flavor-split tiling (hub / packed).

v1 (pallas_advance.py) pays ~220 small VPU ops per 1024-edge subtile in
its 16-word masked-reduce scatter. v2 eliminates the masked reductions
by *placing* edges at build time so the scatter is implicit:

  * hub subtiles — all 1024 edges target ONE packed output word
    (destination words with >= 512 in-region edges). Scatter = one
    full-tile OR reduction + a single masked lane write. Kron/power-law
    graphs put 40-85% of edges here.
  * packed subtiles — the output row (128 words = 4096 destinations) is
    mapped onto the 128 lanes. Lanes 0..119 hold edge slots:
    an 8-lane block is either one 64-slot group (all edges of one
    word) or 8 independent 8-slot lanes (one word each). Scatter =
    3 sublane folds + 3 group rolls + two precomputed placement
    gathers (take_along_axis with a streamed index tile). Lanes
    120..127 are reserved empty so unused placements read zero.

Both flavors share the v1 bitmap gather (8-row region select tree) and
pack `dst % 32` (the bit shift) into the high bits of the src word, so
each flavor streams ONE int32 per edge plus small per-subtile tiles.

Edge budget: ~55 vector ops per 1024 edges vs ~260 in v1.
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

TILE_E = 1024
REGION = 32768
ROWS_PER_REGION = REGION // 32 // 128    # 8
WORDS_PER_ROW = 128                      # output words per (1,128) row
HUB_T = 512                              # hub threshold (edges per cell)
SHIFT_BITS = 26                          # dst%32 packed at bits 26..30
SRC_MASK = (1 << SHIFT_BITS) - 1
LANES_USED = 120                         # lanes 120..127 reserved zero
BLOCKS = LANES_USED // 8                 # 15 assignable 8-blocks
SUBTILES = 4                             # default subtiles per grid step.
                                         # MEASURED optimum on v5e: 4 →
                                         # 2.67 G edge/s (≈the 1.6us/step
                                         # pipeline floor); 16 → 1.9 G
                                         # (unroll hits scheduling/regalloc
                                         # limits, like v1 at 8). Tunable:
                                         # build_pull_plan_v2(subtiles=).
                                         # The mega kernel (pallas_mega.py)
                                         # sidesteps the floor entirely.


def _cdiv(a, b):
    return -(-a // b)


@dataclasses.dataclass
class PullPlanV2:
    n: int
    m: int
    n_words: int
    # hub flavor
    hub_tiles: np.ndarray       # (Th*8, 128) int32 packed src|shift<<26
    hub_row_base: np.ndarray    # (Th,) int32 region word-row base
    hub_out_row: np.ndarray     # (Th,) int32
    hub_out_lane: np.ndarray    # (Th,) int32
    # packed flavor
    pk_tiles: np.ndarray        # (Tp*8, 128) int32 packed src|shift<<26
    pk_row_base: np.ndarray     # (Tp,) int32
    pk_out_row: np.ndarray      # (Tp,) int32
    pk_idx: np.ndarray          # (Tp*8, 128) int32: row 0 = group-
                                # placement gather, row 1 = lane-
                                # placement gather, rows 2-7 padding
                                # (TPU blocks need 8-row alignment)
    subtiles: int = SUBTILES    # subtiles per grid step

    @property
    def num_hub(self) -> int:
        return self.hub_row_base.shape[0]

    @property
    def num_packed(self) -> int:
        return self.pk_row_base.shape[0]


def build_pull_plan_v2(adj_row_offsets: np.ndarray,
                       adj_col_indices: np.ndarray, n: int,
                       subtiles: int = SUBTILES) -> PullPlanV2:
    """Build hub/packed tile sets from the pull-direction adjacency
    (pass the CSC: rows = destination, cols = source)."""
    SUBTILES = subtiles  # shadow module default (plan-local batch size)
    m = int(adj_col_indices.shape[0])
    dst = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(adj_row_offsets)).astype(np.int64)
    src = adj_col_indices.astype(np.int64)
    num_regions = max(1, _cdiv(n + 1, REGION))
    n_words = num_regions * (REGION // 32)
    dummy = n  # frontier bit never set

    region = src // REGION
    word = dst // 32
    packed_val = (src | ((dst % 32) << SHIFT_BITS)).astype(np.int64)

    # sort edges by (region, word)
    order = np.lexsort((word, region))
    region, word, packed_val = region[order], word[order], packed_val[order]

    # cell boundaries
    if m:
        cell_change = np.ones(m, dtype=bool)
        cell_change[1:] = (region[1:] != region[:-1]) | (word[1:] != word[:-1])
        cell_id = np.cumsum(cell_change) - 1
        cell_start = np.nonzero(cell_change)[0]
        cell_count = np.diff(np.append(cell_start, m))
        cell_region = region[cell_start]
        cell_word = word[cell_start]
    else:
        cell_id = np.zeros(0, np.int64)
        cell_start = cell_count = cell_region = cell_word = np.zeros(
            0, np.int64)

    dummy_packed = np.int64(dummy)

    # ---------------- hub flavor ----------------
    hub_cell = cell_count >= HUB_T
    hub_cells = np.nonzero(hub_cell)[0]
    hub_tiles_list = []
    hub_meta = []
    for c in hub_cells:
        s, cnt = int(cell_start[c]), int(cell_count[c])
        for off in range(0, cnt, TILE_E):
            chunk = packed_val[s + off: s + min(off + TILE_E, cnt)]
            tile = np.full(TILE_E, dummy_packed, np.int64)
            tile[: len(chunk)] = chunk
            hub_tiles_list.append(tile)
            w = int(cell_word[c])
            hub_meta.append((int(cell_region[c]) * ROWS_PER_REGION,
                             w // 128, w % 128))
    while hub_tiles_list and len(hub_tiles_list) % SUBTILES:
        hub_tiles_list.append(np.full(TILE_E, dummy_packed, np.int64))
        hub_meta.append((0, 0, 0))
    Th = max(len(hub_tiles_list), 0)
    if Th:
        hub_tiles = np.stack(hub_tiles_list).reshape(Th * 8, 128)
        hub_row_base, hub_out_row, hub_out_lane = map(
            lambda a: np.asarray(a, np.int32), zip(*hub_meta))
    else:
        hub_tiles = np.zeros((0, 128), np.int64)
        hub_row_base = hub_out_row = hub_out_lane = np.zeros(0, np.int32)

    # ---------------- packed flavor ----------------
    # chunks: per packed cell, 64-slot group chunks + one <=8 lane chunk
    pk_cells = np.nonzero(~hub_cell & (cell_count > 0))[0]
    # super-cell = (region, out_row); conflict class = chunk index per cell
    chunks = []  # (super_key, cls, is_group, word_lane, edge_start, count)
    for c in pk_cells:
        s, cnt = int(cell_start[c]), int(cell_count[c])
        w = int(cell_word[c])
        super_key = (int(cell_region[c]), w // 128)
        wl = w % 128
        cls = 0
        off = 0
        while cnt - off >= 8:
            take = min(64, cnt - off)
            chunks.append((super_key, cls, True, wl, s + off, take))
            off += take
            cls += 1
        if cnt - off > 0:
            chunks.append((super_key, cls, False, wl, s + off, cnt - off))

    # bin chunks by super-cell; tiles flow across conflict classes (a
    # tile may host chunks of ANY cls as long as each word appears at
    # most once per placement kind — idx_g[wl]/idx_l[wl] are single
    # mappings). Binning by (super, cls) — the old scheme — opened a
    # fresh tile run per class and left tiles ~47% full on rmat-s20;
    # this packer reaches ~the per-supercell optimum.
    from collections import defaultdict, deque
    by_super = defaultdict(lambda: ([], []))
    for ch in chunks:
        (by_super[ch[0]][0] if ch[2] else by_super[ch[0]][1]).append(ch)

    pk_tiles_list = []
    pk_meta = []     # (row_base, out_row)
    pk_idx_g_list = []
    pk_idx_l_list = []

    for super_key, (gchunks, lchunks) in sorted(by_super.items()):
        reg, out_row = super_key
        gq, lq = deque(gchunks), deque(lchunks)
        while gq or lq:
            tile = np.full((8, 128), dummy_packed, np.int64)
            # unused placements read zeros: group-gather from lane 120
            # (start of the reserved-empty block — its group-OR is 0;
            # lane 127's group-OR wraps to lanes 0..6), lane-gather
            # from lane 127 (raw lane, always empty).
            idx_g = np.full(128, 120, np.int32)
            idx_l = np.full(128, 127, np.int32)
            used_g, used_l = set(), set()
            defer = []
            block = 0
            while block < BLOCKS and gq:
                ch = gq.popleft()
                wl = ch[3]
                if wl in used_g:     # another cls of this word: next tile
                    defer.append(ch)
                    continue
                _, _, _, _, es, cnt = ch
                lanes = slice(8 * block, 8 * block + 8)
                vals = packed_val[es: es + cnt]
                buf = np.full(64, dummy_packed, np.int64)
                buf[:cnt] = vals
                tile[:, lanes] = buf.reshape(8, 8)
                idx_g[wl] = 8 * block
                used_g.add(wl)
                block += 1
            defer.reverse()
            gq.extendleft(defer)
            defer = []
            # remaining blocks become lane slots
            lane_cursor = 8 * block
            while lane_cursor < LANES_USED and lq:
                ch = lq.popleft()
                wl = ch[3]
                if wl in used_l:
                    defer.append(ch)
                    continue
                _, _, _, _, es, cnt = ch
                vals = packed_val[es: es + cnt]
                buf = np.full(8, dummy_packed, np.int64)
                buf[:cnt] = vals
                tile[:, lane_cursor] = buf
                idx_l[wl] = lane_cursor
                lane_cursor += 1
                used_l.add(wl)
            defer.reverse()
            lq.extendleft(defer)
            pk_tiles_list.append(tile)
            pk_meta.append((reg * ROWS_PER_REGION, out_row))
            pk_idx_g_list.append(idx_g)
            pk_idx_l_list.append(idx_l)

    while pk_tiles_list and len(pk_tiles_list) % SUBTILES:
        pk_tiles_list.append(np.full((8, 128), dummy_packed, np.int64))
        pk_meta.append((0, 0))
        pk_idx_g_list.append(np.full(128, 120, np.int32))
        pk_idx_l_list.append(np.full(128, 127, np.int32))
    Tp = len(pk_tiles_list)
    if Tp:
        pk_tiles = np.concatenate(pk_tiles_list, axis=0)
        pk_row_base, pk_out_row = map(
            lambda a: np.asarray(a, np.int32), zip(*pk_meta))
        pk_idx = np.full((Tp, 8, 128), 127, np.int32)
        pk_idx[:, 0, :] = np.stack(pk_idx_g_list)
        pk_idx[:, 1, :] = np.stack(pk_idx_l_list)
        pk_idx = pk_idx.reshape(Tp * 8, 128)
    else:
        pk_tiles = np.zeros((0, 128), np.int64)
        pk_row_base = pk_out_row = np.zeros(0, np.int32)
        pk_idx = np.zeros((0, 128), np.int32)

    return PullPlanV2(
        n=n, m=m, n_words=n_words,
        hub_tiles=hub_tiles.astype(np.int32),
        hub_row_base=hub_row_base, hub_out_row=hub_out_row.astype(np.int32),
        hub_out_lane=hub_out_lane.astype(np.int32),
        pk_tiles=pk_tiles.astype(np.int32),
        pk_row_base=pk_row_base, pk_out_row=pk_out_row.astype(np.int32),
        pk_idx=pk_idx,
        subtiles=subtiles,
    )


def _gather_active(src, row_base, words_ref):
    """Shared 8-row region select tree -> per-edge frontier bit."""
    widx = src >> 5
    lane = widx & 127
    rel = (widx >> 7) - row_base
    g = jnp.zeros((8, 128), jnp.int32)
    for r in range(ROWS_PER_REGION):
        rw = jnp.broadcast_to(words_ref[pl.ds(row_base + r, 1), :], (8, 128))
        g = jnp.where(rel == r, jnp.take_along_axis(rw, lane, axis=1), g)
    return (g >> (src & 31)) & 1


def _hub_kernel(row_base_ref, out_row_ref, out_lane_ref,
                tile_ref, words_ref, out_ref, *, subtiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for k in range(subtiles):
        t = i * subtiles + k
        packed = tile_ref[8 * k: 8 * (k + 1), :]
        src = packed & SRC_MASK
        shift = packed >> SHIFT_BITS
        active = _gather_active(src, row_base_ref[t], words_ref)
        bitval = active << shift
        v = bitval[0:4, :] | bitval[4:8, :]
        v = v[0:2, :] | v[2:4, :]
        v = v[0:1, :] | v[1:2, :]
        for sh in (64, 32, 16, 8, 4, 2, 1):
            v = v | pltpu.roll(v, sh, axis=1)
        placed = jnp.where(lane_iota == out_lane_ref[t], v, 0)
        r = out_row_ref[t]
        out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] | placed


def _packed_kernel(row_base_ref, out_row_ref, tile_ref, idx_ref,
                   words_ref, out_ref, *, subtiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for k in range(subtiles):
        t = i * subtiles + k
        packed = tile_ref[8 * k: 8 * (k + 1), :]
        src = packed & SRC_MASK
        shift = packed >> SHIFT_BITS
        active = _gather_active(src, row_base_ref[t], words_ref)
        bitval = active << shift
        red8 = bitval[0:4, :] | bitval[4:8, :]
        red8 = red8[0:2, :] | red8[2:4, :]
        red8 = red8[0:1, :] | red8[1:2, :]        # (1,128) per-lane OR
        redg = red8
        for sh in (1, 2, 4):
            redg = redg | pltpu.roll(redg, 128 - sh, axis=1)
        # lane 8b of redg = OR of lanes 8b..8b+7
        # Mosaic's lane gather wants 8-sublane operands: gather both
        # placements on broadcast (8,128) tiles, pick the right rows
        idx = idx_ref[8 * k: 8 * (k + 1), :]
        gsel = jnp.take_along_axis(jnp.broadcast_to(redg, (8, 128)),
                                   idx, axis=1)
        lsel = jnp.take_along_axis(jnp.broadcast_to(red8, (8, 128)),
                                   idx, axis=1)
        placed = gsel[0:1, :] | lsel[1:2, :]
        r = out_row_ref[t]
        out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] | placed


class PullSweeperV2:
    """Compiled v2 sweep: frontier words -> touched words (two kernel
    launches, outputs OR-combined)."""

    def __init__(self, plan: PullPlanV2, interpret: bool = False):
        self.plan = plan
        self.n_words = plan.n_words
        rows = plan.n_words // 128
        self.rows = rows
        SUBTILES = plan.subtiles  # shadow module default

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
