"""Pull-sweep kernel v3 — prefix/suffix-OR partial chunks.

v2's packed flavor (pallas_advance_v2.py) loses ~54% of its slots:
group chunks are 64-slot blocks *partially filled* (a 10-edge chunk
burns a full block at 16%), a word's multiple group chunks must land in
different tiles, and hub-cell remainders (<1024 edges) each burn a
partial hub tile.  v3 recovers most of that (measured slot utilization
0.46 -> ~0.76 on rmat-s20, scripts/sim_packing.py):

  * group chunks are always FULL 64-slot blocks; a word may host TWO
    group placements per tile (idx slots g0, g1).
  * remainders become 8-slot-aligned PARTIAL chunks of 1..7 lanes,
    packed two-per-block as a (prefix, suffix) pair: the kernel
    computes per-lane prefix-OR and suffix-OR within each 8-lane
    block, so chunk [8b, 8b+k) is read as pfx[8b+k-1] and chunk
    [8b+8-k, 8b+8) as sfx[8b+8-k].  A full block read is sfx[8b]
    (the group gather).
  * hub cells contribute only FULL 1024-edge tiles to the hub flavor;
    their remainder flows into the packed chunks of the same word
    (a >=512 remainder keeps one partial hub tile — cheaper than 8+
    group placements).

Per-tile placement metadata is ONE (1,128) int32 row:
    p | g0<<8 | g1<<16 | s<<24     (each 7-bit gather lane; 127=empty)
with lanes 120..127 reserved dummy so empty gathers read zero.

The per-edge encoding (src | (dst%32)<<26), the hub flavor kernel, and
the 8-row region frontier gather are shared with v2.  Reference
parity: this is the TPU re-expression of the reference's load-balanced
advance (oprtr/edge_map_partitioned/kernel.cuh:242-559) — the
scanned-degree binary search that maps edge lanes to sources becomes a
build-time placement; the atomic output-queue scatter becomes the
precomputed gather placement.
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
    HUB_T, REGION, ROWS_PER_REGION, SHIFT_BITS, SRC_MASK, _gather_active)

TILE_E = 1024
LANES_USED = 120
BLOCKS = LANES_USED // 8     # 15
SUBTILES = 4                 # subtiles per grid step (v2-measured optimum)
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
    pk_idx: np.ndarray           # (Tp, 128) int32 p|g0<<8|g1<<16|s<<24
    subtiles: int = SUBTILES

    @property
    def num_hub(self):
        return self.hub_row_base.shape[0]

    @property
    def num_packed(self):
        return self.pk_row_base.shape[0]


def build_pull_plan_v3(adj_row_offsets: np.ndarray,
                       adj_col_indices: np.ndarray, n: int,
                       subtiles: int = SUBTILES) -> PullPlanV3:
    """Build v3 hub/packed tile sets from the pull-direction adjacency
    (pass the CSC: rows = destination, cols = source)."""
    m = int(adj_col_indices.shape[0])
    dst = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(adj_row_offsets)).astype(np.int64)
    src = adj_col_indices.astype(np.int64)
    num_regions = max(1, _cdiv(n + 1, REGION))
    n_words = num_regions * (REGION // 32)
    dummy = np.int64(n)   # frontier bit of vertex n is never set

    region = src // REGION
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
    # per-supercell chunk queues: (region, out_row) ->
    #   groups: list of (wl, edge_start)            # always 64 edges
    #   partials: list of (wl, k_lanes, edge_start, count)
    supers = defaultdict(lambda: ([], []))

    for c in range(len(cell_count)):
        s, cnt = int(cell_start[c]), int(cell_count[c])
        w = int(cell_word[c])
        reg = int(cell_region[c])
        wl = w % 128
        sk = (reg, w // 128)
        if cnt >= HUB_T:
            full, rem = divmod(cnt, TILE_E)
            for t in range(full):
                hub_tiles_list.append(
                    packed_val[s + t * TILE_E: s + (t + 1) * TILE_E])
                hub_meta.append((reg * ROWS_PER_REGION, w // 128, wl))
            s += full * TILE_E
            if rem >= HUB_T:
                tile = np.full(TILE_E, dummy, np.int64)
                tile[:rem] = packed_val[s: s + rem]
                hub_tiles_list.append(tile)
                hub_meta.append((reg * ROWS_PER_REGION, w // 128, wl))
                continue
            cnt = rem            # remainder flows into packed chunks
            if cnt == 0:
                continue
        g, r = divmod(cnt, 64)
        k = (r + 7) // 8
        if k == 8:               # 57..63-edge remainder = full block
            g, r, k = g + 1, 0, 0
        groups, partials = supers[sk]
        off = s
        for _ in range(g):
            take = min(64, cnt - (off - s))
            groups.append((wl, off, take))
            off += take
        if r:
            partials.append((wl, k, off, r))

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
        groups, partials = supers[sk]
        gq = list(reversed(groups))      # pop from the end
        # partials sorted by k descending for first-fit pairing
        pq = sorted(partials, key=lambda t: t[1])  # ascending; pop big end
        while gq or pq:
            tile = np.full((8, 128), dummy, np.int64)
            idx = np.zeros(128, np.int64)
            slot_used = np.zeros((128, 4), bool)   # p, g0, g1, s per word
            idx_val = np.full((128, 4), EMPTY, np.int64)
            block = 0
            defer = []
            while block < BLOCKS and gq:
                wl, es, take = gq.pop()
                if slot_used[wl, 1] and slot_used[wl, 2]:
                    defer.append((wl, es, take))
                    continue
                gslot = 1 if not slot_used[wl, 1] else 2
                lanes = slice(8 * block, 8 * block + 8)
                buf = np.full(64, dummy, np.int64)
                buf[:take] = packed_val[es: es + take]
                tile[:, lanes] = buf.reshape(8, 8)
                slot_used[wl, gslot] = True
                idx_val[wl, gslot] = 8 * block
                block += 1
            gq.extend(reversed(defer))
            # pair partials into the remaining blocks
            while block < BLOCKS and pq:
                wl1, k1, es1, r1 = pq.pop()          # largest k
                b0 = 8 * block
                buf = np.full(8 * k1, dummy, np.int64)
                buf[:r1] = packed_val[es1: es1 + r1]
                tile[:, b0: b0 + k1] = buf.reshape(k1, 8).T
                # prefix placement for the first chunk
                slot_used[wl1, 0] = True
                idx_val[wl1, 0] = b0 + k1 - 1
                # find the largest partner fitting the remaining lanes
                partner = None
                for i in range(len(pq) - 1, -1, -1):
                    if pq[i][1] <= 8 - k1:
                        partner = pq.pop(i)
                        break
                if partner is not None:
                    wl2, k2, es2, r2 = partner
                    buf = np.full(8 * k2, dummy, np.int64)
                    buf[:r2] = packed_val[es2: es2 + r2]
                    tile[:, b0 + 8 - k2: b0 + 8] = buf.reshape(k2, 8).T
                    slot_used[wl2, 3] = True
                    idx_val[wl2, 3] = b0 + 8 - k2
                block += 1
            idx = (idx_val[:, 0] | (idx_val[:, 1] << 8)
                   | (idx_val[:, 2] << 16) | (idx_val[:, 3] << 24))
            pk_tiles_list.append(tile)
            pk_meta.append((reg * ROWS_PER_REGION, out_row))
            pk_idx_list.append(idx)

    while pk_tiles_list and len(pk_tiles_list) % subtiles:
        pk_tiles_list.append(np.full((8, 128), dummy, np.int64))
        pk_meta.append((0, 0))
        pk_idx_list.append(np.full(128, EMPTY | (EMPTY << 8)
                                   | (EMPTY << 16) | (EMPTY << 24),
                                   np.int64))
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


def _block_masks():
    """Constant (1,128) int32 masks for the intra-block pfx/sfx OR
    ladders: mge[d][l] = -1 where l%8 >= d, mle[d][l] = -1 where
    l%8 <= 7-d (d in 1,2,4)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % 8
    mge = {d: jnp.where(lane >= d, -1, 0) for d in (1, 2, 4)}
    mle = {d: jnp.where(lane <= 7 - d, -1, 0) for d in (1, 2, 4)}
    return mge, mle


def _pfx_sfx(red8, mge, mle):
    """Per-lane prefix/suffix OR within each 8-lane block.
    pltpu.roll(x, s)[l] = x[l-s]."""
    p = red8
    for d in (1, 2, 4):
        p = p | (pltpu.roll(p, d, axis=1) & mge[d])
    s = red8
    for d in (1, 2, 4):
        s = s | (pltpu.roll(s, 128 - d, axis=1) & mle[d])
    return p, s


def _v3_subtile(packed, idx_row, row_base, fr_ref, mge, mle, sub_iota,
                shifts, dead):
    """One 1024-edge packed subtile -> (1,128) output-word OR values."""
    src = packed & SRC_MASK
    shift = packed >> SHIFT_BITS
    active = _gather_active(src, row_base, fr_ref)
    bitval = active << shift
    red8 = bitval[0:4, :] | bitval[4:8, :]
    red8 = red8[0:2, :] | red8[2:4, :]
    red8 = red8[0:1, :] | red8[1:2, :]           # (1,128) per-lane OR
    pfx, sfx = _pfx_sfx(red8, mge, mle)
    # op rows: 0..1 prefix-OR, 2..7 suffix-OR
    op = jnp.where(sub_iota < 2, jnp.broadcast_to(pfx, (8, 128)),
                   jnp.broadcast_to(sfx, (8, 128)))
    # idx slots: row0 = p, row2 = g0, row3 = g1, row4 = s; rest empty
    vb = jnp.broadcast_to(idx_row, (8, 128))
    idx = ((vb >> shifts) & 127) | dead
    res = jnp.take_along_axis(op, idx, axis=1)
    return res[0:1, :] | res[2:3, :] | res[3:4, :] | res[4:5, :]


def _v3_consts():
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    # per-row shift into the packed idx word; unused rows read slot p
    # but are forced to EMPTY by `dead`
    shifts = (jnp.where(sub_iota == 2, 8, 0)
              + jnp.where(sub_iota == 3, 16, 0)
              + jnp.where(sub_iota == 4, 24, 0))
    used = ((sub_iota == 0) | (sub_iota == 2) | (sub_iota == 3)
            | (sub_iota == 4))
    dead = jnp.where(used, 0, EMPTY)
    return sub_iota, shifts, dead


def _packed_kernel_v3(row_base_ref, out_row_ref, tile_ref, idx_ref,
                      words_ref, out_ref, *, subtiles: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    mge, mle = _block_masks()
    sub_iota, shifts, dead = _v3_consts()
    for k in range(subtiles):
        t = i * subtiles + k
        packed = tile_ref[8 * k: 8 * (k + 1), :]
        idx_row = idx_ref[k: k + 1, :]
        placed = _v3_subtile(packed, idx_row, row_base_ref[t], words_ref,
                             mge, mle, sub_iota, shifts, dead)
        r = out_row_ref[t]
        out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] | placed


# hub kernel identical to v2's — reuse it
from gunrockinst_tpu.ops.pallas_advance_v2 import _hub_kernel


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
