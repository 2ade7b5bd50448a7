"""Pallas pull-sweep kernel — the speed-of-light advance path.

Why: XLA lowers random gather/scatter on TPU to ~10-40 ns per element
(measured on v5e), capping any XLA-expressed frontier sweep at
~100 M edges/s. This kernel restructures the sweep so every per-edge
operation is a full-width VPU op:

  * Edges are preprocessed (once, on host) into 1024-edge (8,128)
    subtiles grouped by (source region, destination window):
      - source region = 32768 vertices = 8 rows of 128 packed int32
        frontier words. A frontier-bit gather is an 8-step
        broadcast + lane-gather select tree (Mosaic supports dynamic
        gather along the 128-lane axis only).
      - destination window = 512 consecutive vertices = 16 packed
        words. The OR-scatter becomes 16 masked tile-reductions
        (sublane folds + lane rotations), assembled into one 128-lane
        row written at a dynamic row offset.
  * 8 subtiles ride in each grid step ((64,128) edge blocks) to
    amortize the ~1.6 us/step pallas pipeline overhead (measured).
  * The frontier bitmap (n/32 int32 words) and the touched bitmap live
    entirely in VMEM; edge tiles stream from HBM through the pallas
    pipeline. n = 2^20 needs 132 KB per bitmap — headroom to n ~ 2^26.
  * The tile arrays are closed over by a per-plan jitted callable
    (`PullSweeper`): passing them as jit arguments re-stages them
    host->device on every call under the axon tunnel.

This is the reference's LB advance (edge_map_partitioned/kernel.cuh)
re-tiled for a vector machine: GetEdgeCounts/Scan/BinarySearch become
the host-side tile build; the per-CTA smem window becomes the source
region; atomic bitmap writes become masked OR-reductions.

The kernel computes `touched` (vertices with >=1 in-edge whose source
bit is set); label updates stay in n-sized XLA elementwise code.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_E = 1024            # edges per subtile (8 x 128)
SUBTILES = 2             # subtiles per grid step (measured optimum on
                         # v5e: 1.18 us/subtile vs 3.7 at 8 — larger
                         # batches hit in-step scheduling limits)
STEP_E = TILE_E * SUBTILES
REGION = 32768           # source vertices per region (8 word-rows)
DWIN = 512               # destination vertices per window (16 words)
ROWS_PER_REGION = REGION // 32 // 128   # = 8
WORDS_PER_WIN = DWIN // 32              # = 16


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class PullPlan:
    """Host-built tile layout for one sweep direction."""
    n: int
    m: int
    n_words: int              # packed words (multiple of 128)
    num_steps: int            # grid steps (8 subtiles each)
    src_tiles: np.ndarray     # (num_steps*64, 128) int32 absolute src ids
    dstrel_tiles: np.ndarray  # (num_steps*64, 128) int32 dst - window base
    src_row_base: np.ndarray  # (num_steps*8,) int32 region word-row base
    dst_row: np.ndarray       # (num_steps*8,) int32 output word-row
    dst_lane: np.ndarray      # (num_steps*8,) int32 first lane (mult of 16)

    @property
    def num_subtiles(self) -> int:
        return self.num_steps * SUBTILES


def build_pull_plan(adj_row_offsets: np.ndarray, adj_col_indices: np.ndarray,
                    n: int) -> PullPlan:
    """Build the tile plan from the sweep-direction adjacency: to sweep
    in-edges (pull), pass the CSC (rows = destination, cols = source).

    Edges are ordered by (src_region, dst) then cut into 1024-edge
    subtiles that never span more than one source region or one
    512-wide destination window; subtiles are padded with
    (dummy -> window base) edges that contribute identity.
    """
    m = int(adj_col_indices.shape[0])
    dst = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(adj_row_offsets)).astype(np.int64)
    src = adj_col_indices.astype(np.int64)
    num_regions = max(1, -(-(n + 1) // REGION))
    n_words = num_regions * (REGION // 32)
    dummy_src = n  # the dummy vertex's frontier bit is never set

    region = src // REGION
    win = dst // DWIN
    order = np.lexsort((dst, win, region))
    src, dst, region, win = src[order], dst[order], region[order], win[order]

    if m:
        group_change = np.ones(m, dtype=bool)
        group_change[1:] = (region[1:] != region[:-1]) | (win[1:] != win[:-1])
        idx_in_group = np.arange(m) - np.maximum.accumulate(
            np.where(group_change, np.arange(m), 0))
        tile_change = group_change | (idx_in_group % TILE_E == 0)
        tile_id = np.cumsum(tile_change) - 1
        num_subtiles = int(tile_id[-1]) + 1
    else:
        num_subtiles = 0

    num_steps = max(-(-num_subtiles // SUBTILES), 1)
    T = num_steps * SUBTILES
    src_tiles = np.full((T, TILE_E), dummy_src, dtype=np.int64)
    dstrel_tiles = np.zeros((T, TILE_E), dtype=np.int64)
    src_row_base = np.zeros(T, dtype=np.int32)
    dst_row = np.zeros(T, dtype=np.int32)
    dst_lane = np.zeros(T, dtype=np.int32)

    if m:
        pos_in_tile = np.arange(m) - np.maximum.accumulate(
            np.where(tile_change, np.arange(m), 0))
        src_tiles[tile_id, pos_in_tile] = src
        dstrel_tiles[tile_id, pos_in_tile] = dst % DWIN
        first_idx = np.nonzero(tile_change)[0]
        src_row_base[:num_subtiles] = (region[first_idx] * ROWS_PER_REGION
                                       ).astype(np.int32)
        wbase = (win[first_idx] * WORDS_PER_WIN).astype(np.int64)
        dst_row[:num_subtiles] = (wbase // 128).astype(np.int32)
        dst_lane[:num_subtiles] = (wbase % 128).astype(np.int32)

    return PullPlan(
        n=n, m=m, n_words=n_words, num_steps=num_steps,
        src_tiles=src_tiles.reshape(T * 8, 128).astype(np.int32),
        dstrel_tiles=dstrel_tiles.reshape(T * 8, 128).astype(np.int32),
        src_row_base=src_row_base, dst_row=dst_row, dst_lane=dst_lane,
    )


def _pull_kernel(src_row_base_ref, dst_row_ref, dst_lane_ref,
                 src_ref, dstrel_ref, words_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    for k in range(SUBTILES):
        t = i * SUBTILES + k
        src = src_ref[8 * k: 8 * (k + 1), :]       # (8,128)
        dstrel = dstrel_ref[8 * k: 8 * (k + 1), :]
        row_base = src_row_base_ref[t]

        widx = src >> 5
        lane = widx & 127
        rel_row = (widx >> 7) - row_base           # 0..7 within region

        gathered = jnp.zeros((8, 128), jnp.int32)
        for r in range(ROWS_PER_REGION):
            row_words = words_ref[pl.ds(row_base + r, 1), :]
            rw = jnp.broadcast_to(row_words, (8, 128))
            g = jnp.take_along_axis(rw, lane, axis=1)
            gathered = jnp.where(rel_row == r, g, gathered)

        active = (gathered >> (src & 31)) & 1
        bitval = active << (dstrel & 31)
        wsel = dstrel >> 5                          # 0..15

        out_row = jnp.zeros((1, 128), jnp.int32)
        dlane = dst_lane_ref[t]
        for wsel_k in range(WORDS_PER_WIN):
            v = jnp.where(wsel == wsel_k, bitval, 0)
            v = v[0:4, :] | v[4:8, :]
            v = v[0:2, :] | v[2:4, :]
            v = v[0:1, :] | v[1:2, :]               # (1,128)
            for sh in (64, 32, 16, 8, 4, 2, 1):
                v = v | pltpu.roll(v, sh, axis=1)   # all lanes = OR
            out_row = out_row | jnp.where(lane_iota == dlane + wsel_k, v, 0)

        drow = dst_row_ref[t]
        cur = out_ref[pl.ds(drow, 1), :]
        out_ref[pl.ds(drow, 1), :] = cur | out_row


def _pull_kernel_fused(src_row_base_ref, dst_row_ref, dst_lane_ref,
                       src_ref, dstrel_ref, words_ref, unvis_ref, out_ref):
    """Variant fusing the frontier-update filter into the sweep: takes
    an UNVISITED bitmap alongside the frontier, ANDs it into the
    output (so the result is directly the next frontier), and skips a
    subtile's entire compute when its destination window has no
    unvisited vertices — the dominant case in the last heavy levels."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    for k in range(SUBTILES):
        t = i * SUBTILES + k
        drow = dst_row_ref[t]
        dlane = dst_lane_ref[t]
        uv_row = unvis_ref[pl.ds(drow, 1), :]
        win = (lane_iota >= dlane) & (lane_iota < dlane + WORDS_PER_WIN)
        uv_win = jnp.where(win, uv_row, 0)

        @pl.when(jnp.any(uv_win != 0))
        def _(t=t, uv_win=uv_win, drow=drow, dlane=dlane):
            src = src_ref[8 * k: 8 * (k + 1), :]
            dstrel = dstrel_ref[8 * k: 8 * (k + 1), :]
            row_base = src_row_base_ref[t]
            widx = src >> 5
            lane = widx & 127
            rel_row = (widx >> 7) - row_base
            gathered = jnp.zeros((8, 128), jnp.int32)
            for r in range(ROWS_PER_REGION):
                row_words = words_ref[pl.ds(row_base + r, 1), :]
                rw = jnp.broadcast_to(row_words, (8, 128))
                g = jnp.take_along_axis(rw, lane, axis=1)
                gathered = jnp.where(rel_row == r, g, gathered)
            active = (gathered >> (src & 31)) & 1
            bitval = active << (dstrel & 31)
            wsel = dstrel >> 5
            out_row = jnp.zeros((1, 128), jnp.int32)
            for wsel_k in range(WORDS_PER_WIN):
                v = jnp.where(wsel == wsel_k, bitval, 0)
                v = v[0:4, :] | v[4:8, :]
                v = v[0:2, :] | v[2:4, :]
                v = v[0:1, :] | v[1:2, :]
                for sh in (64, 32, 16, 8, 4, 2, 1):
                    v = v | pltpu.roll(v, sh, axis=1)
                out_row = out_row | jnp.where(
                    lane_iota == dlane + wsel_k, v, 0)
            out_row = out_row & uv_win      # touched & unvisited
            cur = out_ref[pl.ds(drow, 1), :]
            out_ref[pl.ds(drow, 1), :] = cur | out_row


class PullSweeper:
    """Per-graph compiled sweep: frontier words -> touched words.

    The tile arrays are device_put once and passed as ARGUMENTS to the
    jitted sweep: closure-capturing them would inline hundreds of MB of
    constants into the lowered program (the remote compile service
    rejects the payload and compile time explodes).
    """

    def __init__(self, plan: PullPlan, interpret: bool = False):
        self.plan = plan
        self.n_words = plan.n_words
        rows = plan.n_words // 128
        self.tiles = (
            jax.device_put(plan.src_row_base),
            jax.device_put(plan.dst_row),
            jax.device_put(plan.dst_lane),
            jax.device_put(plan.src_tiles),
            jax.device_put(plan.dstrel_tiles),
        )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(plan.num_steps,),
            in_specs=[
                pl.BlockSpec((8 * SUBTILES, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8 * SUBTILES, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        self.pallas_fn = pl.pallas_call(
            _pull_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            interpret=interpret,
        )
        self.sweep = jax.jit(self.pallas_fn)

        fused_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(plan.num_steps,),
            in_specs=[
                pl.BlockSpec((8 * SUBTILES, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8 * SUBTILES, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        self.pallas_fused_fn = pl.pallas_call(
            _pull_kernel_fused,
            grid_spec=fused_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            interpret=interpret,
        )

    def sweep_fused_with(self, srb, drow, dlane, src_tiles, dstrel_tiles,
                         frontier_words, unvisited_words):
        """Traceable fused form: returns next-frontier words directly
        (touched AND unvisited), skipping fully-visited windows."""
        return self.pallas_fused_fn(srb, drow, dlane, src_tiles,
                                    dstrel_tiles, frontier_words,
                                    unvisited_words)

    def sweep_with(self, srb, drow, dlane, src_tiles, dstrel_tiles,
                   frontier_words):
        """Traceable form for embedding in larger jitted programs."""
        return self.pallas_fn(srb, drow, dlane, src_tiles, dstrel_tiles,
                              frontier_words)

    def __call__(self, frontier_words):
        return self.sweep(*self.tiles, frontier_words)


# ---- bitmap pack/unpack (XLA side, n-sized elementwise) ----

def pack_bitmap(mask, n_words: int):
    """(n_pad,) bool -> (n_words/128, 128) int32 packed words."""
    n_bits = n_words * 32
    bits = jnp.zeros((n_bits,), jnp.int32).at[: mask.shape[0]].set(
        mask.astype(jnp.int32))
    bits = bits.reshape(n_words, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
               ).astype(jnp.int32)
    words = jnp.sum(bits * weights[None, :], axis=1, dtype=jnp.int32)
    return words.reshape(n_words // 128, 128)


def unpack_bitmap(words, n_pad: int):
    """(rows,128) int32 -> (n_pad,) bool. The shift/mask/cast chain is
    fused by XLA so only the int8 intermediate materializes (4x less
    HBM traffic than an int32 one)."""
    flat = words.reshape(-1)
    shifts = jnp.arange(32, dtype=jnp.int32)
    bits = ((flat[:, None] >> shifts[None, :]) & 1).astype(jnp.int8)
    return bits.reshape(-1)[:n_pad].astype(jnp.bool_)
