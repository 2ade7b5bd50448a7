"""Mega-kernel BFS — the ENTIRE search in one pallas call.

The v2 sweeper (pallas_advance_v2.py) is grid-step-bound: at 4
subtiles per ~1.6us pipeline step the sweep tops out near 2.6 G
edge/s no matter how cheap the per-edge math is, and every level pays
a full O(m) sweep. This kernel removes both costs:

  * grid=(1,): the level loop (`lax.while_loop`) runs INSIDE the
    kernel; edge tiles stream HBM->VMEM via explicit double-buffered
    `make_async_copy` chunks (C subtiles = C KiB per DMA), so there is
    no per-step pipeline floor at all.
  * frontier / visited / next bitmaps and the bit-plane label words
    live in VMEM scratch across the whole search — zero HBM traffic
    for state between levels.
  * source-region skipping: a region (32K source vertices, 8 frontier
    word-rows) whose frontier slice is all-zero contributes nothing to
    a pull sweep, so its subtiles are neither DMA'd nor computed that
    level. Pull-OR is monotone + idempotent, which makes chunk
    OVERSHOOT correct: chunk loops round up to whole C-subtile chunks
    and spill into the next region's subtiles without masking (their
    metadata is absolute, their contribution is valid level-d work).

Tile placement (hub / packed flavors), the packed-word bitmap gather
tree, and the `src | (dst%32)<<26` edge encoding are shared with the
v2 design — see pallas_advance_v2.py.

Measured cost anatomy on v5e (scripts/microbench_hub.py /
microbench_floor.py, rmat-s20-shaped tiles): the pipelined v2 kernel
is STEP-bound, not compute-bound — the empty-body pipeline floor is
~1.1-1.7us/step at 4 subtiles/step and grows superlinearly past 8
(s=16: ~5.1us, s=32+: tens of us), while ALL of the subtile math
(select-tree gather + folds + rolls + placement) adds only
~80-100ns/subtile on top of the floor. Hence this kernel's manual
DMA streaming: the pipelined ceiling is ~4-5 G edge/s regardless of
math; beating it requires owning the DMA schedule. Reference parity: this is the
TPU re-expression of the reference's fused BFS hot loop
(gunrock/app/bfs/bfs_enactor.cuh:267-556 — advance+filter until the
device `done` flag flips; here the done flag is the in-VMEM frontier
emptiness test, and the filter's visited-bitmask cull is the
`new = touched & ~visited` word op).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gunrockinst_tpu.ops.pallas_advance_v2 import (
    REGION, ROWS_PER_REGION, SHIFT_BITS, SRC_MASK, build_pull_plan_v2)

CHUNK = 128         # subtiles per DMA chunk (512 KiB edges)
UNROLL = 8          # subtiles per loop iteration (ILP)
GROUPS = CHUNK // UNROLL


def _cdiv(a, b):
    return -(-a // b)


# v5e has ~16 MiB VMEM/core; leave headroom for Mosaic's own needs.
VMEM_LIMIT_BYTES = 14 * 1024 * 1024


def mega_vmem_bytes(n: int) -> int:
    """VMEM residency of the mega kernel for an n-vertex graph: the
    bit-plane label output + visited/frontier/next word maps scale with
    n (planes*rows*512 B) on top of ~8.3 MiB of fixed DMA double
    buffers.  Crosses VMEM_LIMIT_BYTES near rmat s21."""
    from gunrockinst_tpu.ops.pallas_advance_v2 import REGION as _R
    num_regions = max(1, _cdiv(n + 1, _R))
    rows = num_regions * ROWS_PER_REGION          # n_words // 128
    planes = max((n + 1).bit_length(), 1)
    state = (planes + 3) * rows * 128 * 4  # planes + visited + fr + nx
    bufs = (2 * 2 * CHUNK * 8 * 128 * 4            # hub + pk double bufs
            + 2 * (CHUNK // 2) * 128 * 4)          # pk idx double buf
    return state + bufs


def mega_fits(n: int) -> bool:
    return mega_vmem_bytes(n) <= VMEM_LIMIT_BYTES


@dataclasses.dataclass
class MegaPlan:
    n: int
    m: int
    n_words: int
    num_regions: int
    planes: int
    hub_tiles: np.ndarray       # ((Th+pad)*8, 128) int32
    hub_row_base: np.ndarray    # (Th+pad,) int32
    hub_out_row: np.ndarray
    hub_out_lane: np.ndarray
    hub_rs: np.ndarray          # (R+1,) int32 region->subtile range
    pk_tiles: np.ndarray
    pk_row_base: np.ndarray
    pk_out_row: np.ndarray
    pk_idx: np.ndarray          # ((Tp+pad)/2 rows, 128) int32: packed
                                # g|l<<8|g'<<16|l'<<24 per subtile PAIR
    pk_rs: np.ndarray


def build_mega_plan(adj_row_offsets: np.ndarray,
                    adj_col_indices: np.ndarray, n: int) -> MegaPlan:
    """Region-ranged tile plan: v2 placement with subtiles=1 (no grid
    padding), plus per-region subtile ranges and CHUNK*UNROLL dummy
    tail padding so chunk overshoot stays in-bounds."""
    plan = build_pull_plan_v2(adj_row_offsets, adj_col_indices, n,
                              subtiles=1)
    R = plan.n_words // (ROWS_PER_REGION * 128)
    pad = CHUNK  # >= any chunk overshoot

    def region_ranges(row_base, count):
        # row_base = region * ROWS_PER_REGION, sorted ascending
        regions = row_base // ROWS_PER_REGION
        rs = np.searchsorted(regions, np.arange(R + 1)).astype(np.int32)
        assert rs[-1] == count
        return rs

    def pad_meta(a, value, k):
        return np.concatenate([a, np.full(k, value, a.dtype)])

    hub_rs = region_ranges(plan.hub_row_base, plan.num_hub)
    dummy = np.int32(n)  # frontier bit of vertex n is never set
    hub_tiles = np.concatenate(
        [plan.hub_tiles, np.full((pad * 8, 128), dummy, np.int32)])

    # --- packed flavor: even-align every region's subtile range (the
    # compressed idx stream pairs subtiles (2t, 2t+1); chunk bases must
    # land on pair boundaries), then pack the two used idx rows of a
    # pair into ONE int32 row: g | l<<8 | g'<<16 | l'<<24. The idx
    # stream shrinks 8x (rows 2-7 of the v2 idx block were padding).
    pk_rs0 = region_ranges(plan.pk_row_base, plan.num_packed)
    Tp = plan.num_packed
    tiles3 = plan.pk_tiles.reshape(Tp, 8, 128) if Tp else \
        np.zeros((0, 8, 128), np.int32)
    idx3 = plan.pk_idx.reshape(Tp, 8, 128) if Tp else \
        np.zeros((0, 8, 128), np.int32)
    dummy_tile = np.full((8, 128), dummy, np.int32)
    dummy_idx = np.full((8, 128), 127, np.int32)
    dummy_idx[0] = 120
    seg_tiles, seg_idx, seg_rb, seg_or = [], [], [], []
    pk_rs = np.zeros(R + 1, np.int32)
    cursor = 0
    for r in range(R):
        lo, hi = int(pk_rs0[r]), int(pk_rs0[r + 1])
        pk_rs[r] = cursor
        if cursor & 1:   # start this region's range on a pair boundary
            seg_tiles.append(dummy_tile[None])
            seg_idx.append(dummy_idx[None])
            seg_rb.append([0])
            seg_or.append([0])
            cursor += 1
            pk_rs[r] = cursor
        seg_tiles.append(tiles3[lo:hi])
        seg_idx.append(idx3[lo:hi])
        seg_rb.append(plan.pk_row_base[lo:hi])
        seg_or.append(plan.pk_out_row[lo:hi])
        cursor += hi - lo
    pk_rs[R] = cursor
    npad = pad + (cursor & 1)
    seg_tiles.append(np.broadcast_to(dummy_tile, (npad, 8, 128)))
    seg_idx.append(np.broadcast_to(dummy_idx, (npad, 8, 128)))
    seg_rb.append(np.zeros(npad, np.int32))
    seg_or.append(np.zeros(npad, np.int32))
    pk_tiles3 = np.concatenate(seg_tiles) if seg_tiles else tiles3
    pk_idx3 = np.concatenate(seg_idx)
    pk_row_base = np.concatenate(
        [np.asarray(a, np.int32) for a in seg_rb])
    pk_out_row = np.concatenate(
        [np.asarray(a, np.int32) for a in seg_or])
    Tp2 = pk_tiles3.shape[0]           # even
    g = pk_idx3[:, 0, :].astype(np.int64)   # (Tp2, 128), 0..127
    l = pk_idx3[:, 1, :].astype(np.int64)
    packed_idx = (g[0::2] | (l[0::2] << 8) | (g[1::2] << 16)
                  | (l[1::2] << 24)).astype(np.int32)   # (Tp2/2, 128)
    # pad idx rows so the last chunk's idx DMA (CHUNK/2 rows) stays
    # in-bounds
    packed_idx = np.concatenate(
        [packed_idx, np.zeros((CHUNK // 2, 128), np.int32)])

    return MegaPlan(
        n=n, m=plan.m, n_words=plan.n_words, num_regions=R,
        planes=max((n + 1).bit_length(), 1),
        hub_tiles=hub_tiles,
        hub_row_base=pad_meta(plan.hub_row_base, 0, pad),
        hub_out_row=pad_meta(plan.hub_out_row, 0, pad),
        hub_out_lane=pad_meta(plan.hub_out_lane, 0, pad),
        hub_rs=hub_rs,
        pk_tiles=pk_tiles3.reshape(Tp2 * 8, 128),
        pk_row_base=pk_row_base,
        pk_out_row=pk_out_row,
        pk_idx=packed_idx,
        pk_rs=pk_rs,
    )


def _gather_active(src, row_base, fr_ref):
    """8-row region select tree -> per-edge frontier bit (see
    pallas_advance_v2._gather_active; reads the in-VMEM frontier)."""
    widx = src >> 5
    lane = widx & 127
    rel = (widx >> 7) - row_base
    g = jnp.zeros((8, 128), jnp.int32)
    for r in range(ROWS_PER_REGION):
        rw = jnp.broadcast_to(fr_ref[pl.ds(row_base + r, 1), :], (8, 128))
        g = jnp.where(rel == r, jnp.take_along_axis(rw, lane, axis=1), g)
    return (g >> (src & 31)) & 1


def _hub_subtile(t, buf_ref, k, hrb, hor, hol, fr_ref, nx_ref, lane_iota):
    packed = buf_ref[pl.ds(8 * k, 8), :]
    src = packed & SRC_MASK
    shift = packed >> SHIFT_BITS
    active = _gather_active(src, hrb[t], fr_ref)
    bitval = active << shift
    v = bitval[0:4, :] | bitval[4:8, :]
    v = v[0:2, :] | v[2:4, :]
    v = v[0:1, :] | v[1:2, :]
    for sh in (64, 32, 16, 8, 4, 2, 1):
        v = v | pltpu.roll(v, sh, axis=1)
    placed = jnp.where(lane_iota == hol[t], v, 0)
    r = hor[t]
    nx_ref[pl.ds(r, 1), :] = nx_ref[pl.ds(r, 1), :] | placed


def _pk_subtile(t, buf_ref, pibuf_ref, k, parity, prb, por,
                fr_ref, nx_ref, sub_iota):
    """k = chunk-local subtile index; parity = k & 1 (STATIC — the
    unroll factor is even, so parity is decided by the unroll slot).
    The placement row holds g|l<<8|g'<<16|l'<<24 for the (even, odd)
    subtile pair at pibuf row k//2."""
    packed = buf_ref[pl.ds(8 * k, 8), :]
    src = packed & SRC_MASK
    shift = packed >> SHIFT_BITS
    active = _gather_active(src, prb[t], fr_ref)
    bitval = active << shift
    red8 = bitval[0:4, :] | bitval[4:8, :]
    red8 = red8[0:2, :] | red8[2:4, :]
    red8 = red8[0:1, :] | red8[1:2, :]
    redg = red8
    for sh in (1, 2, 4):
        redg = redg | pltpu.roll(redg, 128 - sh, axis=1)
    gl = pibuf_ref[pl.ds(k >> 1, 1), :] >> (parity * 16)
    idx_g = gl & 0x7F
    idx_l = (gl >> 8) & 0x7F
    op = jnp.where(sub_iota < 4, jnp.broadcast_to(redg, (8, 128)),
                   jnp.broadcast_to(red8, (8, 128)))
    idx = jnp.where(sub_iota < 4, jnp.broadcast_to(idx_g, (8, 128)),
                    jnp.broadcast_to(idx_l, (8, 128)))
    res = jnp.take_along_axis(op, idx, axis=1)
    placed = res[0:1, :] | res[4:5, :]
    r = por[t]
    nx_ref[pl.ds(r, 1), :] = nx_ref[pl.ds(r, 1), :] | placed


def _make_kernel(R: int, rows: int, planes: int):
    """R regions, `rows` frontier word-rows, `planes` label bit-planes."""

    def kernel(src_ref, hrb, hor, hol, hrs, prb, por, prs,     # scalars
               hub_hbm, pk_hbm, pkidx_hbm,                     # HBM
               planes_ref, visited_ref, depth_ref,             # outputs
               fr_ref, nx_ref, hbuf, pbuf, pibuf, sems):       # scratch
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        # --- init: frontier = {src}
        fr_ref[:] = jnp.zeros_like(fr_ref)
        s = src_ref[0]
        srow = s >> 12                       # word row (128 words/row)
        slane = (s >> 5) & 127
        fr_ref[pl.ds(srow, 1), :] = jnp.where(
            lane_iota == slane, jnp.int32(1) << (s & 31), 0)
        visited_ref[:] = fr_ref[:]
        planes_ref[:] = jnp.zeros_like(planes_ref)

        def hub_dma(start, c, slot):
            return pltpu.make_async_copy(
                hub_hbm.at[pl.ds((start + c * CHUNK) * 8, CHUNK * 8), :],
                hbuf.at[slot], sems.at[slot])

        def pk_dma(start, c, slot):
            return pltpu.make_async_copy(
                pk_hbm.at[pl.ds((start + c * CHUNK) * 8, CHUNK * 8), :],
                pbuf.at[slot], sems.at[2 + slot])

        def pki_dma(start, c, slot):
            # start is pair-aligned (even), so the packed idx rows for
            # chunk c are exactly [start//2 + c*CHUNK/2, +CHUNK/2)
            return pltpu.make_async_copy(
                pkidx_hbm.at[pl.ds((start >> 1) + c * (CHUNK // 2),
                                   CHUNK // 2), :],
                pibuf.at[slot], sems.at[4 + slot])

        def hub_region(start, nchunks):
            """Double-buffered sweep of nchunks CHUNKs of hub subtiles:
            one fori over UNROLL-subtile groups; DMA next chunk at each
            chunk boundary, wait current, compute groups."""
            @pl.when(nchunks > 0)   # a started DMA must be waited
            def _():
                hub_dma(start, 0, 0).start()

            def body(j, _):
                c = j // GROUPS
                g = j - c * GROUPS
                slot = c & 1

                @pl.when(g == 0)
                def _():
                    @pl.when(c + 1 < nchunks)
                    def _():
                        hub_dma(start, c + 1, 1 - slot).start()
                    hub_dma(start, c, slot).wait()

                base = start + c * CHUNK + g * UNROLL
                for u in range(UNROLL):
                    _hub_subtile(base + u, hbuf.at[slot], g * UNROLL + u,
                                 hrb, hor, hol, fr_ref, nx_ref, lane_iota)
                return 0
            jax.lax.fori_loop(0, nchunks * GROUPS, body, 0)

        def pk_region(start, nchunks):
            @pl.when(nchunks > 0)
            def _():
                pk_dma(start, 0, 0).start()
                pki_dma(start, 0, 0).start()

            def body(j, _):
                c = j // GROUPS
                g = j - c * GROUPS
                slot = c & 1

                @pl.when(g == 0)
                def _():
                    @pl.when(c + 1 < nchunks)
                    def _():
                        pk_dma(start, c + 1, 1 - slot).start()
                        pki_dma(start, c + 1, 1 - slot).start()
                    pk_dma(start, c, slot).wait()
                    pki_dma(start, c, slot).wait()

                base = start + c * CHUNK + g * UNROLL
                for u in range(UNROLL):
                    _pk_subtile(base + u, pbuf.at[slot], pibuf.at[slot],
                                g * UNROLL + u, u & 1, prb, por,
                                fr_ref, nx_ref, sub_iota)
                return 0
            jax.lax.fori_loop(0, nchunks * GROUPS, body, 0)

        def region(r, _):
            reg_any = jnp.any(fr_ref[pl.ds(r * ROWS_PER_REGION,
                                           ROWS_PER_REGION), :] != 0)

            @pl.when(reg_any)
            def _():
                # chunk counts round up; overshoot into the next
                # region is valid level work (monotone OR), and the
                # CHUNK-subtile dummy tail keeps the last DMA in-bounds
                hs, he = hrs[r], hrs[r + 1]
                hub_region(hs, (he - hs + CHUNK - 1) // CHUNK)
                ps, pe = prs[r], prs[r + 1]
                pk_region(ps, (pe - ps + CHUNK - 1) // CHUNK)
            return 0

        def cond(carry):
            depth, cont = carry
            return cont

        def body(carry):
            depth, _ = carry
            nx_ref[:] = jnp.zeros_like(nx_ref)
            jax.lax.fori_loop(0, R, region, 0)
            new = nx_ref[:] & ~visited_ref[:]
            visited_ref[:] = visited_ref[:] | new
            d = depth + 1
            for b in range(planes):
                @pl.when(((d >> b) & 1) == 1)
                def _():
                    planes_ref[pl.ds(b * rows, rows), :] = (
                        planes_ref[pl.ds(b * rows, rows), :] | new)
            fr_ref[:] = new
            return d, jnp.any(new != 0)

        depth, _ = jax.lax.while_loop(cond, body,
                                      (jnp.int32(0), jnp.bool_(True)))
        depth_ref[0, 0] = depth

    return kernel


class MegaBfs:
    """Whole-search BFS kernel wrapper. __call__(src) -> (bit-plane
    label words, visited words, depth)."""

    def __init__(self, plan: MegaPlan, interpret: bool = False):
        if not interpret and not mega_fits(plan.n):
            raise ValueError(
                f"mega kernel VMEM residency {mega_vmem_bytes(plan.n)} B "
                f"exceeds the {VMEM_LIMIT_BYTES} B budget for n={plan.n}; "
                "use the 'pallas' (fused v2) traversal mode instead")
        self.plan = plan
        R = plan.num_regions
        rows = plan.n_words // 128
        self.rows = rows

        self.scalar_args = (
            jax.device_put(plan.hub_row_base),
            jax.device_put(plan.hub_out_row),
            jax.device_put(plan.hub_out_lane),
            jax.device_put(plan.hub_rs),
            jax.device_put(plan.pk_row_base),
            jax.device_put(plan.pk_out_row),
            jax.device_put(plan.pk_rs),
        )
        self.hbm_args = (
            jax.device_put(plan.hub_tiles),
            jax.device_put(plan.pk_tiles),
            jax.device_put(plan.pk_idx),
        )

        kernel = _make_kernel(R, rows, plan.planes)
        self.fn = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=8,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((rows, 128), jnp.int32),   # frontier
                    pltpu.VMEM((rows, 128), jnp.int32),   # next
                    pltpu.VMEM((2, CHUNK * 8, 128), jnp.int32),  # hub db
                    pltpu.VMEM((2, CHUNK * 8, 128), jnp.int32),  # pk db
                    pltpu.VMEM((2, CHUNK // 2, 128), jnp.int32),  # idx db
                    pltpu.SemaphoreType.DMA((6,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((plan.planes * rows, 128), jnp.int32),
                jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            interpret=interpret,
        )
        self._jit = jax.jit(
            lambda src, scal, hbm: self.fn(src, *scal, *hbm))

    def __call__(self, src: int):
        src_arr = jnp.asarray([src], jnp.int32)
        planes, visited, depth = self._jit(src_arr, self.scalar_args,
                                           self.hbm_args)
        return planes, visited, depth
