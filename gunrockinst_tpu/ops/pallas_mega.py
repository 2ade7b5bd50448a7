"""Mega-kernel BFS — the ENTIRE search in one pallas call.

The per-level sweepers (pallas_advance_v2/v3) are grid-step-bound:
every level pays the Mosaic pipeline floor per grid step plus a full
O(m) sweep launch.  This kernel removes both costs:

  * grid=(1,): the level loop (`lax.while_loop`) runs INSIDE the
    kernel; edge tiles stream HBM->VMEM via explicit 4-deep
    `make_async_copy` chunks (4 outstanding copies reach the ~88 GB/s
    in-kernel DMA ceiling on v5e — 2-deep gets only ~57,
    scripts/microbench_dma.py).
  * frontier / visited / next bitmaps and the bit-plane label words
    live in VMEM scratch across the whole search — zero HBM traffic
    for state between levels.
  * source-region skipping: a region (32K source vertices, 8 frontier
    word-rows) whose frontier slice is all-zero contributes nothing to
    a pull sweep, so its subtiles are neither DMA'd nor computed that
    level. Pull-OR is monotone + idempotent, which makes chunk
    OVERSHOOT correct: chunk loops round up to whole CHUNK-subtile
    chunks and spill into the next region's subtiles without masking
    (their metadata is absolute, their contribution is valid level-d
    work).

Tile placement uses the v3 scheme (pallas_advance_v3.py: hub tiles +
suffix-OR runs + per-lane singles, ~0.67 slot utilization on rmat-s20
vs v2's 0.46); the packed idx stream is one (1,128) int32 row per
subtile.  Reference parity: this is the TPU re-expression of the
reference's fused BFS hot loop (gunrock/app/bfs/bfs_enactor.cuh:
267-556 — advance+filter until the device `done` flag flips; here the
done flag is the in-VMEM frontier emptiness test, and the filter's
visited-bitmask cull is the `new = touched & ~visited` word op).
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
    REGION, ROWS_PER_REGION, SHIFT_BITS, SRC_MASK)
from gunrockinst_tpu.ops.pallas_advance_v3 import (
    EMPTY, build_pull_plan_v3, _v3_consts)

CHUNK = 64          # subtiles per DMA chunk (256 KiB edges)
SLOTS = 4           # outstanding DMAs per stream (88 GB/s knee)
UNROLL = 8          # subtiles per loop iteration (ILP)
GROUPS = CHUNK // UNROLL


def _cdiv(a, b):
    return -(-a // b)


# v5e has ~16 MiB VMEM/core; leave headroom for Mosaic's own needs.
VMEM_LIMIT_BYTES = 14 * 1024 * 1024


def mega_vmem_bytes(n: int) -> int:
    """VMEM residency of the mega kernel for an n-vertex graph: the
    bit-plane label output + visited/frontier/next word maps scale with
    n (planes*rows*512 B) on top of the fixed DMA buffers.  Crosses
    VMEM_LIMIT_BYTES near rmat s21."""
    num_regions = max(1, _cdiv(n + 1, REGION))
    rows = num_regions * ROWS_PER_REGION          # n_words // 128
    planes = max((n + 1).bit_length(), 1)
    state = (planes + 3) * rows * 128 * 4  # planes + visited + fr + nx
    bufs = (2 * SLOTS * CHUNK * 8 * 128 * 4        # hub + pk edge bufs
            + SLOTS * CHUNK * 128 * 4)             # pk idx bufs
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
    pk_idx: np.ndarray          # (Tp+pad, 128) int32 g0|g1<<8|l<<16
    pk_rs: np.ndarray


def build_mega_plan(adj_row_offsets: np.ndarray,
                    adj_col_indices: np.ndarray, n: int) -> MegaPlan:
    """Region-ranged v3 tile plan: subtiles=1 (no grid padding), plus
    per-region subtile ranges and CHUNK dummy tail padding so chunk
    overshoot stays in-bounds."""
    plan = build_pull_plan_v3(adj_row_offsets, adj_col_indices, n,
                              subtiles=1)
    R = plan.n_words // (ROWS_PER_REGION * 128)
    pad = CHUNK  # >= any chunk overshoot

    def region_ranges(row_base, count):
        regions = row_base // ROWS_PER_REGION
        rs = np.searchsorted(regions, np.arange(R + 1)).astype(np.int32)
        assert rs[-1] == count
        return rs

    def pad_meta(a, value, k):
        return np.concatenate([a, np.full(k, value, a.dtype)])

    dummy = np.int32(n)
    hub_rs = region_ranges(plan.hub_row_base, plan.num_hub)
    hub_tiles = np.concatenate(
        [plan.hub_tiles, np.full((pad * 8, 128), dummy, np.int32)])

    pk_rs = region_ranges(plan.pk_row_base, plan.num_packed)
    pk_tiles = np.concatenate(
        [plan.pk_tiles, np.full((pad * 8, 128), dummy, np.int32)])
    empty_idx = np.full((pad, 128),
                        EMPTY | (EMPTY << 8) | (EMPTY << 16), np.int32)
    pk_idx = np.concatenate([plan.pk_idx.reshape(-1, 128)
                             if plan.num_packed else
                             np.zeros((0, 128), np.int32), empty_idx])

    return MegaPlan(
        n=n, m=plan.m, n_words=plan.n_words, num_regions=R,
        planes=max((n + 1).bit_length(), 1),
        hub_tiles=hub_tiles,
        hub_row_base=pad_meta(plan.hub_row_base, 0, pad),
        hub_out_row=pad_meta(plan.hub_out_row, 0, pad),
        hub_out_lane=pad_meta(plan.hub_out_lane, 0, pad),
        hub_rs=hub_rs,
        pk_tiles=pk_tiles,
        pk_row_base=pad_meta(plan.pk_row_base, 0, pad),
        pk_out_row=pad_meta(plan.pk_out_row, 0, pad),
        pk_idx=pk_idx,
        pk_rs=pk_rs,
    )


def _gather_active(src, row_base, fr_ref):
    """8-row region select tree -> per-edge frontier bit (reads the
    in-VMEM frontier; see pallas_advance_v2._gather_active)."""
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


def _pk_subtile_v3(t, buf_ref, pibuf_ref, k, prb, por, fr_ref, nx_ref,
                   mle, sub_iota, shifts, dead):
    """k = chunk-local subtile index; v3 placement (suffix-OR runs +
    per-lane singles, pallas_advance_v3._v3_subtile)."""
    packed = buf_ref[pl.ds(8 * k, 8), :]
    src = packed & SRC_MASK
    shift = packed >> SHIFT_BITS
    active = _gather_active(src, prb[t], fr_ref)
    bitval = active << shift
    red8 = bitval[0:4, :] | bitval[4:8, :]
    red8 = red8[0:2, :] | red8[2:4, :]
    red8 = red8[0:1, :] | red8[1:2, :]
    sfx = red8
    for d in (1, 2, 4):
        sfx = sfx | (pltpu.roll(sfx, 128 - d, axis=1) & mle[d])
    op = jnp.where(sub_iota < 4, jnp.broadcast_to(sfx, (8, 128)),
                   jnp.broadcast_to(red8, (8, 128)))
    vb = jnp.broadcast_to(pibuf_ref[pl.ds(k, 1), :], (8, 128))
    idx = ((vb >> shifts) & 127) | dead
    res = jnp.take_along_axis(op, idx, axis=1)
    placed = res[0:1, :] | res[1:2, :] | res[4:5, :]
    r = por[t]
    nx_ref[pl.ds(r, 1), :] = nx_ref[pl.ds(r, 1), :] | placed


def _make_kernel(R: int, rows: int, planes: int):
    """R regions, `rows` frontier word-rows, `planes` label bit-planes."""

    def kernel(src_ref, hrb, hor, hol, hrs, prb, por, prs,     # scalars
               hub_hbm, pk_hbm, pkidx_hbm,                     # HBM
               planes_ref, visited_ref, depth_ref,             # outputs
               fr_ref, nx_ref, hbuf, pbuf, pibuf, sems):       # scratch
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        mle, sub_iota, shifts, dead = _v3_consts()

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
                hbuf.at[slot], sems.at[0, slot])

        def pk_dma(start, c, slot):
            return pltpu.make_async_copy(
                pk_hbm.at[pl.ds((start + c * CHUNK) * 8, CHUNK * 8), :],
                pbuf.at[slot], sems.at[1, slot])

        def pki_dma(start, c, slot):
            return pltpu.make_async_copy(
                pkidx_hbm.at[pl.ds(start + c * CHUNK, CHUNK), :],
                pibuf.at[slot], sems.at[2, slot])

        def hub_region(start, nchunks):
            """SLOTS-deep pipelined sweep of nchunks CHUNKs of hub
            subtiles: DMA chunk c+SLOTS at each chunk boundary, wait
            chunk c, compute its UNROLL-groups."""
            for i in range(SLOTS):
                @pl.when(i < nchunks)
                def _():
                    hub_dma(start, i, i).start()

            def body(j, _):
                c = j // GROUPS
                g = j - c * GROUPS
                slot = c % SLOTS

                @pl.when(g == 0)
                def _():
                    hub_dma(start, c, slot).wait()

                base = start + c * CHUNK + g * UNROLL
                for u in range(UNROLL):
                    _hub_subtile(base + u, hbuf.at[slot], g * UNROLL + u,
                                 hrb, hor, hol, fr_ref, nx_ref, lane_iota)

                @pl.when(g == GROUPS - 1)
                def _():
                    @pl.when(c + SLOTS < nchunks)
                    def _():
                        hub_dma(start, c + SLOTS, slot).start()
                return 0
            jax.lax.fori_loop(0, nchunks * GROUPS, body, 0)

        def pk_region(start, nchunks):
            for i in range(SLOTS):
                @pl.when(i < nchunks)
                def _():
                    pk_dma(start, i, i).start()
                    pki_dma(start, i, i).start()

            def body(j, _):
                c = j // GROUPS
                g = j - c * GROUPS
                slot = c % SLOTS

                @pl.when(g == 0)
                def _():
                    pk_dma(start, c, slot).wait()
                    pki_dma(start, c, slot).wait()

                base = start + c * CHUNK + g * UNROLL
                for u in range(UNROLL):
                    _pk_subtile_v3(base + u, pbuf.at[slot],
                                   pibuf.at[slot], g * UNROLL + u,
                                   prb, por, fr_ref, nx_ref,
                                   mle, sub_iota, shifts, dead)

                @pl.when(g == GROUPS - 1)
                def _():
                    @pl.when(c + SLOTS < nchunks)
                    def _():
                        pk_dma(start, c + SLOTS, slot).start()
                        pki_dma(start, c + SLOTS, slot).start()
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
                "use the 'pallas' (fused v3) traversal mode instead")
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
                    pltpu.VMEM((SLOTS, CHUNK * 8, 128), jnp.int32),  # hub
                    pltpu.VMEM((SLOTS, CHUNK * 8, 128), jnp.int32),  # pk
                    pltpu.VMEM((SLOTS, CHUNK, 128), jnp.int32),      # idx
                    pltpu.SemaphoreType.DMA((3, SLOTS)),
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
