"""Per-subtile compute cost: 8-row gather tree vs single-row gather.

Decides whether the v4 plan (gather_region=4096, ONE frontier row per
subtile, single take_along_axis) can beat v3 (32768, 8-row select
tree) despite its lower slot utilization.  Variants share the mega
kernel's 4-deep DMA pipeline so the number reported is the *pipelined*
cost per subtile (max of DMA and compute):

  dma_only   stream tiles, no compute        -> DMA floor
  tree8_hub  8-row select tree + hub reduce  (current mega hub)
  row1_hub   1 gather + region mask + hub reduce
  tree8_pk   8-row tree + v3 placement       (current mega pk)
  row1_pk    1 gather + mask + v3 placement

Run ON TPU: python scripts/microbench_gather.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 16384           # total subtiles
CHUNK = 64
SLOTS = 4
UNROLL = 8
GROUPS = CHUNK // UNROLL
SHIFT_BITS = 26
SRC_MASK = (1 << SHIFT_BITS) - 1
ROWS = 8


def gather_tree(src, row_base, words_ref):
    widx = src >> 5
    lane = widx & 127
    rel = (widx >> 7) - row_base
    g = jnp.zeros((8, 128), jnp.int32)
    for r in range(ROWS):
        rw = jnp.broadcast_to(words_ref[pl.ds(row_base + r, 1), :],
                              (8, 128))
        g = jnp.where(rel == r, jnp.take_along_axis(rw, lane, axis=1), g)
    return (g >> (src & 31)) & 1


def gather_row(src, row_base, words_ref):
    widx = src >> 5
    lane = widx & 127
    rw = jnp.broadcast_to(words_ref[pl.ds(row_base, 1), :], (8, 128))
    g = jnp.take_along_axis(rw, lane, axis=1)
    ok = (widx >> 7) == row_base
    return ((g >> (src & 31)) & 1) & ok


def hub_reduce(bitval, out_lane_t, lane_iota):
    v = bitval[0:4, :] | bitval[4:8, :]
    v = v[0:2, :] | v[2:4, :]
    v = v[0:1, :] | v[1:2, :]
    for sh in (64, 32, 16, 8, 4, 2, 1):
        v = v | pltpu.roll(v, sh, axis=1)
    return jnp.where(lane_iota == out_lane_t, v, 0)


def pk_reduce(bitval, idx_row, consts):
    mle, sub_iota, shifts, dead = consts
    red8 = bitval[0:4, :] | bitval[4:8, :]
    red8 = red8[0:2, :] | red8[2:4, :]
    red8 = red8[0:1, :] | red8[1:2, :]
    sfx = red8
    for d in (1, 2, 4):
        sfx = sfx | (pltpu.roll(sfx, 128 - d, axis=1) & mle[d])
    op = jnp.where(sub_iota < 4, jnp.broadcast_to(sfx, (8, 128)),
                   jnp.broadcast_to(red8, (8, 128)))
    vb = jnp.broadcast_to(idx_row, (8, 128))
    idx = ((vb >> shifts) & 127) | dead
    res = jnp.take_along_axis(op, idx, axis=1)
    return res[0:1, :] | res[1:2, :] | res[4:5, :]


def consts():
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % 8
    mle = {d: jnp.where(lane <= 7 - d, -1, 0) for d in (1, 2, 4)}
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    shifts = (jnp.where(sub_iota == 1, 8, 0)
              + jnp.where(sub_iota == 4, 16, 0))
    used = (sub_iota == 0) | (sub_iota == 1) | (sub_iota == 4)
    dead = jnp.where(used, 0, 127)
    return mle, sub_iota, shifts, dead


def make_kernel(variant):
    nchunks = T // CHUNK

    def kernel(meta_ref, tiles_hbm, idx_hbm, words_ref, out_ref,
               buf, ibuf, sems, isems):
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        cs = consts()
        out_ref[:] = jnp.zeros_like(out_ref)

        def dma(c, slot):
            return pltpu.make_async_copy(
                tiles_hbm.at[pl.ds(c * CHUNK * 8, CHUNK * 8), :],
                buf.at[slot], sems.at[slot])

        def idma(c, slot):
            return pltpu.make_async_copy(
                idx_hbm.at[pl.ds(c * CHUNK, CHUNK), :],
                ibuf.at[slot], isems.at[slot])

        for i in range(SLOTS):
            dma(i, i).start()
            idma(i, i).start()

        def body(j, acc):
            c = j // GROUPS
            g = j - c * GROUPS
            slot = c % SLOTS

            @pl.when(g == 0)
            def _():
                dma(c, slot).wait()
                idma(c, slot).wait()

            if variant != "dma_only":
                for u in range(UNROLL):
                    k = g * UNROLL + u
                    t = c * CHUNK + k
                    packed = buf.at[slot][pl.ds(8 * k, 8), :]
                    src = packed & SRC_MASK
                    shift = packed >> SHIFT_BITS
                    if variant.startswith("tree8"):
                        active = gather_tree(src, meta_ref[t], words_ref)
                    else:
                        active = gather_row(src, meta_ref[t], words_ref)
                    bitval = active << shift
                    if "hub" in variant:
                        placed = hub_reduce(bitval, meta_ref[t],
                                            lane_iota)
                    else:
                        placed = pk_reduce(
                            bitval, ibuf.at[slot][pl.ds(k, 1), :], cs)
                    if variant.endswith("rmw"):
                        # mega-style dynamic-row read-modify-write
                        r = meta_ref[t] & 7
                        out_ref[pl.ds(r, 1), :] = (
                            out_ref[pl.ds(r, 1), :] | placed)
                    else:
                        acc = acc | placed

            @pl.when((g == GROUPS - 1) & (c + SLOTS < nchunks))
            def _():
                dma(c + SLOTS, slot).start()
                idma(c + SLOTS, slot).start()
            return acc

        acc = jax.lax.fori_loop(0, nchunks * GROUPS, body,
                                jnp.zeros((1, 128), jnp.int32))
        out_ref[0:1, :] = out_ref[0:1, :] | acc

    return kernel


def build(variant):
    return pl.pallas_call(
        make_kernel(variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((SLOTS, CHUNK * 8, 128), jnp.int32),
                pltpu.VMEM((SLOTS, CHUNK, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((SLOTS,)),
                pltpu.SemaphoreType.DMA((SLOTS,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))


def main():
    rng = np.random.default_rng(0)
    # realistic src ids: within one 32768-source region starting at 0
    src = rng.integers(0, 32768, size=(T * 8, 128), dtype=np.int32)
    shift = rng.integers(0, 32, size=(T * 8, 128), dtype=np.int32)
    tiles = src | (shift << SHIFT_BITS)
    meta = rng.integers(0, ROWS, size=(T,), dtype=np.int32)
    idx = rng.integers(0, 120, size=(T, 128), dtype=np.int32)
    words = rng.integers(0, 1 << 31, size=(ROWS, 128), dtype=np.int32)
    tiles, idx, words = map(jax.device_put, (tiles, idx, words))
    meta = jax.device_put(meta)

    for variant in ("dma_only", "tree8_hub", "row1_hub", "tree8_pk",
                    "row1_pk", "tree8_hub_rmw", "tree8_pk_rmw"):
        fn = jax.jit(build(variant))
        out = fn(meta, tiles, idx, words)
        np.asarray(out)     # sync
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(meta, tiles, idx, words)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        gbs = T * 8 * 128 * 4 / dt / 1e9
        print(f"{variant:10s} {dt*1e3:7.3f} ms  {dt/T*1e9:6.1f} ns/subtile"
              f"  {gbs:5.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
