"""Mega-kernel cost anatomy: serial DMA vs double-buffered DMA vs
inner-loop compute, inside a single grid=(1,) kernel.

Variants:
  dma_serial   chunk DMA -> wait, no compute
  dma_db       double-buffered chunk DMA, no compute
  fori         serial DMA + fori(CHUNK/UNROLL) subtile loop (mega v1)
  unroll       serial DMA + fully unrolled subtile compute
  db_unroll    double-buffered DMA + fully unrolled compute

Run ON TPU: python scripts/microbench_mega.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 8192            # total subtiles
CHUNK = 64
UNROLL = 4
SHIFT_BITS = 26
SRC_MASK = (1 << SHIFT_BITS) - 1
ROWS = 8


def gather_tree(src, words_ref):
    widx = src >> 5
    lane = widx & 127
    rel = widx >> 7
    g = jnp.zeros((8, 128), jnp.int32)
    for r in range(ROWS):
        rw = jnp.broadcast_to(words_ref[pl.ds(r, 1), :], (8, 128))
        g = jnp.where(rel == r, jnp.take_along_axis(rw, lane, axis=1), g)
    return (g >> (src & 31)) & 1


def subtile_math(packed, out_lane_t, words_ref, lane_iota):
    src = packed & SRC_MASK
    shift = packed >> SHIFT_BITS
    active = gather_tree(src, words_ref)
    bitval = active << shift
    v = bitval[0:4, :] | bitval[4:8, :]
    v = v[0:2, :] | v[2:4, :]
    v = v[0:1, :] | v[1:2, :]
    for sh in (64, 32, 16, 8, 4, 2, 1):
        v = v | pltpu.roll(v, sh, axis=1)
    return jnp.where(lane_iota == out_lane_t, v, 0)


def make_kernel(variant):
    nchunks = T // CHUNK

    def kernel(out_lane_ref, tiles_hbm, words_ref, out_ref, buf, sems):
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_ref[:] = jnp.zeros_like(out_ref)

        def dma(c, slot):
            return pltpu.make_async_copy(
                tiles_hbm.at[pl.ds(c * CHUNK * 8, CHUNK * 8), :],
                buf.at[slot], sems.at[slot])

        if variant.startswith("db") or variant == "dma_db":
            dma(0, 0).start()

            def body(c, acc):
                slot = c & 1

                @pl.when(c + 1 < nchunks)
                def _():
                    dma(c + 1, 1 - slot).start()
                dma(c, slot).wait()
                if variant == "db_unroll":
                    for k in range(CHUNK):
                        packed = buf.at[slot][8 * k: 8 * (k + 1), :]
                        acc = acc | subtile_math(
                            packed, out_lane_ref[c * CHUNK + k],
                            words_ref, lane_iota)
                return acc

            acc = jax.lax.fori_loop(0, nchunks, body,
                                    jnp.zeros((1, 128), jnp.int32))
            out_ref[0:1, :] = acc
            return

        def body(c, acc):
            d = dma(c, 0)
            d.start()
            d.wait()
            if variant == "fori":
                def sub(j, a):
                    for u in range(UNROLL):
                        k = j * UNROLL + u
                        packed = buf.at[0][pl.ds(8 * k, 8), :]
                        a = a | subtile_math(
                            packed, out_lane_ref[c * CHUNK + k],
                            words_ref, lane_iota)
                    return a
                acc = jax.lax.fori_loop(0, CHUNK // UNROLL, sub, acc)
            elif variant == "unroll":
                for k in range(CHUNK):
                    packed = buf.at[0][8 * k: 8 * (k + 1), :]
                    acc = acc | subtile_math(
                        packed, out_lane_ref[c * CHUNK + k],
                        words_ref, lane_iota)
            return acc

        acc = jax.lax.fori_loop(0, nchunks, body,
                                jnp.zeros((1, 128), jnp.int32))
        out_ref[0:1, :] = acc

    return kernel


def build(variant):
    return pl.pallas_call(
        make_kernel(variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK * 8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ]),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))


def main():
    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 1 << 31, size=(T * 8, 128), dtype=np.int32)
    out_lane = rng.integers(0, 128, size=(T,), dtype=np.int32)
    words = rng.integers(0, 1 << 31, size=(ROWS, 128), dtype=np.int32)
    tiles, out_lane, words = map(jax.device_put, (tiles, out_lane, words))

    for variant in ("dma_serial", "dma_db", "fori", "unroll", "db_unroll"):
        fn = jax.jit(build(variant))
        r = fn(out_lane, tiles, words)
        float(jnp.sum(r))
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(out_lane, tiles, words)
        float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / reps
        print(f"{variant:10s}: {dt*1e3:8.3f} ms  {dt/T*1e9:7.1f} ns/subtile "
              f"{T*1024/dt/1e9:6.2f} G edge/s", flush=True)


if __name__ == "__main__":
    main()
