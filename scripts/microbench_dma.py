"""In-kernel HBM->VMEM DMA bandwidth: chunk size x outstanding copies.

Finds the DMA schedule knee for the mega kernel's edge streaming.
Run ON TPU: python scripts/microbench_dma.py
"""
import itertools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOTAL_MB = 256          # bytes streamed per kernel call


def build(chunk_rows, slots, streams=1):
    """chunk_rows: rows of (x,128) int32 per DMA; slots: in-flight DMAs
    per stream; streams: independent source arrays (hub+pk analog)."""
    total_rows = (TOTAL_MB * 1024 * 1024) // (128 * 4) // streams
    nchunks = total_rows // chunk_rows

    def kernel(*refs):
        hbm = refs[:streams]
        out_ref = refs[streams]
        bufs = refs[streams + 1: streams + 1 + streams]
        sems = refs[streams + 1 + streams]

        def dma(s, c, slot):
            return pltpu.make_async_copy(
                hbm[s].at[pl.ds(c * chunk_rows, chunk_rows), :],
                bufs[s].at[slot], sems.at[s, slot])

        nstart = min(slots, nchunks)
        for s in range(streams):
            for i in range(nstart):
                dma(s, i, i).start()
        out_ref[0, 0] = 0

        def body(c, carry):
            slot = c % slots
            for s in range(streams):
                dma(s, c, slot).wait()

                @pl.when(c + slots < nchunks)
                def _():
                    dma(s, c + slots, slot).start()
                out_ref[0, 0] = out_ref[0, 0] | bufs[s][0, 0, 0]
            return carry

        jax.lax.fori_loop(0, nchunks, body, jnp.int32(0))

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
                      for _ in range(streams)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((slots, chunk_rows, 128), jnp.int32)
                for _ in range(streams)
            ] + [pltpu.SemaphoreType.DMA((streams, slots))],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    ), total_rows, nchunks


def main():
    rng = np.random.default_rng(0)
    results = []
    combos = []
    for chunk_rows in (256, 1024, 4096):          # 128KB, 512KB, 2MB
        for slots in (2, 4, 8):
            if chunk_rows * slots * 128 * 4 > 9 * 2**20:
                continue
            combos.append((chunk_rows, slots, 1))
    combos.append((1024, 2, 2))    # two streams, db each
    combos.append((1024, 4, 2))
    for chunk_rows, slots, streams in combos:
        fn, total_rows, nchunks = build(chunk_rows, slots, streams)
        srcs = [jax.device_put(
            rng.integers(0, 1 << 31, size=(total_rows, 128),
                         dtype=np.int32)) for _ in range(streams)]
        f = jax.jit(fn)
        try:
            r = f(*srcs)
            int(r[0, 0])
        except Exception as e:
            print(f"chunk={chunk_rows:5d} slots={slots} streams={streams}: "
                  f"FAIL {str(e)[:120]}", flush=True)
            continue
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(*srcs)
        int(r[0, 0])
        dt = (time.perf_counter() - t0) / reps
        gbs = TOTAL_MB / 1024 / dt
        print(f"chunk={chunk_rows:5d} rows ({chunk_rows*512//1024:5d}KB) "
              f"slots={slots} streams={streams}: {dt*1e3:7.2f} ms "
              f"{gbs:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
