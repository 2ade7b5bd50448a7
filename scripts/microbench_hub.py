"""Microbenchmark: where do the pull-sweep kernel's cycles go?

Compiles several hub-kernel variants in ONE process (amortizing the
tunnel compile round trips) and times each over the same synthetic
tile stream. Variants strip one piece of work at a time:

  full       current v2 hub kernel math (select tree + folds + rolls)
  nogather   frontier gather replaced by a 1-op mask
  noreduce   select tree kept, folds+rolls dropped
  onegather  single take_along_axis on the raw 8-row region (the
             sublane==src-row layout candidate)
  floor      DMA-only body (pipeline floor)

Run ON TPU: python scripts/microbench_hub.py [num_subtiles]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBTILES = 4
ROWS = 8          # one region
T = int(sys.argv[1]) if len(sys.argv) > 1 else 8192   # subtiles
SHIFT_BITS = 26
SRC_MASK = (1 << SHIFT_BITS) - 1


def gather_tree(src, words_ref):
    widx = src >> 5
    lane = widx & 127
    rel = widx >> 7
    g = jnp.zeros((8, 128), jnp.int32)
    for r in range(ROWS):
        rw = jnp.broadcast_to(words_ref[pl.ds(r, 1), :], (8, 128))
        g = jnp.where(rel == r, jnp.take_along_axis(rw, lane, axis=1), g)
    return (g >> (src & 31)) & 1


def reduce_or_place(bitval, out_lane, lane_iota):
    v = bitval[0:4, :] | bitval[4:8, :]
    v = v[0:2, :] | v[2:4, :]
    v = v[0:1, :] | v[1:2, :]
    for sh in (64, 32, 16, 8, 4, 2, 1):
        v = v | pltpu.roll(v, sh, axis=1)
    return jnp.where(lane_iota == out_lane, v, 0)


def make_kernel(variant):
    def kernel(out_lane_ref, tile_ref, words_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        acc = jnp.zeros((1, 128), jnp.int32)
        for k in range(SUBTILES):
            t = i * SUBTILES + k
            packed = tile_ref[8 * k: 8 * (k + 1), :]
            src = packed & SRC_MASK
            shift = packed >> SHIFT_BITS
            if variant == "floor":
                continue
            if variant == "nogather":
                active = src & 1
            elif variant == "onegather":
                lane = (src >> 5) & 127
                g = jnp.take_along_axis(words_ref[0:8, :], lane, axis=1)
                active = (g >> (src & 31)) & 1
            else:
                active = gather_tree(src, words_ref)
            bitval = active << shift
            if variant == "noreduce":
                acc = acc | (bitval[0:1, :] & lane_iota)
                continue
            placed = reduce_or_place(bitval, out_lane_ref[t], lane_iota)
            if variant == "fullrmw":
                # dynamic-row read-modify-write, like the real kernel
                r = out_lane_ref[t] & 7
                out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] | placed
            else:
                acc = acc | placed
        out_ref[0:1, :] = out_ref[0:1, :] | acc

    return kernel


def build(variant):
    return pl.pallas_call(
        make_kernel(variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // SUBTILES,),
            in_specs=[
                pl.BlockSpec((8 * SUBTILES, 128), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))


def main():
    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 1 << 31, size=(T * 8, 128), dtype=np.int32)
    out_lane = rng.integers(0, 128, size=(T,), dtype=np.int32)
    words = rng.integers(0, 1 << 31, size=(ROWS, 128), dtype=np.int32)
    tiles, out_lane, words = map(jax.device_put, (tiles, out_lane, words))

    for variant in ("floor", "nogather", "onegather", "noreduce", "full",
                    "fullrmw"):
        fn = jax.jit(build(variant))
        r = fn(out_lane, tiles, words)
        float(jnp.sum(r))  # sync
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(out_lane, tiles, words)
        float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / reps
        per_sub = dt / T * 1e9
        print(f"{variant:10s}: {dt*1e3:8.3f} ms  {per_sub:8.1f} ns/subtile "
              f"{T*1024/dt/1e9:7.2f} G edge/s", flush=True)


if __name__ == "__main__":
    main()
