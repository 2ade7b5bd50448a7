"""Floor scaling: per-step pipeline cost vs SUBTILES (block size).

If the floor is a constant per grid step, large blocks amortize it and
the sweep becomes compute-bound; if it is per-byte, the DMA stream is
the wall. Run ON TPU: python scripts/microbench_floor.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 8192
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


def make_kernel(variant, subtiles):
    def kernel(out_lane_ref, tile_ref, words_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        acc = jnp.zeros((1, 128), jnp.int32)
        for k in range(subtiles):
            t = i * subtiles + k
            packed = tile_ref[8 * k: 8 * (k + 1), :]
            src = packed & SRC_MASK
            shift = packed >> SHIFT_BITS
            if variant == "floor":
                continue
            active = gather_tree(src, words_ref)
            bitval = active << shift
            v = bitval[0:4, :] | bitval[4:8, :]
            v = v[0:2, :] | v[2:4, :]
            v = v[0:1, :] | v[1:2, :]
            for sh in (64, 32, 16, 8, 4, 2, 1):
                v = v | pltpu.roll(v, sh, axis=1)
            acc = acc | jnp.where(lane_iota == out_lane_ref[t], v, 0)
        out_ref[0:1, :] = out_ref[0:1, :] | acc

    return kernel


def build(variant, subtiles):
    return pl.pallas_call(
        make_kernel(variant, subtiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T // subtiles,),
            in_specs=[
                pl.BlockSpec((8 * subtiles, 128), lambda i, *_: (i, 0),
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

    for subtiles in (4, 8, 16, 32, 64):
        for variant in ("floor", "full"):
            fn = jax.jit(build(variant, subtiles))
            r = fn(out_lane, tiles, words)
            float(jnp.sum(r))
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(out_lane, tiles, words)
            float(jnp.sum(r))
            dt = (time.perf_counter() - t0) / reps
            print(f"s={subtiles:3d} {variant:6s}: {dt*1e3:7.3f} ms "
                  f"{dt/T*1e9:7.1f} ns/subtile "
                  f"{dt/(T//subtiles)*1e6:7.2f} us/step "
                  f"{T*1024/dt/1e9:6.2f} G edge/s", flush=True)


if __name__ == "__main__":
    main()
