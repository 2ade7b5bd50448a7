"""Sweep the mega BFS kernel's DMA geometry (CHUNK/SLOTS/UNROLL) on the
real chip.  Each config compiles in seconds (grid=(1,)); timing is a
full-frontier step (the fat-sweep case that dominates the search)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench_cache")

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np
import jax.numpy as jnp

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def log(m):
    print(m, flush=True)


def main():
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.ops.pallas_mega import (MegaStepper,
                                                 build_mega_plan)
    csr = rmat_graph(SCALE, 16, undirected=True, seed=42, cache_dir=CACHE)
    n = csr.num_nodes
    csc = csr.transposed()
    plan = build_mega_plan(csc.row_offsets, csc.col_indices, n)
    rows = plan.n_words // 128
    log(f"# n={n} m={csr.num_edges} hub={plan.hub_rs[-1]} "
        f"pk={plan.pk_rs[-1]} subtiles")

    full_fw = jnp.full((rows, 128), -1, jnp.int32)
    zero = jnp.zeros((rows, 128), jnp.int32)
    pln = jnp.zeros((8 * rows, 128), jnp.int32)

    configs = [
        (64, 4, 8),    # current default
        (64, 6, 8),
        (128, 4, 8),
        (128, 4, 16),
        (32, 4, 8),
        (64, 4, 16),
        (128, 6, 8),
        (256, 4, 8),
    ]
    for chunk, slots, unroll in configs:
        try:
            st = MegaStepper(plan, planes=8, chunk=chunk, slots=slots,
                             unroll=unroll)

            @jax.jit
            def step_j(scal, hbm, fw, vw, p, d, _st=st):
                nfw, vw2, p2 = _st.step_with(scal, hbm, fw, vw, p, d)
                return nfw, jnp.sum(nfw)

            t0 = time.time()
            nfw, s = step_j(st.hub_args, st.pk_args, full_fw, zero,
                            pln, 1)
            int(s)
            comp = time.time() - t0
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                nfw, s = step_j(st.hub_args, st.pk_args, full_fw, zero,
                                pln, 1)
                int(s)
                ts.append((time.perf_counter() - t0) * 1e3)
            log(f"# chunk={chunk:3d} slots={slots} unroll={unroll:2d}: "
                f"full sweep min {min(ts):7.2f} ms (compile {comp:.0f}s)")
        except Exception as e:
            log(f"# chunk={chunk} slots={slots} unroll={unroll}: "
                f"FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
