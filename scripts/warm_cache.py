"""Warm the persistent XLA/Mosaic compile cache for every default
bench path in one pass.  Run FIRST THING each round (the driver wipes
.bench_cache/xla between rounds; a cold mega-kernel compile through
the axon tunnel costs 5-45 min, and kernel-body edits invalidate only
the edited kernel's artifact).

Covers: mega BFS (s20 single-plan, incl. dst twin + multi dispatch),
chain kernel (grid), value kernels (add ungated, add gated, min f32
const-w, min i32), BC planes, and the s22 split-plan path if
BENCH_WARM_S22=1 (slow: ~10 min of plan build + upload alone).

Usage: python scripts/warm_cache.py [&]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from gunrockinst_tpu.graph.rmat import rmat_graph
    csr = rmat_graph(20, 16, undirected=True, seed=42, cache_dir=CACHE)
    src = int(np.argmax(csr.degrees))
    t0 = time.time()

    from gunrockinst_tpu.primitives import bfs_pallas
    fn = bfs_pallas.get_fused_bfs_multi(csr, reps=64)
    srcs = np.argsort(-csr.degrees, kind="stable")[:64].astype(np.int32)
    fn(srcs)
    log(f"mega BFS multi warm ({time.time()-t0:.0f}s)")

    from gunrockinst_tpu.primitives import pr, sssp, cc, bc
    for name, call in (
            ("pr/add", lambda: pr.run(csr, max_iter=2, mode="planes")),
            ("sssp/min-f32", lambda: sssp.run(csr, src, mode="planes",
                                              mark_preds=False)),
            ("cc/min-i32", lambda: cc.run(csr, mode="planes")),
            ("bc/gated-add", lambda: bc.run(csr, src=src,
                                            mode="planes"))):
        t0 = time.time()
        try:
            call()
            log(f"{name} warm ({time.time()-t0:.0f}s)")
        except Exception as e:
            log(f"{name} FAILED: {e}")

    t0 = time.time()
    try:
        from gunrockinst_tpu.graph.lattice import grid_graph
        bfs_pallas.bfs_pallas_fused(grid_graph(1024), 0,
                                    mark_preds=False)
        log(f"grid/chain warm ({time.time()-t0:.0f}s)")
    except Exception as e:
        log(f"grid FAILED: {e}")

    if os.environ.get("BENCH_WARM_S22") == "1":
        t0 = time.time()
        try:
            c22 = rmat_graph(22, 16, undirected=True, seed=42,
                             cache_dir=CACHE)
            f22 = bfs_pallas.get_fused_bfs_multi(c22, reps=16)
            s22 = np.argsort(-c22.degrees,
                             kind="stable")[:16].astype(np.int32)
            f22(s22)
            log(f"s22 split-plan warm ({time.time()-t0:.0f}s)")
        except Exception as e:
            log(f"s22 FAILED: {e}")
    log("done")


if __name__ == "__main__":
    main()
