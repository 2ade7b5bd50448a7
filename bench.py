"""Benchmark harness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md): BFS traversal rate in GTEPS on a
Kronecker/R-MAT graph (soc-LiveJournal1 is not fetchable offline; the
reference's own regression set uses kron_g500 graphs of the same
family). vs_baseline is measured against the 5 GTEPS/host north star.
"""

from __future__ import annotations

import json
import os
import sys
import time

SCALE = int(os.environ.get("BENCH_SCALE", "20"))
EDGE_FACTOR = int(os.environ.get("BENCH_EDGE_FACTOR", "16"))
N_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")


def main():
    import jax
    import numpy as np

    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.graph.csr import DeviceGraph
    from gunrockinst_tpu.primitives import bfs
    from gunrockinst_tpu.primitives.base import INF32

    t0 = time.time()
    csr = rmat_graph(SCALE, EDGE_FACTOR, undirected=True, seed=42,
                     cache_dir=CACHE)
    print(f"# graph: rmat s{SCALE} ef{EDGE_FACTOR} -> "
          f"{csr.num_nodes} nodes, {csr.num_edges} edges "
          f"(build {time.time()-t0:.1f}s)", file=sys.stderr)

    src = int(np.argmax(csr.degrees))  # largest-degree source (ref flag)
    modes = os.environ.get("BENCH_MODES", "mega,pallas").split(",")
    g = (DeviceGraph.build(csr, with_csc=False)
         if any(m not in ("pallas", "mega") for m in modes) else None)

    # persistent compile cache: the fused pallas BFS takes minutes to
    # compile cold; cache survives across bench runs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(CACHE, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    best = None
    for mode in modes:
        target = csr if mode in ("pallas", "mega") else g
        try:
            res = bfs.run(target, src, mark_preds=False,
                          traversal_mode=mode)
        except Exception as e:
            print(f"# mode={mode} FAILED: {e}", file=sys.stderr)
            continue
        for _ in range(N_RUNS - 1):
            r2 = bfs.run(target, src, mark_preds=False, traversal_mode=mode)
            if r2.stats.elapsed_ms < res.stats.elapsed_ms:
                res = r2
        gteps = res.stats.edges_visited / (res.stats.elapsed_ms * 1e6)
        print(f"# mode={mode}: {res.stats.elapsed_ms:.2f} ms, "
              f"depth {res.stats.search_depth}, "
              f"{res.stats.edges_visited} edges, {gteps:.4f} GTEPS",
              file=sys.stderr)
        if best is None or gteps > best:
            best = gteps

    # secondary metric (stderr only): PageRank edge throughput per chip
    if os.environ.get("BENCH_PR", "1") == "1":
        try:
            from gunrockinst_tpu.primitives import pr
            res = pr.run(csr, max_iter=5, mode="pallas")
            edges_proc = csr.num_edges * res.stats.search_depth
            rate = edges_proc / (res.stats.elapsed_ms * 1e6)
            print(f"# pagerank: {res.stats.elapsed_ms:.1f} ms for "
                  f"{res.stats.search_depth} iters -> {rate:.4f} G edge-"
                  f"updates/s", file=sys.stderr)
        except Exception as e:  # secondary metric must never break bench
            print(f"# pagerank bench skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": f"BFS GTEPS rmat{SCALE} (single chip)",
        "value": round(best, 4),
        "unit": "GTEPS",
        "vs_baseline": round(best / 5.0, 4),
    }))


if __name__ == "__main__":
    main()
