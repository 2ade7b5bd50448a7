"""Multi-device scaling harness.

Measures distributed BFS + PageRank edges/s at 1..D devices over the
1-D edge-partitioned mesh (the BASELINE.md "N-host scaling efficiency"
config). On this single-chip environment it runs on the virtual CPU
mesh and reports *relative* scaling of the compiled programs; on a
real pod slice the same script measures ICI scaling.

Usage: python scaling_bench.py [--scale 14] [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=12)
    ap.add_argument("--edgefactor", type=int, default=16)
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu or os.environ.get("JAX_PLATFORMS") == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gunrockinst_tpu.graph.csr import DeviceGraph
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.parallel import edge_mesh, shard_graph
    from gunrockinst_tpu.parallel.dist import bfs_dist, pagerank_push_dist

    ndev = len(jax.devices())
    device_counts = args.devices or sorted(
        {d for d in (1, 2, 4, 8) if d <= ndev})
    csr = rmat_graph(args.scale, args.edgefactor, undirected=True, seed=42)
    g = DeviceGraph.build(csr, with_csc=False)
    src = int(np.argmax(csr.degrees))
    m = csr.num_edges
    print(f"# rmat s{args.scale}: {csr.num_nodes} nodes, {m} edges; "
          f"{ndev} devices available", file=sys.stderr)

    results = []
    base_rate = None
    for d in device_counts:
        mesh = edge_mesh(d)
        sg = shard_graph(g, mesh)
        labels, _, depth = bfs_dist(sg, src, mesh, mark_preds=False)
        visited = np.asarray(labels)[: sg.n] != np.iinfo(np.int32).max
        edges_visited = int(np.diff(csr.row_offsets)[visited].sum())
        t0 = time.perf_counter()
        labels, _, depth = bfs_dist(sg, src, mesh, mark_preds=False)
        _ = int(depth)  # host fetch forces completion
        dt = time.perf_counter() - t0
        rate = edges_visited / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        results.append(dict(devices=d, bfs_meps=rate / 1e6,
                            scaling_efficiency=round(eff, 3)))
        print(f"# d={d}: {dt*1e3:.1f} ms, {rate/1e6:.1f} M edges/s, "
              f"efficiency {eff:.2f}", file=sys.stderr)

    print(json.dumps({
        "metric": f"distributed BFS scaling rmat{args.scale}",
        "results": results,
    }))


if __name__ == "__main__":
    main()
