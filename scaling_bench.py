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

    from gunrockinst_tpu.graph.coo import CooGraph
    from gunrockinst_tpu.graph.csr import CsrGraph
    from gunrockinst_tpu.parallel.dist_words import (
        bc_dist_words, bfs_dist_words, cc_dist_words, dobfs_dist_words,
        hits_dist_words, mis_dist_words, mst_dist_words,
        pagerank_dist_words, salsa_dist_words, shard_graph_by_dst,
        sssp_dist_words, topk_dist_words, wtf_dist_words)
    from gunrockinst_tpu.primitives import mst as mst_p

    # symmetrized edge set for weak-connectivity CC
    esrc_u = np.repeat(np.arange(csr.num_nodes, dtype=np.int64),
                       np.diff(csr.row_offsets))
    und = CsrGraph.from_coo(
        CooGraph(csr.num_nodes, esrc_u, csr.col_indices.astype(np.int64)),
        undirected=True)

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

        # boundary-exchange layer: measured per-device ICI egress.
        # dist.py all-reduces 2-3 replicated (n_pad,) int32 vectors per
        # level (>= 8*n_pad bytes egress); dist_words exchanges only
        # each device's OWNED next-frontier words — n_loc/8 bytes,
        # per-level traffic proportional to the bitmap, not the
        # replicated state.
        sgw = shard_graph_by_dst(csr, mesh)
        wl, _, wdepth, wtraffic = bfs_dist_words(sgw, src, mesh,
                                                 mark_preds=False)
        assert np.array_equal(np.asarray(wl)[: sg.n] != np.iinfo(
            np.int32).max, visited), "word-exchange BFS mismatch"
        t0 = time.perf_counter()
        _, _, wdepth, wtraffic = bfs_dist_words(sgw, src, mesh,
                                                mark_preds=False)
        wdt = time.perf_counter() - t0
        dense_bytes = 2 * 4 * sg.n_pad * max(int(depth), 1)

        # word-exchange byte models for the rest of the zoo (VERDICT r2
        # item 6: per-level ICI bytes proportional to owned state, not
        # the replicated vector, for >= 5 primitives)
        _, s_it, s_traffic = sssp_dist_words(sgw, src, mesh)
        _, p_traffic = pagerank_dist_words(sgw, mesh, max_iter=20)
        sgu = shard_graph_by_dst(und, mesh)
        _, c_it, c_traffic = cc_dist_words(sgu, mesh)
        _, b_depth, b_traffic = bc_dist_words(csr, src, mesh)
        _, _, do_depth, do_pulls, do_traffic = dobfs_dist_words(
            sgw, src, mesh)
        # round-4 tier: the rest of the zoo (verdict item 4 — ICI
        # bytes/device reported for ALL 12 primitives)
        _, _, h_traffic = hits_dist_words(csr, mesh, src=src,
                                          max_iter=10)
        _, _, sa_traffic = salsa_dist_words(csr, mesh, max_iter=10)
        rngp = np.random.default_rng(0)
        prio = np.zeros(sgw.n_pad, np.int32)
        prio[: csr.num_nodes] = rngp.permutation(
            csr.num_nodes).astype(np.int32)
        _, _, mi_traffic = mis_dist_words(csr, mesh, prio)
        _, _, tk_traffic = topk_dist_words(csr, mesh, 100)
        _, _, wt_traffic = wtf_dist_words(csr, mesh, src=src,
                                          cot_size=100, max_iter=10)
        wcsr = rmat_graph(args.scale, args.edgefactor, undirected=True,
                          seed=42, with_values=True)
        ces, ced, cwv = mst_p.canonical_edges(wcsr)
        _, _, _, ms_traffic = mst_dist_words(ces, ced, cwv,
                                             wcsr.num_nodes, mesh)

        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        results.append(dict(
            devices=d, bfs_meps=rate / 1e6,
            scaling_efficiency=round(eff, 3),
            words_bfs_meps=edges_visited / wdt / 1e6,
            ici_bytes_per_device=dict(
                bfs=wtraffic, sssp=s_traffic, pr=p_traffic,
                cc=c_traffic, bc=b_traffic, dobfs=do_traffic,
                hits=h_traffic, salsa=sa_traffic, mis=mi_traffic,
                topk=tk_traffic, wtf=wt_traffic, mst=ms_traffic),
            dobfs_pull_levels=f"{do_pulls}/{do_depth}",
            ici_bytes_dense_equiv=dense_bytes,
            ici_reduction=round(dense_bytes / max(wtraffic, 1), 1)))
        print(f"# d={d}: {dt*1e3:.1f} ms, {rate/1e6:.1f} M edges/s, "
              f"efficiency {eff:.2f}; word-exchange {wdt*1e3:.1f} ms, "
              f"ICI B/dev: bfs {wtraffic} sssp {s_traffic} "
              f"pr {p_traffic} cc {c_traffic} bc {b_traffic} "
              f"hits {h_traffic} salsa {sa_traffic} mis {mi_traffic} "
              f"topk {tk_traffic} wtf {wt_traffic} mst {ms_traffic} "
              f"vs {dense_bytes} B dense-bfs "
              f"({dense_bytes/max(wtraffic,1):.0f}x less)",
              file=sys.stderr)

    print(json.dumps({
        "metric": f"distributed BFS scaling rmat{args.scale}",
        "results": results,
    }))


if __name__ == "__main__":
    main()
