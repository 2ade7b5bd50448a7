"""Road-network BFS mode shoot-out: dense sweep vs sparse/auto.

Justifies the sparse/auto traversal path (`primitives/bfs.bfs_sparse`)
on its home turf — the high-diameter bounded-degree graph class of the
reference's regression set (`dataset/large/Makefile`: roadNet-CA,
road_usa).  On a side x side grid the search depth is 2*(side-1), so
the dense sweep does depth * m edge-gathers total while the tiered
sparse expansion does O(m) lanes over the whole search.

Usage: python scripts/bench_road.py [side] [modes]
       (default side=512 -> 262k nodes, ~1M directed edges, depth 1022)
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    modes = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["auto", "sparse", "dense"])

    from gunrockinst_tpu.graph.lattice import grid_graph
    from gunrockinst_tpu.primitives import bfs

    csr = grid_graph(side)
    print(f"# grid side={side}: {csr.num_nodes} nodes, {csr.num_edges} "
          f"edges, expected depth {2 * (side - 1)}")

    for mode in modes:
        try:
            res = bfs.run(csr, 0, mark_preds=False, traversal_mode=mode)
            best = res.stats.elapsed_ms
            for _ in range(2):
                r = bfs.run(csr, 0, mark_preds=False, traversal_mode=mode)
                best = min(best, r.stats.elapsed_ms)
            mteps = res.stats.edges_visited / (best * 1e3)
            print(f"mode={mode:7s}: {best:9.1f} ms, depth "
                  f"{res.stats.search_depth}, {mteps:8.2f} MTEPS")
        except Exception as e:
            print(f"mode={mode:7s}: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
