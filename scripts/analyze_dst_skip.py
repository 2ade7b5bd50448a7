"""Round-5 design probe: how much sweep work can region-granularity
skipping remove per BFS level, on the SOURCE side (current mega kernel)
vs the DESTINATION side (round-5 twin plan), under the original vertex
order vs a degree-sorted internal relabeling?

Cost proxy per level = edges whose source (src-skip) / destination
(dst-skip) super-region is active.  Super-region = 32768 vertices
(ROWS_PER_REGION * 4096), matching the mega kernel's DMA/skip
granularity.

Usage: python scripts/analyze_dst_skip.py [scale]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 20
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
REG = 32768


def main():
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.oracles import bfs_reference
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components

    csr = rmat_graph(SCALE, 16, undirected=True, seed=42,
                     cache_dir=CACHE)
    n, m = csr.num_nodes, csr.num_edges
    src = int(np.argmax(csr.degrees))
    print(f"# rmat s{SCALE}: n={n} m={m} src={src}")

    t0 = time.time()
    labels, _ = bfs_reference(csr, src)
    INF = np.iinfo(np.int32).max
    depth = int(labels[labels != INF].max())
    print(f"# oracle BFS: depth={depth} ({time.time()-t0:.1f}s)")

    A = csr_matrix((np.ones(m, np.int8), csr.col_indices,
                    csr.row_offsets), shape=(n, n))
    t0 = time.time()
    ncc, comp = connected_components(A, directed=False)
    reach = comp == comp[src]
    print(f"# components: {ncc}, |comp(src)|={int(reach.sum())} "
          f"({time.time()-t0:.1f}s)")

    esrc = np.repeat(np.arange(n, dtype=np.int64),
                     np.diff(csr.row_offsets))
    edst = csr.col_indices.astype(np.int64)

    def analyze(name, perm):
        """perm[v] = new id of vertex v (None = identity)."""
        if perm is None:
            lab, rch, es, ed = labels, reach, esrc, edst
        else:
            lab = np.full(n, INF, np.int64)
            inv = np.empty(n, np.int64)
            inv[perm] = np.arange(n)
            lab[perm] = labels          # lab[new_id] = level
            rch = np.zeros(n, bool)
            rch[perm] = reach
            es, ed = perm[esrc], perm[edst]
        sreg = es // REG
        dreg = ed // REG
        nreg = int(max(sreg.max(), dreg.max())) + 1
        # edges per (region) histograms
        s_edges = np.bincount(sreg, minlength=nreg)
        d_edges = np.bincount(dreg, minlength=nreg)
        vreg = np.arange(n) // REG
        tot_src = tot_dst = tot_best = 0
        print(f"## {name}: {nreg} super-regions")
        for d in range(depth + 1):
            # pull sweep producing level d+1: frontier = level d
            front = lab == d
            if not front.any():
                break
            visited = (lab <= d) & (lab != INF)
            # src skip: region active iff holds a frontier vertex
            s_act = np.zeros(nreg, bool)
            s_act[np.unique(vreg[front])] = True
            # dst skip: region active iff holds an unvisited reachable
            # vertex (reach = component of src)
            unv = rch & ~visited
            d_act = np.zeros(nreg, bool)
            d_act[np.unique(vreg[unv])] = True
            cs = int(s_edges[s_act].sum())
            cd = int(d_edges[d_act].sum())
            tot_src += cs
            tot_dst += cd
            tot_best += min(cs, cd)
            print(f"#  L{d}->:{int(front.sum()):>8} front, "
                  f"src {int(s_act.sum()):>3} reg {cs/m:5.2f}m | "
                  f"dst {int(d_act.sum()):>3} reg {cd/m:5.2f}m | "
                  f"best {min(cs,cd)/m:5.2f}m")
        print(f"## {name} totals: src {tot_src/m:.2f}m, "
              f"dst {tot_dst/m:.2f}m, per-level best {tot_best/m:.2f}m "
              f"(current src-only baseline {tot_src/m:.2f}m)")

    analyze("original order", None)
    # degree-sorted: highest degree -> id 0
    order = np.argsort(-csr.degrees.astype(np.int64), kind="stable")
    perm = np.empty(n, np.int64)
    perm[order] = np.arange(n)
    analyze("degree-sorted", perm)


if __name__ == "__main__":
    main()
