"""Tutorial: run CC -> BFS -> BC on one graph and validate each
against its CPU oracle.

Parity with the reference's simple_example/simple_example.cu (CC, BFS
and BC on bips98_606.mtx with cpu_graph_lib references; prints TEST
PASSED, asserted by CTest).

Usage: python examples/simple_example.py [path/to/graph.mtx]
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import gunrockinst_tpu as gt  # noqa: E402
from gunrockinst_tpu.oracles import (bc_reference, bfs_reference,  # noqa: E402
                                     cc_reference)
from gunrockinst_tpu.primitives import bc, bfs, cc  # noqa: E402


def main() -> int:
    path = (sys.argv[1] if len(sys.argv) > 1
            else "/root/reference/simple_example/bips98_606.mtx")
    graph = gt.load_market(path, undirected=True)
    print(f"graph: {graph.num_nodes} nodes, {graph.num_edges} edges")

    ok = True

    res = cc.run(graph)
    ref = cc_reference(graph)
    good = np.array_equal(res.component_ids, ref)
    print(f"CC: {res.num_components} components "
          f"({'match' if good else 'MISMATCH'})")
    res.stats.display("cc")
    ok &= good

    # BFS from the largest-degree vertex of the biggest component
    src = int(np.argmax(graph.degrees))
    r = bfs.run(graph, src, mark_preds=True)
    labels, preds = bfs_reference(graph, src)
    good = (np.array_equal(r.labels, labels)
            and np.array_equal(r.preds, preds))
    print(f"BFS from {src}: depth {r.stats.search_depth} "
          f"({'match' if good else 'MISMATCH'})")
    r.stats.display("bfs")
    ok &= good

    rb = bc.run(graph, src=src)
    ref_bc, _, _ = bc_reference(graph, src=src)
    good = np.allclose(rb.bc_values, ref_bc, rtol=1e-4, atol=1e-5)
    print(f"BC (single source {src}): {'match' if good else 'MISMATCH'}")
    rb.stats.display("bc")
    ok &= good

    print("TEST PASSED" if ok else "TEST FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
