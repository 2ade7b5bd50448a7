"""Benchmark harness.

Prints ONE JSON line on stdout: {"metric", "value", "unit",
"vs_baseline"}.  All diagnostics go to stderr.

Headline metric (BASELINE.md): BFS traversal rate in GTEPS on a
Kronecker/R-MAT graph (soc-LiveJournal1 is not fetchable offline; the
reference's own regression set uses kron_g500 graphs of the same
family). vs_baseline is measured against the 5 GTEPS/host north star.

The headline JSON is emitted IMMEDIATELY after the BFS modes finish so
a driver-side timeout on the (much slower to cold-compile) secondary
metrics can never erase the headline number.  Secondary metrics
(PageRank, SSSP, CC rates) print to stderr afterwards, each under its
own time budget.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

SCALE = int(os.environ.get("BENCH_SCALE", "20"))
EDGE_FACTOR = int(os.environ.get("BENCH_EDGE_FACTOR", "16"))
N_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
# the tail grew in round 4 (hits/salsa/wtf planes + two BC lines);
# everything is warm-cached so this is runtime, not compile, budget —
# and the headline JSON has already printed when it starts
SECONDARY_BUDGET_S = int(os.environ.get("BENCH_SECONDARY_BUDGET",
                                        "1500"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")


class _Budget:
    """SIGALRM-based time budget for secondary metrics: a cold Pallas
    compile through the axon tunnel can take 5-20+ min; the headline
    JSON has already been printed when these run, so on expiry we just
    skip the rest."""

    class Expired(Exception):
        pass

    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        def handler(signum, frame):
            raise _Budget.Expired()
        self._old = signal.signal(signal.SIGALRM, handler)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        return False


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import numpy as np

    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.graph.csr import DeviceGraph
    from gunrockinst_tpu.primitives import bfs

    t0 = time.time()
    csr = rmat_graph(SCALE, EDGE_FACTOR, undirected=True, seed=42,
                     cache_dir=CACHE)
    log(f"# graph: rmat s{SCALE} ef{EDGE_FACTOR} -> "
        f"{csr.num_nodes} nodes, {csr.num_edges} edges "
        f"(build {time.time()-t0:.1f}s)")

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
    errors = []
    # headline-phase deadline: the .bench_cache/xla compile cache is
    # wiped between rounds, so the first run of each pallas mode is a
    # 5-45 min cold compile through the axon tunnel.  The whole mode
    # loop shares ONE deadline (alarms must not nest — SIGALRM is a
    # single timer) so the headline JSON is guaranteed to print well
    # inside the driver's overall budget no matter how many modes hang.
    headline_budget = int(os.environ.get("BENCH_HEADLINE_BUDGET_S",
                                         "2400"))
    deadline = time.time() + headline_budget
    # 64 searches per dispatch: the ~21 ms axon tunnel round trip is
    # 0.3% of the dispatch instead of 10% (measured: K=8 1.56, K=16
    # 1.66, K=32 1.76, K=64 1.80 GTEPS; device floor ~17.3 ms/search)
    K = int(os.environ.get("BENCH_REPS_PER_DISPATCH", "64"))
    for mode in modes:
        remaining = int(deadline - time.time())
        if remaining <= 60:
            errors.append(f"{mode}: headline budget exhausted")
            log(f"# mode={mode} SKIPPED: headline budget exhausted")
            continue
        try:
            with _Budget(remaining):
                if mode == "mega":
                    gteps = bfs_multi_gteps(csr, src, K)
                else:
                    target = csr if mode in ("pallas", "mega") else g
                    res = bfs.run(target, src, mark_preds=False,
                                  traversal_mode=mode)
                    for _ in range(N_RUNS - 1):
                        r2 = bfs.run(target, src, mark_preds=False,
                                     traversal_mode=mode)
                        if r2.stats.elapsed_ms < res.stats.elapsed_ms:
                            res = r2
                    gteps = res.stats.edges_visited / (
                        res.stats.elapsed_ms * 1e6)
                    log(f"# mode={mode}: {res.stats.elapsed_ms:.2f} ms, "
                        f"depth {res.stats.search_depth}, "
                        f"{res.stats.edges_visited} edges, "
                        f"{gteps:.4f} GTEPS")
        except _Budget.Expired:
            errors.append(f"{mode}: compile/run exceeded the "
                          f"{headline_budget}s headline budget")
            log(f"# mode={mode} SKIPPED: headline budget expired")
            continue
        except Exception as e:
            errors.append(f"{mode}: {e}")
            log(f"# mode={mode} FAILED: {e}")
            continue
        if best is None or gteps > best:
            best = gteps
        # modes are ordered fastest-first (mega > pallas, measured both
        # rounds); later modes are fallback insurance, not contenders —
        # skip their 5-20 min cold compiles once a number exists
        if best is not None and os.environ.get("BENCH_ALL_MODES") != "1":
            break

    # ---- guaranteed fallback: plain-XLA dense sweep compiles in
    # ~1-2 min even stone cold; a modest number beats no number ----
    if best is None:
        try:
            log("# all fast modes unavailable; falling back to dense")
            gd = DeviceGraph.build(csr, with_csc=False) if g is None else g
            with _Budget(int(os.environ.get("BENCH_FALLBACK_BUDGET_S",
                                            "600"))):
                res = bfs.run(gd, src, mark_preds=False,
                              traversal_mode="dense")
            best = res.stats.edges_visited / (res.stats.elapsed_ms * 1e6)
            log(f"# mode=dense(fallback): {res.stats.elapsed_ms:.2f} ms, "
                f"{best:.4f} GTEPS")
        except Exception as e:
            errors.append(f"dense-fallback: {e}")
            log(f"# dense fallback FAILED: {e}")

    # ---- headline JSON: print NOW, before any secondary metric ----
    if best is None:
        print(json.dumps({
            "metric": f"BFS GTEPS rmat{SCALE} (single chip)",
            "value": 0.0, "unit": "GTEPS", "vs_baseline": 0.0,
            "error": "; ".join(errors)[:500],
        }), flush=True)
        return 1
    print(json.dumps({
        "metric": f"BFS GTEPS rmat{SCALE} (single chip)",
        "value": round(best, 4),
        "unit": "GTEPS",
        "vs_baseline": round(best / 5.0, 4),
    }), flush=True)

    # ---- secondary metrics (stderr only, time-budgeted) ----
    try:
        with _Budget(SECONDARY_BUDGET_S):
            secondary(csr)
    except _Budget.Expired:
        log("# secondary metrics skipped: time budget expired")
    except Exception as e:
        log(f"# secondary metrics failed: {e}")

    # ---- scale + diameter tail (round-3 verdict item 6): an rmat-s22
    # line and a road-network-class grid line, each under its own
    # budget so a cold Mosaic compile can't eat the rest ----
    if os.environ.get("BENCH_S22", "1") == "1" and SCALE < 22:
        try:
            with _Budget(int(os.environ.get("BENCH_S22_BUDGET_S",
                                            "2700"))):
                bfs_line_for(rmat_graph(22, EDGE_FACTOR,
                                        undirected=True, seed=42,
                                        cache_dir=CACHE), "rmat-s22",
                             multi_k=16)
        except _Budget.Expired:
            log("# s22 line skipped: budget expired")
        except Exception as e:
            log(f"# s22 line failed: {e}")

    if os.environ.get("BENCH_GRID", "1") == "1":
        try:
            from gunrockinst_tpu.graph.lattice import grid_graph
            side = int(os.environ.get("BENCH_GRID_SIDE", "1024"))
            with _Budget(int(os.environ.get("BENCH_GRID_BUDGET_S",
                                            "2700"))):
                bfs_line_for(grid_graph(side), f"grid-{side}x{side}")
        except _Budget.Expired:
            log("# grid line skipped: budget expired")
        except Exception as e:
            log(f"# grid line failed: {e}")

    # ---- market-pipeline line (round-4 verdict missing #4): a
    # soc-LiveJournal1-scale .mtx (generated once and cached — the
    # bench environment has no network; LJ itself is 4.8M nodes / 69M
    # directed edges), parsed by the NATIVE mmap parser every run,
    # built, and pushed through the BFS headline path with per-search
    # oracle asserts.  Runs after the s22 line so the R=128 mega
    # kernel artifact is warm (same vertex count -> same shapes). ----
    if os.environ.get("BENCH_MARKET", "1") == "1":
        try:
            with _Budget(int(os.environ.get("BENCH_MARKET_BUDGET_S",
                                            "2700"))):
                market_line()
        except _Budget.Expired:
            log("# market line skipped: budget expired")
        except Exception as e:
            log(f"# market line failed: {e}")
    return 0


def market_line():
    """Exercise the IO layer at scale on the real chip: .mtx ->
    native parse -> CSR build -> mega BFS, exact-checked."""
    import time as _t
    import numpy as np
    from gunrockinst_tpu.graph.market import load_market
    from gunrockinst_tpu.graph.rmat import rmat_graph

    scale = int(os.environ.get("BENCH_MARKET_SCALE", "22"))
    ef = int(os.environ.get("BENCH_MARKET_EF", "8"))
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"market_s{scale}ef{ef}.mtx")
    if not os.path.exists(path):
        t0 = _t.time()
        csr = rmat_graph(scale, ef, undirected=True, seed=7,
                         cache_dir=CACHE)
        n = csr.num_nodes
        esrc = np.repeat(np.arange(n, dtype=np.int64),
                         np.diff(csr.row_offsets))
        edst = csr.col_indices.astype(np.int64)
        keep = esrc < edst           # one line per undirected pair
        u, v = esrc[keep] + 1, edst[keep] + 1
        import pandas as pd
        with open(path, "w") as f:
            f.write("%%MatrixMarket matrix coordinate pattern "
                    "symmetric\n")
            f.write(f"{n} {n} {u.shape[0]}\n")
            pd.DataFrame({"a": u, "b": v}).to_csv(
                f, sep=" ", header=False, index=False)
        log(f"# market file generated: {path} "
            f"({os.path.getsize(path) >> 20} MiB, "
            f"{_t.time()-t0:.0f}s, one-time)")
    t0 = _t.time()
    g = load_market(path, use_cache=False)   # full parse every run
    log(f"# market parse+build: {_t.time()-t0:.1f}s (native mmap "
        f"parser) -> {g.num_nodes} nodes, {g.num_edges} edges")
    bfs_line_for(g, f"market:rmat-s{scale}ef{ef}", multi_k=16)


def bfs_line_for(gcsr, name, multi_k: int = 0):
    """One exact-checked BFS line on an arbitrary graph.  multi_k > 0
    amortizes the dispatch over K distinct-source searches (like the
    headline; visited-set-exact per search); multi_k == 0 runs the
    single-search driver, which also exercises the full-plane-count
    recompile path on high-diameter graphs (bfs_pallas.get_fused_bfs)."""
    import numpy as np
    from gunrockinst_tpu.primitives import bfs_pallas
    from gunrockinst_tpu.oracles import bfs_reference

    src = int(np.argmax(gcsr.degrees))
    if multi_k:
        try:
            fn = bfs_pallas.get_fused_bfs_multi(gcsr, reps=multi_k)
            srcs = np.argsort(-gcsr.degrees,
                              kind="stable")[:multi_k].astype(np.int32)
            deps, vws, _ = fn(srcs)            # warm-up/compile
            _, vws, wall = fn(srcs)
            visited = fn.visited_of(vws[0])
            edges = int(gcsr.degrees[visited].sum())
            exact = check_multi_exact(gcsr, srcs, vws, fn)
            per = wall / multi_k
            log(f"# bfs ({name}): {per:.1f} ms/search "
                f"({multi_k} distinct sources/dispatch), depth "
                f"{int(deps[0])}, {edges} edges -> "
                f"{edges/(per*1e6):.4f} GTEPS, exact={exact} "
                f"(all {multi_k} searches)")
            assert exact, f"{name} BFS mismatch vs oracle"
            return
        except Exception as e:
            log(f"# bfs ({name}) multi-dispatch unavailable ({e}); "
                "single-search fallback")
    labels, _, depth, _ = bfs_pallas.bfs_pallas_fused(
        gcsr, src, mark_preds=False)          # warm-up/compile
    labels, _, depth, ms = bfs_pallas.bfs_pallas_fused(
        gcsr, src, mark_preds=False)
    visited = labels != np.iinfo(np.int32).max
    edges = int(gcsr.degrees[visited].sum())
    ref_l, _ = bfs_reference(gcsr, src)
    exact = bool(np.array_equal(labels, ref_l))
    log(f"# bfs ({name}): {ms:.1f} ms, depth {depth}, {edges} edges "
        f"-> {edges/(ms*1e6):.4f} GTEPS, exact={exact}")
    assert exact, f"{name} BFS mismatch vs oracle"


def check_multi_exact(csr, srcs, vws, fn):
    """Per-search visited-set exactness for a multi-source dispatch
    (round-4 advisor item: first-source-only checking).  The oracle
    visited set of a source is its connected component (the bench
    graphs are undirected), so one CPU BFS per DISTINCT component
    covers every search; component labels are cached per graph."""
    import numpy as np
    from gunrockinst_tpu.graph.relabel import (component_labels,
                                               is_symmetric)
    from gunrockinst_tpu.oracles import bfs_reference
    INF = np.iinfo(np.int32).max
    if not is_symmetric(csr):
        # directed: reachable sets differ per source even within one
        # weak component — run the oracle per source
        for i, s in enumerate(np.asarray(srcs)):
            ref_l, _ = bfs_reference(csr, int(s))
            if not np.array_equal(fn.visited_of(vws[i]), ref_l != INF):
                return False
        return True
    comp = component_labels(csr)
    ref_vis = {}
    for i, s in enumerate(np.asarray(srcs)):
        c = int(comp[int(s)])
        if c not in ref_vis:
            ref_l, _ = bfs_reference(csr, int(s))
            ref_vis[c] = ref_l != INF
        if not np.array_equal(fn.visited_of(vws[i]), ref_vis[c]):
            return False
    return True


def bfs_multi_gteps(csr, src, K):
    """Headline BFS rate: K complete searches fused into ONE dispatch
    (lax.scan of whole-search while_loops), so the ~22 ms axon tunnel
    round trip is amortized the way the reference's --iteration-num
    averaging amortizes launch overhead.  Reports median-of-dispatches
    to stderr; returns the best rate."""
    import numpy as np
    from gunrockinst_tpu.primitives import bfs_pallas

    fn = bfs_pallas.get_fused_bfs_multi(csr, reps=K)
    # K DISTINCT high-degree sources (round-3 verdict weak #7): the
    # top-K-degree vertices, so the headline is not "one source K
    # times".  The reference's --src=largestdegree picks the single
    # top vertex; --iteration-num repeats it — this is strictly harder.
    srcs = np.argsort(-csr.degrees, kind="stable")[:K].astype(np.int32)
    if srcs.shape[0] < K:
        srcs = np.resize(srcs, K)
    deps, vws, wall = fn(srcs)   # first call compiles
    walls = []
    for _ in range(max(N_RUNS, 3)):
        _, _, w = fn(srcs)
        walls.append(w)
    walls.sort()
    best, med = walls[0], walls[len(walls) // 2]
    # edges visited per search: out-degrees of the visited set
    visited = fn.visited_of(vws[0])
    edges = int(csr.degrees[visited].sum())
    # on-chip exactness gate for the driver-visible headline (round-4
    # verdict weak #3): one CPU oracle BFS against search 0's visited
    # set — the backend has documented silent-miscompile modes, so the
    # headline deserves the same assert the tail lines carry
    from gunrockinst_tpu.oracles import bfs_reference
    ref_l, _ = bfs_reference(csr, int(srcs[0]))
    exact = bool(np.array_equal(visited,
                                ref_l != np.iinfo(np.int32).max))
    gteps = edges / (best / K) / 1e6
    spread = (walls[-1] - walls[0]) / max(med, 1e-9)
    log(f"# mode=mega: {K} searches/dispatch, best {best:.2f} ms "
        f"({best/K:.2f} ms/search), median {med:.2f}, spread "
        f"{spread*100:.1f}%, depth {int(deps[0])}, {edges} edges, "
        f"{gteps:.4f} GTEPS, exact={exact}")
    assert exact, "headline BFS visited set mismatch vs oracle"
    return gteps


def secondary(csr):
    """PageRank / SSSP / CC throughput lines (stderr) — value-plane
    kernel modes (ops/pallas_value.py) with XLA fallbacks.  Round 5:
    every line carries an on-chip correctness check against a host
    oracle (the reference gates every test on CompareResults the same
    way, gunrock/util/test_utils.h:280); validation wall time is
    outside each metric's timed window."""
    import numpy as np

    validate = os.environ.get("BENCH_VALIDATE", "1") == "1"

    # NOTE: every section below re-raises _Budget.Expired — swallowing
    # it in a section's generic handler would disarm the secondary
    # time budget for all later sections (seen in round-5 probe runs)

    if os.environ.get("BENCH_PR", "1") == "1":
        try:
            from gunrockinst_tpu.primitives import pr
            try:
                res = pr.run(csr, max_iter=5, mode="planes")
                pr_mode = "planes"
            except _Budget.Expired:
                raise
            except Exception as e:
                log(f"# pagerank planes unavailable ({e}); using xla")
                res = pr.run(csr, max_iter=5, mode="xla")
                pr_mode = "xla"
            edges_proc = csr.num_edges * res.stats.search_depth
            rate = edges_proc / (res.stats.elapsed_ms * 1e6)
            extra = ""
            if validate:
                from gunrockinst_tpu.oracles import pagerank_reference
                ref = pagerank_reference(csr, 0.85, 0.01, max_iter=5)
                ok = bool(np.allclose(res.ranks, ref, rtol=1e-4,
                                      atol=1e-6))
                extra = f", allclose={ok}"
                assert ok, "pagerank mismatch vs oracle"
            log(f"# pagerank ({pr_mode}): {res.stats.elapsed_ms:.1f} ms "
                f"for {res.stats.search_depth} iters -> {rate:.4f} "
                f"G edge-updates/s{extra}")
        except _Budget.Expired:
            raise
        except Exception as e:
            log(f"# pagerank bench skipped: {e}")

    if os.environ.get("BENCH_SSSP", "1") == "1":
        try:
            from gunrockinst_tpu.primitives import sssp
            src = int(np.argmax(csr.degrees))
            try:
                res = sssp.run(csr, src, mode="planes",
                               mark_preds=False)
                s_mode = "planes"
            except _Budget.Expired:
                raise
            except Exception as e:
                log(f"# sssp planes unavailable ({e}); using sparse")
                res = sssp.run(csr, src)
                s_mode = "sparse"
            rate = csr.num_edges / (res.stats.elapsed_ms * 1e6)
            extra = ""
            if validate:
                # scipy Dijkstra (C speed); the bench graph is
                # unweighted so f64 vs f32 cannot diverge (integer
                # distances < 2^24)
                from scipy.sparse import csr_matrix
                from scipy.sparse.csgraph import dijkstra
                a = csr_matrix((np.ones(csr.num_edges, np.float32),
                                csr.col_indices, csr.row_offsets),
                               shape=(csr.num_nodes, csr.num_nodes))
                ref = dijkstra(a, indices=src, unweighted=False)
                got = np.where(np.isfinite(res.dist), res.dist, np.inf)
                ok = bool(np.array_equal(got, ref.astype(np.float32)))
                extra = f", exact={ok}"
                assert ok, "sssp distances mismatch vs Dijkstra"
            log(f"# sssp ({s_mode}): {res.stats.elapsed_ms:.1f} ms, "
                f"depth {res.stats.search_depth} -> {rate:.4f} GTEPS"
                f"{extra}")
        except _Budget.Expired:
            raise
        except Exception as e:
            log(f"# sssp bench skipped: {e}")

    if os.environ.get("BENCH_CC", "1") == "1":
        try:
            from gunrockinst_tpu.primitives import cc
            try:
                res = cc.run(csr, mode="planes")
                c_mode = "planes"
            except _Budget.Expired:
                raise
            except Exception as e:
                log(f"# cc planes unavailable ({e}); using xla")
                res = cc.run(csr)
                c_mode = "xla"
            rate = csr.num_edges / (res.stats.elapsed_ms * 1e6)
            extra = ""
            if validate:
                from gunrockinst_tpu.graph.relabel import (
                    component_labels)
                ref = component_labels(csr)
                ncc = int(ref.max()) + 1
                # same partition up to label renaming: component count
                # matches and the (ref, got) pairing is a bijection
                pairs = np.unique(np.stack(
                    [ref, res.component_ids], axis=1), axis=0)
                ok = (res.num_components == ncc
                      and pairs.shape[0] == ncc)
                extra = f", exact={bool(ok)}"
                assert ok, "cc partition mismatch vs union-find"
            log(f"# cc ({c_mode}): {res.stats.elapsed_ms:.1f} ms, "
                f"{res.num_components} components -> {rate:.4f} "
                f"G edge/s{extra}")
        except _Budget.Expired:
            raise
        except Exception as e:
            log(f"# cc bench skipped: {e}")

    if os.environ.get("BENCH_HITS", "1") == "1":
        try:
            from gunrockinst_tpu.primitives import hits
            hsrc = int(np.argmax(csr.degrees))
            res = hits.run(csr, src=hsrc, max_iter=10, mode="planes")
            rate = csr.num_edges * 2 * 10 / (res.stats.elapsed_ms * 1e6)
            extra = ""
            if validate:
                from gunrockinst_tpu.oracles import hits_reference
                ref_hub, ref_auth = hits_reference(csr, hsrc,
                                                   max_iter=10)
                ok = bool(
                    np.allclose(res.hub_ranks, ref_hub, rtol=1e-4,
                                atol=1e-6)
                    and np.allclose(res.auth_ranks, ref_auth,
                                    rtol=1e-4, atol=1e-6))
                extra = f", allclose={ok}"
                assert ok, "hits ranks mismatch vs oracle"
            log(f"# hits (planes): {res.stats.elapsed_ms:.1f} ms for "
                f"10 iters (2 sweeps each) -> {rate:.4f} "
                f"G edge-updates/s{extra}")
        except _Budget.Expired:
            raise
        except Exception as e:
            log(f"# hits bench skipped: {e}")

    if os.environ.get("BENCH_SALSA", "1") == "1":
        try:
            from gunrockinst_tpu.primitives import salsa
            res = salsa.run(csr, max_iter=10, mode="planes")
            rate = csr.num_edges * 4 * 10 / (res.stats.elapsed_ms * 1e6)
            extra = ""
            if validate:
                from gunrockinst_tpu.oracles import salsa_reference
                ref_hub, ref_auth = salsa_reference(csr, max_iter=10)
                ok = bool(
                    np.allclose(res.hub_ranks, ref_hub, rtol=1e-4,
                                atol=1e-6)
                    and np.allclose(res.auth_ranks, ref_auth,
                                    rtol=1e-4, atol=1e-6))
                extra = f", allclose={ok}"
                assert ok, "salsa ranks mismatch vs oracle"
            log(f"# salsa (planes): {res.stats.elapsed_ms:.1f} ms for "
                f"10 iters (4 sweeps each) -> {rate:.4f} "
                f"G edge-updates/s{extra}")
        except _Budget.Expired:
            raise
        except Exception as e:
            log(f"# salsa bench skipped: {e}")

    if os.environ.get("BENCH_WTF", "1") == "1":
        try:
            from gunrockinst_tpu.primitives import wtf
            res = wtf.run(csr, src=int(np.argmax(csr.degrees)),
                          cot_size=1000, mode="planes")
            ph = res.phases or {}
            log(f"# wtf (planes): {res.stats.elapsed_ms:.1f} ms "
                f"[ppr {ph.get('ppr_ms', -1):.1f} ms "
                f"({ph.get('ppr_iters', -1)} iters), cot sort "
                f"{ph.get('cot_sort_ms', -1):.1f} ms, salsa "
                f"{ph.get('salsa_ms', -1):.1f} ms]")
        except _Budget.Expired:
            raise
        except Exception as e:
            log(f"# wtf bench skipped: {e}")

    if os.environ.get("BENCH_BC", "1") == "1":
        try:
            from gunrockinst_tpu.graph.rmat import rmat_graph
            from gunrockinst_tpu.primitives import bc
            from gunrockinst_tpu.graph.csr import DeviceGraph
            # single-source BC at benchmark scale (round-3 verdict
            # weak #8: the s14 all-source line alone hid the s20
            # single-source number).  Round 5: value-plane fast path
            # (level-gated ADD sweeps), validated against Brandes.
            src = int(np.argmax(csr.degrees))
            try:
                res1 = bc.run(csr, src=src, mode="planes")
                bc_mode = "planes"
            except _Budget.Expired:
                raise
            except Exception as e:
                log(f"# bc planes unavailable ({e}); using xla")
                g20 = DeviceGraph.build(csr, with_csc=False)
                res1 = bc.run(g20, src=src)
                bc_mode = "xla"
            rate = csr.num_edges * 2 / (res1.stats.elapsed_ms * 1e6)
            extra = ""
            if os.environ.get("BENCH_VALIDATE", "1") == "1":
                from gunrockinst_tpu.oracles.centrality import (
                    bc_reference_fast)
                ref_bc, ref_sigma, _ = bc_reference_fast(csr, src)
                ok = bool(np.allclose(res1.bc_values, ref_bc,
                                      rtol=1e-3, atol=1e-6))
                extra = f", allclose={ok}"
                assert ok, "bc values mismatch vs Brandes"
            log(f"# bc (single-source {bc_mode}, s{SCALE}): "
                f"{res1.stats.elapsed_ms:.1f} ms, depth "
                f"{res1.stats.search_depth} -> {rate:.4f} G edge/s "
                f"(fwd+bwd){extra}")
            # all-source batched BC at a smaller scale (round-2 verdict
            # item 10: record the batching win as a number; s20
            # all-sources would take hours on any backend)
            bscale = int(os.environ.get("BENCH_BC_SCALE", "14"))
            bcsr = rmat_graph(bscale, 16, undirected=True, seed=42,
                              cache_dir=CACHE)
            bg = DeviceGraph.build(bcsr, with_csc=False)
            res = bc.run(bg, src=-1)
            srcs_per_s = bcsr.num_nodes / (res.stats.elapsed_ms / 1e3)
            log(f"# bc (batched all-source, s{bscale}): "
                f"{res.stats.elapsed_ms:.1f} ms for {bcsr.num_nodes} "
                f"sources -> {srcs_per_s:.1f} sources/s")
        except _Budget.Expired:
            raise
        except Exception as e:
            log(f"# bc bench skipped: {e}")


if __name__ == "__main__":
    raise SystemExit(main())
