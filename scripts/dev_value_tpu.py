"""On-chip smoke + timing for the value-plane kernel at rmat scale."""
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
    from gunrockinst_tpu.ops.pallas_value import (
        ValueStepper, build_value_plan, to_bitmajor_np, from_bitmajor_np,
        words_from_mask, mask_from_words)

    t0 = time.time()
    csr = rmat_graph(SCALE, 16, undirected=True, seed=42, cache_dir=CACHE)
    n, m = csr.num_nodes, csr.num_edges
    log(f"# graph s{SCALE}: n={n} m={m} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    csc = csr.transposed()
    w = np.ones(m, np.float32)
    plan = build_value_plan(csc.row_offsets, csc.col_indices, n, weights=w)
    Th = (plan.hub_meta.shape[0])
    Tp = (plan.pk_meta.shape[0])
    util = m / max((Th + Tp) * 1024, 1)
    log(f"# plan: {Th} hub + {Tp} pk subtiles, slot util {util:.3f} "
        f"({time.time()-t0:.1f}s build)")

    rows_w = plan.rows_w
    stepper = ValueStepper(plan, mode="min", f32=True,
                           use_active=True, interpret=False)
    rng = np.random.default_rng(1)
    vals = rng.uniform(0, 100, n).astype(np.float32)
    vals[rng.random(n) < 0.3] = np.inf
    changed = np.ones(n, bool)
    acc0 = jnp.asarray(to_bitmajor_np(vals, rows_w))
    ch0 = jnp.asarray(words_from_mask(changed, plan.n_words))

    @jax.jit
    def step_j(scal, hbm, acc, ch):
        a2, c2 = stepper.step_with(scal, hbm, acc, ch)
        return a2, c2, jnp.sum(c2)

    t0 = time.time()
    a2, c2, s = step_j(stepper.scal_args, stepper.hbm_args, acc0, ch0)
    int(s)
    log(f"# min-f32 sweep compile+run: {time.time()-t0:.1f}s")
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        a2, c2, s = step_j(stepper.scal_args, stepper.hbm_args, acc0, ch0)
        int(s)
        ts.append((time.perf_counter() - t0) * 1e3)
    log(f"# min-f32 full sweep: min {min(ts):.2f} med "
        f"{sorted(ts)[3]:.2f} ms (incl ~22ms dispatch)")

    # correctness vs oracle at scale
    got = from_bitmajor_np(np.asarray(a2), n, np.float32)
    esrc = csc.col_indices
    edst = np.repeat(np.arange(n), np.diff(csc.row_offsets))
    cand = (vals[esrc] + w).astype(np.float32)
    out = vals.copy()
    np.minimum.at(out, edst, cand)
    if np.array_equal(got, out):
        log("# min-f32 CORRECT at scale")
    else:
        bad = np.nonzero(got != out)[0]
        log(f"# min-f32 MISMATCH: {bad.size} verts, first {bad[:5]} "
            f"got {got[bad[:5]]} want {out[bad[:5]]}")

    # sparse-changed sweep timing (region skip)
    changed_sparse = np.zeros(n, bool)
    changed_sparse[rng.integers(0, n, 150)] = True
    chs = jnp.asarray(words_from_mask(changed_sparse, plan.n_words))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        a2, c2, s = step_j(stepper.scal_args, stepper.hbm_args, acc0, chs)
        int(s)
        ts.append((time.perf_counter() - t0) * 1e3)
    log(f"# min-f32 sparse(150)-changed sweep: min {min(ts):.2f} ms")

    # add mode (PR shape) — NOTE: unweighted plan (a weighted plan
    # would add w to every gathered contrib)
    plan_nw = build_value_plan(csc.row_offsets, csc.col_indices, n)
    stepper_a = ValueStepper(plan_nw, mode="add", f32=True,
                             use_active=False, zero_acc=True,
                             track_changed=False, interpret=False)

    @jax.jit
    def step_a(scal, hbm, acc, ch):
        a2, c2 = stepper_a.step_with(scal, hbm, acc, ch)
        return a2, jnp.sum(a2)

    contrib = rng.uniform(0, 1, n).astype(np.float32)
    acc0a = jnp.asarray(to_bitmajor_np(contrib, rows_w))
    chall = jnp.full((rows_w, 128), -1, jnp.int32)
    t0 = time.time()
    a2, s = step_a(stepper_a.scal_args, stepper_a.hbm_args, acc0a, chall)
    int(s)
    log(f"# add-f32 sweep compile+run: {time.time()-t0:.1f}s")
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        a2, s = step_a(stepper_a.scal_args, stepper_a.hbm_args, acc0a,
                       chall)
        int(s)
        ts.append((time.perf_counter() - t0) * 1e3)
    log(f"# add-f32 full sweep: min {min(ts):.2f} ms")
    got = from_bitmajor_np(np.asarray(a2), n, np.float32)
    out = np.zeros(n, np.float32)
    np.add.at(out, edst, contrib[esrc])
    rel = np.abs(got - out) / np.maximum(np.abs(out), 1e-9)
    err = np.max(rel)
    log(f"# add-f32 max rel err vs numpy: {err:.2e}")
    indeg = np.bincount(edst, minlength=n)
    for v in np.argsort(-rel)[:5]:
        log(f"#   v={v} indeg={indeg[v]} got={got[v]:.6e} "
            f"want={out[v]:.6e}")
    z = (indeg == 0) & (got != 0)
    log(f"# add-f32 zero-indeg strays: {int(z.sum())}"
        + (f" max {np.abs(got[z]).max():.3e}" if z.any() else ""))


if __name__ == "__main__":
    main()
