"""Per-level profile of the mega BFS on the real chip (round-3 item 1).

Answers VERDICT r2 'what's weak #1': where do 42.76 ms - ~26 ms of
sweeps go?  Prints, progressively:
  1. bare dispatch round-trip (jitted scalar add) -- tunnel floor
  2. fused mega BFS fn(src), 10 reps
  3. per-level step_with dispatch times (manual level loop)
  4. step with FULL frontier / EMPTY frontier (sweep bounds)
  5. K-source fused scan (amortized per-search cost)

Run: python scripts/profile_bfs_levels.py [scale]
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def log(msg):
    print(msg, flush=True)


def t_ms(f, reps=10):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        out.append((time.perf_counter() - t0) * 1e3)
    return out


def main():
    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.ops.pallas_mega import MegaStepper, build_mega_plan
    from gunrockinst_tpu.ops.pallas_advance import pack_bitmap
    from gunrockinst_tpu.primitives.bfs_pallas import get_fused_bfs

    t0 = time.time()
    csr = rmat_graph(SCALE, 16, undirected=True, seed=42, cache_dir=CACHE)
    n = csr.num_nodes
    log(f"# graph rmat s{SCALE}: n={n} m={csr.num_edges} "
        f"({time.time()-t0:.1f}s)")
    src = int(np.argmax(csr.degrees))

    # --- 1. dispatch floor ---
    one = jnp.ones((), jnp.int32)
    f_add = jax.jit(lambda x: x + 1)
    int(f_add(one))  # compile
    times = t_ms(lambda: int(f_add(one)), reps=30)
    log(f"# dispatch RT: min {min(times):.2f} med "
        f"{sorted(times)[len(times)//2]:.2f} max {max(times):.2f} ms")

    # --- 2. fused mega BFS ---
    fn = get_fused_bfs(csr, use_mega=True)
    t0 = time.time()
    labels, depth, dev_ms = fn(src)
    log(f"# fused first call (compile+run): {time.time()-t0:.1f}s, "
        f"depth={depth}, device_ms={dev_ms:.2f}")
    reps = []
    for _ in range(10):
        _, _, dev_ms = fn(src)
        reps.append(dev_ms)
    reps_s = sorted(reps)
    log(f"# fused mega x10: min {reps_s[0]:.2f} med "
        f"{reps_s[5]:.2f} max {reps_s[-1]:.2f} ms  all="
        f"{[f'{r:.1f}' for r in reps]}")
    levels_np = np.asarray(labels)
    binc = np.bincount(levels_np[levels_np < np.iinfo(np.int32).max],
                       minlength=depth + 1)
    log(f"# frontier sizes per level: {binc[:depth+2].tolist()}")

    # --- 3. per-level stepping ---
    csc = csr.transposed()
    plan = build_mega_plan(csc.row_offsets, csc.col_indices, n)
    stepper = MegaStepper(plan, planes=8)
    rows = plan.n_words // 128
    n_pad = ((n + 128) // 128) * 128

    @jax.jit
    def step_j(scal, hbm, fw, vw, pln, d):
        nfw, vw2, pln2 = stepper.step_with(scal, hbm, fw, vw, pln, d)
        return nfw, vw2, pln2, jnp.sum(nfw)

    f0 = jnp.zeros((n_pad,), jnp.bool_).at[src].set(True)
    fw = pack_bitmap(f0, plan.n_words)
    vw = fw
    pln = jnp.zeros((8 * rows, 128), jnp.int32)
    d = 1
    t0 = time.time()
    nfw, vw2, pln2, s = step_j(stepper.hub_args, stepper.pk_args,
                               fw, vw, pln, 1)
    int(s)
    log(f"# single-step compile+run: {time.time()-t0:.1f}s")
    # re-run level by level, timing each step (fresh state)
    fw, vw = pack_bitmap(f0, plan.n_words), pack_bitmap(f0, plan.n_words)
    pln = jnp.zeros((8 * rows, 128), jnp.int32)
    d = 0
    total = 0.0
    while True:
        d += 1
        t0 = time.perf_counter()
        nfw, vw, pln, s = step_j(stepper.hub_args, stepper.pk_args,
                                 fw, vw, pln, d)
        cnt = int(s)
        dt = (time.perf_counter() - t0) * 1e3
        total += dt
        log(f"# level {d}: step dispatch {dt:.2f} ms, new-frontier "
            f"words-sum {cnt}")
        fw = nfw
        if cnt == 0 or d > 12:
            break
    log(f"# per-level total (incl. per-call tunnel RT): {total:.2f} ms")

    # --- 4. bounds: full / empty frontier ---
    full_fw = jnp.full((rows, 128), -1, jnp.int32)
    empty_fw = jnp.zeros((rows, 128), jnp.int32)
    zero_vw = jnp.zeros((rows, 128), jnp.int32)
    for name, f in (("full", full_fw), ("empty", empty_fw)):
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            nfw, vw2, pln2, s = step_j(stepper.hub_args, stepper.pk_args,
                                       f, zero_vw, pln, 1)
            int(s)
            ts.append((time.perf_counter() - t0) * 1e3)
        log(f"# step({name} frontier): min {min(ts):.2f} med "
            f"{sorted(ts)[3]:.2f} ms")

    # --- 5. K-source fused scan (amortized) ---
    K = 8
    srcs = np.argsort(-np.asarray(csr.degrees))[:K].astype(np.int32)
    log(f"# compiling {K}-source fused scan ...")

    @jax.jit
    def multi(scal, hbm, srcs):
        def one(carry, s):
            f0 = jnp.zeros((n_pad,), jnp.bool_).at[s].set(True)
            fw0 = pack_bitmap(f0, plan.n_words)
            planes0 = jnp.zeros((8 * rows, 128), jnp.int32)

            def cond(c):
                pl_, fw_, vw_, dep, cont = c
                return cont & (dep < n)

            def body(c):
                pl_, fw_, vw_, dep, _ = c
                dd = dep + 1
                nfw, vw2, pl2 = stepper.step_with(scal, hbm, fw_, vw_,
                                                  pl_, dd)
                return pl2, nfw, vw2, dd, jnp.any(nfw != 0)

            pl_, fw_, vw_, dep, _ = jax.lax.while_loop(
                cond, body, (planes0, fw0, fw0, jnp.int32(0),
                             jnp.bool_(True)))
            return carry + dep, dep

        tot, deps = jax.lax.scan(one, jnp.int32(0), srcs)
        return tot, deps

    t0 = time.time()
    tot, deps = multi(stepper.hub_args, stepper.pk_args, jnp.asarray(srcs))
    int(tot)
    log(f"# multi compile+run: {time.time()-t0:.1f}s")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        tot, deps = multi(stepper.hub_args, stepper.pk_args,
                          jnp.asarray(srcs))
        int(tot)
        ts.append((time.perf_counter() - t0) * 1e3)
    log(f"# {K}-source fused: min {min(ts):.2f} ms total -> "
        f"{min(ts)/K:.2f} ms/search amortized; depths={list(map(int, deps))}")


if __name__ == "__main__":
    main()
