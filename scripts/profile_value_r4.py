"""Round-4 profiling: split the value-plane cost into kernel sweep vs
XLA glue on the real chip, and report plan statistics.

Usage: python scripts/profile_value_r4.py [scale]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 20
CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(CACHE, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from gunrockinst_tpu.graph.rmat import rmat_graph
    from gunrockinst_tpu.ops.pallas_value import (
        ValueStepper, get_unweighted_plan, bitmajor_fill_np)

    csr = rmat_graph(SCALE, 16, undirected=True, seed=42,
                     cache_dir=CACHE)
    n, m = csr.num_nodes, csr.num_edges
    print(f"# rmat s{SCALE}: n={n} m={m}")

    t0 = time.time()
    plan = get_unweighted_plan(csr)
    print(f"# plan build: {time.time()-t0:.1f}s; "
          f"hub subtiles {plan.hub_meta.shape[0]} "
          f"pk subtiles {plan.pk_meta.shape[0]} "
          f"regions {plan.num_regions}")
    # slot utilization: edges / (subtiles * 1024)
    print(f"# slot utilization: "
          f"{m / max(plan.num_subtiles * 1024, 1):.3f}")

    t0 = time.time()
    stepper = ValueStepper(plan, mode="add", f32=True, use_active=False,
                           zero_acc=True, track_changed=False)
    print(f"# stepper init (upload): {time.time()-t0:.1f}s")

    rows_w = plan.rows_w
    ones_words = jnp.asarray(
        np.full((rows_w, 128), -1, np.int32))
    acc0 = jnp.asarray(bitmajor_fill_np(0.5, rows_w))

    K = 6

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def raw_loop(scal, hbm, acc, ch, k: int):
        def body(i, a):
            a2, _ = stepper.step_with(scal, hbm, a, ch)
            return a2
        out = jax.lax.fori_loop(0, k, body, acc)
        return out, jnp.sum(out[0, :1])

    t0 = time.time()
    out, s = raw_loop(stepper.scal_args, stepper.hbm_args, acc0,
                      ones_words, K)
    float(s)
    print(f"# raw ADD-sweep x{K} (compile+run): "
          f"{(time.time()-t0)*1e3:.1f} ms")
    for _ in range(3):
        t0 = time.time()
        out, s = raw_loop(stepper.scal_args, stepper.hbm_args, acc0,
                          ones_words, K)
        float(s)
        dt = (time.time() - t0) * 1e3
        print(f"# raw ADD-sweep x{K}: {dt:.1f} ms "
              f"({dt/K:.1f} ms/sweep, "
              f"{m*K/(dt*1e6):.3f} G edge/s)")

    # full PR planes for comparison (glue included)
    from gunrockinst_tpu.primitives import pr
    fn = pr.get_pr_planes(csr)
    ranks, it, ms = fn(0.85, 0.01, -1, 50)
    ranks, it, ms = fn(0.85, 0.01, -1, 50)
    print(f"# pr planes: {ms:.1f} ms for {it} iters "
          f"({ms/max(it,1):.1f} ms/iter) -> glue = "
          f"{ms/max(it,1) - (dt/K):.1f} ms/iter")

    # sssp / cc planes: report iteration counts (cost = iters x sweep)
    from gunrockinst_tpu.primitives import sssp, cc
    src = int(np.argmax(csr.degrees))
    f2 = sssp.get_sssp_planes(csr)
    dist, sit, sms = f2(src)
    dist, sit, sms = f2(src)
    print(f"# sssp planes: {sms:.1f} ms, {sit} rounds "
          f"({sms/max(sit,1):.1f} ms/round)")
    f3 = cc.get_cc_planes(csr)
    comp, cit, cms = f3()
    comp, cit, cms = f3()
    print(f"# cc planes: {cms:.1f} ms, {cit} rounds "
          f"({cms/max(cit,1):.1f} ms/round)")


if __name__ == "__main__":
    main()
