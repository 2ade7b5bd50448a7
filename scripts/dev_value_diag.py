"""Diagnose the s20 ADD-mode mismatch: which dsts are wrong, in what
(word, lane, bit) pattern."""
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

from gunrockinst_tpu.graph.rmat import rmat_graph
from gunrockinst_tpu.ops.pallas_value import (
    ValueStepper, build_value_plan, to_bitmajor_np, from_bitmajor_np)

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 20
csr = rmat_graph(SCALE, 16, undirected=True, seed=42, cache_dir=CACHE)
n, m = csr.num_nodes, csr.num_edges
csc = csr.transposed()
plan = build_value_plan(csc.row_offsets, csc.col_indices, n)
rows_w = plan.rows_w
print(f"n={n} hub={plan.hub_meta.shape[0]} pk={plan.pk_meta.shape[0]}",
      flush=True)

st = ValueStepper(plan, P=32, mode="add", f32=True, use_active=False,
                  zero_acc=True, track_changed=False, interpret=False)
rng = np.random.default_rng(1)
contrib = rng.uniform(0, 1, n).astype(np.float32)
acc0 = jnp.asarray(to_bitmajor_np(contrib, rows_w))
ch = jnp.full((rows_w, 128), -1, jnp.int32)
a2, _, _ = st(acc0, ch)
got = from_bitmajor_np(np.asarray(a2), n, np.float32)

es = csc.col_indices
ed = np.repeat(np.arange(n), np.diff(csc.row_offsets))
out = np.zeros(n, np.float32)
np.add.at(out, ed, contrib[es].astype(np.float32))
err = np.abs(got - out)
tol = 1e-3 + 1e-5 * np.abs(out)
bad = np.nonzero(err > tol)[0]
print(f"bad dsts: {bad.size} / {n}", flush=True)
if bad.size:
    g = bad % 32
    word = bad // 32
    lane = word % 128
    row = word // 128
    print("bit g histogram:", np.bincount(g, minlength=32).tolist())
    print("lane%8 histogram:", np.bincount(lane % 8).tolist())
    print("row histogram head:", np.bincount(row, minlength=rows_w)[:32].tolist())
    print("first 10 bad:", bad[:10].tolist())
    print("  got ", got[bad[:10]])
    print("  want", out[bad[:10]])
    print("  indeg", np.bincount(ed, minlength=n)[bad[:10]])
    # are the bad dsts hub words?
    hub_meta = plan.hub_meta
    hub_rows = (hub_meta >> 7) & 0xFFF
    hub_lanes = hub_meta & 127
    hub_words = set((int(r) * 128 + int(l))
                    for r, l in zip(hub_rows, hub_lanes))
    in_hub = sum(1 for wd in word if int(wd) in hub_words)
    print(f"bad dsts in hub words: {in_hub}/{bad.size}")
