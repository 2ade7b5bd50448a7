"""Instrumentation: per-iteration tracing, resumable stepping, and
algorithm-state checkpointing.

The reference's INST layer slices long-running kernels into resumable
time slices, persists a yield point, and reports per-launch progress to
an external scheduler (kernel_runtime_stats.cuh:21-29, the
`Kernelinstrumented` relaunch loops, bfs_enactor.cuh:384-505, and the
"l advance <iter> <yield_point> <elapsed>" traces,
advance/kernel.cuh:639). The TPU-native analog:

  * `ProgressTracer` — per-iteration records (iteration, frontier
    size, elapsed ms) with the reference's trace line format; feeds
    `avg_duty`-style summaries.
  * `SteppedBfs` — runs BFS in bounded slices (`max_depth` chunks):
    between slices the host can yield to other work, persist state, or
    abort — cooperative preemption at level granularity (a level is
    the natural TPU "time slice": kernels are already bounded).
  * checkpoint/restore — vertex-state pytrees to .npz and back
    (extends the reference's graph-build binary cache, csr.cuh:140,
    to algorithm state, which the reference never had).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph
from gunrockinst_tpu.ops import frontier as fr

INT_MAX = np.iinfo(np.int32).max


@dataclasses.dataclass
class TraceRecord:
    kernel: str
    iteration: int
    frontier_size: int
    elapsed_ms: float           # wall time for the slice (incl. host)
    device_ms: float = 0.0      # dispatch -> device-completion time


class ProgressTracer:
    """Collects per-iteration progress (EnactorStats + INST trace
    analog).  `avg_duty` is the reference's per-kernel duty metric
    (util/kernel_runtime_stats.cuh:226-290: kernel running time /
    lifetime): here device-ms / wall-ms summed over slices."""

    def __init__(self, verbose: bool = False):
        self.records: List[TraceRecord] = []
        self.verbose = verbose

    def record(self, kernel: str, iteration: int, frontier_size: int,
               elapsed_ms: float, device_ms: float = 0.0) -> None:
        self.records.append(
            TraceRecord(kernel, iteration, frontier_size, elapsed_ms,
                        device_ms))
        if self.verbose:
            # reference trace-line shape: "l advance <iter> <...> <elapsed>"
            duty = 100.0 * device_ms / elapsed_ms if elapsed_ms else 0.0
            print(f"l {kernel} {iteration} {frontier_size} "
                  f"{elapsed_ms:.4f} dev {device_ms:.4f} duty {duty:.1f}%")

    @property
    def total_queued(self) -> int:
        return sum(r.frontier_size for r in self.records)

    @property
    def total_elapsed_ms(self) -> float:
        return sum(r.elapsed_ms for r in self.records)

    @property
    def total_device_ms(self) -> float:
        return sum(r.device_ms for r in self.records)

    @property
    def avg_duty(self) -> float:
        """Device-time share of wall time, 0..1 (avg_duty analog)."""
        wall = self.total_elapsed_ms
        return (self.total_device_ms / wall) if wall > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        return dict(iterations=len(self.records),
                    total_queued=self.total_queued,
                    elapsed_ms=self.total_elapsed_ms,
                    device_ms=round(self.total_device_ms, 4),
                    avg_duty=round(self.avg_duty, 4))


# -- checkpoint / restore ----------------------------------------------------

def save_state(path: str, **arrays) -> None:
    """Persist named vertex-state arrays (+ scalars) to an .npz."""
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_state(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# -- stepped / resumable BFS -------------------------------------------------

@jax.jit
def _bfs_slice(graph: DeviceGraph, labels, frontier, depth, steps):
    """Run up to `steps` BFS levels from the given state."""
    esrc, edst = graph.edge_src, graph.edge_dst
    n_pad = graph.n_pad

    def cond(c):
        labels, frontier, depth, left = c
        return jnp.any(frontier) & (left > 0)

    def body(c):
        labels, frontier, depth, left = c
        active = frontier[esrc]
        cand = active & (labels[edst] == INT_MAX)
        touched = jnp.zeros((n_pad,), jnp.bool_).at[edst].max(cand)
        newf = touched & (labels == INT_MAX)
        labels = jnp.where(newf, depth + 1, labels)
        return labels, newf, depth + 1, left - 1

    labels, frontier, depth, _ = jax.lax.while_loop(
        cond, body, (labels, frontier, depth, steps))
    return labels, frontier, depth


class SteppedBfs:
    """Cooperatively-preemptible BFS: advance `slice_depth` levels per
    `step()` call; checkpoint/restore between slices.

    The reference's yield-point relaunch loop
    (`while h_yield_point < grid-1`, bfs_enactor.cuh:384) becomes
    `while not done: step()` — with the slice boundary at level
    granularity instead of CTA granularity.
    """

    def __init__(self, graph: DeviceGraph, src: int, slice_depth: int = 1,
                 tracer: Optional[ProgressTracer] = None):
        self.graph = graph
        self.slice_depth = slice_depth
        self.tracer = tracer or ProgressTracer()
        self.labels = jnp.full((graph.n_pad,), INT_MAX,
                               jnp.int32).at[src].set(0)
        self.frontier = fr.singleton_bitmap(src, graph.n_pad)
        self.depth = jnp.int32(0)
        self.done = False

    def step(self) -> bool:
        """Run one slice. Returns True while not converged.

        The wall/device split feeds ProgressTracer.avg_duty (the
        reference's kernel-running-time vs kernel-lifetime metric,
        util/kernel_runtime_stats.cuh:226-290): device_ms spans from
        the jitted call's RETURN (dispatch done, device working) to the
        completion of the forcing scalar fetch; wall time additionally
        counts the host-side dispatch/trace before it and the frontier
        bookkeeping after — so duty < 1 measures real host overhead
        instead of being 100% by construction."""
        if self.done:
            return False
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(
                f"bfs_slice_d{int(self.depth)}"):
            self.labels, self.frontier, self.depth = _bfs_slice(
                self.graph, self.labels, self.frontier, self.depth,
                jnp.int32(self.slice_depth))
            t1 = time.perf_counter()   # dispatched; device running
            size = int(fr.frontier_size(self.frontier))
        t2 = time.perf_counter()       # scalar fetch forced completion
        self.done = size == 0
        elapsed = (time.perf_counter() - t0) * 1e3
        self.tracer.record("advance", int(self.depth), size, elapsed,
                           (t2 - t1) * 1e3)
        return not self.done

    # -- persistence --------------------------------------------------------

    def checkpoint(self, path: str) -> None:
        save_state(path, labels=self.labels, frontier=self.frontier,
                   depth=self.depth)

    @staticmethod
    def resume(graph: DeviceGraph, path: str, slice_depth: int = 1,
               tracer: Optional[ProgressTracer] = None) -> "SteppedBfs":
        state = load_state(path)
        obj = SteppedBfs.__new__(SteppedBfs)
        obj.graph = graph
        obj.slice_depth = slice_depth
        obj.tracer = tracer or ProgressTracer()
        obj.labels = jnp.asarray(state["labels"])
        obj.frontier = jnp.asarray(state["frontier"])
        obj.depth = jnp.int32(int(state["depth"]))
        obj.done = bool((~np.asarray(state["frontier"])).all())
        return obj

    def run_to_completion(self):
        while self.step():
            pass
        return np.asarray(self.labels)[: self.graph.n]


# -- stepped SSSP / CC (the reference runs its INST relaunch loop for
# these enactors too: sssp_enactor.cuh, cc_enactor.cuh:300) ------------

@jax.jit
def _sssp_slice(graph: DeviceGraph, dist, pending, it, steps):
    """Up to `steps` frontier Bellman-Ford rounds (primitives/sssp.py
    bellman semantics: scatter-min relaxations from pending sources)."""
    esrc, edst, w = graph.edge_src, graph.edge_dst, graph.edge_w
    n_pad = graph.n_pad
    inf = jnp.float32(jnp.inf)

    def cond(c):
        dist, pending, it, left = c
        return jnp.any(pending) & (left > 0)

    def body(c):
        dist, pending, it, left = c
        cand = pending[esrc]
        vals = jnp.where(cand, dist[esrc] + w, inf)
        relaxed = jnp.full((n_pad,), inf).at[edst].min(vals)
        newdist = jnp.minimum(dist, relaxed)
        return newdist, newdist < dist, it + 1, left - 1

    dist, pending, it, _ = jax.lax.while_loop(
        cond, body, (dist, pending, it, steps))
    return dist, pending, it


class SteppedSssp:
    """Cooperatively-preemptible SSSP (Bellman rounds per slice)."""

    def __init__(self, graph: DeviceGraph, src: int, slice_depth: int = 1,
                 tracer: Optional[ProgressTracer] = None):
        self.graph = graph
        self.slice_depth = slice_depth
        self.tracer = tracer or ProgressTracer()
        self.dist = jnp.full((graph.n_pad,), jnp.inf,
                             jnp.float32).at[src].set(0.0)
        self.pending = jnp.zeros((graph.n_pad,), jnp.bool_
                                 ).at[src].set(True)
        self.it = jnp.int32(0)
        self.done = False

    def step(self) -> bool:
        if self.done:
            return False
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(f"sssp_slice_{int(self.it)}"):
            self.dist, self.pending, self.it = _sssp_slice(
                self.graph, self.dist, self.pending, self.it,
                jnp.int32(self.slice_depth))
            t1 = time.perf_counter()   # dispatched; device running
            size = int(jnp.sum(self.pending.astype(jnp.int32)))
        t2 = time.perf_counter()       # scalar fetch forced completion
        self.done = size == 0
        elapsed = (time.perf_counter() - t0) * 1e3
        self.tracer.record("relax", int(self.it), size, elapsed,
                           (t2 - t1) * 1e3)
        return not self.done

    def checkpoint(self, path: str) -> None:
        save_state(path, dist=self.dist, pending=self.pending, it=self.it)

    def run_to_completion(self):
        while self.step():
            pass
        return np.asarray(self.dist)[: self.graph.n]


@jax.jit
def _cc_slice(graph: DeviceGraph, comp, it, steps):
    """Up to `steps` hook + double pointer-jump rounds
    (primitives/cc.py semantics)."""
    esrc, edst = graph.edge_src, graph.edge_dst

    def cond(c):
        comp, changed, it, left = c
        return changed & (left > 0)

    def body(c):
        comp, _, it, left = c
        hook = comp.at[edst].min(comp[esrc]).at[esrc].min(comp[edst])
        hook = hook[hook]
        hook = hook[hook]
        return hook, jnp.any(hook != comp), it + 1, left - 1

    comp, changed, it, _ = jax.lax.while_loop(
        cond, body, (comp, jnp.bool_(True), it, steps))
    return comp, changed, it


class SteppedCc:
    """Cooperatively-preemptible connected components."""

    def __init__(self, graph: DeviceGraph, slice_depth: int = 1,
                 tracer: Optional[ProgressTracer] = None):
        self.graph = graph
        self.slice_depth = slice_depth
        self.tracer = tracer or ProgressTracer()
        self.comp = jnp.arange(graph.n_pad, dtype=jnp.int32)
        self.it = jnp.int32(0)
        self.done = False

    def step(self) -> bool:
        if self.done:
            return False
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(f"cc_slice_{int(self.it)}"):
            comp, changed, self.it = _cc_slice(
                self.graph, self.comp, self.it,
                jnp.int32(self.slice_depth))
            t1 = time.perf_counter()   # dispatched; device running
            changed = bool(changed)
            moved = int(jnp.sum((comp != self.comp).astype(jnp.int32)))
            self.comp = comp
        t2 = time.perf_counter()       # scalar fetches forced completion
        self.done = not changed
        elapsed = (time.perf_counter() - t0) * 1e3
        self.tracer.record("hook", int(self.it), moved, elapsed,
                           (t2 - t1) * 1e3)
        return not self.done

    def checkpoint(self, path: str) -> None:
        save_state(path, comp=self.comp, it=self.it)

    def run_to_completion(self):
        while self.step():
            pass
        return np.asarray(self.comp)[: self.graph.n]
