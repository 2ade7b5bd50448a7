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
    elapsed_ms: float


class ProgressTracer:
    """Collects per-iteration progress (EnactorStats + INST trace
    analog)."""

    def __init__(self, verbose: bool = False):
        self.records: List[TraceRecord] = []
        self.verbose = verbose

    def record(self, kernel: str, iteration: int, frontier_size: int,
               elapsed_ms: float) -> None:
        self.records.append(
            TraceRecord(kernel, iteration, frontier_size, elapsed_ms))
        if self.verbose:
            # reference trace-line shape: "l advance <iter> <...> <elapsed>"
            print(f"l {kernel} {iteration} {frontier_size} "
                  f"{elapsed_ms:.4f}")

    @property
    def total_queued(self) -> int:
        return sum(r.frontier_size for r in self.records)

    @property
    def total_elapsed_ms(self) -> float:
        return sum(r.elapsed_ms for r in self.records)

    def summary(self) -> Dict[str, float]:
        return dict(iterations=len(self.records),
                    total_queued=self.total_queued,
                    elapsed_ms=self.total_elapsed_ms)


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
        """Run one slice. Returns True while not converged."""
        if self.done:
            return False
        t0 = time.perf_counter()
        self.labels, self.frontier, self.depth = _bfs_slice(
            self.graph, self.labels, self.frontier, self.depth,
            jnp.int32(self.slice_depth))
        size = int(fr.frontier_size(self.frontier))
        elapsed = (time.perf_counter() - t0) * 1e3
        self.tracer.record("advance", int(self.depth), size, elapsed)
        self.done = size == 0
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
