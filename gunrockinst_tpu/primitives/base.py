"""Primitive scaffolding: graph coercion, result stats, timing.

The stats block mirrors the reference's printed metric schema
(tests/bfs/test_bfs.cu:210-235, app/bfs/bfs_app.cu:93-120): elapsed ms,
M-Edges/s (TEPS), search depth, nodes/edges visited, total_queued,
redundant work %.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Union

import numpy as np

import jax

from gunrockinst_tpu.graph.csr import CsrGraph, DeviceGraph

INF32 = np.iinfo(np.int32).max

GraphLike = Union[CsrGraph, DeviceGraph]


def device_graph(graph: GraphLike, **kw) -> DeviceGraph:
    if isinstance(graph, DeviceGraph):
        return graph
    return DeviceGraph.build(graph, **kw)


@dataclasses.dataclass
class Stats:
    elapsed_ms: float = 0.0
    search_depth: int = 0
    nodes_visited: int = 0
    edges_visited: int = 0
    total_queued: int = 0
    # device-time share of wall time, 0..1 (the reference's avg CTA
    # duty, kernel_runtime_stats.cuh:226-290); < 0 = not measured
    avg_duty: float = -1.0

    @property
    def m_teps(self) -> float:
        """Millions of traversed edges per second (test_bfs.cu:215)."""
        if self.elapsed_ms <= 0:
            return 0.0
        return self.edges_visited / (self.elapsed_ms * 1000.0)

    @property
    def redundant_pct(self) -> float:
        """Redundant work % (app/bfs/bfs_app.cu:115): queued minus
        useful, over useful.  0 when total_queued was not tracked
        (deterministic combines never enqueue duplicates)."""
        if self.edges_visited == 0 or self.total_queued == 0:
            return 0.0
        # vertex-granular queues (the Stepped* INST paths) can be
        # smaller than the edge count; redundancy is then simply zero
        # (deterministic combines never enqueue duplicates)
        return max(0.0, 100.0 * (self.total_queued - self.edges_visited)
                   / self.edges_visited)

    def display(self, name: str) -> str:
        """Print the reference's full metric block (app/bfs/
        bfs_app.cu:93-120): elapsed, rate, depth, avg duty,
        nodes/edges visited, total_queued, redundant work %."""
        out = (f"[{name}] elapsed: {self.elapsed_ms:.4f} ms, rate: "
               f"{self.m_teps:.4f} MiEdges/s, search_depth: "
               f"{self.search_depth}")
        if self.avg_duty >= 0:
            out += f", avg_duty: {100.0 * self.avg_duty:.2f}%"
        out += (f", nodes_visited: {self.nodes_visited}, "
                f"edges_visited: {self.edges_visited}, "
                f"total_queued: "
                f"{self.total_queued or self.edges_visited}, "
                f"redundant_work: {self.redundant_pct:.2f}%")
        print(out)
        return out


class Timer:
    """GpuTimer analog (test_utils.cuh:156): blocks on device results."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_ms = (time.perf_counter() - self.t0) * 1e3
        return False

    @staticmethod
    def block(tree):
        jax.block_until_ready(tree)


def sync(x) -> None:
    """Force completion of the computation producing `x`.

    On the axon TPU backend `jax.block_until_ready` can return before
    the device work finishes; a host fetch cannot. Always sync on a
    SCALAR output (e.g. the iteration counter) so the transfer itself
    is free but the full program must have run to produce it.
    """
    np.asarray(x)
