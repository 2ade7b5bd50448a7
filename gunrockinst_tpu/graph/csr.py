"""CSR graph containers.

Host side: `CsrGraph` (NumPy) — capability parity with the reference's
`gunrock/csr.cuh` (`Csr::FromCoo` sort/dedupe/offsets :248, binary cache
:140-246, `PrintHistogram` :350, `GetAverageDegree`).

Device side: `DeviceGraph` — the TPU-resident form. Unlike the
reference's raw device pointers + texture binds, this is a JAX pytree of
HBM-resident, lane-padded arrays with **static shapes**:

  * vertex arrays sized ``n_pad`` (multiple of 128, ``>= n+1``); vertex
    id ``n`` is a dummy sink used for padding,
  * edge arrays sized ``m_pad`` (multiple of 128); padding edges are
    ``(n -> n)`` with weight 0 and never satisfy any functor condition
    because the dummy vertex is never in a frontier,
  * both CSR (row-sorted, for push/forward advance) and CSC (col-sorted,
    for pull/backward advance — DOBFS, HITS, SALSA) edge orderings are
    carried, each with an id map back to CSR edge order.

This replaces the reference's dynamic frontier allocation
(`problem_base.cuh:368-427` queue_sizing) with fixed capacities chosen at
trace time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.coo import CooGraph

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(eq=False)  # identity-hashable: used as cache key
class CsrGraph:
    """Host CSR: ``row_offsets`` (n+1,), ``col_indices`` (m,),
    optional ``edge_values`` (m,) and ``node_values`` (n,)."""

    row_offsets: np.ndarray
    col_indices: np.ndarray
    edge_values: Optional[np.ndarray] = None
    node_values: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return int(self.row_offsets.shape[0] - 1)

    @property
    def num_edges(self) -> int:
        return int(self.col_indices.shape[0])

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_coo(coo: CooGraph, undirected: bool = False,
                 dedupe: bool = True,
                 remove_self_loops: bool = True) -> "CsrGraph":
        """Build CSR from an edge list (Csr::FromCoo analog: sort,
        drop duplicate edges and self-loops — gunrock/csr.cuh:267-288)."""
        if undirected:
            coo = coo.with_reverse_edges()
        if remove_self_loops:
            coo = coo.without_self_loops()
        coo = coo.deduped() if dedupe else coo.row_sorted()
        n, m = coo.num_nodes, coo.num_edges
        counts = np.bincount(coo.rows, minlength=n).astype(np.int64)
        row_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=row_offsets[1:])
        dtype = np.int32 if m < 2**31 else np.int64
        return CsrGraph(
            row_offsets=row_offsets.astype(dtype),
            col_indices=coo.cols.astype(np.int32),
            edge_values=(None if coo.values is None
                         else coo.values.astype(np.float32)),
        )

    def to_coo(self) -> CooGraph:
        rows = np.repeat(np.arange(self.num_nodes, dtype=np.int32),
                         np.diff(self.row_offsets))
        return CooGraph(self.num_nodes, rows, self.col_indices.copy(),
                        None if self.edge_values is None
                        else self.edge_values.copy())

    def transposed(self) -> "CsrGraph":
        """CSC of this graph, i.e. CSR of the reverse graph."""
        return CsrGraph.from_coo(self.to_coo().reversed(), dedupe=False)

    # -- stats (reference csr.cuh:350 PrintHistogram, GetAverageDegree) ----

    @property
    def degrees(self) -> np.ndarray:
        return np.diff(self.row_offsets).astype(np.int32)

    def average_degree(self) -> float:
        return self.num_edges / max(self.num_nodes, 1)

    def degree_histogram(self) -> np.ndarray:
        """Log-scale degree histogram: slot k counts vertices with degree
        in [2^(k-1), 2^k), slot 0 counts degree-0 vertices."""
        deg = self.degrees
        slots = np.zeros(deg.shape, dtype=np.int64)
        nz = deg > 0
        slots[nz] = np.floor(np.log2(deg[nz])).astype(np.int64) + 1
        return np.bincount(slots)

    def print_histogram(self) -> str:
        lines = [f"Degree histogram ({self.num_nodes} vertices, "
                 f"{self.num_edges} edges):"]
        hist = self.degree_histogram()
        for k, c in enumerate(hist):
            if c:
                lo = 0 if k == 0 else 2 ** (k - 1)
                lines.append(f"    Degree 2^{k - 1 if k else '-inf'} "
                             f"(>= {lo}): {c} ({100.0 * c / self.num_nodes:.2f} %)")
        out = "\n".join(lines)
        print(out)
        return out

    # -- binary cache (reference csr.cuh:140-246 WriteToFile/FromCsr) ------

    def save(self, path: str) -> None:
        arrays = dict(row_offsets=self.row_offsets,
                      col_indices=self.col_indices)
        if self.edge_values is not None:
            arrays["edge_values"] = self.edge_values
        if self.node_values is not None:
            arrays["node_values"] = self.node_values
        np.savez(path, **arrays)

    @staticmethod
    def load(path: str) -> "CsrGraph":
        with np.load(path) as z:
            return CsrGraph(
                row_offsets=z["row_offsets"],
                col_indices=z["col_indices"],
                edge_values=z["edge_values"] if "edge_values" in z else None,
                node_values=z["node_values"] if "node_values" in z else None,
            )

    # -- device form -------------------------------------------------------

    def to_device(self, with_csc: bool = True,
                  with_values: Optional[bool] = None) -> "DeviceGraph":
        return DeviceGraph.build(self, with_csc=with_csc,
                                 with_values=with_values)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceGraph:
    """TPU-resident padded graph (see module docstring for layout)."""

    # static metadata (not traced)
    n: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    m_pad: int = dataclasses.field(metadata=dict(static=True))

    # CSR (edges sorted by source)
    row_offsets: jax.Array     # (n_pad,) int32; entries > n clamp to m
    edge_src: jax.Array        # (m_pad,) int32 source per edge
    edge_dst: jax.Array        # (m_pad,) int32 destination per edge
    edge_w: jax.Array          # (m_pad,) float32 (ones if unweighted)
    out_degree: jax.Array      # (n_pad,) int32 (0 at dummy/pad)

    # CSC (edges sorted by destination) — pull direction
    col_offsets: Optional[jax.Array] = None   # (n_pad,) int32
    csc_src: Optional[jax.Array] = None       # (m_pad,) int32 (in-neighbor)
    csc_dst: Optional[jax.Array] = None       # (m_pad,) int32
    csc_w: Optional[jax.Array] = None         # (m_pad,) float32
    csc_edge_id: Optional[jax.Array] = None   # (m_pad,) int32 -> CSR edge id
    in_degree: Optional[jax.Array] = None     # (n_pad,) int32

    @property
    def dummy(self) -> int:
        """The padding vertex id (== n)."""
        return self.n

    @property
    def has_csc(self) -> bool:
        return self.col_offsets is not None

    @staticmethod
    def build(csr: CsrGraph, with_csc: bool = True,
              with_values: Optional[bool] = None) -> "DeviceGraph":
        n, m = csr.num_nodes, csr.num_edges
        n_pad = _round_up(n + 1, LANE)
        m_pad = _round_up(max(m, 1), LANE)
        if with_values is None:
            with_values = csr.edge_values is not None

        def pad_edges(a, fill, dtype):
            out = np.full(m_pad, fill, dtype=dtype)
            out[:m] = a
            return jnp.asarray(out)

        def pad_offsets(offsets):
            out = np.full(n_pad, m, dtype=np.int32)
            out[: n + 1] = offsets
            return jnp.asarray(out)

        def pad_degree(offsets):
            out = np.zeros(n_pad, dtype=np.int32)
            out[:n] = np.diff(offsets)
            return jnp.asarray(out)

        src = np.repeat(np.arange(n, dtype=np.int32),
                        np.diff(csr.row_offsets))
        if with_values:
            ev = (csr.edge_values if csr.edge_values is not None
                  else np.ones(m, dtype=np.float32))
        else:
            ev = np.ones(m, dtype=np.float32)

        kwargs = dict(
            n=n, m=m, n_pad=n_pad, m_pad=m_pad,
            row_offsets=pad_offsets(csr.row_offsets),
            edge_src=pad_edges(src, n, np.int32),
            edge_dst=pad_edges(csr.col_indices, n, np.int32),
            edge_w=pad_edges(ev, 0.0, np.float32),
            out_degree=pad_degree(csr.row_offsets),
        )

        if with_csc:
            # stable sort by destination; keep the CSR edge id of each slot
            order = np.argsort(csr.col_indices[:m], kind="stable").astype(np.int32)
            cdst = csr.col_indices[order]
            counts = np.bincount(cdst, minlength=n)
            col_offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(counts, out=col_offsets[1:])
            kwargs.update(
                col_offsets=pad_offsets(col_offsets),
                csc_src=pad_edges(src[order], n, np.int32),
                csc_dst=pad_edges(cdst, n, np.int32),
                csc_w=pad_edges(ev[order], 0.0, np.float32),
                csc_edge_id=pad_edges(order, m_pad - 1, np.int32),
                in_degree=pad_degree(col_offsets),
            )
        return DeviceGraph(**kwargs)

    def reverse_view(self) -> "DeviceGraph":
        """A DeviceGraph whose CSR is this graph's CSC (for primitives that
        advance over the reverse graph, e.g. HITS hub<->auth)."""
        if not self.has_csc:
            raise ValueError("reverse_view requires with_csc=True")
        return DeviceGraph(
            n=self.n, m=self.m, n_pad=self.n_pad, m_pad=self.m_pad,
            row_offsets=self.col_offsets,
            edge_src=self.csc_dst, edge_dst=self.csc_src, edge_w=self.csc_w,
            out_degree=self.in_degree,
            col_offsets=self.row_offsets,
            csc_src=self.edge_dst, csc_dst=self.edge_src, csc_w=self.edge_w,
            csc_edge_id=None, in_degree=self.out_degree,
        )
