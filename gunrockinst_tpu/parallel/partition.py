"""1-D edge partitioning across a device mesh.

Each device owns an equal contiguous slice of the (CSR-ordered) edge
list; vertex state is replicated. An advance becomes: local gather +
local scatter-combine into a full-length vertex vector, then a mesh
collective (pmin/pmax/psum) merges the per-shard partials — the
boundary-vertex frontier exchange rides ICI as one all-reduce.

This is the distribution design BASELINE.json prescribes ("1-D edge
partition per host, per-iteration boundary frontier/label exchange");
the reference has no working analog to copy (multi-GPU is stubbed,
problem_base.cuh:336).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gunrockinst_tpu.graph.csr import DeviceGraph, LANE, _round_up
from gunrockinst_tpu.parallel.mesh import EDGE_AXIS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Edge arrays sharded over the mesh edge axis; degree/offset arrays
    replicated. Static metadata mirrors DeviceGraph."""

    n: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    m_pad: int = dataclasses.field(metadata=dict(static=True))

    edge_src: jax.Array   # (m_pad,) sharded P('e')
    edge_dst: jax.Array   # (m_pad,) sharded P('e')
    edge_w: jax.Array     # (m_pad,) sharded P('e')
    out_degree: jax.Array  # (n_pad,) replicated
    row_offsets: jax.Array  # (n_pad,) replicated

    @property
    def dummy(self) -> int:
        return self.n


def shard_graph(graph: DeviceGraph, mesh: Mesh) -> ShardedGraph:
    """Re-pad edge arrays so every shard is lane-aligned and place them
    over the mesh."""
    d = mesh.shape[EDGE_AXIS]
    m_pad = _round_up(graph.m_pad, LANE * d)
    pad = m_pad - graph.m_pad

    def pad_to(a, fill):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,), fill, dtype=a.dtype)])
        return a

    eshard = NamedSharding(mesh, P(EDGE_AXIS))
    vrepl = NamedSharding(mesh, P())
    return ShardedGraph(
        n=graph.n, m=graph.m, n_pad=graph.n_pad, m_pad=m_pad,
        edge_src=jax.device_put(pad_to(graph.edge_src, graph.n), eshard),
        edge_dst=jax.device_put(pad_to(graph.edge_dst, graph.n), eshard),
        edge_w=jax.device_put(pad_to(graph.edge_w, 0.0), eshard),
        out_degree=jax.device_put(graph.out_degree, vrepl),
        row_offsets=jax.device_put(graph.row_offsets, vrepl),
    )
