"""The filter operator — frontier cull + compact.

TPU-native re-expression of oprtr/filter/kernel.cuh: the reference's
four cull stages (BitmaskCull global visited bytes, VertexCull functor
test, HistoryCull/WarpCull smem hashes) exist to cheaply *approximate*
dedup before a scan compaction; on a bitmap frontier dedup is exact and
free, so filter reduces to elementwise masking:

    out = frontier & vertex_cond & ~visited

`CondFilter/ApplyFilter` functors become a vectorized vertex function.
The idempotence knob of the reference (tolerate duplicate frontier
entries to skip atomics) is moot — bitmaps cannot hold duplicates.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from gunrockinst_tpu.graph.csr import DeviceGraph


def filter_frontier(
    graph: DeviceGraph,
    frontier,                        # (n_pad,) bool
    vertex_fn: Optional[Callable] = None,  # (vids, state) -> keep mask
    state=None,
    visited=None,                    # (n_pad,) bool visited bitmask, or None
) -> jax.Array:
    """Returns the culled frontier bitmap. The dummy/padding vertices
    are always culled."""
    mask = frontier
    if visited is not None:
        mask = mask & ~visited
    if vertex_fn is not None:
        vids = jnp.arange(graph.n_pad, dtype=jnp.int32)
        mask = mask & vertex_fn(vids, state)
    # cull dummy + padding (vertex ids >= n)
    real = jnp.arange(graph.n_pad, dtype=jnp.int32) < graph.n
    return mask & real
