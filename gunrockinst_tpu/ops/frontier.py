"""Frontier representations and conversions.

The reference keeps frontiers as dynamically-sized device queues with
ping-pong buffers and device<->host length handshakes
(util/multiple_buffering.cuh, util/cta_work_progress.cuh). TPU-native
frontiers are static-shape values instead:

  * bitmap  — (n_pad,) bool, the primary in-loop form: dedup is free,
    set ops are elementwise, emptiness is a `jnp.any` carried inside
    `lax.while_loop` (no host sync — the reference's mapped-memory
    `done` flag, edge_map_forward/kernel.cuh:208, becomes a loop value).
  * id list — (cap,) int32 padded with `fill`, plus a count; produced
    by mask-compaction (the filter kernel's scan+scatter two-phase,
    oprtr/filter/kernel.cuh:740, is `jnp.nonzero` with a static size).
"""

from __future__ import annotations

import jax.numpy as jnp


def empty_bitmap(n_pad: int):
    return jnp.zeros((n_pad,), dtype=jnp.bool_)


def bitmap_from_ids(ids, n_pad: int):
    """Set bits for the given vertex ids (out-of-range ids dropped)."""
    return empty_bitmap(n_pad).at[ids].set(True, mode="drop")


def singleton_bitmap(src, n_pad: int):
    return empty_bitmap(n_pad).at[src].set(True)


def compact(mask, cap: int, fill: int):
    """Bitmap -> (ids (cap,), count). ids beyond count equal `fill`.

    Static-size `nonzero` lowers to cumsum + scatter, the same
    prefix-sum compaction the reference's filter kernel performs.
    """
    (ids,) = jnp.nonzero(mask, size=cap, fill_value=fill)
    return ids.astype(jnp.int32), jnp.sum(mask.astype(jnp.int32))


def frontier_size(mask):
    return jnp.sum(mask.astype(jnp.int32))
