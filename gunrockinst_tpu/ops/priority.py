"""Near-far priority frontier (delta-stepping buckets).

Re-expression of gunrock/priority_queue/{near_far_pile,kernel}.cuh: the
MarkValid + two-pass Compact + host Bisect pipeline
(kernel.cuh:161-405) becomes two masks on the pending bitmap — the
"pile" never materializes because bitmaps subsume the ping-pong queues.
Used by primitives/sssp.py; exposed here as a reusable operator.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def near_far_split(pending, keys, level, delta
                   ) -> Tuple[jax.Array, jax.Array]:
    """Split a pending bitmap by priority bucket.

    near = pending entries with keys < (level+1)*delta (the current
    bucket); far = the rest. (PriorityQueue::Bisect analog.)
    """
    bound = (level.astype(jnp.float32) + 1.0) * delta
    near = pending & (keys < bound)
    return near, pending & ~near


def next_nonempty_level(pending, keys, level, delta) -> jax.Array:
    """The bucket index of the smallest pending key (>= level+1) — the
    re-Bisect loop of the reference (sssp_enactor.cuh:399-420) without
    per-level host round-trips."""
    minkey = jnp.min(jnp.where(pending, keys, jnp.inf))
    new_level = jnp.where(jnp.isfinite(minkey),
                          jnp.floor(minkey / delta).astype(jnp.int32),
                          level + 1)
    return jnp.maximum(new_level, level + 1)
