"""Deterministic scatter-combine primitives.

These replace the reference's atomic operations (atomicCAS claim in
bfs_functor.cuh:56, atomicMin in sssp_functor.cuh:64, atomicAdd in
pr_functor.cuh:67) with XLA scatter reductions, which combine
concurrent updates deterministically — same result every run, every
shard count.

All functions take a destination-sized init array (n_pad,) and per-item
(ids, vals); out-of-range ids are dropped.
"""

from __future__ import annotations

import jax.numpy as jnp

INT_INF = jnp.iinfo(jnp.int32).max


def scatter_min(init, ids, vals):
    return init.at[ids].min(vals, mode="drop")


def scatter_max(init, ids, vals):
    return init.at[ids].max(vals, mode="drop")


def scatter_add(init, ids, vals):
    return init.at[ids].add(vals, mode="drop")


def scatter_or(init, ids, flags):
    """Boolean accumulate (visited-bitmask set analog)."""
    return init.at[ids].max(flags, mode="drop")


_COMBINES = {
    "min": (scatter_min, lambda dt: (jnp.iinfo(dt).max
                                     if jnp.issubdtype(dt, jnp.integer)
                                     else jnp.inf)),
    "max": (scatter_max, lambda dt: (jnp.iinfo(dt).min
                                     if jnp.issubdtype(dt, jnp.integer)
                                     else -jnp.inf)),
    "add": (scatter_add, lambda dt: 0),
    "or": (scatter_or, lambda dt: False),
}


def combine_fn(name: str):
    """Returns (scatter, identity_for_dtype) for a combine name.

    The combine set mirrors the reference's REDUCE_OP enum
    (oprtr/advance/kernel_policy.cuh:43-81: NONE/PLUS/MULTIPLIES/
    MAXIMUM/MINIMUM) minus MULTIPLIES (unused by any reference
    primitive) plus OR (bitmap union).
    """
    return _COMBINES[name]
