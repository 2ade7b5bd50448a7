"""Device-mesh helpers.

The reference's multi-GPU support is unimplemented scaffolding
(app/problem_base.cuh:186-210 GpuIndex/GraphSliceRow stubs, :336 TODO);
this module provides the real thing TPU-natively: a 1-D
`jax.sharding.Mesh` over which edges are partitioned, with XLA
collectives (pmin/pmax/psum over ICI) replacing the missing
frontier-exchange layer (SURVEY.md §2.6, §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

EDGE_AXIS = "e"


def edge_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh with the edge-partition axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EDGE_AXIS,))
