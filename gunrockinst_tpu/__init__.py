"""gunrockinst_tpu — a TPU-native graph analytics framework.

A from-scratch JAX/XLA/Pallas re-expression of the bulk-synchronous
frontier programming model of the reference (Gunrock v0.2 INST fork,
see /root/reference): a graph primitive is a state pytree ("Problem"),
vectorized edge/vertex functions ("Functors"), and an iteration driver
("Enactor") alternating two frontier operators:

  * advance — expand the neighbors of the current frontier, applying a
    per-edge condition/apply pair, combining concurrent writes with
    deterministic segment reductions (min/max/sum/or) instead of atomics
    (reference: gunrock/oprtr/advance/kernel.cuh).
  * filter  — cull and compact a frontier (visited bitmask, dedup)
    (reference: gunrock/oprtr/filter/kernel.cuh).

Design differences from the CUDA reference (deliberate, TPU-first):
  * Static shapes everywhere: vertex state is a dense padded array; the
    frontier's primary form is a bitmap over vertices, with on-demand
    compaction to padded id lists (capacity buckets replace the
    reference's `queue_sizing` oversizing).
  * No atomics: scatter-min/max/add with XLA combining semantics gives
    deterministic results (pred ties broken by min vertex id).
  * The host<->device queue-length handshake of the reference
    (cta_work_progress.cuh) disappears: frontier sizes are values
    carried inside `lax.while_loop`.
  * Multi-chip: a `jax.sharding.Mesh` with 1-D edge partitioning and
    collective combines replaces the reference's unimplemented
    multi-GPU stubs (problem_base.cuh:186-210).
"""

__version__ = "0.1.0"

from gunrockinst_tpu.graph.csr import CsrGraph, DeviceGraph  # noqa: F401
from gunrockinst_tpu.graph.market import load_market  # noqa: F401
from gunrockinst_tpu.graph.rmat import rmat_graph  # noqa: F401
from gunrockinst_tpu.graph.lattice import grid_graph  # noqa: F401
