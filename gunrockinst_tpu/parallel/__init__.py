from gunrockinst_tpu.parallel.mesh import edge_mesh  # noqa: F401
from gunrockinst_tpu.parallel.partition import ShardedGraph, shard_graph  # noqa: F401
