from gunrockinst_tpu.graph.coo import CooGraph  # noqa: F401
from gunrockinst_tpu.graph.csr import CsrGraph, DeviceGraph  # noqa: F401
from gunrockinst_tpu.graph.market import load_market  # noqa: F401
from gunrockinst_tpu.graph.rmat import rmat_graph  # noqa: F401
from gunrockinst_tpu.graph.lattice import grid_graph  # noqa: F401
