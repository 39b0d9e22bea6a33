"""openmg_tpu — a TPU-native geometric multigrid framework.

A brand-new JAX/XLA/Pallas implementation of the capability surface of the
pure-Python reference ``tsbertalan/openmg`` (geometric multigrid for sparse
SPD systems — canonically 1D/2D/3D Poisson on regular grids), redesigned
TPU-first rather than ported:

* operators live in a DIA-on-grid "stencil" form (dense per-offset
  coefficient grids) — shift-multiply-add over dense arrays is the idiomatic
  TPU execution model (VPU-vectorized, HBM-streaming, gather-free);
* CSR / ELL / BSR containers with padded static nnz cover the general
  sparse-interchange surface (BASELINE component T1);
* smoothers (weighted Jacobi, red–black Gauss–Seidel) run as fused Pallas
  kernels on the stencil fast path (T3/T4);
* the V-cycle is unrolled over the static level list into one jitted XLA
  program (T7); the coarsest level is direct-solved (T8);
* multi-chip/multi-host scaling uses ``jax.sharding.Mesh`` + ``shard_map``
  with ``ppermute`` halo exchange and all-gather coarse redistribution
  (T9–T11, T16).

Note on reference citations: the reference mount ``/root/reference`` was
EMPTY at survey time (SURVEY.md §0).  Behavioral parity is therefore defined
against ``BASELINE.json`` and the numpy mirror of the published algorithm in
``openmg_tpu/utils/oracle.py``; component IDs (R1..R12, T1..T16) cited in
docstrings refer to SURVEY.md §2.
"""

from openmg_tpu.core.config import SolverConfig, ProblemConfig, MeshConfig
from openmg_tpu.core.solver import mg_solve, solve, setup
from openmg_tpu.core.hierarchy import build_hierarchy, Hierarchy, Level
from openmg_tpu.models.poisson import (
    diffusion,
    diffusion_stencil,
    poisson,
    poisson_stencil,
    stencil_from_csr,
    stencil_to_csr,
)
from openmg_tpu.models.elasticity import coupled_diffusion, elasticity
from openmg_tpu.core.algebraic import AlgebraicSolver, setup_sparse
from openmg_tpu.ops.sparse import (
    BSRMatrix,
    CSRMatrix,
    ELLMatrix,
    from_scipy,
    to_scipy,
)
from openmg_tpu.ops.stencil import StencilOperator
from openmg_tpu.parallel.dist import DistributedSolver, distributed_setup
from openmg_tpu.parallel.mesh import initialize_distributed, make_mesh
from openmg_tpu.parallel.sparse_dist import (
    DistributedAlgebraicSolver,
    setup_sparse_distributed,
)

__version__ = "0.1.0"

__all__ = [
    "mg_solve",
    "solve",
    "setup",
    "SolverConfig",
    "ProblemConfig",
    "MeshConfig",
    "build_hierarchy",
    "Hierarchy",
    "Level",
    "poisson",
    "poisson_stencil",
    "elasticity",
    "coupled_diffusion",
    "diffusion",
    "diffusion_stencil",
    "stencil_from_csr",
    "stencil_to_csr",
    "StencilOperator",
    "CSRMatrix",
    "ELLMatrix",
    "BSRMatrix",
    "from_scipy",
    "to_scipy",
    "AlgebraicSolver",
    "setup_sparse",
    "DistributedSolver",
    "distributed_setup",
    "DistributedAlgebraicSolver",
    "setup_sparse_distributed",
    "make_mesh",
    "initialize_distributed",
]
