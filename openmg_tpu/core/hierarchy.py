"""Grid-hierarchy construction (components R3, T6, T7 setup, T8).

Setup runs eagerly on the host in float64 (one-time, not the metric —
SURVEY.md §7 design stance): assemble/accept the fine stencil, build the
Galerkin RAP chain structurally (:mod:`openmg_tpu.ops.galerkin`), precompute
per-level inverse diagonals and red/black masks, and factor the coarsest
level into an explicit dense inverse so the in-cycle coarse solve is a
single (MXU) matmul.  The result is a static pytree of levels over which
the V-cycle unrolls at trace time into one XLA program.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from openmg_tpu.models.poisson import stencil_to_csr
from openmg_tpu.ops.galerkin import galerkin_rap_stencil
from openmg_tpu.ops.smoothers import red_mask
from openmg_tpu.ops.stencil import StencilOperator, diag_index
from openmg_tpu.ops.transfer import AGGREGATE, Transfer, coarse_shape

__all__ = ["Level", "Hierarchy", "build_hierarchy", "default_gridlevels"]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("A", "inv_diag", "mask"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class Level:
    A: StencilOperator
    inv_diag: jax.Array  # grid-shaped 1/diag(A)
    mask: jax.Array  # red parity mask (bool, grid-shaped)

    @property
    def grid_shape(self):
        return self.A.grid_shape


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("levels", "coarse_inv", "fine_hi", "fine_hi_lo"),
    meta_fields=("stats", "transfer"),
)
@dataclasses.dataclass(frozen=True)
class Hierarchy:
    levels: tuple  # tuple[Level, ...], finest first
    coarse_inv: jax.Array  # (nc, nc) dense inverse of the coarsest operator
    fine_hi: StencilOperator  # fine operator for the outer residual
    # double-float residual mode: fine_hi holds the f32 hi coefficients and
    # fine_hi_lo the f32 lo remainders (exact two-f32 split of the f64
    # operator); None in plain float modes.
    fine_hi_lo: StencilOperator | None
    stats: tuple  # static per-level (shape, num_offsets, true_nnz)
    transfer: Transfer  # static intergrid transfer spec

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    @property
    def grid_shape(self):
        return self.levels[0].grid_shape


def default_gridlevels(shape, max_dense_coarse: int, min_coarse_dim: int = 1) -> int:
    """Full-depth level count: coarsen while factor-2 coarsening is legal
    and the current level is still too big for the dense coarse solve."""
    shape = [int(s) for s in shape]
    levels = 1
    while int(np.prod(shape)) > max_dense_coarse:
        if not (
            all(s == 1 or s % 2 == 0 for s in shape)
            and any(s > 1 for s in shape)
            and all(s == 1 or s // 2 >= min_coarse_dim for s in shape)
        ):
            break
        shape = [max(1, s // 2) for s in shape]
        levels += 1
    return levels


def build_hierarchy(
    offsets,
    coeffs,
    gridlevels=None,
    dtype=jnp.float32,
    residual_dtype=None,
    transfer: Transfer = AGGREGATE,
    max_dense_coarse: int = 4096,
    min_coarse_dim: int = 1,
) -> Hierarchy:
    """Build the multigrid hierarchy from a fine-level stencil.

    ``coeffs`` may be numpy (host setup, recommended — runs in float64) or a
    device array.  Levels are cast to ``dtype`` for the cycle; the fine
    operator is additionally kept at ``residual_dtype`` precision for the
    outer defect-correction residual (SURVEY.md §7 mixed-precision plan) —
    ``"doublefloat"`` stores an exact two-f32 split instead of one array.
    """
    coeffs = np.asarray(coeffs, dtype=np.float64) if isinstance(
        coeffs, np.ndarray
    ) else coeffs
    shape = tuple(int(s) for s in coeffs.shape[1:])
    if gridlevels is None:
        gridlevels = default_gridlevels(shape, max_dense_coarse, min_coarse_dim)

    chain = [(tuple(offsets), coeffs)]
    for _ in range(int(gridlevels) - 1):
        offs, cfs = chain[-1]
        c_offs, c_cfs = galerkin_rap_stencil(offs, cfs, transfer=transfer)
        chain.append((tuple(c_offs), c_cfs))

    # coarsest: dense inverse (factored once in f64; in-cycle solve = matmul)
    c_offs, c_cfs = chain[-1]
    nc = int(np.prod(c_cfs.shape[1:]))
    if nc > max_dense_coarse:
        raise ValueError(
            f"coarsest level has {nc} unknowns > max_dense_coarse="
            f"{max_dense_coarse}; increase gridlevels (or max_dense_coarse)"
        )
    Ac = stencil_to_csr(c_offs, np.asarray(c_cfs, dtype=np.float64)).toarray()
    coarse_inv = np.linalg.inv(Ac)

    levels = []
    stats = []
    for offs, cfs in chain:
        cfs_np = np.asarray(cfs, dtype=np.float64)
        op = StencilOperator(jnp.asarray(cfs_np, dtype=dtype), tuple(offs))
        diag = cfs_np[diag_index(tuple(offs))]
        if np.any(diag == 0):
            raise ValueError("operator has zero diagonal entries")
        inv_diag = jnp.asarray(1.0 / diag, dtype=dtype)
        mask = red_mask(cfs_np.shape[1:])
        levels.append(Level(A=op, inv_diag=inv_diag, mask=mask))
        stats.append(
            (
                tuple(int(s) for s in cfs_np.shape[1:]),
                len(offs),
                int(np.count_nonzero(cfs_np)),
            )
        )

    fine64 = np.asarray(chain[0][1], dtype=np.float64)
    fine_offs = tuple(chain[0][0])
    rdtype = residual_dtype or dtype
    fine_hi_lo = None
    if rdtype == "doublefloat":
        hi = fine64.astype(np.float32)
        lo = (fine64 - hi.astype(np.float64)).astype(np.float32)
        fine_hi = StencilOperator(jnp.asarray(hi), fine_offs)
        fine_hi_lo = StencilOperator(jnp.asarray(lo), fine_offs)
    else:
        fine_hi = StencilOperator(jnp.asarray(fine64, dtype=rdtype), fine_offs)
    return Hierarchy(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv, dtype=dtype),
        fine_hi=fine_hi,
        fine_hi_lo=fine_hi_lo,
        stats=tuple(stats),
        transfer=transfer,
    )
