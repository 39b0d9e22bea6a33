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
from openmg_tpu.ops.galerkin import galerkin_rap_device, galerkin_rap_stencil
from openmg_tpu.ops.smoothers import red_mask
from openmg_tpu.ops.stencil import StencilOperator, diag_index
from openmg_tpu.ops.transfer import AGGREGATE, Transfer, coarse_shape

__all__ = [
    "Level",
    "Hierarchy",
    "build_hierarchy",
    "build_hierarchy_device",
    "default_gridlevels",
]


def red_mask_device(shape):
    """Device-side red/black parity mask (xor of per-axis index parities)."""
    shape = tuple(int(s) for s in shape)
    acc = None
    for a in range(len(shape)):
        par = jax.lax.broadcasted_iota(jnp.int32, shape, a) & 1
        acc = par if acc is None else acc ^ par
    return acc == 0


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
    max_dense_coarse: int = 512,
    min_coarse_dim: int = 1,
    setup_dtype="float32",
) -> Hierarchy:
    """Build the multigrid hierarchy from a fine-level stencil.

    ``coeffs`` may be numpy (host setup, recommended) or a device array.
    The RAP chain runs in ``setup_dtype`` (default float32 — exact for the
    dyadic-rational stencils of Poisson hierarchies, and coarse operators
    are preconditioner components, so reduced precision only perturbs the
    convergence *rate*, never the converged answer; this halves setup
    memory traffic, which dominates 256³+ setup on this 2-vCPU host).
    Levels are cast to ``dtype`` for the cycle; the fine operator is
    additionally kept at ``residual_dtype`` precision for the outer
    defect-correction residual (SURVEY.md §7 mixed-precision plan) —
    ``"doublefloat"`` stores an exact two-f32 split of the *original*
    (full-precision) input instead of one array.
    """
    orig_coeffs = coeffs
    shape = tuple(int(s) for s in coeffs.shape[1:])
    if gridlevels is None:
        gridlevels = default_gridlevels(shape, max_dense_coarse, min_coarse_dim)
    setup_dtype = np.dtype(setup_dtype)
    if isinstance(coeffs, np.ndarray):
        coeffs = np.asarray(coeffs, dtype=setup_dtype)

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
        cfs_np = np.asarray(cfs)
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

    fine_offs = tuple(chain[0][0])
    rdtype = residual_dtype or dtype
    fine_hi_lo = None
    if rdtype == "doublefloat":
        orig_np = np.asarray(orig_coeffs)
        if orig_np.dtype == np.float32:
            # already f32-exact: lo part is identically zero
            hi, lo = orig_np, np.zeros_like(orig_np)
        else:
            orig_np = orig_np.astype(np.float64, copy=False)
            hi = orig_np.astype(np.float32)
            lo = (orig_np - hi).astype(np.float32)
        fine_hi = StencilOperator(jnp.asarray(hi), fine_offs)
        fine_hi_lo = StencilOperator(jnp.asarray(lo), fine_offs)
    else:
        fine64 = np.asarray(orig_coeffs, dtype=np.float64)
        fine_hi = StencilOperator(jnp.asarray(fine64, dtype=rdtype), fine_offs)
    return Hierarchy(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv, dtype=dtype),
        fine_hi=fine_hi,
        fine_hi_lo=fine_hi_lo,
        stats=tuple(stats),
        transfer=transfer,
    )


def build_hierarchy_device(
    offsets,
    coeffs,
    gridlevels=None,
    dtype=jnp.float32,
    residual_dtype="doublefloat",
    transfer: Transfer = AGGREGATE,
    max_dense_coarse: int = 512,
    min_coarse_dim: int = 1,
) -> Hierarchy:
    """Setup-on-device hierarchy construction (the TPU fast path).

    ``coeffs`` is a device array (e.g. from
    :func:`~openmg_tpu.models.poisson.poisson_stencil_device`).  The RAP
    chain, inverse diagonals and parity masks are all computed on the chip
    with jitted programs; only the (tiny) coarsest operator crosses to the
    host for dense factorization.  This avoids both the bandwidth-starved
    host numpy and the slow host→device relay transfers that made 256³
    host setup take minutes.

    The cycle runs in ``dtype`` (f32).  Residual mode must be
    ``"doublefloat"`` or a float32-compatible dtype: the fine operator is
    kept as-is (exactly representable inputs → zero lo part).
    """
    offsets = tuple(tuple(o) for o in offsets)
    coeffs = coeffs.astype(dtype)
    shape = tuple(int(s) for s in coeffs.shape[1:])
    if gridlevels is None:
        gridlevels = default_gridlevels(shape, max_dense_coarse, min_coarse_dim)

    chain = [(offsets, coeffs)]
    for _ in range(int(gridlevels) - 1):
        offs, cfs = chain[-1]
        c_offs, c_cfs = galerkin_rap_device(offs, cfs, transfer=transfer)
        chain.append((tuple(c_offs), c_cfs))

    c_offs, c_cfs = chain[-1]
    nc = int(np.prod(c_cfs.shape[1:]))
    if nc > max_dense_coarse:
        raise ValueError(
            f"coarsest level has {nc} unknowns > max_dense_coarse="
            f"{max_dense_coarse}; increase gridlevels (or max_dense_coarse)"
        )
    Ac = stencil_to_csr(c_offs, np.asarray(c_cfs, dtype=np.float64)).toarray()
    coarse_inv = np.linalg.inv(Ac)

    levels, stats = [], []
    for offs, cfs in chain:
        op = StencilOperator(cfs, tuple(offs))
        di = diag_index(tuple(offs))
        inv_diag = jax.jit(lambda c, i=di: 1.0 / c[i])(cfs)
        mask = red_mask_device(cfs.shape[1:])
        levels.append(Level(A=op, inv_diag=inv_diag, mask=mask))
        stats.append(
            (
                tuple(int(s) for s in cfs.shape[1:]),
                len(offs),
                int(jnp.sum(cfs != 0)),
            )
        )

    if residual_dtype == "doublefloat":
        fine_hi = StencilOperator(chain[0][1], chain[0][0])
        fine_hi_lo = StencilOperator(jnp.zeros_like(chain[0][1]), chain[0][0])
    else:
        rd = jnp.dtype(residual_dtype)
        fine_hi = StencilOperator(chain[0][1].astype(rd), chain[0][0])
        fine_hi_lo = None
    return Hierarchy(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv, dtype=dtype),
        fine_hi=fine_hi,
        fine_hi_lo=fine_hi_lo,
        stats=tuple(stats),
        transfer=transfer,
    )
