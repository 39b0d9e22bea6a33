"""Stencil (DIA-on-grid) operator — the TPU-native sparse format.

Every matrix whose rows/columns live on a regular grid and whose couplings
use a bounded set of multi-index offsets (true of the reference's entire
hierarchy: Poisson fine operators and all Galerkin coarsenings, SURVEY.md
R1/R3) is stored as ``coeffs[k, *grid]`` per static offset ``offsets[k]``.

SpMV then becomes shift–multiply–add over dense grid arrays: no gather, no
index traffic, fully VPU-vectorizable and HBM-streaming — this is the fast
path the BASELINE kernel target ("per-level SpMV at ~HBM speed-of-light")
is measured on.  General unstructured matrices use the CSR/ELL/BSR
containers in :mod:`openmg_tpu.ops.sparse` instead.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["StencilOperator", "shift", "apply", "residual", "diag_index"]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("coeffs", "values"),
    meta_fields=("offsets", "shape"),
)
@dataclasses.dataclass(frozen=True)
class StencilOperator:
    """Sparse operator in DIA-on-grid form.

    Two storage modes:

    * **varying** (general): ``coeffs`` is ``(K, *grid_shape)`` with
      ``coeffs[k][i] = A[i, i + offsets[k]]``, zero where the neighbor
      leaves the grid; ``values is None``.
    * **constant** (fast path): ``coeffs is None`` and ``values`` is a
      ``(K,)`` vector — the operator is translation-invariant with
      Dirichlet (zero) truncation at the grid boundary, i.e.
      ``A[i, i+o_k] = values[k]`` whenever ``i + o_k`` is in the grid.
      SpMV then reads only ``x`` (coefficients cost no HBM bandwidth):
      measured 1.6× faster sweeps at 256³.  Poisson fine operators and
      all aggregation-Galerkin coarsenings are exactly of this form;
      detection happens at hierarchy setup.

    offsets: static tuple of K integer d-tuples.
    shape: static grid shape (required in constant mode; optional
        otherwise — inferred from coeffs).
    """

    coeffs: jax.Array | None
    offsets: tuple
    values: jax.Array | None = None
    shape: tuple | None = None

    @property
    def is_constant(self) -> bool:
        return self.coeffs is None

    @property
    def grid_shape(self) -> tuple:
        if self.coeffs is not None:
            return tuple(self.coeffs.shape[1:])
        return tuple(self.shape)

    @property
    def ndim(self) -> int:
        return len(self.offsets[0])

    @property
    def n(self) -> int:
        return int(np.prod(self.grid_shape))

    @property
    def num_offsets(self) -> int:
        return len(self.offsets)

    @property
    def dtype(self):
        return self.coeffs.dtype if self.coeffs is not None else self.values.dtype

    def coeff(self, k: int):
        """The k-th coefficient (grid array or scalar)."""
        return self.coeffs[k] if self.coeffs is not None else self.values[k]

    def apply(self, x: jax.Array) -> jax.Array:
        return apply(self, x)

    def diag(self):
        return self.coeff(diag_index(self.offsets))

    def astype(self, dtype) -> "StencilOperator":
        if self.coeffs is not None:
            return StencilOperator(self.coeffs.astype(dtype), self.offsets)
        return StencilOperator(
            None, self.offsets, self.values.astype(dtype), self.shape
        )


def diag_index(offsets) -> int:
    zero = (0,) * len(offsets[0])
    return offsets.index(zero)


def shift(x: jax.Array, off) -> jax.Array:
    """``z[i] = x[i + off]`` with zeros outside the domain (static offset).

    Implemented as pad+slice so XLA fuses the whole shift–multiply–add chain
    of an SpMV into one HBM-streaming loop nest.
    """
    if all(o == 0 for o in off):
        return x
    pad_cfg = [(max(0, -o), max(0, o), 0) for o in off]
    xp = lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)
    starts = [max(0, o) for o in off]
    limits = [s + n for s, n in zip(starts, x.shape)]
    return lax.slice(xp, starts, limits)


def apply(op: StencilOperator, x: jax.Array) -> jax.Array:
    """SpMV ``y = A x`` on grid-shaped ``x`` (gather-free)."""
    y = None
    for k, off in enumerate(op.offsets):
        t = op.coeff(k) * shift(x, off)
        y = t if y is None else y + t
    return y


def residual(op: StencilOperator, b: jax.Array, x: jax.Array) -> jax.Array:
    """``r = b − A x`` (reference component R5).

    Constant 3D stencils take the fused Pallas kernel (one HBM pass; the
    jnp shift chain measured ~5× slower at 256³); everything else falls
    back to ``b − apply(A, x)``.
    """
    if op.is_constant and x.dtype == jnp.float32:
        from openmg_tpu.ops import kernels

        if kernels.supports(op.offsets, x.shape):
            return kernels.residual_const_3d(op.values, op.offsets, b, x)
    return b - apply(op, x)
