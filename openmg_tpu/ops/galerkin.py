"""Galerkin coarsening ``A_c = R A Rᵀ`` in stencil form (components R3, T6).

The reference computes the triple product with scipy SpGEMM at every level
(SURVEY.md §3.1).  For regular grids with the aggregation restriction this
product has a closed structured form, computed here with pure strided array
ops (numpy or JAX — no SpGEMM, no index lists), which is what makes 512³
setup feasible (SURVEY.md §7 "Hard parts: SpGEMM at 512³"):

With R[c, f] = w for f ∈ agg(c) (w = 1/2^d over coarsened dims), fine point
f = 2I + p (parity p ∈ {0,1}^d, coarse cell I) and fine offset o,

    A_c[I, I + D] += w² · A[f, f + o]      where D = floor((p + o) / 2).

Each (offset o, parity p) pair contributes one strided slice of the fine
coefficient grid, reshaped to the coarse grid and accumulated at coarse
offset D.  Fine-grid boundary truncation (zero coefficients) propagates
automatically, so no masking is needed.  Agreement with scipy SpGEMM on the
explicit matrices is proven in tests/test_galerkin.py.
"""

from __future__ import annotations

import itertools

import numpy as np

from openmg_tpu.ops.stencil import StencilOperator
from openmg_tpu.ops.transfer import coarse_shape

__all__ = ["galerkin_rap_stencil", "galerkin_rap"]


def galerkin_rap_stencil(offsets, coeffs, prune: bool = True):
    """Structured RAP on raw ``(offsets, coeffs)`` arrays (numpy or jax).

    Returns coarse ``(offsets, coeffs)``.  ``prune`` drops coarse offsets
    whose coefficient grid is identically zero (requires concrete values —
    setup runs eagerly, outside jit).
    """
    if isinstance(coeffs, np.ndarray):
        xp = np
    else:
        import jax.numpy as xp  # device arrays: RAP runs on-device
    shape = tuple(coeffs.shape[1:])
    d = len(shape)
    axes = [a for a in range(d) if shape[a] > 1]
    if any(shape[a] % 2 for a in axes):
        raise ValueError(f"all dims > 1 must be even to coarsen, got {shape}")
    cshape = coarse_shape(shape)
    w2 = (1.0 / (2 ** len(axes))) ** 2

    parities = list(
        itertools.product(*[(0, 1) if shape[a] > 1 else (0,) for a in range(d)])
    )
    acc: dict = {}
    for k, off in enumerate(offsets):
        ck = coeffs[k]
        for p in parities:
            # coarse offset D = floor((p + o)/2); source stride-2 slice at parity p
            D = tuple(
                (p[a] + off[a]) // 2 if shape[a] > 1 else off[a] for a in range(d)
            )
            sl = tuple(
                slice(p[a], None, 2) if shape[a] > 1 else slice(None)
                for a in range(d)
            )
            contrib = ck[sl]
            if D in acc:
                acc[D] = acc[D] + contrib
            else:
                acc[D] = contrib

    c_offsets = sorted(acc.keys())
    # diagonal-first convention
    zero = (0,) * d
    if zero in c_offsets:
        c_offsets.remove(zero)
        c_offsets = [zero] + c_offsets
    stacked = xp.stack([acc[D] for D in c_offsets]) * w2
    stacked = stacked.astype(coeffs.dtype)
    assert tuple(stacked.shape[1:]) == cshape
    if prune:
        keep = [i for i in range(len(c_offsets)) if bool((stacked[i] != 0).any())]
        c_offsets = [c_offsets[i] for i in keep]
        stacked = stacked[np.asarray(keep)] if isinstance(stacked, np.ndarray) else stacked[
            list(keep)
        ]
    return tuple(c_offsets), stacked


def galerkin_rap(op: StencilOperator, prune: bool = True) -> StencilOperator:
    """Structured Galerkin coarsening of a :class:`StencilOperator`."""
    c_offsets, c_coeffs = galerkin_rap_stencil(op.offsets, op.coeffs, prune=prune)
    return StencilOperator(c_coeffs, tuple(c_offsets))
