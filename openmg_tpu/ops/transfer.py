"""Grid transfer operators: restriction / prolongation (components R2, T5).

The reference builds an explicit sparse aggregation matrix R with
``R[c, f] = 1/2^d`` over each coarse point's ``2^d`` fine children and uses
``P = Rᵀ`` (SURVEY.md R2).  On grid-shaped arrays those products are exact
reshape/mean and repeat/scale operations — no sparse matrix, no gather —
which is how the TPU build executes them.  ``tests/test_transfer.py`` proves
bit-level agreement with the explicit-R oracle.

Dims of size 1 are not coarsened (matching
:func:`openmg_tpu.utils.oracle.aggregate_restriction`).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["coarse_shape", "restrict", "prolong"]


def coarse_shape(shape) -> tuple:
    return tuple(max(1, int(s) // 2) for s in shape)


def _coarsened_axes(shape):
    return [a for a, s in enumerate(shape) if s > 1]


def restrict(v):
    """``R v``: mean over each 2^d aggregation cell (weight 1/2^d each)."""
    shape = v.shape
    axes = _coarsened_axes(shape)
    new_shape = []
    for a, s in enumerate(shape):
        if a in axes:
            new_shape += [s // 2, 2]
        else:
            new_shape += [s]
    w = v.reshape(new_shape)
    # positions of the inserted factor-2 axes in new_shape
    mean_axes = []
    pos = 0
    for a, s in enumerate(shape):
        if a in axes:
            mean_axes.append(pos + 1)
            pos += 2
        else:
            pos += 1
    return w.mean(axis=tuple(mean_axes))


def prolong(u, fine_shape):
    """``Rᵀ u``: each fine point receives its parent's value × 1/2^d.

    ``fine_shape`` identifies which axes were coarsened (those with
    ``fine == 2 * coarse``); a coarse dim of 1 that came from a fine dim of
    2 must still be expanded, so the fine shape cannot be inferred from
    ``u`` alone.
    """
    axes = [a for a, (f, c) in enumerate(zip(fine_shape, u.shape)) if f == 2 * c]
    for a, (f, c) in enumerate(zip(fine_shape, u.shape)):
        if a not in axes and f != c:
            raise ValueError(f"incompatible shapes {u.shape} -> {fine_shape}")
    out = u
    for a in axes:
        out = jnp.repeat(out, 2, axis=a)
    scale = 1.0 / (2 ** len(axes))
    return out * jnp.asarray(scale, dtype=u.dtype)
