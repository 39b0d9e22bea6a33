"""V-cycle engine (components R6, T7, T8).

The reference's ``mg_cycle`` is a recursive Python function (SURVEY.md
§3.2).  Here the recursion unrolls at *trace* time over the static level
list — per-level shapes differ, so the "recursion" becomes straight-line
multi-level code inside a single jitted XLA program; there is no dynamic
control flow on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from openmg_tpu.core.hierarchy import Hierarchy
from openmg_tpu.ops.smoothers import smooth
from openmg_tpu.ops.stencil import apply, residual
from openmg_tpu.ops.transfer import prolong, restrict

__all__ = ["v_cycle", "coarse_solve"]


def coarse_solve(hierarchy: Hierarchy, b):
    """Direct solve at the coarsest level via the precomputed dense inverse
    (R8): one small matmul, MXU-friendly."""
    shape = b.shape
    x = hierarchy.coarse_inv @ b.reshape(-1)
    return x.reshape(shape)


def v_cycle(
    hierarchy: Hierarchy,
    b,
    x,
    level: int = 0,
    pre: int = 2,
    post: int = 2,
    smoother: str = "rbgs",
    omega: float = 2.0 / 3.0,
):
    """One V-cycle starting at ``level``; returns the improved ``x``.

    All loop/recursion bounds are static; under ``jax.jit`` this traces to
    one straight-line multi-level program (T7).
    """
    L = hierarchy.levels[level]
    if level == hierarchy.num_levels - 1:
        return coarse_solve(hierarchy, b)
    x = smooth(smoother, L.A, L.inv_diag, b, x, pre, omega)
    r = residual(L.A, b, x)
    bc = restrict(r, hierarchy.transfer)
    ec = v_cycle(
        hierarchy,
        bc,
        jnp.zeros_like(bc),
        level + 1,
        pre,
        post,
        smoother,
        omega,
    )
    x = x + prolong(ec, L.grid_shape, hierarchy.transfer)
    x = smooth(smoother, L.A, L.inv_diag, b, x, post, omega)
    return x
