"""Cycle engine: V / W / FMG (components R6, T7, T8).

The reference's ``mg_cycle`` is a recursive Python function (SURVEY.md
§3.2).  Here the recursion unrolls at *trace* time over the static level
list — per-level shapes differ, so the "recursion" becomes straight-line
multi-level code inside a single jitted XLA program; there is no dynamic
control flow on device.

Beyond the reference's V-cycle, two standard stronger cycles ship
(selected by ``SolverConfig.cycle_type``):

* **W-cycle** (``gamma=2``): each level visits its coarser level twice —
  more robust for hard problems at ~2× coarse-level work (cheap in 3D,
  where each level is 1/8 the size).
* **FMG** (full multigrid, "f"): restrict the rhs to every level, solve
  the coarsest exactly, then work back up — prolongate and run one
  V-cycle per level.  One FMG pass costs ~1.3× a V-cycle and contracts
  the error like ~2 V-cycles, so as the defect-correction preconditioner
  it cuts outer cycles roughly in half.
"""

from __future__ import annotations

import jax.numpy as jnp

from openmg_tpu.core.hierarchy import Hierarchy
from openmg_tpu.ops.smoothers import smooth
from openmg_tpu.ops.stencil import apply, residual
from openmg_tpu.ops.transfer import prolong, restrict

__all__ = ["v_cycle", "fmg_cycle", "coarse_solve", "run_cycle", "pcg_solve"]


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
    gamma: int = 1,
    x_zero: bool = False,
):
    """One µ-cycle starting at ``level`` (``gamma=1`` → V, 2 → W);
    returns the improved ``x``.

    All loop/recursion bounds are static; under ``jax.jit`` this traces to
    one straight-line multi-level program (T7).

    ``x_zero`` declares (statically) that ``x`` is all-zero — true at every
    level of the defect-correction cycle (fine level solves ``A e = r``
    from zero; each coarse visit starts from a zero correction).  The
    pre-smooth + residual then take the fused zero-start Pallas kernel
    (ops/fused.py), which reads only ``b``.
    """
    from openmg_tpu.ops import fused

    L = hierarchy.levels[level]
    if level == hierarchy.num_levels - 1:
        return coarse_solve(hierarchy, b)
    # deepest fusion first: pre-smooth + residual + restriction in ONE
    # Pallas pass (never materializes the fine residual); then the
    # pre-smooth + residual pair; then the separate jnp/Pallas pieces
    bc = None
    if pre > 0:
        out = fused.presmooth_restrict_fused(
            smoother, L.A, b, None if x_zero else x, pre, omega,
            hierarchy.transfer,
        )
        if out is not None:
            x, bc = out
    if bc is None:
        fused_pre = None
        if x_zero:
            if pre == 0:
                x, r = x, b  # r = b − A·0
                fused_pre = (x, r)
            else:
                fused_pre = fused.presmooth_residual_fused(
                    smoother, L.A, b, pre, omega
                )
        if fused_pre is not None:
            x, r = fused_pre
            bc = restrict(r, hierarchy.transfer)
        else:
            x = smooth(smoother, L.A, L.inv_diag, b, x, pre, omega)
            # partial fusion for levels whose planes are too large for
            # the staged fusions (512²-class): residual + restriction in
            # one stage-free kernel, never materializing r
            bc = fused.residual_restrict_fused(
                L.A, b, x, hierarchy.transfer
            )
            if bc is None:
                r = residual(L.A, b, x)
                bc = restrict(r, hierarchy.transfer)
    ec = jnp.zeros_like(bc)
    # µ recursive visits; at the level just above the coarsest a second
    # visit would re-run the exact solve on an (near-)unchanged residual,
    # so W-cycles fall back to one visit there (standard optimization)
    visits = 1 if level == hierarchy.num_levels - 2 else gamma
    for v in range(visits):
        ec = v_cycle(
            hierarchy,
            bc,
            ec,
            level + 1,
            pre,
            post,
            smoother,
            omega,
            gamma,
            x_zero=(v == 0),
        )
    if post > 0:
        y = fused.prolong_smooth_fused(
            smoother, L.A, b, x, ec, post, omega, hierarchy.transfer
        )
        if y is not None:
            return y
        if post > 1:
            # partial fusion (512²-class planes): prolong + the FIRST
            # post-sweep in one kernel, remaining sweeps on the chunked
            # tier — exact composition of the same stages
            y = fused.prolong_smooth_fused(
                smoother, L.A, b, x, ec, 1, omega, hierarchy.transfer
            )
            if y is not None:
                return smooth(
                    smoother, L.A, L.inv_diag, b, y, post - 1, omega
                )
    x = x + prolong(ec, L.grid_shape, hierarchy.transfer)
    x = smooth(smoother, L.A, L.inv_diag, b, x, post, omega)
    return x


def fmg_cycle(
    hierarchy: Hierarchy,
    b,
    pre: int = 2,
    post: int = 2,
    smoother: str = "rbgs",
    omega: float = 2.0 / 3.0,
    gamma: int = 1,
):
    """One full-multigrid pass for ``A x = b`` from a zero initial guess
    (the defect-correction outer loop always solves from zero, so FMG
    needs no ``x`` argument): restrict ``b`` to every level, solve the
    coarsest exactly, then prolongate upward with one µ-cycle per level.
    """
    bs = [b]
    for lvl in range(hierarchy.num_levels - 1):
        bs.append(restrict(bs[-1], hierarchy.transfer))
    x = coarse_solve(hierarchy, bs[-1])
    for lvl in range(hierarchy.num_levels - 2, -1, -1):
        shape = hierarchy.levels[lvl].grid_shape
        x = prolong(x, shape, hierarchy.transfer)
        x = v_cycle(
            hierarchy, bs[lvl], x, lvl, pre, post, smoother, omega, gamma
        )
    return x


def run_cycle(
    hierarchy: Hierarchy,
    r,
    cycle_type: str = "v",
    pre: int = 2,
    post: int = 2,
    smoother: str = "rbgs",
    omega: float = 2.0 / 3.0,
):
    """Error-correction cycle ``e ≈ A⁻¹ r`` from zero, by cycle type."""
    if cycle_type == "v":
        return v_cycle(
            hierarchy, r, jnp.zeros_like(r), 0, pre, post, smoother, omega, 1,
            x_zero=True,
        )
    if cycle_type == "w":
        return v_cycle(
            hierarchy, r, jnp.zeros_like(r), 0, pre, post, smoother, omega, 2,
            x_zero=True,
        )
    if cycle_type == "f":
        return fmg_cycle(hierarchy, r, pre, post, smoother, omega, 1)
    raise ValueError(f"unknown cycle_type {cycle_type!r}; choose v|w|f")


def pcg_solve(
    hierarchy: Hierarchy,
    r0,
    iters: int = 2,
    cycle_type: str = "v",
    pre: int = 2,
    post: int = 2,
    smoother: str = "rbgs",
    omega: float = 2.0 / 3.0,
):
    """``iters`` steps of conjugate gradients on ``A e = r0`` from zero,
    preconditioned by one multigrid cycle per step (beyond the reference:
    MG-preconditioned Krylov is the standard production combination for
    SPD systems with rough coefficients, where a stationary V-cycle's
    contraction degrades — PAPERS.md two-stage-GS/Krylov literature).

    Used as the inner error solver of the defect-correction loop
    (``SolverConfig(krylov="pcg")``): the outer loop tolerates a
    nonlinear inner map, so no flexible-CG machinery is needed.  All
    static trip counts — trace-unrolls into the single solve program.
    """
    from openmg_tpu.ops.stencil import apply as stencil_apply

    A = hierarchy.levels[0].A

    def precond(rr):
        return run_cycle(
            hierarchy, rr, cycle_type, pre, post, smoother, omega
        )

    e = jnp.zeros_like(r0)
    r = r0
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    for it in range(iters):
        Ap = stencil_apply(A, p)
        alpha = rz / jnp.sum(p * Ap)
        e = e + alpha * p
        if it == iters - 1:
            break
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / rz
        rz = rz_new
        p = z + beta * p
    return e
