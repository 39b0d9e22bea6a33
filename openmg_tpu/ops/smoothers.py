"""Stationary smoothers on stencil operators (components R4, T3, T4).

The reference pre-smooths with lexicographic Gauss–Seidel
(``iterative_solve``, SURVEY.md R4) — inherently sequential over rows.  The
TPU build uses the two order-free variants named by BASELINE:

* weighted Jacobi  ``x ← x + ω D⁻¹ (b − A x)``  (T3), and
* red–black Gauss–Seidel — update the red parity class from black, then
  black from red (T4).  For bipartite stencils (the 2d+1-point Poisson
  operators and all aggregation-Galerkin coarsenings of them, which stay
  (2d+1)-point) this is exactly Gauss–Seidel in the red-black ordering.

These are the jnp reference implementations; XLA already fuses each sweep
into a single HBM-streaming loop nest.  The red/black parity mask is
generated inline from broadcasted iota (XLA fuses it — index parity costs
zero HBM traffic, where a stored bool mask would stream 1 byte/point per
half-sweep).  The Pallas fused kernels (:mod:`openmg_tpu.ops.kernels`)
implement the same math with explicit VMEM tiling and are tested against
these.

Iteration counts are static (Python ints), so sweeps unroll at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from openmg_tpu.ops.stencil import (
    StencilOperator,
    apply,
    diag_index,
    residual,
    shift,
)

__all__ = [
    "jacobi",
    "rbgs",
    "chebyshev",
    "gershgorin_lambda_max",
    "red_mask",
    "parity_mask_expr",
    "smooth",
]


def parity_mask_expr(shape):
    """Traced red-parity mask (True where coordinate-sum parity is even);
    generated from iota inside the surrounding jit — no memory traffic."""
    shape = tuple(int(s) for s in shape)
    acc = None
    for a in range(len(shape)):
        par = jax.lax.broadcasted_iota(jnp.int32, shape, a) & 1
        acc = par if acc is None else acc ^ par
    return acc == 0


def red_mask(shape) -> "jnp.ndarray":
    """Materialized red/black parity mask (kept for tests/inspection; the
    smoothers use :func:`parity_mask_expr` inline).

    Parity of a sum is the xor of parities — computed by broadcasting uint8
    aranges (np.indices would materialize d full int64 grids; at 256³ that
    is 400 MB of traffic on a bandwidth-starved host).
    """
    import numpy as np

    shape = tuple(int(s) for s in shape)
    acc = None
    for a, s in enumerate(shape):
        view = [1] * len(shape)
        view[a] = -1
        par = (np.arange(s, dtype=np.uint8) & 1).reshape(view)
        acc = par if acc is None else acc ^ par
    return jnp.asarray(acc == 0)


def jacobi(
    op: StencilOperator,
    inv_diag,
    b,
    x,
    iterations: int,
    omega: float = 2.0 / 3.0,
):
    om = jnp.asarray(omega, dtype=x.dtype)
    for _ in range(iterations):
        x = x + om * inv_diag * (b - apply(op, x))
    return x


def _offdiag_apply(op: StencilOperator, x):
    """(A − D) x : stencil apply skipping the zero offset."""
    di = diag_index(op.offsets)
    y = None
    for k, off in enumerate(op.offsets):
        if k == di:
            continue
        t = op.coeff(k) * shift(x, off)
        y = t if y is None else y + t
    return y


def rbgs(
    op: StencilOperator,
    inv_diag,
    b,
    x,
    iterations: int,
):
    """Red–black Gauss–Seidel: per half-sweep, colored points are set to
    ``D⁻¹ (b − (A − D) x)`` using the other color's current values."""
    mask = parity_mask_expr(x.shape)
    for _ in range(iterations):
        for m in (mask, ~mask):
            xn = inv_diag * (b - _offdiag_apply(op, x))
            x = jnp.where(m, xn, x)
    return x


def gershgorin_lambda_max(op: StencilOperator, inv_diag):
    """Upper bound on λmax(D⁻¹A): ``max_i (1 + Σ_j≠i |a_ij| / a_ii)``.

    Scalar expression for constant stencils (zero runtime cost under jit);
    one fused reduction for varying ones.  Exactly 2 for Poisson.
    """
    di = diag_index(op.offsets)
    if op.is_constant:
        offsum = sum(
            jnp.abs(op.values[k])
            for k in range(op.num_offsets)
            if k != di
        )
        return 1.0 + offsum * jnp.abs(inv_diag)
    offsum = None
    for k in range(op.num_offsets):
        if k == di:
            continue
        t = jnp.abs(op.coeffs[k])
        offsum = t if offsum is None else offsum + t
    return 1.0 + jnp.max(offsum * jnp.abs(inv_diag))


def chebyshev(
    op: StencilOperator,
    inv_diag,
    b,
    x,
    iterations: int,
    lam_max=None,
):
    """Fourth-kind Chebyshev polynomial smoother (PAPERS.md: "Optimal
    Polynomial Smoothers for Parallel AMG"; Lottes' 4th-kind scheme).

    K iterations of ``x ← x + d_k`` with the d-recurrence

        d_1 = 4/(3 λmax) · D⁻¹ r₀
        d_{k+1} = (2k−1)/(2k+3) · d_k + (8k+4)/((2k+3) λmax) · D⁻¹ r_k

    damps the whole upper half of the spectrum optimally in the 4th-kind
    Chebyshev sense; K=1 with λmax=2 is exactly ω=2/3 weighted Jacobi
    (pinned by tests).  Order-free (pure Jacobi building blocks), so it
    distributes exactly like Jacobi.  Each iteration costs one A-apply —
    the ``residual`` fast path (Pallas on constant 3D stencils) computes
    both the initial residual and the ``r ← r − A d`` updates.
    """
    if lam_max is None:
        lam_max = gershgorin_lambda_max(op, inv_diag)
    lam_max = jnp.asarray(lam_max, dtype=x.dtype)
    r = residual(op, b, x)
    d = (4.0 / 3.0) / lam_max * inv_diag * r
    for k in range(1, iterations + 1):
        x = x + d
        if k == iterations:
            break
        r = residual(op, r, d)  # r ← r − A d
        d = ((2 * k - 1) / (2 * k + 3)) * d + (
            (8 * k + 4) / (2 * k + 3)
        ) / lam_max * inv_diag * r
    return x


def smooth(
    name: str,
    op: StencilOperator,
    inv_diag,
    b,
    x,
    iterations: int,
    omega: float,
    use_pallas: bool = True,
):
    if iterations <= 0:
        return x
    if use_pallas and op.is_constant and x.dtype == jnp.float32:
        from openmg_tpu.ops import fused, kernels

        # deep-fusion tier: S half-sweeps per HBM pass (ops/fused.py)
        y = fused.smooth_fused(name, op, b, x, iterations, omega)
        if y is not None:
            return y
        if kernels.supports(op.offsets, x.shape):
            if name == "jacobi":
                return kernels.jacobi_const_3d(
                    op.values, op.offsets, b, x, iterations, omega
                )
            if name == "rbgs":
                return kernels.rbgs_const_3d(op.values, op.offsets, b, x, iterations)
    if name == "jacobi":
        return jacobi(op, inv_diag, b, x, iterations, omega)
    if name == "rbgs":
        return rbgs(op, inv_diag, b, x, iterations)
    if name == "chebyshev":
        return chebyshev(op, inv_diag, b, x, iterations)
    raise ValueError(f"unknown smoother {name!r}")
