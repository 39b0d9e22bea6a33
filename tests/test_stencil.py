"""Stencil SpMV / smoother math vs scipy oracles (T2/T3/T4 jnp paths)."""

import numpy as np
import pytest
import scipy.sparse as sp

from openmg_tpu.models.poisson import poisson, poisson_stencil, rhs_random
from openmg_tpu.ops.smoothers import jacobi, rbgs, red_mask
from openmg_tpu.ops.stencil import StencilOperator, apply, residual, shift
from openmg_tpu.utils.oracle import jacobi_np

import jax.numpy as jnp


@pytest.mark.parametrize("off", [(0,), (1,), (-1,), (2,)])
def test_shift_1d(off):
    x = jnp.arange(1.0, 6.0)
    z = np.asarray(shift(x, off))
    n = 5
    expected = np.zeros(n)
    for i in range(n):
        j = i + off[0]
        if 0 <= j < n:
            expected[i] = float(x[j])
    np.testing.assert_array_equal(z, expected)


def test_shift_2d():
    x = jnp.arange(12.0).reshape(3, 4)
    z = np.asarray(shift(x, (1, -1)))
    expected = np.zeros((3, 4))
    for i in range(3):
        for j in range(4):
            if 0 <= i + 1 < 3 and 0 <= j - 1 < 4:
                expected[i, j] = float(x[i + 1, j - 1])
    np.testing.assert_array_equal(z, expected)


@pytest.mark.parametrize("shape", [(16,), (8, 8), (4, 6, 8)])
def test_apply_matches_scipy(shape):
    offsets, coeffs = poisson_stencil(shape)
    op = StencilOperator(jnp.asarray(coeffs), offsets)
    x = rhs_random(shape, seed=2)
    y = np.asarray(apply(op, jnp.asarray(x)))
    A = poisson(shape)
    np.testing.assert_allclose(y.ravel(), A @ x.ravel(), rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("shape", [(16,), (8, 8)])
def test_jacobi_matches_oracle(shape):
    offsets, coeffs = poisson_stencil(shape)
    op = StencilOperator(jnp.asarray(coeffs), offsets)
    inv_diag = 1.0 / jnp.asarray(coeffs[0])
    b = rhs_random(shape, seed=3)
    x0 = np.zeros(shape)
    got = np.asarray(
        jacobi(op, inv_diag, jnp.asarray(b), jnp.asarray(x0), 3, omega=2 / 3)
    )
    A = poisson(shape)
    expected = jacobi_np(A, b.ravel(), x0.ravel(), 3, omega=2 / 3)
    np.testing.assert_allclose(got.ravel(), expected, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("shape", [(16,), (8, 8), (4, 4, 4)])
def test_rbgs_matches_two_color_gs(shape):
    """RB-GS == Gauss–Seidel in red-black ordering: solve exactly with a
    permuted triangular oracle."""
    offsets, coeffs = poisson_stencil(shape)
    op = StencilOperator(jnp.asarray(coeffs), offsets)
    inv_diag = 1.0 / jnp.asarray(coeffs[0])
    mask = red_mask(shape)
    b = rhs_random(shape, seed=4)
    x0 = rhs_random(shape, seed=5)

    got = np.asarray(rbgs(op, inv_diag, jnp.asarray(b), jnp.asarray(x0), 1))

    # oracle: permute to red-then-black ordering, one forward GS sweep
    A = poisson(shape).toarray()
    m = np.asarray(mask).ravel()
    perm = np.concatenate([np.where(m)[0], np.where(~m)[0]])
    Ap = A[np.ix_(perm, perm)]
    bp = b.ravel()[perm]
    xp = x0.ravel()[perm].copy()
    n = len(xp)
    for i in range(n):  # forward GS in permuted order
        xp[i] = (bp[i] - Ap[i, :i] @ xp[:i] - Ap[i, i + 1 :] @ xp[i + 1 :]) / Ap[i, i]
    expected = np.empty(n)
    expected[perm] = xp
    np.testing.assert_allclose(got.ravel(), expected, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("shape", [(16,), (8, 8), (4, 4, 4)])
def test_constant_stencil_bitwise_equals_varying(shape):
    """Constant-mode operator (scalar coefficients + zero-BC) must produce
    bit-identical SpMV/smoother results to the materialized arrays."""
    offsets, coeffs = poisson_stencil(shape, dtype=np.float32)
    var_op = StencilOperator(jnp.asarray(coeffs), offsets)
    d = len(shape)
    vals = jnp.asarray([2.0 * d] + [-1.0] * (2 * d), dtype=jnp.float32)
    const_op = StencilOperator(None, offsets, vals, shape)
    assert const_op.is_constant and not var_op.is_constant
    x = jnp.asarray(rhs_random(shape, seed=8), dtype=jnp.float32)
    b = jnp.asarray(rhs_random(shape, seed=9), dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(apply(const_op, x)), np.asarray(apply(var_op, x))
    )
    inv_var = 1.0 / jnp.asarray(coeffs[0])
    inv_const = jnp.asarray(1.0 / (2.0 * d), dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(jacobi(const_op, inv_const, b, x, 3)),
        np.asarray(jacobi(var_op, inv_var, b, x, 3)),
    )
    np.testing.assert_array_equal(
        np.asarray(rbgs(const_op, inv_const, b, x, 2)),
        np.asarray(rbgs(var_op, inv_var, b, x, 2)),
    )


def test_hierarchy_detects_constant_levels():
    from openmg_tpu.core.hierarchy import build_hierarchy
    from openmg_tpu.ops.transfer import AGGREGATE, LINEAR

    offsets, coeffs = poisson_stencil((16, 16))
    h_agg = build_hierarchy(offsets, coeffs, gridlevels=3, transfer=AGGREGATE,
                            residual_dtype="doublefloat")
    assert all(l.A.is_constant for l in h_agg.levels)
    h_lin = build_hierarchy(offsets, coeffs, gridlevels=3, transfer=LINEAR,
                            residual_dtype="doublefloat")
    assert h_lin.levels[0].A.is_constant  # fine Poisson is constant
    assert not h_lin.levels[1].A.is_constant  # linear RAP varies at boundary
    assert h_lin.fine_hi.is_constant


def test_residual():
    shape = (8, 8)
    offsets, coeffs = poisson_stencil(shape)
    op = StencilOperator(jnp.asarray(coeffs), offsets)
    b = jnp.asarray(rhs_random(shape, seed=6))
    x = jnp.asarray(rhs_random(shape, seed=7))
    r = np.asarray(residual(op, b, x))
    A = poisson(shape)
    np.testing.assert_allclose(
        r.ravel(), np.asarray(b).ravel() - A @ np.asarray(x).ravel(), rtol=1e-13
    )
