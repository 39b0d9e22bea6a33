"""Variable-coefficient diffusion generator + varying-coefficient solve
path (beyond the reference's constant-coefficient Poisson)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from openmg_tpu import SolverConfig, setup
from openmg_tpu.models.poisson import (
    diffusion,
    diffusion_stencil,
    poisson,
    poisson_stencil,
    rhs_random,
)


def test_reduces_to_poisson_for_unit_kappa():
    shape = (9, 7)
    offs_d, cfs_d = diffusion_stencil(np.ones(shape))
    offs_p, cfs_p = poisson_stencil(shape)
    assert offs_d == offs_p
    np.testing.assert_array_equal(cfs_d, cfs_p)


@pytest.mark.parametrize("shape", [(24,), (16, 12), (8, 8, 8)])
def test_spd_m_matrix(shape):
    rng = np.random.default_rng(0)
    kappa = np.exp(rng.normal(size=shape))  # lognormal medium
    A = diffusion(kappa)
    # symmetric
    assert abs(A - A.T).max() < 1e-12
    # positive definite (smallest eigenvalue > 0 via direct solve check)
    n = A.shape[0]
    x = rng.standard_normal(n)
    assert x @ (A @ x) > 0
    # M-matrix: positive diagonal, nonpositive off-diagonals
    assert (A.diagonal() > 0).all()
    off = A - __import__("scipy.sparse", fromlist=["diags"]).diags(A.diagonal())
    assert off.max() <= 1e-14


def test_rejects_nonpositive_kappa():
    with pytest.raises(ValueError, match="positive"):
        diffusion_stencil(np.zeros((4, 4)))


@pytest.mark.parametrize("smoother", ["rbgs", "jacobi", "chebyshev"])
def test_solves_discontinuous_medium(smoother):
    """4-orders-of-magnitude coefficient jump: converges and matches the
    direct solve (the varying-coefficient hierarchy path end to end)."""
    shape = (32, 32)
    kappa = np.ones(shape)
    kappa[8:24, 8:24] = 1e4  # high-conductivity inclusion
    offsets, coeffs = diffusion_stencil(kappa)
    b = rhs_random(shape, seed=1)

    # the double-float residual floor is ~‖A‖·‖x‖·2⁻⁴⁹ ≈ 1.4e-10 here
    # (‖A‖ ~ 8e4 from the κ jump) — the reference's absolute threshold
    # must sit above the operator-scaled floor
    cfg = SolverConfig(
        smoother=smoother, transfer="linear", cycles=200,
        gridlevels=4, max_dense_coarse=4096, threshold=1e-9,
    )
    solver = setup((offsets, coeffs), cfg)
    x, info = solver.solve(b)
    assert info["converged"], info["residual_norms"][-5:]

    A = diffusion(kappa)
    x_dir = spla.spsolve(A.tocsc(), b.ravel())
    err = np.linalg.norm(np.asarray(x).ravel() - x_dir) / np.linalg.norm(x_dir)
    assert err < 1e-6


def test_smooth_medium_3d():
    shape = (16, 16, 16)
    zz, yy, xx = np.meshgrid(*[np.linspace(0, 1, s) for s in shape],
                             indexing="ij")
    kappa = 1.0 + 0.5 * np.sin(2 * np.pi * zz) * np.cos(2 * np.pi * yy)
    assert (kappa > 0).all()
    offsets, coeffs = diffusion_stencil(kappa)
    b = rhs_random(shape, seed=2)
    cfg = SolverConfig(transfer="linear", cycles=100, gridlevels=3,
                       max_dense_coarse=4096)
    x, info = setup((offsets, coeffs), cfg).solve(b)
    assert info["converged"]
    A = diffusion(kappa)
    x_dir = spla.spsolve(A.tocsc(), b.ravel())
    err = np.linalg.norm(np.asarray(x).ravel() - x_dir) / np.linalg.norm(x_dir)
    assert err < 1e-8
