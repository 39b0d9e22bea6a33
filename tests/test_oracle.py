"""M0: the numpy mirror of the reference algorithm converges on the
BASELINE configs and agrees with the direct-solver oracle (SURVEY.md §4.2-1).
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from openmg_tpu.models.poisson import poisson, rhs_random
from openmg_tpu.utils.oracle import (
    aggregate_restriction,
    coarsen_A,
    gauss_seidel_np,
    jacobi_np,
    max_gridlevels,
    reference_mg_solve,
    restrictions,
)


def test_max_gridlevels():
    assert max_gridlevels((64,)) == 7  # 64..1
    assert max_gridlevels((6,)) == 2  # 6 -> 3 (odd stops)
    assert max_gridlevels((256, 256)) == 9
    assert max_gridlevels((1,)) == 1


@pytest.mark.parametrize("shape", [(8,), (8, 8), (4, 4, 4), (2, 8, 4)])
def test_restriction_shapes_and_rowsums(shape):
    R = aggregate_restriction(shape)
    cshape = tuple(max(1, s // 2) for s in shape)
    assert R.shape == (int(np.prod(cshape)), int(np.prod(shape)))
    # each coarse row averages its 2^d children: rows sum to 1
    np.testing.assert_allclose(np.asarray(R.sum(axis=1)).ravel(), 1.0)


def test_galerkin_coarse_symmetric_spd():
    A = poisson((8, 8))
    Rs, shapes = restrictions((8, 8), 3)
    As = coarsen_A(A, Rs)
    assert shapes == [(8, 8), (4, 4), (2, 2)]
    for Ac in As:
        assert (abs(Ac - Ac.T)).max() < 1e-14
        w = np.linalg.eigvalsh(Ac.toarray())
        assert w.min() > 0  # SPD preserved by Galerkin with full-rank R


def test_smoothers_reduce_residual():
    A = poisson((16, 16))
    b = rhs_random((16, 16), seed=1).ravel()
    x0 = np.zeros_like(b)
    r0 = np.linalg.norm(b)
    for sm in (gauss_seidel_np, jacobi_np):
        x = sm(A, b, x0.copy(), 5)
        assert np.linalg.norm(b - A @ x) < r0


@pytest.mark.parametrize(
    "shape,gridlevels,smoother",
    [
        ((64,), 2, "jacobi"),  # BASELINE config 1 (reference-parity run)
        ((64,), None, "gauss_seidel"),
        ((32, 32), 5, "gauss_seidel"),
        ((16, 16, 16), None, "gauss_seidel"),
    ],
)
def test_oracle_converges_to_direct_solve(shape, gridlevels, smoother):
    A = poisson(shape)
    b = rhs_random(shape, seed=0).ravel()
    params = {
        "problemshape": shape,
        "gridlevels": gridlevels,
        "iterations": 2,
        "post_iterations": 2,
        "cycles": 300,
        "threshold": 1e-10,
        "smoother": smoother,
    }
    x, info = reference_mg_solve(A, b, params)
    assert info["converged"], info
    x_true = spla.spsolve(sp.csc_matrix(A), b)
    np.testing.assert_allclose(x, x_true, atol=1e-8)
    # monotone-ish convergence: final residual really is below threshold
    assert info["final_norm"] < 1e-10
    assert info["residual_norms"][0] > info["final_norm"]
