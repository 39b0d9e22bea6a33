"""Problem generators: CSR assembly vs stencil form vs known structure (R1)."""

import numpy as np
import pytest
import scipy.sparse as sp

from openmg_tpu.models.poisson import (
    poisson,
    poisson_stencil,
    rhs_random,
    stencil_from_csr,
    stencil_to_csr,
)


@pytest.mark.parametrize("shape", [(8,), (64,), (8, 8), (16, 8), (4, 4, 4), (8, 4, 6)])
def test_poisson_structure(shape):
    A = poisson(shape)
    n = int(np.prod(shape))
    d = len(shape)
    assert A.shape == (n, n)
    assert np.allclose(A.diagonal(), 2 * d)
    # symmetric, off-diagonals are -1
    assert (abs(A - A.T)).nnz == 0
    off = A - sp.diags(A.diagonal())
    assert np.all(off.data == -1)
    # row sums: zero in the interior, positive on the boundary (Dirichlet)
    rs = np.asarray(A.sum(axis=1)).ravel()
    assert np.all(rs >= -1e-12)
    interior = rs[np.abs(rs) < 1e-12]
    if all(s > 2 for s in shape):
        assert interior.size == int(np.prod([s - 2 for s in shape]))


@pytest.mark.parametrize("shape", [(8,), (8, 8), (4, 6, 8)])
def test_stencil_matches_csr(shape):
    offsets, coeffs = poisson_stencil(shape)
    A_stencil = stencil_to_csr(offsets, coeffs)
    A = poisson(shape)
    assert (abs(A - A_stencil)).max() == 0


@pytest.mark.parametrize("shape", [(8,), (8, 8), (4, 6, 8)])
def test_stencil_roundtrip_from_csr(shape):
    A = poisson(shape)
    offsets, coeffs = stencil_from_csr(A, shape)
    assert offsets[0] == (0,) * len(shape)
    A2 = stencil_to_csr(offsets, coeffs)
    assert (abs(A - A2)).max() == 0


def test_stencil_from_csr_rejects_dense_coupling():
    rng = np.random.default_rng(0)
    A = sp.csr_matrix(rng.standard_normal((64, 64)))
    with pytest.raises(ValueError):
        stencil_from_csr(A, (8, 8), max_offsets=27)


def test_rhs_reproducible():
    a = rhs_random((4, 4), seed=3)
    b = rhs_random((4, 4), seed=3)
    np.testing.assert_array_equal(a, b)
