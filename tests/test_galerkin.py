"""Structured Galerkin RAP == scipy SpGEMM on explicit matrices (T6)."""

import numpy as np
import pytest

from openmg_tpu.models.poisson import poisson_stencil, stencil_to_csr
from openmg_tpu.ops.galerkin import galerkin_rap_stencil
from openmg_tpu.utils.oracle import aggregate_restriction


@pytest.mark.parametrize("shape", [(8,), (64,), (8, 8), (4, 2), (4, 6, 8), (2, 2, 2)])
def test_rap_matches_spgemm(shape):
    offsets, coeffs = poisson_stencil(shape)
    c_offsets, c_coeffs = galerkin_rap_stencil(offsets, coeffs)
    Ac_structured = stencil_to_csr(c_offsets, c_coeffs)
    R = aggregate_restriction(shape)
    A = stencil_to_csr(offsets, coeffs)
    Ac_spgemm = (R @ A @ R.T).tocsr()
    assert (abs(Ac_structured - Ac_spgemm)).max() < 1e-13


def test_rap_chain_stays_compact_and_symmetric():
    # aggregation-Galerkin of the (2d+1)-point operator stays (2d+1)-point
    offsets, coeffs = poisson_stencil((16, 16, 16))
    for _ in range(3):
        offsets, coeffs = galerkin_rap_stencil(offsets, coeffs)
        assert len(offsets) <= 7
        A = stencil_to_csr(offsets, coeffs)
        assert (abs(A - A.T)).max() < 1e-13


def test_rap_random_spd_stencil():
    # spatially-varying SPD stencil (not constant-coefficient Poisson)
    rng = np.random.default_rng(0)
    shape = (8, 8)
    offsets, coeffs = poisson_stencil(shape)
    coeffs = coeffs.copy()
    # random symmetric positive perturbation of the diagonal
    coeffs[0] += rng.uniform(0.5, 1.5, size=shape)
    c_offsets, c_coeffs = galerkin_rap_stencil(offsets, coeffs)
    R = aggregate_restriction(shape)
    A = stencil_to_csr(offsets, coeffs)
    Ac = (R @ A @ R.T).tocsr()
    assert (abs(stencil_to_csr(c_offsets, c_coeffs) - Ac)).max() < 1e-13
