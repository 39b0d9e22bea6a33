"""Structured Galerkin RAP == scipy SpGEMM on explicit matrices (T6)."""

import numpy as np
import pytest

from openmg_tpu.models.poisson import poisson_stencil, stencil_to_csr
from openmg_tpu.ops.galerkin import galerkin_rap_stencil
from openmg_tpu.ops.transfer import AGGREGATE, LINEAR
from openmg_tpu.utils.oracle import (
    aggregate_restriction,
    weighted_prolongation,
    weighted_restriction,
)

SPECS = [AGGREGATE, LINEAR]


@pytest.mark.parametrize("shape", [(8,), (64,), (8, 8), (4, 2), (4, 6, 8), (2, 2, 2)])
@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_rap_matches_spgemm(shape, spec):
    offsets, coeffs = poisson_stencil(shape)
    c_offsets, c_coeffs = galerkin_rap_stencil(offsets, coeffs, transfer=spec)
    Ac_structured = stencil_to_csr(c_offsets, c_coeffs)
    R = weighted_restriction(shape, spec.r_taps)
    P = weighted_prolongation(shape, spec.p_taps)
    A = stencil_to_csr(offsets, coeffs)
    Ac_spgemm = (R @ A @ P).tocsr()
    assert (abs(Ac_structured - Ac_spgemm)).max() < 1e-13


def test_rap_aggregate_matches_reference_RART():
    shape = (8, 8)
    offsets, coeffs = poisson_stencil(shape)
    c_offsets, c_coeffs = galerkin_rap_stencil(offsets, coeffs, transfer=AGGREGATE)
    R = aggregate_restriction(shape)
    A = stencil_to_csr(offsets, coeffs)
    Ac = (R @ A @ R.T).tocsr()
    assert (abs(stencil_to_csr(c_offsets, c_coeffs) - Ac)).max() < 1e-13


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_rap_chain_stays_compact_and_symmetric(spec):
    # aggregation keeps (2d+1)-point; linear converges to ≤ 3^d-point
    offsets, coeffs = poisson_stencil((16, 16, 16))
    bound = 7 if spec.name == "aggregate" else 27
    for _ in range(3):
        offsets, coeffs = galerkin_rap_stencil(offsets, coeffs, transfer=spec)
        assert len(offsets) <= bound
        assert all(all(abs(o) <= 1 for o in off) for off in offsets)
        A = stencil_to_csr(offsets, coeffs)
        assert (abs(A - A.T)).max() < 1e-12
        w = np.linalg.eigvalsh(A.toarray())
        assert w.min() > 0  # SPD preserved


def test_rap_random_spd_stencil():
    # spatially-varying SPD stencil (not constant-coefficient Poisson)
    rng = np.random.default_rng(0)
    shape = (8, 8)
    offsets, coeffs = poisson_stencil(shape)
    coeffs = coeffs.copy()
    coeffs[0] += rng.uniform(0.5, 1.5, size=shape)
    for spec in SPECS:
        c_offsets, c_coeffs = galerkin_rap_stencil(offsets, coeffs, transfer=spec)
        R = weighted_restriction(shape, spec.r_taps)
        P = weighted_prolongation(shape, spec.p_taps)
        A = stencil_to_csr(offsets, coeffs)
        Ac = (R @ A @ P).tocsr()
        assert (abs(stencil_to_csr(c_offsets, c_coeffs) - Ac)).max() < 1e-13
