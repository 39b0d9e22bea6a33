"""FacedStencilOperator (boundary-corrected constant levels): exactness vs
the varying-coefficient representation, and solve parity.

The faced representation must be the SAME operator (exact Galerkin), so
apply/residual/smoother sweeps must agree with the varying path to fp
round-off, and full solves must reproduce the varying-path trajectory.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openmg_tpu import SolverConfig, setup
from openmg_tpu.core.hierarchy import detect_faced
from openmg_tpu.models.poisson import rhs_random
from openmg_tpu.ops.smoothers import smooth
from openmg_tpu.ops.stencil import FacedStencilOperator, apply, residual


def _hierarchies(shape, transfer="linear"):
    cfg = SolverConfig(
        smoother="rbgs", transfer=transfer, residual_dtype="doublefloat"
    )
    s_f = setup(shape, cfg, faced=True)
    s_v = setup(shape, cfg, faced=False)
    return s_f, s_v, cfg


def _faced_levels(h):
    return [
        (i, L) for i, L in enumerate(h.levels)
        if isinstance(L.A, FacedStencilOperator)
    ]


def test_linear_transfer_produces_faced_levels():
    s_f, s_v, _ = _hierarchies((32, 32, 32))
    faced = _faced_levels(s_f.hierarchy)
    assert faced, "linear-transfer coarse levels should be faced"
    for i, L in faced:
        assert not s_v.hierarchy.levels[i].A.is_constant


@pytest.mark.parametrize("shape", [(32, 32, 32), (64, 32, 16)])
def test_faced_apply_residual_match_varying(shape):
    s_f, s_v, _ = _hierarchies(shape)
    for (i, Lf) in _faced_levels(s_f.hierarchy):
        Lv = s_v.hierarchy.levels[i]
        gs = Lf.A.grid_shape
        x = jnp.asarray(rhs_random(gs, seed=i), dtype=jnp.float32)
        b = jnp.asarray(rhs_random(gs, seed=100 + i), dtype=jnp.float32)
        yf = np.asarray(apply(Lf.A, x))
        yv = np.asarray(apply(Lv.A, x))
        np.testing.assert_allclose(yf, yv, rtol=0, atol=1e-5)
        rf = np.asarray(residual(Lf.A, b, x))
        rv = np.asarray(residual(Lv.A, b, x))
        np.testing.assert_allclose(rf, rv, rtol=0, atol=1e-5)


def test_faced_to_varying_roundtrip_exact():
    s_f, s_v, _ = _hierarchies((32, 32, 32))
    for (i, Lf) in _faced_levels(s_f.hierarchy):
        Cv = np.asarray(s_v.hierarchy.levels[i].A.coeffs)
        Cf = np.asarray(Lf.A.to_varying().coeffs)
        np.testing.assert_array_equal(Cf, Cv)


@pytest.mark.parametrize("name", ["jacobi", "rbgs", "chebyshev"])
def test_faced_smoother_matches_varying(name):
    s_f, s_v, _ = _hierarchies((32, 32, 32))
    for (i, Lf) in _faced_levels(s_f.hierarchy):
        Lv = s_v.hierarchy.levels[i]
        gs = Lf.A.grid_shape
        x = jnp.asarray(rhs_random(gs, seed=i), dtype=jnp.float32)
        b = jnp.asarray(rhs_random(gs, seed=50 + i), dtype=jnp.float32)
        xf = np.asarray(smooth(name, Lf.A, None, b, x, 2, 2.0 / 3.0))
        xv = np.asarray(
            smooth(name, Lv.A, Lv.inv_diag, b, x, 2, 2.0 / 3.0)
        )
        np.testing.assert_allclose(xf, xv, rtol=0, atol=1e-5)


def test_detect_faced_rejects_genuinely_varying():
    rng = np.random.default_rng(0)
    offsets = ((0, 0), (0, 1), (1, 0))
    coeffs = rng.normal(size=(3, 8, 8))
    assert detect_faced(offsets, coeffs) is None


def test_detect_faced_rejects_exactly_constant():
    # exactly-constant operators belong to the plain constant path
    offsets = ((0, 0), (0, 1), (0, -1))
    coeffs = np.zeros((3, 8, 8))
    coeffs[0] = 2.0
    coeffs[1, :, :-1] = -1.0
    coeffs[2, :, 1:] = -1.0
    assert detect_faced(offsets, coeffs) is None


def test_faced_solve_matches_varying_trajectory():
    shape = (32, 32, 32)
    s_f, s_v, cfg = _hierarchies(shape)
    b = rhs_random(shape, seed=3)
    b /= np.linalg.norm(b.ravel())
    b = jnp.asarray(b, dtype=jnp.float32)
    xf, inf_f = s_f.solve(b)
    xv, inf_v = s_v.solve(b)
    assert inf_f["converged"] and inf_v["converged"]
    # the operator is identical, so cycle counts must match and the
    # per-cycle norms track to fp tolerance
    assert inf_f["cycles"] == inf_v["cycles"]
    a = np.asarray(inf_f["residual_norms"])
    v = np.asarray(inf_v["residual_norms"])
    np.testing.assert_allclose(a[:-1], v[:-1], rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xv), rtol=0, atol=1e-6
    )


def test_faced_solve_converges_fast_128():
    """The linear-transfer convergence rate (the reason the faced path
    exists) must be preserved: ≤ 10 cycles to 1e-10 at 128³ (cf. 7 at the
    exact-Galerkin baseline; constant-projected coarse ops needed 60+)."""
    shape = (128, 128, 128)
    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", residual_dtype="doublefloat"
    )
    s = setup(shape, cfg)
    assert _faced_levels(s.hierarchy)
    b = rhs_random(shape, seed=1)
    b /= np.linalg.norm(b.ravel())
    b = jnp.asarray(b, dtype=jnp.float32)
    _, info = s.solve(b)
    assert info["converged"]
    assert info["cycles"] <= 10, info["cycles"]
