"""Observability + checkpoint/resume tests (T15, SURVEY.md §5.4/§5.5)."""

import json

import numpy as np
import pytest

from openmg_tpu import SolverConfig, setup
from openmg_tpu.models.poisson import rhs_random
from openmg_tpu.utils.checkpoint import (
    config_hash,
    load_checkpoint,
    save_checkpoint,
)
from openmg_tpu.utils.observe import (
    convergence_factor,
    level_breakdown,
    solve_report,
)


@pytest.fixture(scope="module")
def solver():
    return setup((32, 32), SolverConfig(smoother="rbgs", transfer="linear"))


def test_solve_report_is_jsonable(solver):
    b = rhs_random((32, 32), seed=0)
    x, info = solver.solve(b)
    rep = solve_report(solver, info)
    s = json.dumps(rep)  # must not raise
    back = json.loads(s)
    assert back["converged"] is True
    assert back["cycles"] == info["cycles"]
    assert 0 < back["convergence_factor"] < 1
    assert back["level_stats"][0]["shape"] == [32, 32]
    assert back["cycle_smoother_nnz_per_s"] > 0


def test_level_breakdown(solver):
    recs = level_breakdown(solver, sweeps=2, reps=1)
    assert len(recs) == solver.hierarchy.num_levels
    for r in recs:
        assert r["smoother_nnz_per_s"] > 0
        assert r["smoother_ms_per_sweep"] > 0
    assert recs[0]["nnz"] > recs[-1]["nnz"]


def test_convergence_factor():
    rho = 0.1
    norms = [1.0 * rho**k for k in range(8)]
    assert convergence_factor(norms) == pytest.approx(rho, rel=1e-12)
    assert np.isnan(convergence_factor([1.0, 0.1]))


def test_checkpoint_roundtrip(tmp_path):
    p = tmp_path / "ck.npz"
    x = np.random.default_rng(0).normal(size=(4, 4))
    save_checkpoint(p, x, 3, [1.0, 0.5, 0.25, 0.1], "abc")
    x2, cyc, hist = load_checkpoint(p, "abc")
    np.testing.assert_array_equal(x, x2)
    assert cyc == 3
    assert hist == [1.0, 0.5, 0.25, 0.1]
    with pytest.raises(ValueError, match="hash"):
        load_checkpoint(p, "other")


def test_resume_matches_uninterrupted(tmp_path):
    """A solve interrupted after 3 cycles and resumed with a higher cycle
    cap must reproduce the uninterrupted solve exactly (deterministic
    cycles; the checkpoint stores the exact full-precision state)."""
    shape = (32, 32)
    b = rhs_random(shape, seed=3)

    full = SolverConfig(smoother="rbgs", transfer="linear", cycles=40)
    x_ref, info_ref = setup(shape, full).solve(b)
    assert info_ref["converged"]

    # interrupted run: cycle cap 3 (cap excluded from the config hash)
    p = tmp_path / "state.npz"
    short = SolverConfig(smoother="rbgs", transfer="linear", cycles=3)
    _, info3 = setup(shape, short).solve(b, checkpoint_path=str(p))
    assert not info3["converged"]
    _, cyc, _ = load_checkpoint(p, config_hash(short, shape))
    assert cyc == 3

    # resume under the full cap: continues from cycle 3 to convergence
    x_res, info_res = setup(shape, full).solve(
        b, checkpoint_path=str(p), resume=True
    )
    assert info_res["converged"]
    np.testing.assert_allclose(
        np.asarray(x_res), np.asarray(x_ref), rtol=0, atol=1e-13
    )
    # identical residual trajectory, cycle for cycle (f32 tolerance: the
    # uninterrupted run's device loop records norms in f32, the host loop
    # in f64)
    np.testing.assert_allclose(
        info_res["residual_norms"],
        info_ref["residual_norms"][: len(info_res["residual_norms"])],
        rtol=1e-6,
    )


def test_checkpoint_refuses_different_solver(tmp_path):
    shape = (16, 16)
    b = rhs_random(shape, seed=5)
    p = tmp_path / "mid.npz"
    s = setup(shape, SolverConfig(smoother="jacobi", cycles=3))
    s.solve(b, checkpoint_path=str(p))
    other = setup(shape, SolverConfig(smoother="rbgs", cycles=3))
    with pytest.raises(ValueError, match="hash"):
        other.solve(b, checkpoint_path=str(p), resume=True)


def test_bitwise_deterministic_across_runs():
    """SURVEY.md §5.2: the determinism story — two identical solves (fresh
    setup each time) produce bit-identical iterates and norms."""
    shape = (32, 32)
    b = rhs_random(shape, seed=11)
    cfg = SolverConfig(smoother="rbgs", transfer="linear")
    x1, i1 = setup(shape, cfg).solve(b)
    x2, i2 = setup(shape, cfg).solve(b)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert i1["residual_norms"] == i2["residual_norms"]
    assert i1["cycles"] == i2["cycles"]
