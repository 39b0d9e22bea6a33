"""W-cycle and FMG cycle types (stencil + sparse engines + distributed)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from openmg_tpu import SolverConfig, setup
from openmg_tpu.core.algebraic import setup_sparse
from openmg_tpu.models.poisson import poisson, rhs_random


def _direct(shape, b):
    A = poisson(shape)
    return spla.spsolve(A.tocsc(), np.asarray(b, dtype=np.float64).ravel())


@pytest.mark.parametrize("cycle_type", ["v", "w", "f"])
def test_cycle_types_converge_to_direct(cycle_type):
    shape = (32, 32)
    b = rhs_random(shape, seed=0)
    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", cycle_type=cycle_type, cycles=60
    )
    x, info = setup(shape, cfg).solve(b)
    assert info["converged"], info["residual_norms"]
    x_dir = _direct(shape, b)
    err = np.linalg.norm(np.asarray(x).ravel() - x_dir) / np.linalg.norm(x_dir)
    assert err < 1e-9


def test_fmg_needs_fewer_cycles_than_v():
    shape = (64, 64)
    b = rhs_random(shape, seed=1)
    infos = {}
    for ct in ("v", "f"):
        cfg = SolverConfig(
            smoother="rbgs", transfer="linear", cycle_type=ct, cycles=60
        )
        _, infos[ct] = setup(shape, cfg).solve(b)
    assert infos["f"]["converged"] and infos["v"]["converged"]
    assert infos["f"]["cycles"] < infos["v"]["cycles"]


def test_w_cycle_not_weaker_than_v():
    """W contracts at least as fast as V per cycle (aggregate transfer,
    where the cycle is weak enough for the difference to show)."""
    shape = (64, 64)
    b = rhs_random(shape, seed=2)
    cycles = {}
    for ct in ("v", "w"):
        cfg = SolverConfig(
            smoother="rbgs", transfer="aggregate", cycle_type=ct,
            cycles=400, gridlevels=4,
        )
        _, info = setup(shape, cfg).solve(b)
        assert info["converged"]
        cycles[ct] = info["cycles"]
    assert cycles["w"] <= cycles["v"]


@pytest.mark.parametrize("cycle_type", ["w", "f"])
def test_sparse_engine_cycle_types(cycle_type):
    shape = (16, 16)
    A = poisson(shape)
    b = rhs_random(shape, seed=3)
    cfg = SolverConfig(
        smoother="rbgs",
        transfer="linear",
        cycle_type=cycle_type,
        cycles=60,
        gridlevels=3,
        format="ell",
        max_dense_coarse=4096,
    )
    solver = setup_sparse(A, shape, cfg)
    x, info = solver.solve(b)
    assert info["converged"]
    x_dir = _direct(shape, b)
    err = np.linalg.norm(np.asarray(x).ravel() - x_dir) / np.linalg.norm(x_dir)
    assert err < 1e-8


def test_distributed_w_cycle_matches_single_device():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs fake multi-device mesh")
    from openmg_tpu.core.config import MeshConfig
    from openmg_tpu.parallel.dist import DistributedSolver, distributed_setup

    shape = (32, 32)
    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", cycle_type="w",
        cycles=60, gridlevels=3, max_dense_coarse=4096,
    )
    b = rhs_random(shape, seed=4)
    x1, info1 = setup(shape, cfg).solve(b)
    d = distributed_setup(shape, cfg, MeshConfig(n_devices=4))
    x4, info4 = d.solve(b)
    assert info4["converged"] == info1["converged"]
    assert abs(info4["cycles"] - info1["cycles"]) <= 1
    np.testing.assert_allclose(
        np.asarray(x4), np.asarray(x1), rtol=1e-8, atol=1e-10
    )


def test_distributed_fmg_supported():
    """FMG distributes (round 3): the per-level rhs restriction rides the
    same halo-tap/redistribution transfers as the V-cycle; a bad
    cycle_type still raises."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs fake multi-device mesh")
    from openmg_tpu.core.config import MeshConfig
    from openmg_tpu.parallel.dist import distributed_setup

    cfg = SolverConfig(cycle_type="f", gridlevels=2, max_dense_coarse=4096,
                       cycles=40)
    solver = distributed_setup((16, 16), cfg, MeshConfig(n_devices=2))
    from openmg_tpu.models.poisson import rhs_random

    x, info = solver.solve(rhs_random((16, 16), seed=3))
    assert info["converged"]
    with pytest.raises(ValueError, match="cycle_type"):
        distributed_setup(
            (16, 16),
            SolverConfig(cycle_type="q", gridlevels=2, max_dense_coarse=4096),
            MeshConfig(n_devices=2),
        )


class TestChebyshev:
    def test_k1_equals_jacobi_two_thirds(self):
        """4th-kind Chebyshev with K=1 and λmax=2 is exactly ω=2/3 Jacobi."""
        import jax.numpy as jnp

        from openmg_tpu.ops.smoothers import chebyshev, jacobi
        from openmg_tpu.ops.stencil import StencilOperator
        from openmg_tpu.models.poisson import poisson_offsets

        shape = (16, 16)
        vals = jnp.asarray([4.0, -1.0, -1.0, -1.0, -1.0], dtype=jnp.float32)
        op = StencilOperator(None, poisson_offsets(2), vals, shape)
        inv_d = jnp.float32(0.25)
        b = jnp.asarray(rhs_random(shape, seed=0), jnp.float32)
        x = jnp.asarray(rhs_random(shape, seed=1), jnp.float32)
        got = chebyshev(op, inv_d, b, x, 1)
        want = jacobi(op, inv_d, b, x, 1, 2.0 / 3.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )

    @pytest.mark.parametrize("dim", [2, 3])
    def test_converges_to_direct(self, dim):
        shape = (32,) * dim if dim == 2 else (16, 16, 16)
        b = rhs_random(shape, seed=5)
        cfg = SolverConfig(smoother="chebyshev", transfer="linear", cycles=60)
        x, info = setup(shape, cfg).solve(b)
        assert info["converged"]
        x_dir = _direct(shape, b)
        err = np.linalg.norm(np.asarray(x).ravel() - x_dir) / np.linalg.norm(
            x_dir
        )
        assert err < 1e-9

    def test_sparse_engine_chebyshev(self):
        shape = (16, 16)
        A = poisson(shape)
        b = rhs_random(shape, seed=6)
        cfg = SolverConfig(
            smoother="chebyshev", transfer="linear", cycles=60,
            gridlevels=3, format="ell", max_dense_coarse=4096,
        )
        x, info = setup_sparse(A, shape, cfg).solve(b)
        assert info["converged"]
        err = np.linalg.norm(
            np.asarray(x).ravel() - _direct(shape, b)
        ) / np.linalg.norm(_direct(shape, b))
        assert err < 1e-8

    def test_distributed_chebyshev_matches_single(self):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs fake multi-device mesh")
        from openmg_tpu.core.config import MeshConfig
        from openmg_tpu.parallel.dist import distributed_setup

        shape = (32, 32)
        cfg = SolverConfig(
            smoother="chebyshev", transfer="linear", cycles=60,
            gridlevels=3, max_dense_coarse=4096,
        )
        b = rhs_random(shape, seed=7)
        x1, info1 = setup(shape, cfg).solve(b)
        d = distributed_setup(shape, cfg, MeshConfig(n_devices=4))
        x4, info4 = d.solve(b)
        assert info4["converged"] == info1["converged"]
        assert abs(info4["cycles"] - info1["cycles"]) <= 1
        np.testing.assert_allclose(
            np.asarray(x4), np.asarray(x1), rtol=1e-8, atol=1e-10
        )


class TestPCG:
    def test_pcg_converges_and_matches_direct(self):
        shape = (32, 32)
        b = rhs_random(shape, seed=8)
        cfg = SolverConfig(
            smoother="rbgs", transfer="linear", krylov="pcg",
            krylov_iters=2, cycles=60,
        )
        x, info = setup(shape, cfg).solve(b)
        assert info["converged"]
        x_dir = _direct(shape, b)
        err = np.linalg.norm(np.asarray(x).ravel() - x_dir) / np.linalg.norm(
            x_dir
        )
        assert err < 1e-9

    def test_pcg_beats_plain_mg_on_jumpy_coefficients(self):
        """1e4 coefficient jump: MG-preconditioned CG needs fewer cycles
        than the same number of bare V-cycles per outer step."""
        from openmg_tpu.models.poisson import diffusion_stencil

        shape = (32, 32)
        kappa = np.ones(shape)
        kappa[8:24, 8:24] = 1e4
        offsets, coeffs = diffusion_stencil(kappa)
        b = rhs_random(shape, seed=9)
        counts = {}
        for kr in ("none", "pcg"):
            cfg = SolverConfig(
                smoother="rbgs", transfer="linear", krylov=kr,
                krylov_iters=2, cycles=200, gridlevels=4,
                max_dense_coarse=4096, threshold=1e-9,
            )
            _, info = setup((offsets, coeffs), cfg).solve(b)
            assert info["converged"]
            # total V-cycle count: pcg runs krylov_iters cycles per step
            mult = 2 if kr == "pcg" else 1
            counts[kr] = info["cycles"] * mult
        assert counts["pcg"] <= counts["none"]

    def test_unknown_krylov_rejected(self):
        shape = (16, 16)
        b = rhs_random(shape, seed=1)
        with pytest.raises(ValueError, match="krylov"):
            setup(shape, SolverConfig(krylov="gmres")).solve(b)
