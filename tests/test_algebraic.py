"""General sparse engine tests: coloring, algebraic hierarchy, solve parity
with the direct oracle, and the mg_solve fallback for non-stencil matrices."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from openmg_tpu import SolverConfig, mg_solve, setup_sparse
from openmg_tpu.core.algebraic import (
    build_sparse_hierarchy,
    greedy_colors,
    parity_colors,
)
from openmg_tpu.models.poisson import poisson, rhs_random


def test_parity_colors_poisson():
    shape = (8, 8)
    A = poisson(shape)
    c = parity_colors(A, shape)
    assert c is not None and set(np.unique(c)) == {0, 1}
    coo = A.tocoo()
    off = coo.row != coo.col
    assert np.all(c[coo.row[off]] != c[coo.col[off]])


def test_parity_colors_rejects_same_parity_coupling():
    # 9-point-like operator: diagonal neighbors couple same-parity points
    n = 6
    A = sp.lil_matrix((n * n, n * n))
    for i in range(n - 1):
        for j in range(n - 1):
            a, b = i * n + j, (i + 1) * n + (j + 1)
            A[a, b] = A[b, a] = -1.0
    A.setdiag(4.0)
    assert parity_colors(A.tocsr(), (n, n)) is None


def test_greedy_colors_valid():
    rng = np.random.default_rng(0)
    A = sp.random(60, 60, density=0.08, random_state=rng, format="csr")
    A = A + A.T + 10 * sp.identity(60)
    c = greedy_colors(A)
    coo = sp.coo_matrix(A)
    off = coo.row != coo.col
    assert np.all(c[coo.row[off]] != c[coo.col[off]])


@pytest.mark.parametrize(
    "shape,fmt,smoother",
    [
        ((64,), "ell", "jacobi"),
        ((32, 32), "csr", "rbgs"),
        ((16, 16, 16), "bsr", "jacobi"),
        ((24, 24), "dense", "rbgs"),
    ],
)
def test_sparse_engine_converges_and_matches_direct(shape, fmt, smoother):
    A = poisson(shape)
    b = rhs_random(shape, seed=3).ravel()
    cfg = SolverConfig(
        smoother=smoother, format=fmt, threshold=1e-10, cycles=200
    )
    solver = setup_sparse(A, shape, cfg)
    x, info = solver.solve(b)
    assert info["converged"], info["residual_norms"][-5:]
    x_direct = spla.spsolve(sp.csc_matrix(A), b)
    rel = np.linalg.norm(np.asarray(x) - x_direct) / np.linalg.norm(x_direct)
    assert rel < 1e-8, rel
    assert info["format"] == fmt


def test_rbgs_colors_per_level():
    shape = (16, 16)
    A = poisson(shape)
    h = build_sparse_hierarchy(
        A, shape, fmt="ell", smoother="rbgs", transfer_name="aggregate"
    )
    # Poisson fine level is bipartite → exactly 2 colors
    assert h.levels[0].num_colors == 2
    for lvl in h.levels:
        assert lvl.num_colors >= 1


def _non_stencil_spd(shape, seed=0):
    """Poisson plus weak random long-range symmetric couplings: SPD,
    diagonally dominant, but with O(n) distinct grid offsets — not
    stencil-representable within budget."""
    A = sp.lil_matrix(poisson(shape).astype(np.float64))
    n = A.shape[0]
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, size=4 * n)
    cols = rng.integers(0, n, size=4 * n)
    for i, j in zip(rows, cols):
        if i == j:
            continue
        A[i, j] += -0.01
        A[j, i] += -0.01
        A[i, i] += 0.01
        A[j, j] += 0.01
    return sp.csr_matrix(A)


def test_mg_solve_falls_back_to_general_engine():
    shape = (16, 16)
    A = _non_stencil_spd(shape, seed=4)
    b = rhs_random(shape, seed=5).ravel()
    x, info = mg_solve(
        A, b, {"problemshape": shape, "threshold": 1e-10, "cycles": 300}
    )
    assert info["converged"], info["residual_norms"][-5:]
    assert "format" in info  # general engine ran
    x_direct = spla.spsolve(sp.csc_matrix(A), b)
    rel = np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct)
    assert rel < 1e-8, rel


def test_mg_solve_forced_format():
    shape = (32,)
    b = rhs_random(shape, seed=6).ravel()
    x, info = mg_solve(
        None,
        b,
        {
            "problemshape": shape,
            "threshold": 1e-10,
            "cycles": 100,
            "format": "ell",
        },
    )
    assert info["converged"]
    assert info["format"] == "ell"
    x_direct = spla.spsolve(sp.csc_matrix(poisson(shape)), b)
    assert np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct) < 1e-8


def test_linear_transfer_general_engine():
    shape = (32, 32)
    A = poisson(shape)
    b = rhs_random(shape, seed=7).ravel()
    cfg = SolverConfig(
        transfer="linear", format="ell", threshold=1e-10, cycles=100
    )
    solver = setup_sparse(A, shape, cfg)
    x, info = solver.solve(b)
    assert info["converged"]
    # linear transfers converge much faster than aggregate
    assert info["cycles"] <= 15, info["cycles"]


def test_dense_parameters_toggle():
    """Reference ``dense=True`` debug mode (SURVEY.md R9): the same solve
    runs with densified operators and must match the sparse engine's
    per-cycle residual trajectory to fp tolerance."""
    shape = (16, 16)
    b = rhs_random(shape, seed=5).ravel()
    params = {
        "problemshape": shape,
        "threshold": 1e-10,
        "cycles": 50,
        "smoother": "jacobi",
    }
    x_d, info_d = mg_solve(None, b, {**params, "dense": True})
    assert info_d["format"] == "dense"
    assert info_d["converged"]
    x_s, info_s = mg_solve(None, b, {**params, "format": "ell"})
    n = min(len(info_d["residual_norms"]), len(info_s["residual_norms"]))
    assert np.allclose(
        info_d["residual_norms"][:n], info_s["residual_norms"][:n], rtol=1e-4
    )
    assert np.linalg.norm(x_d - x_s) / np.linalg.norm(x_s) < 1e-8


def test_dense_format_rejects_large_problems():
    with pytest.raises(ValueError, match="debug mode"):
        setup_sparse(
            poisson((64, 64, 64)),
            (64, 64, 64),
            SolverConfig(format="dense"),
        )


def test_general_vs_stencil_engine_same_trajectory():
    """Jacobi + aggregate: the general engine runs the same math as the
    stencil engine — per-cycle residual norms must agree closely."""
    from openmg_tpu import setup

    shape = (32, 32)
    b = rhs_random(shape, seed=8)
    cfg = SolverConfig(
        smoother="jacobi", transfer="aggregate", threshold=1e-10, cycles=12
    )
    s_sten = setup(shape, cfg)
    _, info_sten = s_sten.solve(b)
    s_gen = setup_sparse(poisson(shape), shape, cfg)
    _, info_gen = s_gen.solve(b.ravel())
    a = np.asarray(info_sten["residual_norms"][:10])
    g = np.asarray(info_gen["residual_norms"][:10])
    assert np.allclose(a, g, rtol=1e-4), (a, g)


def test_pcg_on_general_engine():
    """krylov="pcg" on the general-sparse engine: MG-preconditioned CG
    inner error solves — converges to the same fixed point in fewer
    outer steps than pure MG."""
    shape = (32, 32)
    b = rhs_random(shape, seed=2).ravel()
    base = dict(smoother="rbgs", transfer="linear", format="ell",
                gridlevels=3, max_dense_coarse=4096, cycles=60)
    x_mg, info_mg = setup_sparse(
        poisson(shape), shape, SolverConfig(**base)
    ).solve(b)
    x_pcg, info_pcg = setup_sparse(
        poisson(shape), shape,
        SolverConfig(krylov="pcg", krylov_iters=2, **base),
    ).solve(b)
    assert info_pcg["converged"]
    assert info_pcg["cycles"] <= info_mg["cycles"]
    np.testing.assert_allclose(x_pcg, x_mg, rtol=1e-7, atol=1e-9)


def test_sparse_solve_many_matches_scalar():
    """General-sparse batched serving == per-rhs scalar solves."""
    shape = (16, 16)
    cfg = SolverConfig(smoother="rbgs", transfer="linear", format="ell",
                       gridlevels=3, max_dense_coarse=4096, cycles=60)
    solver = setup_sparse(poisson(shape), shape, cfg)
    rhs = [rhs_random(shape, seed=s).ravel() for s in (1, 2)]
    rhs[1] = rhs[1] * 1e-3
    xs, info = solver.solve_many(rhs)
    assert info["batch"] == 2
    for k, b in enumerate(rhs):
        xk, infok = solver.solve(b)
        np.testing.assert_array_equal(np.asarray(xs[k]), np.asarray(xk))
        assert info["cycles"][k] == infok["cycles"]
    assert info["cycles"][1] < info["cycles"][0]


def test_device_native_rhs_path():
    """A flat f32 jax-array rhs takes the device-native path: f32 hi part
    returned on device, full df pair in info['x_df'] (mirrors
    core.solver.Solver / the distributed engines)."""
    import jax
    import jax.numpy as jnp

    shape = (16, 16)
    cfg = SolverConfig(transfer="linear", format="ell", gridlevels=3,
                       max_dense_coarse=4096, cycles=60, threshold=1e-10,
                       residual_dtype="doublefloat")
    solver = setup_sparse(poisson(shape), shape, cfg)
    b = rhs_random(shape, seed=4).ravel()
    bf = jnp.asarray(b, dtype=jnp.float32)
    x, info = solver.solve(bf)
    assert isinstance(x, jax.Array) and x.dtype == jnp.float32
    assert info["converged"] and "x_df" in info
    x_full = np.asarray(info["x_df"][0], np.float64) + np.asarray(
        info["x_df"][1], np.float64
    )
    # f32 rhs quantization: compare against the host path on the same b
    x_ref, _ = solver.solve(np.asarray(bf, np.float64))
    np.testing.assert_allclose(x_full, x_ref, rtol=0, atol=1e-10)

    # batched device-native: (K, n) f32 array, warm-start batch supported
    bK = jnp.stack([bf, 2.0 * bf])
    xs, infom = solver.solve_many(bK)
    assert isinstance(xs, jax.Array) and xs.shape == (2, 16 * 16)
    assert all(infom["converged"]) and "x_df" in infom
    # warm start from the f32 hi parts (lo bits dropped → a short polish,
    # far fewer cycles than the cold solves)
    xs2, infom2 = solver.solve_many(bK, x0s=xs)
    assert max(infom2["cycles"]) < min(infom["cycles"])
