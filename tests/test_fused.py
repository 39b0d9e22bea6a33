"""Multi-stage fused smoother kernels (ops/fused.py) vs the jnp smoothers.

Interpreter-mode parity on CPU, same strategy as tests/test_kernels.py:
the jnp implementations are the pinned oracles (themselves validated
against scipy / permuted classical GS), and the fused kernels must match
them to f32 roundoff for every stage mix, halo depth, and chunking.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from openmg_tpu.models.poisson import poisson_offsets
from openmg_tpu.ops import fused
from openmg_tpu.ops.smoothers import jacobi, rbgs, smooth
from openmg_tpu.ops.stencil import StencilOperator, apply


SHAPE = (8, 4, 128)


def make_op(shape=SHAPE):
    offsets = poisson_offsets(3)
    values = jnp.asarray([6.0] + [-1.0] * 6, dtype=jnp.float32)
    op = StencilOperator(None, offsets, values, shape)
    inv_diag = 1.0 / values[offsets.index((0, 0, 0))]
    return op, inv_diag


def rand(shape=SHAPE, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)


@pytest.mark.parametrize("iterations", [1, 2, 3])
def test_fused_jacobi_matches_jnp(iterations):
    op, inv_diag = make_op()
    b, x = rand(seed=1), rand(seed=2)
    want = jacobi(op, inv_diag, b, x, iterations, 2.0 / 3.0)
    stages = fused.stages_for("jacobi", iterations, 2.0 / 3.0)
    got = fused.fused_stages_const_3d(op.values, op.offsets, b, x, stages)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


@pytest.mark.parametrize("iterations", [1, 2])
def test_fused_rbgs_matches_jnp(iterations):
    op, inv_diag = make_op()
    b, x = rand(seed=3), rand(seed=4)
    want = rbgs(op, inv_diag, b, x, iterations)
    stages = fused.stages_for("rbgs", iterations, 0.0)
    got = fused.fused_stages_const_3d(op.values, op.offsets, b, x, stages)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


@pytest.mark.parametrize("name", ["jacobi", "rbgs"])
@pytest.mark.parametrize("pre", [1, 2])
def test_presmooth_residual_fused(name, pre):
    op, inv_diag = make_op()
    b = rand(seed=5)
    zero = jnp.zeros(SHAPE, jnp.float32)
    x_want = (
        jacobi(op, inv_diag, b, zero, pre, 2.0 / 3.0)
        if name == "jacobi"
        else rbgs(op, inv_diag, b, zero, pre)
    )
    r_want = b - apply(op, x_want)
    out = fused.presmooth_residual_fused(name, op, b, pre, 2.0 / 3.0)
    assert out is not None
    x_got, r_got = out
    np.testing.assert_allclose(x_got, x_want, rtol=0, atol=1e-5)
    np.testing.assert_allclose(r_got, r_want, rtol=0, atol=1e-5)


def test_smooth_fused_chunking(monkeypatch):
    """Force a tiny VMEM budget so 4 half-sweeps split into ≥2 chunks and
    the slab height drops, exercising the halo clamp/mask paths."""
    op, inv_diag = make_op()
    b, x = rand(seed=6), rand(seed=7)
    # plane = 4*128*4 B = 2 KiB; the K-aware fit model charges
    # 2(2E+tz) window planes + 0.9·7·E scoped planes for a depth-c has-x
    # kernel (E = tz+2c): ≈54 planes at (c=2, tz=1), ≈66 at (c=2, tz=2),
    # ≈74 at (c=3, tz=1) — a 60-plane budget forces max_chunk=2 with tz=1
    monkeypatch.setattr(fused, "_TOTAL_BUDGET", 2048 * 60)
    got = fused.smooth_fused("rbgs", op, b, x, 2, 0.0)
    assert got is not None
    want = rbgs(op, inv_diag, b, x, 2)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_smooth_dispatches_fused():
    """smooth() must route multi-sweep f32 constant-stencil smoothing
    through the fused tier and agree with the jnp path."""
    op, inv_diag = make_op()
    b, x = rand(seed=8), rand(seed=9)
    got = smooth("rbgs", op, inv_diag, b, x, 2, 0.0)
    want = rbgs(op, inv_diag, b, x, 2)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_vcycle_x_zero_flag_is_sound():
    """v_cycle(x=0, x_zero=True) == v_cycle(x=0, x_zero=False): the fused
    zero-start pre-smooth is an implementation detail, not a math change."""
    from openmg_tpu import SolverConfig, setup
    from openmg_tpu.core.cycle import v_cycle

    solver = setup((8, 8, 128), SolverConfig(smoother="rbgs"))
    h = solver.hierarchy
    b = rand((8, 8, 128), seed=10)
    zero = jnp.zeros_like(b)
    fast = v_cycle(h, b, zero, 0, 2, 2, "rbgs", 2.0 / 3.0, 1, x_zero=True)
    slow = v_cycle(h, b, zero, 0, 2, 2, "rbgs", 2.0 / 3.0, 1, x_zero=False)
    np.testing.assert_allclose(fast, slow, rtol=0, atol=1e-5)


def test_solve_through_fused_path_converges():
    """End-to-end: a grid wide enough for the fused kernels must still
    converge to the reference tolerance (mixed fused/fallback levels)."""
    from openmg_tpu import SolverConfig, setup

    shape = (8, 8, 128)
    solver = setup(
        shape, SolverConfig(smoother="rbgs", residual_dtype="doublefloat")
    )
    rng = np.random.default_rng(0)
    b = rng.standard_normal(shape)
    b /= np.linalg.norm(b.ravel())
    x, info = solver.solve(b)
    assert info["converged"]
    assert info["final_norm"] < 1e-10


# ---------------------------------------------------------------------------
# cornered-operator fused path (in-kernel region fix-ups)
# ---------------------------------------------------------------------------


def _cornered_level(shape=(32, 32, 256), level=1):
    from openmg_tpu import SolverConfig, setup
    from openmg_tpu.ops.stencil import CorneredOperator

    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", residual_dtype="doublefloat"
    )
    h = setup(shape, cfg, faced=True).hierarchy
    L = h.levels[level]
    assert isinstance(L.A, CorneredOperator)
    return L.A


@pytest.mark.parametrize("name", ["jacobi", "rbgs"])
def test_smooth_fused_cornered_matches_jnp(name):
    from openmg_tpu.ops.smoothers import _smooth_cornered

    op = _cornered_level()
    b = rand(op.grid_shape, seed=11)
    x = rand(op.grid_shape, seed=12)
    got = fused.smooth_fused(name, op, b, x, 2, 2.0 / 3.0)
    assert got is not None, "cornered deep fusion should engage"
    want = _smooth_cornered(name, op, b, x, 2, 2.0 / 3.0, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=2e-5
    )


@pytest.mark.parametrize("name", ["jacobi", "rbgs"])
def test_presmooth_residual_fused_cornered(name):
    from openmg_tpu.ops.smoothers import _smooth_cornered
    from openmg_tpu.ops.stencil import residual as exact_residual

    op = _cornered_level()
    b = rand(op.grid_shape, seed=13)
    out = fused.presmooth_residual_fused(name, op, b, 2, 2.0 / 3.0)
    assert out is not None
    xs, r = out
    x_ref = _smooth_cornered(
        name, op, b, jnp.zeros(op.grid_shape, jnp.float32), 2, 2.0 / 3.0,
        use_pallas=False,
    )
    r_ref = exact_residual(op, b, x_ref)
    np.testing.assert_allclose(
        np.asarray(xs), np.asarray(x_ref), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(r_ref), rtol=0, atol=2e-5
    )


def test_cornered_min_tz_constraint():
    """Cornered fusion requires tz ≥ depth+1 (z-region fix-ups rely on
    global row 0 living only in tile 0's slab); when the grid is too small
    for that, the fused path must decline rather than compute wrongly."""
    op = _cornered_level()
    # nz = 16 at level 1 of a (32, ...) problem: a depth-5 chunk needs
    # tz ≥ 6 → tz = 8 which divides 16, so it should engage...
    stages = fused.stages_for("rbgs", 2, 0.0)
    tz = fused._fit_tz(op.grid_shape, len(stages) + 1, False, 2,
                       min_tz=len(stages) + 2, k=len(op.offsets))
    assert tz is None or tz >= len(stages) + 2


# ---------------------------------------------------------------------------
# in-kernel grid transfers (restriction-fused pre / prolongation-fused post)
# ---------------------------------------------------------------------------


def _fine_level(shape=(32, 32, 256)):
    from openmg_tpu import SolverConfig, setup

    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", residual_dtype="doublefloat"
    )
    h = setup(shape, cfg).hierarchy
    return h.levels[0], h.transfer


@pytest.mark.parametrize("name", ["jacobi", "rbgs"])
@pytest.mark.parametrize("zero_start", [True, False])
def test_presmooth_restrict_fused(name, zero_start):
    from openmg_tpu.ops.transfer import restrict

    L, tr = _fine_level()
    b = rand(L.grid_shape, seed=21)
    x0 = None if zero_start else rand(L.grid_shape, seed=22)
    out = fused.presmooth_restrict_fused(name, L.A, b, x0, 2, 2.0 / 3.0, tr)
    assert out is not None, "restrict fusion should engage on this shape"
    xs, bc = out
    x_ref = smooth(
        name, L.A, L.inv_diag, b,
        jnp.zeros(L.grid_shape, jnp.float32) if x0 is None else x0,
        2, 2.0 / 3.0, use_pallas=False,
    )
    bc_ref = restrict(b - L.A.apply(x_ref), tr)
    np.testing.assert_allclose(
        np.asarray(xs), np.asarray(x_ref), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(bc), np.asarray(bc_ref), rtol=0, atol=2e-5
    )


@pytest.mark.parametrize("name", ["jacobi", "rbgs"])
def test_prolong_smooth_fused(name):
    from openmg_tpu.ops.transfer import prolong

    L, tr = _fine_level()
    b = rand(L.grid_shape, seed=23)
    x0 = rand(L.grid_shape, seed=24)
    ec = rand(tuple(s // 2 for s in L.grid_shape), seed=25)
    y = fused.prolong_smooth_fused(name, L.A, b, x0, ec, 2, 2.0 / 3.0, tr)
    assert y is not None, "prolong fusion should engage on this shape"
    x_ref = smooth(
        name, L.A, L.inv_diag, b, x0 + prolong(ec, L.grid_shape, tr),
        2, 2.0 / 3.0, use_pallas=False,
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x_ref), rtol=0, atol=2e-5
    )


def test_transfer_fused_nx128_levels():
    """nx = 128 levels fuse their transfers too (coarse nx = 64 rides
    full-dim Mosaic blocks — round 3 relaxation); parity vs the unfused
    path, and genuinely unfusable shapes still decline."""
    from openmg_tpu.ops.smoothers import smooth
    from openmg_tpu.ops.stencil import StencilOperator, residual as exact_residual
    from openmg_tpu.ops.transfer import prolong, restrict

    L, tr = _fine_level((32, 32, 256))
    b = rand((16, 16, 128), seed=26)
    op = StencilOperator(None, L.A.offsets, L.A.values, (16, 16, 128))
    inv_d = 1.0 / op.values[0]
    out = fused.presmooth_restrict_fused("rbgs", op, b, None, 2, 2.0 / 3.0, tr)
    assert out is not None, "nx=128 restrict fusion should engage"
    xs, bc = out
    x_ref = smooth("rbgs", op, inv_d, b, jnp.zeros_like(b), 2, 2.0 / 3.0,
                   use_pallas=False)
    bc_ref = restrict(exact_residual(op, b, x_ref), tr)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x_ref), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(bc), np.asarray(bc_ref), rtol=0, atol=2e-5)

    ec = rand((8, 8, 64), seed=27)
    y = fused.prolong_smooth_fused("rbgs", op, b, xs, ec, 2, 2.0 / 3.0, tr)
    assert y is not None, "nx=128 prolong fusion should engage"
    y_ref = smooth("rbgs", op, inv_d, b, xs + prolong(ec, op.grid_shape, tr),
                   2, 2.0 / 3.0, use_pallas=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=0, atol=2e-5)

    # odd trailing dim: still unfusable
    op_odd = StencilOperator(None, L.A.offsets, L.A.values, (16, 16, 96))
    b_odd = rand((16, 16, 96), seed=28)
    assert fused.presmooth_restrict_fused(
        "rbgs", op_odd, b_odd, None, 2, 2.0 / 3.0, tr
    ) is None


# ---------------------------------------------------------------------------
# whole-plane fused 2D tier (VERDICT r4 task 6)
# ---------------------------------------------------------------------------


def _hier2d(shape=(64, 128)):
    from openmg_tpu import SolverConfig, setup

    cfg = SolverConfig(smoother="rbgs", transfer="linear", gridlevels=3,
                       max_dense_coarse=4096, residual_dtype="doublefloat")
    return setup(shape, cfg).hierarchy


@pytest.mark.parametrize("name,iters", [("rbgs", 2), ("jacobi", 3)])
def test_fused2d_const_matches_jnp(name, iters):
    """Whole-plane 2D stage fusion on the constant fine level == jnp."""
    h = _hier2d()
    L = h.levels[0]
    assert L.A.is_constant
    s = L.A.grid_shape
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(s), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(s), jnp.float32)
    got = fused._fused2d(name, L.A, b, x0, iters, 2.0 / 3.0, False)
    assert got is not None
    ref = smooth(name, L.A, L.inv_diag, b, x0, iters, 2.0 / 3.0,
                 use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("name", ["rbgs", "jacobi"])
def test_fused2d_cornered_matches_jnp(name):
    """Exact cornered-delta algebra in the 2D whole-plane kernel."""
    from openmg_tpu.ops.stencil import CorneredOperator

    h = _hier2d()
    L = h.levels[1]
    assert isinstance(L.A, CorneredOperator)
    s = L.A.grid_shape
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(s), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(s), jnp.float32)
    got = fused._fused2d(name, L.A, b, x0, 2, 2.0 / 3.0, False)
    assert got is not None
    ref = smooth(name, L.A, L.inv_diag, b, x0, 2, 2.0 / 3.0,
                 use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_fused2d_zero_start_residual():
    """Zero-start presmooth + residual in one launch (reads only b)."""
    from openmg_tpu.ops.stencil import residual as st_resid

    h = _hier2d()
    for lvl in (0, 1):
        L = h.levels[lvl]
        s = L.A.grid_shape
        rng = np.random.default_rng(2 + lvl)
        b = jnp.asarray(rng.standard_normal(s), jnp.float32)
        out = fused.presmooth_residual_fused("rbgs", L.A, b, 2, 2.0 / 3.0)
        assert out is not None
        xz, r = out
        ref = smooth("rbgs", L.A, L.inv_diag, b, jnp.zeros_like(b), 2,
                     2.0 / 3.0, use_pallas=False)
        np.testing.assert_allclose(np.asarray(xz), np.asarray(ref),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r),
                                   np.asarray(st_resid(L.A, b, ref)),
                                   rtol=0, atol=1e-4)


def test_fused2d_solve_parity_and_gate():
    """End-to-end 2D solve is identical with the fused tier on vs off;
    oversized planes are rejected by the VMEM gate."""
    import openmg_tpu as mg
    from openmg_tpu.models.poisson import rhs_random
    from openmg_tpu.ops import kernels

    shape = (128, 128)
    cfg = mg.SolverConfig(smoother="rbgs", transfer="linear", gridlevels=4,
                          max_dense_coarse=4096,
                          residual_dtype="doublefloat", cycles=60)
    b = rhs_random(shape, seed=2)
    b = b / np.linalg.norm(b.ravel())
    x1, i1 = mg.setup(shape, cfg).solve(b)
    orig = fused._fused2d
    try:
        fused._fused2d = lambda *a, **k: None
        x2, i2 = mg.setup(shape, cfg).solve(b)
    finally:
        fused._fused2d = orig
    assert i1["converged"] and i1["cycles"] == i2["cycles"]
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                               rtol=0, atol=1e-9)
    # perf gate: ≥512² planes must NOT take the whole-plane path (it
    # loses to the pipelined small kernels there — r5 on-chip probes)
    offs = tuple((oy, ox) for oy in (-1, 0, 1) for ox in (-1, 0, 1))
    assert not kernels.supports_fused2d(offs, (512, 512))
    assert kernels.supports_fused2d(offs, (256, 256))


# ---------------------------------------------------------------------------
# stage-free partial fusion (VERDICT r4 task 1)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("lvl", [0, 1])
def test_residual_restrict_fused(lvl):
    """bc = R (b − A x) in one stage-free kernel == residual + restrict,
    on const and cornered levels."""
    from openmg_tpu import SolverConfig, setup
    from openmg_tpu.ops.stencil import residual as st_resid
    from openmg_tpu.ops.transfer import restrict

    cfg = SolverConfig(smoother="rbgs", transfer="linear", gridlevels=3,
                       max_dense_coarse=99999,
                       residual_dtype="doublefloat")
    h = setup((32, 32, 64), cfg).hierarchy
    L = h.levels[lvl]
    s = L.A.grid_shape
    rng = np.random.default_rng(lvl)
    b = jnp.asarray(rng.standard_normal(s), jnp.float32)
    x = jnp.asarray(rng.standard_normal(s), jnp.float32)
    bc = fused.residual_restrict_fused(L.A, b, x, h.transfer)
    assert bc is not None
    ref = restrict(st_resid(L.A, b, x), h.transfer)
    np.testing.assert_allclose(np.asarray(bc), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_partial_fusion_cycle_parity(monkeypatch):
    """With the full staged fusions disabled (the 512²-plane situation),
    the single-device cycle composes chunked smoothing + stage-free
    residual_restrict + prolong+1-sweep and still matches the plain
    path."""
    import openmg_tpu as mg
    from openmg_tpu.models.poisson import rhs_random

    shape = (32, 32, 64)
    cfg = mg.SolverConfig(smoother="rbgs", transfer="linear", gridlevels=3,
                          max_dense_coarse=99999,
                          residual_dtype="doublefloat", cycles=60)
    b = rhs_random(shape, seed=3)
    b = b / np.linalg.norm(b.ravel())
    x_ref, i_ref = mg.setup(shape, cfg).solve(b)

    orig_plan = fused.plan_presmooth_restrict
    orig_pr = fused.presmooth_restrict_fused
    orig_ps = fused.plan_prolong_smooth

    monkeypatch.setattr(fused, "presmooth_restrict_fused",
                        lambda *a, **k: None)
    monkeypatch.setattr(fused, "plan_presmooth_restrict",
                        lambda *a, **k: None)

    def ps_one_only(name, n_off, shape_, iters, omega, transfer, **kw):
        if iters > 1:
            return None
        return orig_ps(name, n_off, shape_, iters, omega, transfer, **kw)

    monkeypatch.setattr(fused, "plan_prolong_smooth", ps_one_only)
    orig_psf = fused.prolong_smooth_fused

    def psf_one_only(name, op, b_, x_, ec, iters, omega, transfer, **kw):
        if iters > 1:
            return None
        return orig_psf(name, op, b_, x_, ec, iters, omega, transfer, **kw)

    monkeypatch.setattr(fused, "prolong_smooth_fused", psf_one_only)
    x_part, i_part = mg.setup(shape, cfg).solve(b)
    assert i_part["cycles"] == i_ref["cycles"]
    np.testing.assert_allclose(np.asarray(x_part), np.asarray(x_ref),
                               rtol=0, atol=1e-9)


@pytest.mark.parametrize("lvl", [0, 1])
def test_fused2d_transfers(lvl):
    """2D whole-plane fusion with in-kernel transfers: presmooth +
    residual + restriction in one launch, and prolong + post-smooth in
    one launch (const fine + cornered Galerkin level)."""
    from openmg_tpu.ops.stencil import residual as st_resid
    from openmg_tpu.ops.transfer import prolong, restrict

    h = _hier2d()
    L = h.levels[lvl]
    s = L.A.grid_shape
    rng = np.random.default_rng(20 + lvl)
    b = jnp.asarray(rng.standard_normal(s), jnp.float32)
    x = jnp.asarray(rng.standard_normal(s), jnp.float32)
    out = fused.presmooth_restrict_fused(
        "rbgs", L.A, b, None, 2, 2.0 / 3.0, h.transfer
    )
    assert out is not None
    xs, bc = out
    ref_x = smooth("rbgs", L.A, L.inv_diag, b, jnp.zeros_like(b), 2,
                   2.0 / 3.0, use_pallas=False)
    ref_bc = restrict(st_resid(L.A, b, ref_x), h.transfer)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_x),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bc), np.asarray(ref_bc),
                               rtol=0, atol=1e-4)

    cs = tuple(v // 2 for v in s)
    ec = jnp.asarray(rng.standard_normal(cs), jnp.float32)
    y = fused.prolong_smooth_fused(
        "rbgs", L.A, b, x, ec, 2, 2.0 / 3.0, h.transfer
    )
    assert y is not None
    ref_y = smooth("rbgs", L.A, L.inv_diag, b,
                   x + prolong(ec, s, h.transfer), 2, 2.0 / 3.0,
                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                               rtol=0, atol=1e-4)
