"""Pallas smoother kernels == jnp smoothers (interpret mode on CPU;
compiled path exercised by scripts/tpu_smoke.py on the real chip)."""

import numpy as np
import pytest
import jax.numpy as jnp

from openmg_tpu.models.poisson import poisson_offsets, rhs_random
from openmg_tpu.ops import kernels
from openmg_tpu.ops.smoothers import jacobi, rbgs
from openmg_tpu.ops.stencil import StencilOperator

# (2, 512, 512): 1 MB planes force tz=1 (the 512³ fine-level regime)
SHAPES = [(8, 8, 128), (4, 16, 256), (16, 8, 128), (2, 512, 512)]


def _const_op(shape):
    offsets = poisson_offsets(3)
    vals = jnp.asarray([6.0] + [-1.0] * 6, dtype=jnp.float32)
    return StencilOperator(None, offsets, vals, shape)


def test_supports():
    offsets = poisson_offsets(3)
    assert kernels.supports(offsets, (8, 8, 128))
    assert not kernels.supports(offsets, (8, 8))  # not 3D
    assert not kernels.supports(offsets, (8, 8, 100))  # lanes not 128-mult
    assert not kernels.supports(((0, 0, 0), (2, 0, 0)), (8, 8, 128))  # radius 2


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("iters", [1, 3])
def test_jacobi_kernel_matches_jnp(shape, iters):
    op = _const_op(shape)
    inv_d = jnp.float32(1.0 / 6.0)
    b = jnp.asarray(rhs_random(shape, seed=0), jnp.float32)
    x = jnp.asarray(rhs_random(shape, seed=1), jnp.float32)
    got = np.asarray(kernels.jacobi_const_3d(op.values, op.offsets, b, x, iters, 2 / 3))
    want = np.asarray(jacobi(op, inv_d, b, x, iters, 2 / 3))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("iters", [1, 2])
def test_rbgs_kernel_matches_jnp(shape, iters):
    op = _const_op(shape)
    inv_d = jnp.float32(1.0 / 6.0)
    b = jnp.asarray(rhs_random(shape, seed=2), jnp.float32)
    x = jnp.asarray(rhs_random(shape, seed=3), jnp.float32)
    got = np.asarray(kernels.rbgs_const_3d(op.values, op.offsets, b, x, iters))
    want = np.asarray(rbgs(op, inv_d, b, x, iters))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_full_27pt_stencil():
    """27-point constant stencils (linear-transfer coarse pattern) work."""
    shape = (8, 8, 128)
    offsets = tuple(
        (a, b_, c)
        for a in (-1, 0, 1)
        for b_ in (-1, 0, 1)
        for c in (-1, 0, 1)
    )
    rng = np.random.default_rng(0)
    vals_np = -np.abs(rng.uniform(0.1, 1.0, len(offsets))).astype(np.float32)
    di = offsets.index((0, 0, 0))
    vals_np[di] = 30.0
    vals = jnp.asarray(vals_np)
    op = StencilOperator(None, offsets, vals, shape)
    b = jnp.asarray(rhs_random(shape, seed=4), jnp.float32)
    x = jnp.asarray(rhs_random(shape, seed=5), jnp.float32)
    got = np.asarray(kernels.jacobi_const_3d(vals, offsets, b, x, 2, 0.8))
    want = np.asarray(jacobi(op, jnp.float32(1 / 30.0), b, x, 2, 0.8))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("shape", SHAPES)
def test_residual_kernel_matches_jnp(shape):
    from openmg_tpu.ops.stencil import apply

    op = _const_op(shape)
    b = jnp.asarray(rhs_random(shape, seed=4), jnp.float32)
    x = jnp.asarray(rhs_random(shape, seed=5), jnp.float32)
    got = np.asarray(kernels.residual_const_3d(op.values, op.offsets, b, x))
    want = np.asarray(b - apply(op, x))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_df_update_residual_kernel_matches_jnp():
    from openmg_tpu.core.solver import _residual_norm_df_exact_t
    from openmg_tpu.ops.doublefloat import df_add_f32, df_split, pow2_terms

    shape = (8, 8, 128)
    op = _const_op(shape)
    terms = tuple(pow2_terms(float(v)) for v in np.asarray(op.values))
    assert kernels.supports_fused_update(op.offsets, shape)

    rng = np.random.default_rng(7)
    b_df = df_split(rng.standard_normal(shape))
    x_df = df_split(rng.standard_normal(shape))
    e = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    xh, xl, r = kernels.df_update_residual_const_3d(
        op.offsets, terms, x_df[0], x_df[1], e, b_df[0], b_df[1]
    )

    x2 = df_add_f32(x_df, e)
    r2, _ = _residual_norm_df_exact_t(op.offsets, terms, b_df, x2)
    np.testing.assert_array_equal(np.asarray(xh), np.asarray(x2[0]))
    np.testing.assert_array_equal(np.asarray(xl), np.asarray(x2[1]))
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(r2[0]), rtol=0, atol=1e-6
    )


def test_fused_device_loop_matches_host_loop_3d():
    """Whole-solve fused path (pallas interpret) == host loop, 3D."""
    import dataclasses

    from openmg_tpu import SolverConfig, setup
    from openmg_tpu.models.poisson import rhs_random

    shape = (8, 8, 128)
    cfg = SolverConfig(
        smoother="rbgs", transfer="linear", residual_dtype="doublefloat",
        gridlevels=3, max_dense_coarse=4096,
    )
    b = rhs_random(shape, seed=9)
    s_dev = setup(shape, cfg)
    assert s_dev._exact_terms is not None
    x_d, info_d = s_dev.solve(b)
    s_host = setup(shape, dataclasses.replace(cfg, outer_loop="host"))
    x_h, info_h = s_host.solve(b)
    assert info_d["converged"] and info_h["converged"]
    assert info_d["cycles"] == info_h["cycles"]
    np.testing.assert_allclose(
        np.asarray(x_d), np.asarray(x_h), rtol=0, atol=1e-11
    )
    # near the ~1e-13 double-float floor the last entries feel summation
    # order; everything above it agrees to f32 precision
    np.testing.assert_allclose(
        info_d["residual_norms"],
        info_h["residual_norms"],
        rtol=1e-4,
        atol=1e-14,
    )


# ---------------------------------------------------------------------------
# 2D grids (BASELINE config 2: 256² RB-GS) — lifted to (1, ny, nx)
# ---------------------------------------------------------------------------

SHAPES_2D = [(8, 128), (16, 256), (256, 256)]


def _const_op_2d(shape):
    offsets = poisson_offsets(2)
    vals = jnp.asarray([4.0] + [-1.0] * 4, dtype=jnp.float32)
    return StencilOperator(None, offsets, vals, shape)


def test_supports_2d():
    offsets = poisson_offsets(2)
    assert kernels.supports(offsets, (256, 256))
    assert kernels.supports(offsets, (8, 128))
    assert not kernels.supports(offsets, (8, 100))  # lanes not 128-mult
    assert not kernels.supports(poisson_offsets(3), (8, 128))  # 3D offsets
    assert kernels.supports_fused_update(offsets, (256, 256))


@pytest.mark.parametrize("shape", SHAPES_2D)
@pytest.mark.parametrize("name", ["jacobi", "rbgs"])
def test_2d_kernels_match_jnp(shape, name):
    op = _const_op_2d(shape)
    inv_d = jnp.float32(1.0 / 4.0)
    b = jnp.asarray(rhs_random(shape, seed=4), jnp.float32)
    x = jnp.asarray(rhs_random(shape, seed=5), jnp.float32)
    if name == "jacobi":
        got = kernels.jacobi_const_3d(op.values, op.offsets, b, x, 2, 2 / 3)
        want = jacobi(op, inv_d, b, x, 2, 2 / 3)
    else:
        got = kernels.rbgs_const_3d(op.values, op.offsets, b, x, 2)
        want = rbgs(op, inv_d, b, x, 2)
    assert got.shape == shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )


@pytest.mark.parametrize("shape", SHAPES_2D)
def test_2d_residual_kernel_matches_jnp(shape):
    from openmg_tpu.ops.stencil import apply

    op = _const_op_2d(shape)
    b = jnp.asarray(rhs_random(shape, seed=6), jnp.float32)
    x = jnp.asarray(rhs_random(shape, seed=7), jnp.float32)
    got = kernels.residual_const_3d(op.values, op.offsets, b, x)
    want = b - apply(op, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6
    )


def test_2d_df_update_residual_kernel():
    from openmg_tpu.ops.doublefloat import df_add_f32, df_split, pow2_terms
    from openmg_tpu.core.solver import _residual_norm_df_exact_t

    shape = (64, 128)
    offsets = poisson_offsets(2)
    vals = [4.0] + [-1.0] * 4
    terms = tuple(pow2_terms(v) for v in vals)
    rng = np.random.default_rng(11)
    b_df = df_split(rng.standard_normal(shape))
    x_df = df_split(rng.standard_normal(shape))
    e = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    xh, xl, r = kernels.df_update_residual_const_3d(
        offsets, terms, x_df[0], x_df[1], e, b_df[0], b_df[1]
    )
    x2 = df_add_f32(x_df, e)
    r2, _ = _residual_norm_df_exact_t(offsets, terms, b_df, x2)
    np.testing.assert_array_equal(np.asarray(xh), np.asarray(x2[0]))
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(r2[0]), rtol=0, atol=1e-5
    )


# ---------------------------------------------------------------------------
# varying-coefficient kernels (the diffusion / general-stencil family)
# ---------------------------------------------------------------------------


def _vary_op(shape, seed=0):
    """Realistic varying operator: variable-coefficient diffusion."""
    from openmg_tpu.models.poisson import diffusion_stencil

    rng = np.random.default_rng(seed)
    kappa = 0.5 + rng.random(shape)
    offsets, coeffs = diffusion_stencil(kappa)
    return StencilOperator(jnp.asarray(coeffs, jnp.float32), offsets)


@pytest.mark.parametrize("shape", [(8, 8, 128), (4, 16, 256), (2, 512, 512)])
@pytest.mark.parametrize("name", ["jacobi", "rbgs"])
def test_varying_kernels_match_jnp(shape, name):
    from openmg_tpu.ops.smoothers import jacobi as jacobi_jnp, rbgs as rbgs_jnp

    op = _vary_op(shape, seed=31)
    inv_d = 1.0 / op.diag()
    b = jnp.asarray(rhs_random(shape, seed=32), jnp.float32)
    x = jnp.asarray(rhs_random(shape, seed=33), jnp.float32)
    assert kernels.supports_varying(op.offsets, shape)
    if name == "jacobi":
        got = kernels.jacobi_vary_3d(op.coeffs, op.offsets, b, x, 2, 2 / 3)
        want = jacobi_jnp(op, inv_d, b, x, 2, 2 / 3)
    else:
        got = kernels.rbgs_vary_3d(op.coeffs, op.offsets, b, x, 2)
        want = rbgs_jnp(op, inv_d, b, x, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_varying_kernels_2d():
    from openmg_tpu.ops.smoothers import rbgs as rbgs_jnp

    op = _vary_op((64, 128), seed=34)
    inv_d = 1.0 / op.diag()
    b = jnp.asarray(rhs_random((64, 128), seed=35), jnp.float32)
    x = jnp.asarray(rhs_random((64, 128), seed=36), jnp.float32)
    assert kernels.supports_varying(op.offsets, (64, 128))
    got = kernels.rbgs_vary_3d(op.coeffs, op.offsets, b, x, 2)
    want = rbgs_jnp(op, inv_d, b, x, 2)
    assert got.shape == (64, 128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_varying_residual_matches_apply():
    from openmg_tpu.ops.stencil import apply, residual

    op = _vary_op((8, 8, 128), seed=37)
    b = jnp.asarray(rhs_random((8, 8, 128), seed=38), jnp.float32)
    x = jnp.asarray(rhs_random((8, 8, 128), seed=39), jnp.float32)
    got = kernels.residual_vary_3d(op.coeffs, op.offsets, b, x)
    want = b - apply(op, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    # the dispatching residual() takes the same path
    got2 = residual(op, b, x)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_df_update_residual_emit_norm():
    """emit_norm=True: the kernel's per-tile partial sums reproduce
    ‖r‖² (saves a full r re-read per cycle for the convergence norm)."""
    from openmg_tpu.ops.doublefloat import df_split, pow2_terms

    shape = (8, 8, 128)
    op = _const_op(shape)
    terms = tuple(pow2_terms(float(v)) for v in np.asarray(op.values))
    rng = np.random.default_rng(9)
    b_df = df_split(rng.standard_normal(shape))
    x_df = df_split(rng.standard_normal(shape))
    e = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    xh, xl, r, pn = kernels.df_update_residual_const_3d(
        op.offsets, terms, x_df[0], x_df[1], e, b_df[0], b_df[1],
        emit_norm=True,
    )
    xh0, xl0, r0 = kernels.df_update_residual_const_3d(
        op.offsets, terms, x_df[0], x_df[1], e, b_df[0], b_df[1]
    )
    np.testing.assert_array_equal(np.asarray(r), np.asarray(r0))
    nsq_ref = float(jnp.sum(r0.astype(jnp.float64) ** 2))
    nsq = float(jnp.sum(pn[:, 0, 0]))
    assert abs(nsq - nsq_ref) <= 1e-5 * max(nsq_ref, 1e-30), (nsq, nsq_ref)
