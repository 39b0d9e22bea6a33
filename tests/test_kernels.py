"""Pallas smoother kernels == jnp smoothers (interpret mode on CPU;
compiled path exercised by scripts/tpu_smoke.py on the real chip)."""

import numpy as np
import pytest
import jax.numpy as jnp

from openmg_tpu.models.poisson import poisson_offsets, rhs_random
from openmg_tpu.ops import kernels
from openmg_tpu.ops.smoothers import jacobi, rbgs
from openmg_tpu.ops.stencil import StencilOperator

SHAPES = [(8, 8, 128), (4, 16, 256), (16, 8, 128)]


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
