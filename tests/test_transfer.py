"""Grid transfers: reshape/mean path == explicit sparse R oracle (T5)."""

import numpy as np
import pytest

from openmg_tpu.ops.transfer import coarse_shape, prolong, restrict
from openmg_tpu.utils.oracle import aggregate_restriction


@pytest.mark.parametrize("shape", [(8,), (2,), (8, 8), (4, 2), (4, 6, 8), (2, 2, 2), (1, 4)])
def test_restrict_matches_sparse_R(shape):
    rng = np.random.default_rng(0)
    v = rng.standard_normal(shape)
    R = aggregate_restriction(shape)
    expected = (R @ v.ravel()).reshape(coarse_shape(shape))
    got = np.asarray(restrict(v))
    np.testing.assert_allclose(got, expected, rtol=1e-14, atol=0)


@pytest.mark.parametrize("shape", [(8,), (2,), (8, 8), (4, 2), (4, 6, 8), (1, 4)])
def test_prolong_matches_sparse_RT(shape):
    rng = np.random.default_rng(1)
    cs = coarse_shape(shape)
    u = rng.standard_normal(cs)
    R = aggregate_restriction(shape)
    expected = (R.T @ u.ravel()).reshape(shape)
    got = np.asarray(prolong(u, shape))
    np.testing.assert_allclose(got, expected, rtol=1e-14, atol=0)


def test_prolong_shape_mismatch_raises():
    with pytest.raises(ValueError):
        prolong(np.zeros((4,)), (12,))
