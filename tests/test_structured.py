"""Boundary-collapsed setup == direct Galerkin RAP chain, bit-exact."""

import numpy as np
import pytest

from openmg_tpu.core.structured import expand_rep, expand_rep_np, structured_chain
from openmg_tpu.models.poisson import poisson_offsets, poisson_stencil
from openmg_tpu.ops.galerkin import galerkin_rap_stencil
from openmg_tpu.ops.transfer import AGGREGATE, LINEAR
from openmg_tpu.utils.oracle import max_gridlevels


def _direct_chain(shape, gridlevels, transfer):
    offsets, coeffs = poisson_stencil(shape)  # float64
    chain = [(offsets, coeffs)]
    for _ in range(gridlevels - 1):
        offs, cfs = chain[-1]
        chain.append(galerkin_rap_stencil(offs, cfs, transfer=transfer))
    return chain


def _materialize(level):
    out = level.rep
    for a in range(len(level.real_shape)):
        out = (
            expand_rep_np(out, a, level.real_shape[a])
            if level.m_shape[a] < level.real_shape[a]
            else out
        )
    return out


@pytest.mark.parametrize(
    "shape,gridlevels",
    [
        ((64,), 4),
        ((128,), 5),
        ((64, 32), 4),
        ((32, 32), 3),
        ((64, 64, 32), 3),
        ((8, 8), 2),  # everything exact (below dummy size)
        ((128, 4), 2),  # mixed collapsed/exact axes
    ],
)
@pytest.mark.parametrize("transfer", [AGGREGATE, LINEAR], ids=lambda t: t.name)
def test_structured_equals_direct(shape, gridlevels, transfer):
    gridlevels = min(gridlevels, max_gridlevels(shape))
    d = len(shape)
    vals = [2.0 * d] + [-1.0] * (2 * d)
    levels = structured_chain(poisson_offsets(d), vals, shape, gridlevels, transfer)
    direct = _direct_chain(shape, gridlevels, transfer)
    assert len(levels) == len(direct)
    for lvl, (offs_d, cfs_d) in zip(levels, direct):
        assert lvl.offsets == tuple(offs_d)
        got = _materialize(lvl)
        assert got.shape == cfs_d.shape
        np.testing.assert_array_equal(got, cfs_d)
        assert lvl.nnz() == np.count_nonzero(cfs_d)


def test_expand_rep_traced_matches_np():
    import jax.numpy as jnp

    shape = (128, 64)
    levels = structured_chain(
        poisson_offsets(2), [4.0, -1.0, -1.0, -1.0, -1.0], shape, 3, LINEAR
    )
    lvl = levels[1]
    got = np.asarray(expand_rep(jnp.asarray(lvl.rep), lvl.m_shape, lvl.real_shape))
    np.testing.assert_array_equal(got, _materialize(lvl))
