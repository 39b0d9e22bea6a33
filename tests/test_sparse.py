"""Sparse format layer tests (T1): CSR/ELL/BSR containers, padded static
nnz inertness, SpMV vs scipy, double-float SpMV accuracy."""

import numpy as np
import pytest
import scipy.sparse as sp

from openmg_tpu.ops.sparse import (
    bsr_from_scipy,
    csr_from_scipy,
    diagonal,
    ell_from_scipy,
    from_scipy,
    spmv,
    spmv_df,
    to_scipy,
)


def random_sparse(n, m, density=0.1, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.random(n, m, density=density, random_state=rng, format="csr")
    A.data = rng.standard_normal(A.nnz)
    return A


@pytest.mark.parametrize("fmt", ["csr", "ell", "bsr"])
def test_round_trip(fmt):
    n = 48
    A = random_sparse(n, n, 0.15, seed=1)
    A = A + sp.identity(n)  # ensure some structure on the diagonal
    M = from_scipy(A, fmt, dtype=np.float64)
    back = to_scipy(M)
    assert np.allclose(back.toarray(), A.toarray())


@pytest.mark.parametrize("fmt", ["csr", "ell"])
def test_spmv_rectangular(fmt):
    A = random_sparse(40, 72, 0.12, seed=2)
    x = np.random.default_rng(3).standard_normal(72)
    M = from_scipy(A, fmt, dtype=np.float64)
    y = np.asarray(spmv(M, np.asarray(x)))
    assert np.allclose(y, A @ x, atol=1e-12)


def test_spmv_bsr():
    n = 64
    A = random_sparse(n, n, 0.1, seed=4) + sp.identity(n)
    x = np.random.default_rng(5).standard_normal(n)
    for bs in (1, 2, 4, 8):
        M = bsr_from_scipy(A, blocksize=(bs, bs), dtype=np.float64)
        y = np.asarray(spmv(M, np.asarray(x)))
        assert np.allclose(y, A @ x, atol=1e-12), f"blocksize {bs}"


def test_padding_is_inert():
    """Extra pad slots beyond the minimum must not change any result."""
    A = random_sparse(32, 32, 0.2, seed=6)
    x = np.random.default_rng(7).standard_normal(32)
    y_ref = A @ x
    tight = ell_from_scipy(A, dtype=np.float64)
    wide = ell_from_scipy(A, k=tight.k + 5, dtype=np.float64)
    assert np.allclose(np.asarray(spmv(wide, np.asarray(x))), y_ref, atol=1e-12)
    csr_wide = csr_from_scipy(A, pad_nnz_to=257, dtype=np.float64)
    assert csr_wide.nnz_pad >= A.nnz + 1
    assert np.allclose(
        np.asarray(spmv(csr_wide, np.asarray(x))), y_ref, atol=1e-12
    )
    b_tight = bsr_from_scipy(A, blocksize=(4, 4), dtype=np.float64)
    b_wide = bsr_from_scipy(A, blocksize=(4, 4), kb=b_tight.kb + 3, dtype=np.float64)
    assert np.allclose(
        np.asarray(spmv(b_wide, np.asarray(x))), y_ref, atol=1e-12
    )


@pytest.mark.parametrize("fmt", ["csr", "ell", "bsr"])
def test_diagonal(fmt):
    n = 40
    A = random_sparse(n, n, 0.15, seed=8) + 3 * sp.identity(n)
    M = from_scipy(A, fmt, dtype=np.float64)
    d = np.asarray(diagonal(M))
    assert np.allclose(d, A.diagonal(), atol=1e-12)


def test_spmv_df_accuracy():
    """Double-float ELL SpMV must track the float64 product to ~1e-13
    relative — the precision the 1e-10 outer residual rides on."""
    import dataclasses

    import jax.numpy as jnp

    n = 128
    A = random_sparse(n, n, 0.1, seed=9) + 4 * sp.identity(n)
    x64 = np.random.default_rng(10).standard_normal(n)
    y64 = A @ x64

    ell64 = ell_from_scipy(A, dtype=np.float64)
    d64 = np.asarray(ell64.data)
    hi = d64.astype(np.float32)
    lo = (d64 - hi.astype(np.float64)).astype(np.float32)
    M_hi = dataclasses.replace(ell64, data=jnp.asarray(hi))
    M_lo = dataclasses.replace(ell64, data=jnp.asarray(lo))

    x_hi = x64.astype(np.float32)
    x_lo = (x64 - x_hi.astype(np.float64)).astype(np.float32)
    y_hi, y_lo = spmv_df(M_hi, M_lo, jnp.asarray(x_hi), jnp.asarray(x_lo))
    y = np.asarray(y_hi, dtype=np.float64) + np.asarray(y_lo, dtype=np.float64)
    err = np.abs(y - y64).max() / max(np.abs(y64).max(), 1.0)
    assert err < 1e-12, err


def test_ell_k_budget_guard():
    A = random_sparse(16, 16, 0.5, seed=11)
    tight = ell_from_scipy(A)
    with pytest.raises(ValueError):
        ell_from_scipy(A, k=tight.k - 1)


def test_bsr_requires_divisible():
    A = random_sparse(30, 30, 0.2, seed=12)
    with pytest.raises(ValueError):
        bsr_from_scipy(A, blocksize=(4, 4))
