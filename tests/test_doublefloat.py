"""Double-float arithmetic vs numpy float64 oracles (~2^-49 unit roundoff)."""

import numpy as np
import pytest
import jax.numpy as jnp

from openmg_tpu.ops import doublefloat as df


def _rand(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape) * scale


def test_split_merge_roundtrip():
    a = _rand((64,), 0) * 1e3 + _rand((64,), 1) * 1e-9
    x = df.df_split(a)
    back = df.df_merge(x)
    # split is exact: hi + lo == a in f64 (f32 pair holds ~49 bits; values
    # here need < 49 bits relative)
    np.testing.assert_allclose(back, a, rtol=1e-14, atol=0)


def test_two_sum_exact():
    a = jnp.asarray(_rand((128,), 2) * 1e6, dtype=jnp.float32)
    b = jnp.asarray(_rand((128,), 3) * 1e-3, dtype=jnp.float32)
    s, e = df.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, exact)


def test_two_prod_exact():
    a = jnp.asarray(_rand((128,), 4), dtype=jnp.float32)
    b = jnp.asarray(_rand((128,), 5), dtype=jnp.float32)
    p, e = df.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    # f32 products are exactly representable in f64 ⇒ must match exactly
    np.testing.assert_array_equal(got, exact)


@pytest.mark.parametrize("op,npop", [
    (df.df_add, np.add),
    (df.df_sub, np.subtract),
    (df.df_mul, np.multiply),
])
def test_df_binary_ops(op, npop):
    a = _rand((256,), 6) * 1e2
    b = _rand((256,), 7) * 1e-4
    x, y = df.df_split(a), df.df_split(b)
    got = df.df_merge(op(x, y))
    expected = npop(a, b)
    scale = np.maximum(np.abs(expected), 1e-30)
    assert np.max(np.abs(got - expected) / scale) < 1e-13


def test_df_accumulation_beats_f32():
    """Summing many cancelling terms: df keeps ~14 digits where f32 keeps 7."""
    rng = np.random.default_rng(8)
    terms = rng.standard_normal(10_000)
    exact = np.sum(terms)
    acc = df.df_split(np.zeros(()))
    for chunk in np.split(terms, 100):
        c = jnp.asarray(np.sum(chunk, dtype=np.float64).astype(np.float32))
        c_lo = jnp.asarray(
            (np.sum(chunk, dtype=np.float64) - np.float64(np.asarray(c))).astype(
                np.float32
            )
        )
        acc = df.df_add(acc, (c, c_lo))
    got = float(df.df_merge(acc))
    assert abs(got - exact) < 1e-11 * max(1.0, abs(exact))


def test_df_mul_f32_and_add_f32():
    a = _rand((64,), 9)
    x = df.df_split(a)
    c = jnp.asarray(np.float32(3.7))
    got = df.df_merge(df.df_mul_f32(x, c))
    expected = a * np.float64(np.float32(3.7))
    assert np.max(np.abs(got - expected)) < 1e-13 * np.max(np.abs(expected))
    got2 = df.df_merge(df.df_add_f32(x, c))
    expected2 = a + np.float64(np.float32(3.7))
    np.testing.assert_allclose(got2, expected2, rtol=1e-13)


class TestPow2Terms:
    def test_decompositions(self):
        from openmg_tpu.ops.doublefloat import pow2_terms

        assert pow2_terms(-1.0) == (-1.0,)
        assert pow2_terms(4.0) == (4.0,)
        assert pow2_terms(6.0) == (4.0, 2.0)
        assert pow2_terms(-6.0) == (-4.0, -2.0)
        assert pow2_terms(0.75) == (0.5, 0.25)
        assert pow2_terms(7.0) == (4.0, 2.0, 1.0)
        assert pow2_terms(0.0) == ()
        assert pow2_terms(6.5) == (4.0, 2.0, 0.5)
        assert pow2_terms(6.75) is None  # needs 4 terms
        assert pow2_terms(1.1) is None  # not dyadic


class TestExactResidual:
    def test_matches_generic_and_f64_oracle(self):
        import numpy as np
        import jax.numpy as jnp

        from openmg_tpu.core.solver import (
            _residual_norm_df_exact_t,
            _residual_norm_df_t,
            exact_residual_terms,
        )
        from openmg_tpu import SolverConfig, setup
        from openmg_tpu.models.poisson import poisson, rhs_random
        from openmg_tpu.ops.doublefloat import df_merge, df_split

        shape = (16, 16, 16)
        s = setup(shape, SolverConfig(residual_dtype="doublefloat"))
        h = s.hierarchy
        terms = exact_residual_terms(h)
        assert terms is not None  # 3D Poisson taps are (4,2) and (-1,)

        rng = np.random.default_rng(0)
        b = rng.standard_normal(shape)
        x = rng.standard_normal(shape)
        b_df, x_df = df_split(b), df_split(x)

        r_e, n_e = _residual_norm_df_exact_t(
            h.fine_hi.offsets, terms, b_df, x_df
        )
        r_g, n_g = _residual_norm_df_t(h.fine_hi, h.fine_hi_lo, b_df, x_df)

        # f64 oracle
        A = poisson(shape)
        r64 = b.ravel() - A @ x.ravel()
        for r_pair in (r_e, r_g):
            err = np.abs(df_merge(r_pair).ravel() - r64)
            assert err.max() < 1e-12 * max(1.0, np.abs(r64).max())
        np.testing.assert_allclose(float(n_e), float(n_g), rtol=1e-10)
