"""Gauss-Jordan solver vs numpy reference."""
import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.ops.linalg import gj_solve


def test_gj_solve_matches_numpy():
    rng = np.random.default_rng(0)
    for n, m in [(3, 1), (6, 6), (18, 18), (18, 6)]:
        S = rng.normal(size=(n, n)) + n * np.eye(n)
        B = rng.normal(size=(n, m))
        X = np.asarray(gj_solve(jnp.asarray(S), jnp.asarray(B)))
        np.testing.assert_allclose(X, np.linalg.solve(S, B), rtol=1e-9, atol=1e-9)


def test_gj_solve_needs_pivoting():
    # zero pivot in the natural order; partial pivoting must handle it
    S = np.array([[0.0, 1.0], [1.0, 0.0]])
    b = np.array([2.0, 3.0])
    x = np.asarray(gj_solve(jnp.asarray(S), jnp.asarray(b)))
    np.testing.assert_allclose(x, [3.0, 2.0], atol=1e-12)


def test_gj_solve_vector_rhs():
    rng = np.random.default_rng(1)
    S = rng.normal(size=(18, 18)) + 18 * np.eye(18)
    b = rng.normal(size=18)
    x = np.asarray(gj_solve(jnp.asarray(S), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(S, b), rtol=1e-9, atol=1e-9)
