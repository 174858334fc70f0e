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


def test_mixed_gain_matches_f64():
    """f32-solve + one f64 refinement must match the full-f64 gain to
    ~f64 working accuracy on filter-realistic systems."""
    from fastlivo_tpu.ops.linalg import kalman_gain6, kalman_gain6_mixed

    rng = np.random.default_rng(0)
    for trial in range(8):
        # covariance-like SPD P and a Gram HtH with varying conditioning
        A = rng.normal(size=(18, 18))
        P = (A @ A.T) * 1e-3 + np.eye(18) * 10.0 ** rng.uniform(-6, -2)
        H = rng.normal(size=(6, 6))
        HTH = H @ H.T * 10.0 ** rng.uniform(0, 4)
        K_ref = np.asarray(kalman_gain6(jnp.asarray(P), jnp.asarray(HTH)))
        K_mix = np.asarray(kalman_gain6_mixed(jnp.asarray(P), jnp.asarray(HTH)))
        scale = np.abs(K_ref).max() + 1e-30
        assert np.abs(K_mix - K_ref).max() / scale < 1e-9, trial
