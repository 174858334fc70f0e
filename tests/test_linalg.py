"""Gauss-Jordan solver vs numpy reference."""
import numpy as np
import pytest
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


@pytest.mark.slow
def test_kalman_gain6_matches_dense_numpy():
    """The pivot-free Cholesky gain must equal the dense factored form
    K_1[:, :6] = P (HtH_pad P + I)^-1 [:, :6] computed in numpy f64,
    across conditioning and including singular (rank-deficient) HtH."""
    from fastlivo_tpu.ops.linalg import kalman_gain6

    rng = np.random.default_rng(3)
    for trial in range(10):
        A = rng.normal(size=(18, 18))
        P = (A @ A.T) * 1e-3 + np.eye(18) * 10.0 ** rng.uniform(-6, -2)
        r = rng.integers(1, 7)  # HtH rank: degenerate scans give rank<6
        H = rng.normal(size=(6, r))
        HTH = H @ H.T * 10.0 ** rng.uniform(0, 5)
        HTH_pad = np.zeros((18, 18))
        HTH_pad[:6, :6] = HTH
        K_ref = np.linalg.solve((HTH_pad @ P + np.eye(18)).T, P.T).T[:, :6]
        K = np.asarray(kalman_gain6(jnp.asarray(P), jnp.asarray(HTH)))
        scale = np.abs(K_ref).max() + 1e-30
        assert np.abs(K - K_ref).max() / scale < 1e-9, trial


def test_mixed_gain_matches_f64():
    """The default gain (equilibrated f32 factorization + f64 refinement
    + backward-error fallback) must match the exact pivoted-f64 gain to
    ~f64 working accuracy on filter-realistic systems."""
    from fastlivo_tpu.ops.linalg import kalman_gain6, kalman_gain6_f64

    rng = np.random.default_rng(0)
    for trial in range(8):
        # covariance-like SPD P and a Gram HtH with varying conditioning
        A = rng.normal(size=(18, 18))
        P = (A @ A.T) * 1e-3 + np.eye(18) * 10.0 ** rng.uniform(-6, -2)
        H = rng.normal(size=(6, 6))
        HTH = H @ H.T * 10.0 ** rng.uniform(0, 4)
        K_ref = np.asarray(kalman_gain6_f64(jnp.asarray(P), jnp.asarray(HTH)))
        K = np.asarray(kalman_gain6(jnp.asarray(P), jnp.asarray(HTH)))
        scale = np.abs(K_ref).max() + 1e-30
        assert np.abs(K - K_ref).max() / scale < 1e-9, trial


def test_gain_fallback_on_ill_conditioned():
    """Adversarial conditioning (strong measurement vs weak anisotropic
    prior, kappa(S) >> 1e7) defeats f32 refinement; the backward-error
    accept test must route those frames to the exact f64 solve and the
    result must still match dense-numpy f64."""
    from fastlivo_tpu.ops.linalg import kalman_gain6

    rng = np.random.default_rng(9)
    # near-singular correlated prior block + huge rank-1 HtH
    v = rng.normal(size=6)
    Q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    P66 = Q @ np.diag([1e-2, 1e-4, 1e-6, 1e-8, 1e-9, 1e-10]) @ Q.T
    P = np.zeros((18, 18))
    P[:6, :6] = P66
    P[6:, 6:] = np.eye(12) * 1e-4
    P[:6, 6:] = rng.normal(size=(6, 12)) * 1e-7
    P[6:, :6] = P[:6, 6:].T
    HTH = np.outer(v, v) * 1e9
    S = HTH @ (0.5 * (P66 + P66.T)) + np.eye(6)
    K_ref = np.linalg.solve(S.T, P[:, :6].T).T
    K = np.asarray(kalman_gain6(jnp.asarray(P), jnp.asarray(HTH)))
    scale = np.abs(K_ref).max() + 1e-30
    assert np.abs(K - K_ref).max() / scale < 1e-8
