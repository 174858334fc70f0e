"""Small dense linear algebra built from basic arithmetic only.

TPU XLA compiles f64 elementwise/matmul but not the LAPACK-style
factorizations behind `jnp.linalg.solve` (LU custom-calls fail on the
v5e toolchain for f64). The iterated-EKF gain needs exactly one small
solve per iteration — 18x18 with an 18-wide RHS (laserMapping.cpp:1663,
lidar_selection.cpp:871) — so a Gauss-Jordan elimination with partial
pivoting in pure jnp ops is both portable and fast enough (n=18:
~18 fori_loop steps over an 18x36 tile; negligible next to the point
batch)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gj_solve(S: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve S X = B for square S via Gauss-Jordan with partial pivoting.

    S: (n, n); B: (n, m) or (n,). Uses only elementwise ops, dynamic
    row gathers and fori_loop — compiles for any dtype the backend can
    add/multiply (including emulated f64 on TPU).
    """
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    n = S.shape[0]
    A = jnp.concatenate([S, B.astype(S.dtype)], axis=1)  # (n, n+m)
    rows = jnp.arange(n)

    def body(k, A):
        col = jnp.abs(A[:, k])
        col = jnp.where(rows >= k, col, -1.0)
        p = jnp.argmax(col)
        rk = A[k]
        rp = A[p]
        A = A.at[k].set(rp).at[p].set(rk)
        piv = A[k, k]
        row = A[k] / piv
        A = A.at[k].set(row)
        factors = A[:, k].at[k].set(0.0)
        return A - factors[:, None] * row[None, :]

    A = jax.lax.fori_loop(0, n, body, A, unroll=True)
    X = A[:, n:]
    return X[:, 0] if vec else X


def kalman_gain6(P: jnp.ndarray, HTH6: jnp.ndarray) -> jnp.ndarray:
    """K_1[:, :6] of the iterated-EKF gain, via the exact 6x6 reduction.

    The reference computes K_1 = (HᵀH + (P/R)⁻¹)⁻¹ with two 18x18
    inversions (laserMapping.cpp:1663, lidar_selection.cpp:871). With
    HᵀH nonzero only in the top-left 6x6 block, the factored form
    K_1 = P' (HᵀH P' + I)⁻¹ has S = HᵀH P' + I with identity rows below
    the pose block, so
        K_1[:, :6] = P'[:, :6] (HᵀH₆ P'[:6, :6] + I₆)⁻¹
    — one 6x6 solve instead of an 18x18 one. Only the first 6 columns
    are ever used (solution and G both contract against them).

    Args: P (18, 18) = cov/R (f64); HTH6 (6, 6) (f64).
    Returns: (18, 6) gain block.
    """
    A = HTH6 @ P[0:6, 0:6] + jnp.eye(6, dtype=P.dtype)
    return gj_solve(A.T, P[:, 0:6].T).T


def kalman_gain6_mixed(P: jnp.ndarray, HTH6: jnp.ndarray) -> jnp.ndarray:
    """`kalman_gain6` with the solve in f32 plus ONE f64 iterative-
    refinement step (opt-in; see lio_update(mixed_gain=True)).

    TPU f64 is software-emulated, so the 6-step f64 Gauss-Jordan is the
    latency item in every EKF iteration. Solving in f32 and refining
    once in f64 (r = B - S X; X += S^-1 r) recovers ~full f64 accuracy
    for the well-conditioned S = HtH P' + I systems the filter produces
    (kappa ~ 1e2-1e4): the refined residual shrinks by the f32 backward
    error (~1e-7 kappa) twice over. Equivalence bounds are asserted in
    tests/test_linalg.py."""
    f64 = P.dtype
    S = (HTH6 @ P[0:6, 0:6] + jnp.eye(6, dtype=f64)).T  # (6,6)
    B = P[:, 0:6].T  # (6,18)
    S32 = S.astype(jnp.float32)
    X = gj_solve(S32, B.astype(jnp.float32)).astype(f64)
    r = B - S @ X
    dX = gj_solve(S32, r.astype(jnp.float32)).astype(f64)
    return (X + dX).T
