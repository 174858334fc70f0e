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


def solve_spd(S: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve S X = B for SYMMETRIC POSITIVE-DEFINITE S, pivot-free.

    Unpivoted Gauss-Jordan is unconditionally stable for SPD systems
    (Wilkinson: every pivot equals a Schur-complement diagonal, which
    stays positive). Dropping the pivot search removes the per-step
    argmax + dynamic row gather/scatter of `gj_solve` — those are
    unfusable HLO ops that the axon relay charges for on every EKF
    iteration — leaving one static-unrolled chain of row-vectorized
    elementwise updates that XLA fuses. Callers MUST guarantee SPD.
    """
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    n = S.shape[0]
    A = jnp.concatenate([S, B.astype(S.dtype)], axis=1)
    ii = jnp.arange(n)
    for k in range(n):  # static unroll: every index below is constant
        row = A[k] / A[k, k]
        factors = jnp.where(ii == k, 0.0, A[:, k])
        A = jnp.where(
            (ii == k)[:, None], row[None, :],
            A - factors[:, None] * row[None, :],
        )
    X = A[:, n:]
    return X[:, 0] if vec else X


def kalman_gain6_f64(P: jnp.ndarray, HTH6: jnp.ndarray) -> jnp.ndarray:
    """Exact-f64 K_1[:, :6] via the 6x6 reduction + pivoted Gauss-Jordan.

    The reference computes K_1 = (HᵀH + (P/R)⁻¹)⁻¹ with two 18x18
    inversions (laserMapping.cpp:1663, lidar_selection.cpp:871). With
    HᵀH nonzero only in the top-left 6x6 block, the factored form
    K_1 = P' (HᵀH P' + I)⁻¹ has S = HᵀH P' + I with identity rows below
    the pose block, so
        K_1[:, :6] = P'[:, :6] (HᵀH₆ P'[:6, :6] + I₆)⁻¹
    — one 6x6 solve instead of an 18x18 one. Only the first 6 columns
    are ever used (solution and G both contract against them).

    This is the reference implementation (and the rare-case fallback of
    `kalman_gain6`): every op in f64, partial pivoting."""
    A = HTH6 @ P[0:6, 0:6] + jnp.eye(6, dtype=P.dtype)
    return gj_solve(A.T, P[:, 0:6].T).T


# growth headroom over f64 machine epsilon for the backward-error accept
# test of kalman_gain6 (a pivoted f64 elimination itself only promises a
# backward error of O(n·growth·eps); 1e3·eps keeps the accepted result
# at least that good while tolerating the refinement's last-step noise)
_BE_TOL = 1e3 * 2.220446049250313e-16


def kalman_gain6(P: jnp.ndarray, HTH6: jnp.ndarray) -> jnp.ndarray:
    """K_1[:, :6] of the iterated-EKF gain — f64-quality at f32 cost.

    Same mathematical target as `kalman_gain6_f64` (docstring there for
    the 6x6 reduction, laserMapping.cpp:1663 / lidar_selection.cpp:871),
    but engineered for the TPU's emulated f64: inside a composite
    executable every f64 op stays un-fused, so the pivoted f64
    elimination costs ~113 HLO ops per EKF iteration (measured), the
    bulk of the LIO/VIO while-loop body. Scheme:

      1. Jacobi-equilibrate P₆₆ (D = diag(√diag); covariance
         ill-conditioning is almost entirely rot-vs-pos block scaling).
      2. Build the f32 approximate inverse via the INFORMATION form
         S⁻¹ = P₆₆⁻¹ N⁻¹, N = HᵀH₆ + P₆₆⁻¹: both systems are SPD, so
         the pivot-FREE `solve_spd` is unconditionally stable and its
         static f32 elimination chain fuses (no argmax / dynamic swaps).
      3. Three f64 iterative-refinement steps against the exact f64
         system K S = P'[:, :6] using the f32 inverse as preconditioner.
      4. Accept iff the final f64 residual passes a backward-error test
         ‖r‖∞ ≤ tol·(‖B‖∞ + n‖K‖∞‖S‖∞) — the same guarantee a pivoted
         f64 elimination offers — else fall back to `kalman_gain6_f64`
         inside `lax.cond` (the branch costs nothing unless taken;
         refinement converges at rate ~κ(S)·eps_f32, so only κ ≳ 1e5
         frames ever take it).

    Args: P (18, 18) = cov/R (f64); HTH6 (6, 6) (f64).
    Returns: (18, 6) gain block, backward-stable to f64.
    """
    f64 = P.dtype
    f32 = jnp.float32
    if f64 == f32:  # x64 disabled (CI/CPU edge): single precision all
        return kalman_gain6_f64(P, HTH6)
    P66 = P[0:6, 0:6]
    P66 = 0.5 * (P66 + P66.T)  # (I-GH)P keeps P symmetric only in exact
    # arithmetic (laserMapping.cpp:1712) — symmetrize the roundoff
    HTHs = 0.5 * (HTH6 + HTH6.T)
    B = P[:, 0:6]  # (18, 6)
    S = HTHs @ P66 + jnp.eye(6, dtype=f64)  # exact f64 system: K S = B

    d = jnp.sqrt(jnp.diagonal(P66))  # (6,) > 0 (SPD)
    dinv = 1.0 / d
    Pt32 = ((P66 * dinv[:, None]) * dinv[None, :]).astype(f32)  # unit diag
    I6 = jnp.eye(6, dtype=f32)
    Ptinv = solve_spd(Pt32, I6)
    Nt32 = ((HTHs * d[:, None]) * d[None, :]).astype(f32) + Ptinv
    Ntinv = solve_spd(Nt32, I6)
    # S⁻¹ = P₆₆⁻¹N⁻¹ = D⁻¹·P̃⁻¹·Ñ⁻¹·D  (both factors already f32)
    d32, dinv32 = d.astype(f32), dinv.astype(f32)
    Q32 = ((Ptinv @ Ntinv) * dinv32[:, None]) * d32[None, :]

    K = (B.astype(f32) @ Q32).astype(f64)
    for _ in range(3):
        r = B - K @ S
        K = K + (r.astype(f32) @ Q32).astype(f64)

    r = B - K @ S
    bound = _BE_TOL * (
        jnp.max(jnp.abs(B))
        + 6.0 * jnp.max(jnp.abs(K)) * jnp.max(jnp.abs(S))
    )
    ok = jnp.max(jnp.abs(r)) <= bound
    return jax.lax.cond(
        ok,
        lambda K, *_: K,
        lambda _K, S, B: gj_solve(S.T, B.T).T,
        K, S, B,
    )


# Back-compat: the historical opt-in "mixed" gain (f32 pivoted solve +
# one refinement, no accept test) is superseded by the default scheme
# above, which strictly dominates it in both cost (pivot-free fusable
# f32 factorization) and accuracy (3 refinements + backward-error
# fallback). The `mixed_gain` flags across lio/vio/frame_step/configs
# remain accepted and simply select the same implementation.
kalman_gain6_mixed = kalman_gain6
