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
