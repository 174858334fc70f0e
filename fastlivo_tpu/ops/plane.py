"""Batched least-squares plane fitting.

Replaces the per-point `esti_plane` QR solve (reference:
include/common_lib.h:449-493) with a closed-form batched 3x3
normal-equation solve that vmaps over thousands of neighbor sets at once
(TPU: one fused elementwise+small-matmul pass instead of 5x3 QR per point).

Plane model (same as reference): solve A n = -1 for the 5 neighbor
coordinates A (NUM_MATCH_POINTS x 3), then normalize:
    normal = n / |n|, d = 1 / |n|,
validity = all 5 neighbors within `threshold` of the plane.
"""
from __future__ import annotations

import jax.numpy as jnp


def _solve3x3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve via the adjugate (Cramer). A: (..., 3, 3),
    b: (..., 3). Branch-free and cheap on the VPU; near-singular systems
    produce large solutions that the downstream validity gate rejects."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    x = c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]
    y = c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]
    z = c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]
    return jnp.stack([x, y, z], axis=-1) * inv_det[..., None]


def sym3x3_min_eigvec(S: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a symmetric 3x3
    batch (..., 3, 3), in closed form.

    Eigenvalues via the trigonometric solution of the characteristic
    cubic; the eigenvector is the largest cross product of rows of
    (S - lambda_min I) (its null-space direction). Fully elementwise —
    no LAPACK custom calls, compiles on any backend."""
    dtype = S.dtype
    a00, a01, a02 = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    a11, a12, a22 = S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det(B)/2 with B = (S - qI)/p
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) / (p * p * p)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # rows of (S - lam I)
    r0 = jnp.stack([a00 - lam_min, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam_min, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam_min], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    norm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    # degenerate (isotropic) scatter: fall back to +z; the validity gate
    # downstream rejects such fits anyway
    fallback = jnp.zeros_like(best).at[..., 2].set(1.0)
    ok = norm[..., 0] > 1e-20
    return jnp.where(ok[..., None], best / jnp.where(ok[..., None], norm, 1.0), fallback)


def fit_plane(
    pts: jnp.ndarray, valid: jnp.ndarray | None = None, threshold: float = 0.1
):
    """Fit planes through neighbor sets (centered total least squares).

    The reference solves A n = -1 by QR per point set. That
    parametrization is numerically poor in f32 far from the origin and
    degenerate for planes through the origin; we instead take the
    smallest-eigenvector of the centered 3x3 scatter matrix (orthogonal
    regression) — translation invariant and f32-stable — then report the
    plane in the reference's [n, d] form (n.p + d = 0, |n| = 1). The
    downstream behavior gate is identical: all neighbors must lie within
    `threshold` of the plane (esti_plane, common_lib.h:471-477).

    Args:
      pts: (..., K, 3) neighbor coordinates (K = NUM_MATCH_POINTS = 5).
      valid: optional (..., K) bool; invalid rows don't constrain the fit.
      threshold: max point-to-plane distance for validity
        (reference: 0.1, laserMapping.cpp:1571).

    Returns:
      pabcd: (..., 4) [nx, ny, nz, d] with |n| = 1
      ok:    (...,) bool validity
    """
    if valid is None:
        valid = jnp.ones(pts.shape[:-1], dtype=bool)
    w = valid.astype(pts.dtype)[..., None]  # (..., K, 1)
    nvalid = jnp.maximum(jnp.sum(w, axis=(-2, -1)), 1.0)  # (...,)
    centroid = jnp.sum(pts * w, axis=-2) / nvalid[..., None]
    centered = (pts - centroid[..., None, :]) * w
    scatter = jnp.einsum("...ki,...kj->...ij", centered, centered)
    # smallest eigenvector of the symmetric 3x3 scatter = plane normal.
    # Closed form (elementwise, VPU-friendly) — jnp.linalg.eigh's QR
    # iteration costs ~30 ms for a 16k batch on one TPU chip.
    normal = sym3x3_min_eigvec(scatter)
    d = -jnp.sum(normal * centroid, axis=-1)
    pabcd = jnp.concatenate([normal, d[..., None]], axis=-1)
    # validity: every valid neighbor within threshold of the plane
    dist = jnp.abs(
        jnp.einsum("...ki,...i->...k", pts, normal) + d[..., None]
    )
    ok = jnp.all(jnp.where(valid, dist <= threshold, True), axis=-1)
    ok = ok & (nvalid >= 3.0) & jnp.all(jnp.isfinite(pabcd), axis=-1)
    return pabcd, ok


def fit_plane_ref(
    pts: jnp.ndarray, valid: jnp.ndarray | None = None, threshold: float = 0.1
):
    """EXACT reference plane parametrization (esti_plane,
    common_lib.h:449-493): least-squares solve of A·n = -1 over the K
    neighbors, then pabcd = [n/|n|, 1/|n|]; valid iff every neighbor
    lies within `threshold` of the normalized plane.

    The reference's colPivHouseholderQr on the (full-rank) 5x3 system is
    the least-squares solution, identical to the 3x3 normal equations in
    exact arithmetic. Forming AᵀA squares the conditioning (the reason
    the default backend is the centered TLS `fit_plane`), so the tiny
    per-point algebra runs in f64 — ~60 flops/point, emulated on TPU but
    negligible next to the kNN gather — which strictly dominates the
    reference's own f32 QR (esti_plane is instantiated with T=float,
    laserMapping.cpp:1571).

    Selectable via `capacity.plane_fit: ref`; see tests/
    test_reference_algebra.py for the transcription equivalence and the
    measured TLS-vs-ref end-to-end A/B.

    Same signature/returns as `fit_plane`. With a `valid` mask, rows
    outside the mask don't constrain the fit and validity additionally
    requires ALL K rows valid (the reference only fits when the 5-NN
    search returned a full neighbor set)."""
    K = pts.shape[-2]
    if valid is None:
        valid = jnp.ones(pts.shape[:-1], dtype=bool)
    dtype = pts.dtype
    f64 = jnp.float64
    w = valid.astype(f64)[..., None]
    p64 = pts.astype(f64) * w
    AtA = jnp.einsum("...ki,...kj->...ij", p64, p64)
    Atb = -jnp.sum(p64, axis=-2)  # Aᵀ·(-1)
    n = _solve3x3(AtA, Atb)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1))
    safe = jnp.maximum(norm, 1e-30)
    inv = 1.0 / safe
    normal = n * inv[..., None]
    d = inv  # pca_result(3) = 1/|n| (common_lib.h:469)
    pabcd = jnp.concatenate([normal, d[..., None]], axis=-1)
    dist = jnp.abs(
        jnp.einsum("...ki,...i->...k", pts.astype(f64), normal)
        + d[..., None]
    )
    ok = jnp.all(jnp.where(valid, dist <= threshold, True), axis=-1)
    ok = (
        ok
        & (jnp.sum(valid, axis=-1) == K)
        & (norm > 1e-30)
        & jnp.all(jnp.isfinite(pabcd), axis=-1)
    )
    return pabcd.astype(dtype), ok


def point_to_plane(pabcd: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Signed distance(s): (..., 4), (..., 3) -> (...,)."""
    return jnp.sum(pabcd[..., :3] * p, axis=-1) + pabcd[..., 3]
