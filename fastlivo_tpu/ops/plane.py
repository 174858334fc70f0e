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
    # smallest eigenvector of the symmetric 3x3 scatter = plane normal
    eigval, eigvec = jnp.linalg.eigh(scatter)
    normal = eigvec[..., :, 0]
    d = -jnp.sum(normal * centroid, axis=-1)
    pabcd = jnp.concatenate([normal, d[..., None]], axis=-1)
    # validity: every valid neighbor within threshold of the plane
    dist = jnp.abs(
        jnp.einsum("...ki,...i->...k", pts, normal) + d[..., None]
    )
    ok = jnp.all(jnp.where(valid, dist <= threshold, True), axis=-1)
    ok = ok & (nvalid >= 3.0) & jnp.all(jnp.isfinite(pabcd), axis=-1)
    return pabcd, ok


def point_to_plane(pabcd: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Signed distance(s): (..., 4), (..., 3) -> (...,)."""
    return jnp.sum(pabcd[..., :3] * p, axis=-1) + pabcd[..., 3]
