"""Batched SO(3) operations in pure JAX.

Functional re-design of the reference's scalar SO(3) helpers
(reference: include/so3_math.h:11-103). All functions broadcast over
arbitrary leading batch dimensions and are jit/vmap/scan safe (no
data-dependent control flow; small-angle cases handled with masked
Taylor expansions so gradients stay finite at the identity).
"""
from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-7


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix.

    Equivalent of SKEW_SYM_MATRX (so3_math.h:9).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map: (..., 3) axis-angle -> (..., 3, 3).

    Equivalent of Exp(v1, v2, v3) (so3_math.h:54-72) but batched and
    branch-free. Uses the unnormalized form
        R = I + A * K + B * K^2,  K = skew(phi),
        A = sin(t)/t, B = (1-cos(t))/t^2
    with 4th-order Taylor fallbacks near t = 0.
    """
    dtype = phi.dtype
    t2 = jnp.sum(phi * phi, axis=-1)
    t = jnp.sqrt(jnp.maximum(t2, jnp.asarray(_SMALL**2, dtype)))
    small = t2 < (_SMALL * 10.0) ** 2
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / (t * t))
    k = skew(phi)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2



def log(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix logarithm: (..., 3, 3) -> (..., 3) axis-angle.

    Matches Log() (so3_math.h:75-81): theta from the trace, axis from
    the antisymmetric part, with the same small-angle fallback
    (theta < 1e-3 -> 0.5 * vee(R - R^T)).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.where(
        tr > 3.0 - 1e-6,
        jnp.zeros_like(tr),
        jnp.arccos(jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)),
    )
    k = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    safe_sin = jnp.where(jnp.abs(theta) < 1e-3, jnp.ones_like(theta), jnp.sin(theta))
    scale = jnp.where(jnp.abs(theta) < 1e-3, 0.5 * jnp.ones_like(theta), 0.5 * theta / safe_sin)
    return scale[..., None] * k


def rot_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> XYZ euler angles, matching RotMtoEuler
    (so3_math.h:83-103). Used only for logging parity."""
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    y = jnp.arctan2(-R[..., 2, 0], sy)
    z = jnp.where(singular, jnp.zeros_like(sy), jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


def quat_from_rot(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) quaternion (x, y, z, w), branch-free.

    Shepperd's method via the four squared magnitudes; used for TUM
    trajectory export (reference writes q via Eigen::Quaterniond,
    laserMapping.cpp:1742).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best.
    qw2 = jnp.maximum(0.0, 1.0 + tr) / 4.0
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22) / 4.0
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22) / 4.0
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22) / 4.0
    cands = jnp.stack(
        [
            # from qw
            jnp.stack([m21 - m12, m02 - m20, m10 - m01, 4.0 * qw2], axis=-1),
            # from qx
            jnp.stack([4.0 * qx2, m01 + m10, m02 + m20, m21 - m12], axis=-1),
            # from qy
            jnp.stack([m01 + m10, 4.0 * qy2, m12 + m21, m02 - m20], axis=-1),
            # from qz
            jnp.stack([m02 + m20, m12 + m21, 4.0 * qz2, m10 - m01], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 4)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    denom = 4.0 * jnp.sqrt(jnp.take_along_axis(mags, best[..., None], axis=-1))[..., 0]
    q = q / jnp.maximum(denom, 1e-12)[..., None]
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, 1e-12)
