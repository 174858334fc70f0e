"""The 18-dimensional navigation error-state as a JAX pytree.

TPU-native equivalent of the reference's hand-rolled `StatesGroup`
(reference: include/common_lib.h:296-381): attitude R in SO(3), position,
velocity, gyro/accel biases and gravity, plus the 18x18 covariance, with
the on-manifold boxplus / boxminus operators used by the iterated EKF.

State ordering (matches DIM_STATE=18 layout, common_lib.h:330-365):
    [0:3]   delta-rotation (so3, right perturbation: R <- R Exp(d))
    [3:6]   position
    [6:9]   velocity
    [9:12]  gyro bias
    [12:15] accel bias
    [15:18] gravity
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .ops import so3

DIM_STATE = 18
INIT_COV = 0.001
G_M_S2 = 9.81  # gravity constant (common_lib.h:33)


class NavState(NamedTuple):
    """Pytree nav state.

    All members are f64 by default: the iterated-EKF covariance path
    must run in double (f32 roundoff drives the contracted covariance
    indefinite within ~10 frames — variances reach ~1e-8 while entries
    are ~1e-3-scale, below f32 epsilon; the reference runs the whole
    solve in double for the same reason). The 18-dim algebra is tiny, so
    f64 — even software-emulated on TPU — is negligible next to the
    f32 point/patch batches, which cast the pose down at the boundary.
    """

    rot: jnp.ndarray  # (3, 3) world-from-imu rotation at segment end
    pos: jnp.ndarray  # (3,)
    vel: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (3,) gyro bias
    ba: jnp.ndarray  # (3,) accel bias
    grav: jnp.ndarray  # (3,) gravity in world frame
    cov: jnp.ndarray  # (18, 18) covariance


def identity_state(dtype=jnp.float64) -> NavState:
    """Fresh state, matching StatesGroup's constructor
    (common_lib.h:298-306): identity pose, zero vectors, INIT_COV * I."""
    return NavState(
        rot=jnp.eye(3, dtype=dtype),
        pos=jnp.zeros(3, dtype=dtype),
        vel=jnp.zeros(3, dtype=dtype),
        bg=jnp.zeros(3, dtype=dtype),
        ba=jnp.zeros(3, dtype=dtype),
        grav=jnp.zeros(3, dtype=dtype),
        cov=jnp.eye(DIM_STATE, dtype=dtype) * INIT_COV,
    )


def pack24(s: NavState) -> jnp.ndarray:
    """Device-side flatten of the 24 logged state values
    [rot(9), pos(3), vel(3), bg(3), ba(3), grav(3)] so the host reads
    them in ONE transfer (per-leaf reads cost a relay round trip each).
    jit-compiled on first use via the wrapper below."""
    return jnp.concatenate(
        [s.rot.reshape(9), s.pos, s.vel, s.bg, s.ba, s.grav]
    ).astype(jnp.float64)


_pack24_jit = None


def pack24_host(s: NavState):
    """One-transfer host copy of the 24 logged state values."""
    import numpy as np

    global _pack24_jit
    if _pack24_jit is None:
        import jax

        _pack24_jit = jax.jit(pack24)
    return np.asarray(_pack24_jit(s))


def host_identity_state(dtype="float64") -> NavState:
    """`identity_state` twin built from HOST (numpy) arrays.

    For values a jit will close over as constants: lowering a jit that
    embeds a *device* constant forces a device->host readback, and the
    first D2H degrades this container's relay-session dispatch floor
    ~500x (see ops/voxel_map._mix64_np). Host constants embed free."""
    import numpy as np

    return NavState(
        rot=np.eye(3, dtype=dtype),
        pos=np.zeros(3, dtype=dtype),
        vel=np.zeros(3, dtype=dtype),
        bg=np.zeros(3, dtype=dtype),
        ba=np.zeros(3, dtype=dtype),
        grav=np.zeros(3, dtype=dtype),
        cov=np.eye(DIM_STATE, dtype=dtype) * INIT_COV,
    )


def boxplus(s: NavState, delta: jnp.ndarray) -> NavState:
    """s [+] delta  (StatesGroup::operator+=, common_lib.h:343-352).

    Rotation uses the right-multiplicative exponential; the other blocks
    are plain addition. Covariance is carried through unchanged.
    """
    return NavState(
        rot=s.rot @ so3.exp(delta[0:3]),
        pos=s.pos + delta[3:6],
        vel=s.vel + delta[6:9],
        bg=s.bg + delta[9:12],
        ba=s.ba + delta[12:15],
        grav=s.grav + delta[15:18],
        cov=s.cov,
    )


def boxminus(a: NavState, b: NavState) -> jnp.ndarray:
    """a [-] b -> (18,)  (StatesGroup::operator-, common_lib.h:354-365)."""
    return jnp.concatenate(
        [
            so3.log(b.rot.T @ a.rot),
            a.pos - b.pos,
            a.vel - b.vel,
            a.bg - b.bg,
            a.ba - b.ba,
            a.grav - b.grav,
        ]
    )


def reset_pose(s: NavState) -> NavState:
    """StatesGroup::resetpose (common_lib.h:367-372): zero R/p/v, keep
    biases, gravity and covariance. Used during the EKF warm-up window."""
    return s._replace(
        rot=jnp.eye(3, dtype=s.rot.dtype),
        pos=jnp.zeros(3, dtype=s.pos.dtype),
        vel=jnp.zeros(3, dtype=s.vel.dtype),
    )
