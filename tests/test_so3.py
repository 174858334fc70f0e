import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastlivo_tpu.ops import so3

rng = np.random.default_rng(0)


def _rand_axis_angle(n, scale=1.0):
    return rng.normal(size=(n, 3)).astype(np.float32) * scale


def test_exp_identity():
    np.testing.assert_allclose(so3.exp(jnp.zeros(3)), np.eye(3), atol=1e-7)


def test_exp_matches_scipy():
    from scipy.spatial.transform import Rotation

    phis = _rand_axis_angle(32)
    R = np.asarray(so3.exp(jnp.asarray(phis)))
    R_ref = Rotation.from_rotvec(phis).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_exp_log_roundtrip():
    phis = _rand_axis_angle(64, scale=0.8)
    back = np.asarray(so3.log(so3.exp(jnp.asarray(phis))))
    np.testing.assert_allclose(back, phis, atol=2e-5)


def test_log_small_angle():
    phis = _rand_axis_angle(16, scale=1e-5)
    back = np.asarray(so3.log(so3.exp(jnp.asarray(phis))))
    np.testing.assert_allclose(back, phis, atol=1e-7)


def test_exp_is_rotation():
    phis = _rand_axis_angle(16, scale=3.0)
    R = np.asarray(so3.exp(jnp.asarray(phis)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_skew_cross_product():
    a = rng.normal(size=3).astype(np.float32)
    b = rng.normal(size=3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(so3.skew(jnp.asarray(a)) @ b), np.cross(a, b), atol=1e-6
    )


def test_exp_grad_finite_at_zero():
    g = jax.grad(lambda p: jnp.sum(so3.exp(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_rot_to_euler_roundtrip():
    from scipy.spatial.transform import Rotation

    phis = _rand_axis_angle(16, scale=0.7)
    R = Rotation.from_rotvec(phis).as_matrix()
    eul = np.asarray(so3.rot_to_euler(jnp.asarray(R.astype(np.float32))))
    R_back = Rotation.from_euler("xyz", eul).as_matrix()
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_quat_from_rot():
    from scipy.spatial.transform import Rotation

    phis = _rand_axis_angle(64, scale=3.0)
    R = Rotation.from_rotvec(phis).as_matrix().astype(np.float32)
    q = np.asarray(so3.quat_from_rot(jnp.asarray(R)))
    q_ref = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q_ref, atol=1e-5)


def test_log_near_pi():
    """Matrix log near the theta=pi branch cut stays finite and
    round-trips (the reference's Log, so3_math.h:75-81, is also used at
    large attitude errors during aggressive-motion recovery)."""
    for ax in ([1.0, 0, 0], [0, 1.0, 0], [0.6, -0.8, 0.0]):
        for th in (np.pi - 1e-4, np.pi - 1e-2, 3.0):
            w = np.asarray(ax) / np.linalg.norm(ax) * th
            R = so3.exp(jnp.asarray(w))
            w2 = np.asarray(so3.log(R))
            assert np.all(np.isfinite(w2))
            R2 = so3.exp(jnp.asarray(w2))
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R),
                                       atol=5e-4)


def test_numpy_logging_twins_match_jnp():
    """logging_util re-implements quaternion/euler conversions in scalar
    numpy for the Log/ output surface; they must agree with the tested
    jnp versions (review r5: only the jnp twins were exercised)."""
    import numpy as np

    from fastlivo_tpu.logging_util import _euler_deg, rot_to_quat_xyzw

    rng = np.random.default_rng(0)
    for _ in range(50):
        w = rng.normal(size=3)
        R = np.asarray(so3.exp(jnp.asarray(w)))
        q_np = np.asarray(rot_to_quat_xyzw(R))  # [x,y,z,w]
        q_j = np.asarray(so3.quat_from_rot(jnp.asarray(R)))  # [x,y,z,w]
        # quaternions are sign-ambiguous
        if np.dot(q_np, q_j) < 0:
            q_np = -q_np
        np.testing.assert_allclose(q_np, q_j, atol=1e-6)
        # _euler_deg scales by the reference's literal 57.3 (NOT 180/pi)
        e_np = np.asarray(_euler_deg(R))
        e_j = 57.3 * np.asarray(so3.rot_to_euler(jnp.asarray(R)))
        np.testing.assert_allclose(e_np, e_j, atol=1e-5)
