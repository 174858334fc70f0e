"""Multi-device SPMD tests on the 8-virtual-device CPU mesh (conftest)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastlivo_tpu import lio
from fastlivo_tpu.parallel import sharded
from fastlivo_tpu.ops import so3, voxel_map as vm
from fastlivo_tpu.state import identity_state

from test_lio import build_map, make_room_points, scan_from_pose


@pytest.fixture(scope="module")
def room():
    world = make_room_points(step=0.15)
    return world, build_map(world, table=1 << 16)


def test_sharded_matches_single_device(room):
    world, m = room
    rot_true = np.asarray(so3.exp(jnp.asarray([0.03, -0.02, 0.1])))
    pos_true = np.array([0.4, -0.3, 1.2])
    rot0 = rot_true @ np.asarray(so3.exp(jnp.asarray([0.01, 0.015, -0.01])))
    pos0 = pos_true + np.array([0.05, -0.04, 0.03])
    scan = scan_from_pose(world, rot_true, pos_true, n=2048)
    s = identity_state()._replace(
        rot=jnp.asarray(rot0), pos=jnp.asarray(pos0)
    )
    args = (
        jnp.asarray(scan), jnp.ones(len(scan), bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
    )
    ref = lio.lio_update(s, m, *args, laser_point_cov=0.001, max_iter=5)

    mesh = sharded.make_mesh(8)
    assert mesh.devices.size == 8
    got = sharded.sharded_lio_update(
        mesh, s, m, *args, laser_point_cov=0.001, max_iter=5
    )
    np.testing.assert_allclose(
        np.asarray(got.state.pos), np.asarray(ref.state.pos), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.state.rot), np.asarray(ref.state.rot), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.state.cov), np.asarray(ref.state.cov), atol=1e-6
    )
    assert abs(int(got.n_active) - int(ref.n_active)) <= 2
    # sharded result converges toward truth (coarse 0.15 m fixture)
    assert np.linalg.norm(np.asarray(got.state.pos) - pos_true) < 2e-2


def test_full_scan_step_under_mesh(room):
    """The dryrun_multichip path: full propagate+undistort+EKF+insert."""
    from fastlivo_tpu import imu as imu_mod

    world, m = room
    mesh = sharded.make_mesh(8)
    s = identity_state()._replace(
        pos=jnp.asarray([0.0, 0.0, 1.2]), grav=jnp.asarray([0.0, 0.0, -9.81])
    )
    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0),
        cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )
    P = 16
    N = 1024
    rng = np.random.default_rng(0)
    scan = scan_from_pose(world, np.eye(3), np.array([0.0, 0.0, 1.2]), n=N)
    st, m2, n_act, _, _ = sharded.sharded_scan_step(
        mesh, s, m,
        jnp.tile(jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (P, 1)),
        jnp.zeros((P, 3), jnp.float32),
        jnp.full(P, 0.005, jnp.float32),
        jnp.asarray((np.arange(P) + 1) * 0.005, np.float32),
        jnp.ones(P, bool),
        jnp.float32(0.0),
        jnp.asarray([0.0, 0.0, 9.81], jnp.float32) + s.grav.astype(jnp.float32),
        jnp.zeros(3, jnp.float32),
        calib,
        jnp.asarray(scan),
        jnp.asarray(rng.uniform(0, 0.08, N).astype(np.float32)),
        jnp.ones(N, bool),
        laser_point_cov=0.001,
        max_iter=3,
    )
    assert int(n_act) > N // 2
    assert np.all(np.isfinite(np.asarray(st.pos)))
    assert int(m2.count) >= int(m.count)
