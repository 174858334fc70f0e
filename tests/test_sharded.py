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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_vio_update_matches_single_device():
    """Photometric update: 8-way row partition == single device."""
    import sys
    sys.path.insert(0, "tests")
    from test_vio import make_cfg, ds as _dsfix  # fixture funcs
    from fastlivo_tpu.io.synthetic import SyntheticDataset
    from fastlivo_tpu import vio as vio_mod
    from fastlivo_tpu.vio import photometric_update, select_tracked, Vio
    from fastlivo_tpu.state import identity_state
    from fastlivo_tpu.ops import so3

    W, H, F = 320, 256, 200.0
    dsx = SyntheticDataset(cam_size=(W, H), cam_f=F, cam_hz=10.0)
    cfg = make_cfg()
    v = Vio(cfg)
    rng = np.random.default_rng(0)
    v.set_last_cloud(dsx.room.sample_surface(6000, rng).astype(np.float32))
    rot, pos = dsx.traj.pose(2.0)
    s0 = identity_state()._replace(rot=jnp.asarray(rot), pos=jnp.asarray(pos))
    v.update(s0, s0, dsx.render_image(2.0))
    # second frame with perturbed prior
    rot1, pos1 = dsx.traj.pose(2.05)
    s1 = identity_state()._replace(
        rot=jnp.asarray(rot1) @ so3.exp(jnp.asarray([0.004, -0.003, 0.005])),
        pos=jnp.asarray(pos1) + jnp.asarray([0.02, -0.01, 0.015]),
    )
    img = jnp.asarray(v._to_gray(dsx.render_image(2.05)))
    fid = jnp.int32(v.fid)
    import fastlivo_tpu.visual_map as vmap_mod
    v.vmap = vmap_mod.push_image(v.vmap, img, fid)
    rcw = np.asarray(v.Rci) @ np.asarray(s1.rot, np.float32).T
    pcw = -rcw @ np.asarray(s1.pos, np.float32) + np.asarray(v.Pci)
    from fastlivo_tpu.ops.voxel_filter import voxel_downsample
    pg, pgm = voxel_downsample(v.last_cloud, 0.2, max_out=v.max_pg)
    vox_np = np.unique(np.floor(pg[pgm] / 0.5).astype(np.int32), axis=0)
    max_vox = 2048  # unique keys still valid input post-dedup-removal
    vox = np.zeros((max_vox, 3), np.int32); vox[: len(vox_np)] = vox_np[:max_vox]
    vmask = np.zeros(max_vox, bool); vmask[: len(vox_np)] = True
    tr = select_tracked(
        v.vmap, v.cam, jnp.asarray(rcw), jnp.asarray(pcw), img,
        jnp.asarray(pg), jnp.asarray(pgm), jnp.asarray(vox), jnp.asarray(vmask),
        outlier_threshold=cfg.outlier_threshold, ncc_thre=cfg.ncc_thre,
        grid_size=v.grid_size, patch_size=v.patch_size, gw=v.gw, gh=v.gh,
    )
    assert int(jnp.sum(tr.valid)) > 8

    ref_state, ref_G, _, ref_err, _ = photometric_update(
        s1, s1, v.cam, img, tr.pos, tr.patch, tr.search_level, tr.valid,
        v.Rci, v.Pci, v.Jdphi_dR, v.Jdp_dR,
        img_point_cov=cfg.img_point_cov, patch_size=v.patch_size,
        level=0, max_iter=4,
    )
    mesh = sharded.make_mesh(8)
    got_state, got_G, _, got_err, _ = sharded.sharded_photometric_update(
        mesh, s1, s1, v.cam, img, tr.pos, tr.patch, tr.search_level, tr.valid,
        v.Rci, v.Pci, v.Jdphi_dR, v.Jdp_dR,
        img_point_cov=cfg.img_point_cov, patch_size=v.patch_size,
        level=0, max_iter=4,
    )
    # f32 patch partial sums reduce in different orders across shards
    np.testing.assert_allclose(np.asarray(got_state.pos),
                               np.asarray(ref_state.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_state.rot),
                               np.asarray(ref_state.rot), atol=1e-5)
    np.testing.assert_allclose(float(got_err), float(ref_err), rtol=1e-3)
