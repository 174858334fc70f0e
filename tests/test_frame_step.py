"""Fused lidar_frame_step == the staged undistort/filter/EKF/insert path."""
import numpy as np
import pytest
import jax.numpy as jnp

from fastlivo_tpu import imu as imu_mod
from fastlivo_tpu import lio as lio_mod
from fastlivo_tpu.frame_step import lidar_frame_step
from fastlivo_tpu.ops import voxel_filter as vf
from fastlivo_tpu.ops import voxel_map as vm
from fastlivo_tpu.state import identity_state

from test_lio import build_map, make_room_points, scan_from_pose


@pytest.mark.slow
def test_fused_equals_staged():
    world = make_room_points(step=0.15)
    m = build_map(world, voxel=0.3, table=1 << 16)
    rng = np.random.default_rng(4)
    N = 4096
    pos0 = np.array([0.3, -0.2, 1.1])
    scan = scan_from_pose(world, np.eye(3), pos0, n=N, rng=rng, noise=0.003)
    t_rel = jnp.asarray(np.sort(rng.uniform(0, 0.1, N)).astype(np.float32))
    rmask = jnp.ones(N, bool)
    s = identity_state()._replace(
        pos=jnp.asarray(pos0 + [0.03, -0.02, 0.01]),
        grav=jnp.asarray([0.0, 0.0, -9.81]),
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
    pose = imu_mod.PoseTable(
        offs=jnp.asarray(np.linspace(0, 0.1, P).astype(np.float32)),
        rot=jnp.tile(jnp.asarray(s.rot, jnp.float32)[None], (P, 1, 1)),
        pos=jnp.tile(jnp.asarray(s.pos, jnp.float32)[None], (P, 1)),
        vel=jnp.tile(jnp.asarray([0.4, -0.2, 0.1], jnp.float32), (P, 1)),
        acc=jnp.zeros((P, 3), jnp.float32),
        gyr=jnp.tile(jnp.asarray([0.05, 0.02, -0.1], jnp.float32), (P, 1)),
    )
    kwargs = dict(laser_point_cov=0.001, max_iter=5, knn_radius=1, max_probe=8)

    (st_f, m_f, down_f, dmask_f, nact_f, it_f, dense_f,
     active_f, stats_f) = lidar_frame_step(
        s, m, pose, calib, jnp.asarray(scan), t_rel, rmask,
        jnp.float32(0.3), max_points=4096, dense_out=True, **kwargs,
    )

    # staged
    und = imu_mod.undistort(s, pose, jnp.asarray(scan), t_rel, rmask, calib)
    down, dmask = vf.voxel_downsample_device(und, rmask, jnp.float32(0.3), 4096)
    res = lio_mod.lio_update(
        s, m, down, dmask, calib.lid_rot, calib.lid_off, **kwargs
    )
    np.testing.assert_allclose(np.asarray(st_f.pos), np.asarray(res.state.pos),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_f.rot), np.asarray(res.state.rot),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_f.cov), np.asarray(res.state.cov),
                               atol=1e-12)
    assert int(nact_f) == int(res.n_active)
    np.testing.assert_array_equal(np.asarray(active_f), np.asarray(res.active))
    assert int(it_f) == int(res.iters)
    # the packed stats row mirrors the scalar outputs + posterior pack24
    stats = np.asarray(stats_f)
    assert stats.shape == (29,)
    assert int(stats[0]) == int(jnp.sum(dmask))
    assert int(stats[1]) == int(res.n_active)
    assert int(stats[2]) == int(res.iters)
    np.testing.assert_allclose(stats[3:12].reshape(3, 3),
                               np.asarray(res.state.rot), atol=1e-12)
    np.testing.assert_allclose(stats[12:15], np.asarray(res.state.pos),
                               atol=1e-12)
    # residual RMS over active rows (the online health signal)
    act = np.asarray(res.active)
    rr = np.asarray(res.res, np.float64)
    want_rms = np.sqrt((rr[act] ** 2).sum() / max(act.sum(), 1))
    np.testing.assert_allclose(stats[27], want_rms, rtol=1e-6)
    # the fused map insert used the posterior pose
    rot32 = res.state.rot.astype(jnp.float32)
    pos32 = res.state.pos.astype(jnp.float32)
    world_pts = (down @ calib.lid_rot.T + calib.lid_off) @ rot32.T + pos32
    m2 = vm.insert(m, world_pts, dmask)
    assert int(m_f.count) == int(m2.count)
    # dense output is at the posterior too
    dw = np.asarray(dense_f)[np.asarray(rmask)]
    und_np = np.asarray(und)
    exp = und_np @ np.asarray(rot32).T + np.asarray(pos32)
    np.testing.assert_allclose(dw, exp[np.asarray(rmask)], atol=1e-5)


def test_stage_scan_matches_padded_arrays():
    """stage_scan's one packed upload == the zero-padded 3-array form
    the fused step consumed before round 4 (pipeline._stage_scan)."""
    from fastlivo_tpu.frame_step import stage_scan

    rng = np.random.default_rng(7)
    N, B, R = 900, 1024, 1024
    pts = rng.normal(size=(N, 3)).astype(np.float32)
    trel = rng.uniform(0, 0.1, N).astype(np.float32)
    w = np.zeros((B + 1, 4), np.float32)
    w[:N, 0:3] = pts
    w[:N, 3] = trel
    w[B, 0] = N
    p_j, t_j, m_j = stage_scan(jnp.asarray(w), R=R)
    buf = np.zeros((R, 3), np.float32); buf[:N] = pts
    tr = np.zeros(R, np.float32); tr[:N] = trel
    mask = np.zeros(R, bool); mask[:N] = True
    np.testing.assert_array_equal(np.asarray(p_j), buf)
    np.testing.assert_array_equal(np.asarray(t_j), tr)
    np.testing.assert_array_equal(np.asarray(m_j), mask)

    # bucket smaller than capacity: device-side pad to R
    p_j, t_j, m_j = stage_scan(jnp.asarray(w), R=2048)
    assert p_j.shape == (2048, 3)
    np.testing.assert_array_equal(np.asarray(p_j)[:N], pts)
    assert not np.asarray(m_j)[N:].any()


def test_stats_carries_map_occupancy():
    """stats[28] = the posterior map's occupancy scalar (n_alloc/count),
    so load-factor checks never need a blocking device read."""
    world = make_room_points(step=0.15)
    m = build_map(world, voxel=0.3, table=1 << 16)
    rng = np.random.default_rng(4)
    Npts = 1500
    pos0 = np.array([0.3, -0.2, 1.1])
    pts = scan_from_pose(world, np.eye(3), pos0, n=Npts, rng=rng,
                         noise=0.003)
    R = 2048
    buf = np.zeros((R, 3), np.float32); buf[:Npts] = pts
    tr = np.zeros(R, np.float32)
    tr[:Npts] = np.sort(rng.uniform(0, 0.1, Npts)).astype(np.float32)
    pm = np.zeros(R, bool); pm[:Npts] = True
    s = identity_state()._replace(
        pos=jnp.asarray(pos0), grav=jnp.asarray([0.0, 0.0, -9.81]))
    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0),
        cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )
    P = 4
    pose = imu_mod.PoseTable(
        offs=jnp.asarray(np.linspace(0, 0.1, P).astype(np.float32)),
        rot=jnp.tile(jnp.asarray(s.rot, jnp.float32)[None], (P, 1, 1)),
        pos=jnp.tile(jnp.asarray(s.pos, jnp.float32)[None], (P, 1)),
        vel=jnp.zeros((P, 3), jnp.float32),
        acc=jnp.zeros((P, 3), jnp.float32),
        gyr=jnp.zeros((P, 3), jnp.float32),
    )
    out = lidar_frame_step(
        s, m, pose, calib, jnp.asarray(buf), jnp.asarray(tr),
        jnp.asarray(pm), jnp.float32(0.3), laser_point_cov=0.001,
        max_points=2048, max_iter=2, knn_radius=1, max_probe=12,
    )
    m2, stats = out[1], np.asarray(out[8])
    assert stats.shape == (29,)
    occ = m2.n_alloc if hasattr(m2, "n_alloc") else m2.count
    assert stats[28] == float(occ)
    assert stats[28] > 0


def test_donated_step_matches_copy_based():
    """capacity.donate_maps: the donating lidar step variant must be
    bit-identical to the copy-based default (only the buffer aliasing
    differs)."""
    import numpy as np
    from fastlivo_tpu import imu as imu_mod
    from fastlivo_tpu.frame_step import (lidar_frame_step,
                                         lidar_frame_step_donated)
    from fastlivo_tpu.ops import tiled_map as tmod
    from fastlivo_tpu.state import identity_state

    rng = np.random.default_rng(0)
    world = np.stack([rng.uniform(-10, 10, 6000),
                      rng.uniform(-10, 10, 6000),
                      rng.uniform(0, 0.1, 6000)], 1).astype(np.float32)
    scan = world[rng.choice(6000, 2048, replace=False)] + rng.normal(
        0, 0.004, (2048, 3)).astype(np.float32)
    s = identity_state()._replace(pos=jnp.asarray([0.01, -0.01, 0.0]))
    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0), cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )
    P = 8
    pose = imu_mod.PoseTable(
        offs=jnp.asarray(np.linspace(0, 0.1, P, dtype=np.float32)),
        rot=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (P, 1, 1)),
        pos=jnp.zeros((P, 3), jnp.float32),
        vel=jnp.zeros((P, 3), jnp.float32),
        acc=jnp.zeros((P, 3), jnp.float32),
        gyr=jnp.zeros((P, 3), jnp.float32),
    )
    args = (jnp.asarray(scan), jnp.zeros(2048, jnp.float32),
            jnp.ones(2048, bool), jnp.float32(0.5))
    kw = dict(laser_point_cov=0.001, max_points=2048, max_iter=3,
              knn_radius=1, max_probe=8, dense_out=False)
    m1 = tmod.build_host(world, (32, 32, 8), 512, 0.5)
    r_copy = lidar_frame_step(s, m1, pose, calib, *args, **kw)
    m2 = tmod.build_host(world, (32, 32, 8), 512, 0.5)
    r_don = lidar_frame_step_donated(s, m2, pose, calib, *args, **kw)
    np.testing.assert_array_equal(np.asarray(r_copy[0].pos),
                                  np.asarray(r_don[0].pos))
    np.testing.assert_array_equal(np.asarray(r_copy[8]),
                                  np.asarray(r_don[8]))
    np.testing.assert_array_equal(np.asarray(r_copy[1].pts),
                                  np.asarray(r_don[1].pts))
