"""Full LIVO (LIO + VIO) end-to-end pipeline test on synthetic data.

The camera looks horizontally (+x in the body frame) at the textured
room walls; image groups interleave with scan-end groups exactly as in
the reference's sync (laserMapping.cpp:520-690), exercising segmented
IMU propagation, mid-scan VIO updates, and the merged-pose-table
undistortion."""
import numpy as np
import pytest

from fastlivo_tpu.config import CameraConfig, CapacityConfig, Config
from fastlivo_tpu.io.synthetic import SyntheticDataset
from fastlivo_tpu.pipeline import Pipeline

W, H, F = 320, 256, 200.0
# camera: z forward = body +x, x right = body -y, y down = body -z
RCL = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])


def livo_config():
    cfg = Config()
    cfg.img_enable = True
    cfg.lidar_enable = True
    cfg.max_iteration = 6
    cfg.filter_size_surf = 0.3
    cfg.filter_size_map = 0.3
    cfg.grid_size = 32
    cfg.patch_size = 8
    cfg.outlier_threshold = 300.0
    cfg.img_point_cov = 100.0
    cfg.camera = CameraConfig(
        width=W, height=H, fx=F, fy=F, cx=(W - 1) / 2.0, cy=(H - 1) / 2.0,
        d=[0.0, 0.0, 0.0, 0.0],
    )
    cfg.Rcl = RCL.ravel().tolist()
    cfg.Pcl = [0.0, 0.0, 0.0]
    cfg.capacity = CapacityConfig(
        map_table_size=1 << 17,
        max_points=4096,
        max_raw_points=8192,
        max_imu_per_group=64,
        vmap_points=8192,
        vmap_table_size=1 << 15,
        vmap_voxel_cap=8,
        frame_ring=16,
        max_cands=4096,
    )
    return cfg


@pytest.fixture(scope="module")
def livo_run():
    ds = SyntheticDataset(
        duration=6.0, points_per_scan=4096, lidar_noise=0.004, seed=5,
        cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL,
    )
    pipe = Pipeline(livo_config())
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    for t, img in ds.images():
        pipe.push_img(t, img)
    outs = pipe.spin()
    return ds, pipe, outs


def test_livo_runs_and_tracks(livo_run):
    ds, pipe, outs = livo_run
    assert len(outs) >= 40
    assert pipe.vio is not None
    assert int(pipe.vio.vmap.n_pts) > 50  # visual map populated
    assert pipe.vio.last_stats.get("tracked", 0) > 5  # tracking alive


def test_livo_trajectory_ate(livo_run):
    ds, pipe, outs = livo_run
    base = ds.traj.base_pos
    errs = []
    for o in outs:
        if o.t < ds.traj.t_static + 0.5:
            continue
        _, pos_gt = ds.traj.pose(o.t)
        errs.append(np.linalg.norm(o.pos - (pos_gt - base)))
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.06, f"LIVO ATE {ate:.4f} m"


def test_livo_image_groups_interleaved(livo_run):
    ds, pipe, outs = livo_run
    # sync must have produced image groups (VIO frames processed)
    assert pipe.vio.fid > 30


@pytest.mark.slow
def test_livo_async_read_outputs_identical(livo_run):
    """Deferred readback (Pipeline.async_read) with interleaved camera
    frames: lidar FrameOutputs and the VIO state must be bit-identical
    to the synchronous run (the read timing must not touch estimation)."""
    _, ref_pipe, outs_ref = livo_run
    ds = SyntheticDataset(
        duration=6.0, points_per_scan=4096, lidar_noise=0.004, seed=5,
        cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL,
    )
    pipe = Pipeline(livo_config())
    pipe.async_read = True
    assert pipe.vio.async_read  # propagated
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    for t, img in ds.images():
        pipe.push_img(t, img)
    outs = pipe.spin() + pipe.finish()
    assert len(outs) == len(outs_ref)
    for a, b in zip(outs, outs_ref):
        assert a.t == b.t
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.quat, b.quat)
        assert a.n_active == b.n_active
    # VIO surfaces match: tracked stats resolved, map grew identically
    assert int(pipe.vio.vmap.n_pts) == int(ref_pipe.vio.vmap.n_pts)
    assert pipe.vio.last_stats == ref_pipe.vio.last_stats
    np.testing.assert_array_equal(pipe.vio.last_rcw, ref_pipe.vio.last_rcw)


@pytest.mark.slow
def test_live_block_read_matches_sync(livo_run):
    """Pipeline.enable_block_read (serve --block-read): live
    block-packed readback produces the same trajectory as sync mode,
    materialized late. Same executables per frame; the only divergence
    channel is map-maintenance triggers consuming posteriors up to
    ~2*block events old (the documented slider-lag class, mm against a
    hundreds-of-meters margin) — pinned within replay's block
    tolerance on the shared 6 s stream."""
    ds, pipe_sync, outs_sync = livo_run
    pipe = Pipeline(livo_config())
    pipe.enable_block_read(2)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    for t, img in ds.images():
        pipe.push_img(t, img)
    outs = pipe.spin()
    outs += pipe.finish()
    assert len(outs) == len(outs_sync)
    err = np.array([
        np.linalg.norm(np.asarray(a.pos) - np.asarray(b.pos))
        for a, b in zip(outs, outs_sync)
    ])
    assert err.max() < 5e-3, err.max()
    for a, b in zip(outs, outs_sync):
        assert a.t == b.t


def test_block_read_rejects_per_frame_consumers(tmp_path):
    pipe = Pipeline(livo_config())
    pipe.on_frame = lambda o: None
    with pytest.raises(ValueError):
        pipe.enable_block_read(2)


@pytest.mark.slow
def test_long_livo_soak_stays_consistent(livo_run):
    """Long-horizon stability on the full LIVO pipeline: the health
    signals must stay bounded over the whole run — res_rms (posterior
    point-to-plane RMS) must not trend upward (filter divergence shows
    here first) and the pose must stay inside the synthetic room."""
    ds, pipe, outs = livo_run
    assert len(outs) >= 40
    rms = np.asarray([o.res_rms for o in outs if o.res_rms > 0])
    assert len(rms) >= 30
    first, last = rms[: len(rms) // 3], rms[-len(rms) // 3:]
    assert np.median(last) < 3.0 * max(np.median(first), 0.01), (
        np.median(first), np.median(last))
    assert np.max(rms) < 1.0  # meters — sanity ceiling for the scene
    pos = np.asarray([o.pos for o in outs])
    assert np.all(np.abs(pos) < 50.0)  # never leaves the room's world


@pytest.mark.slow
def test_livo_end_to_end_with_distorted_camera():
    """Full LIVO through a radtan camera: the dataset renders with
    nonzero distortion and the pipeline's camera model carries the same
    coefficients. Tracking must stay alive and the trajectory accurate —
    closes the loop above the unit-level distortion differentials
    (test_detect_differential), which pin the projections but not the
    sync/undistort/EKF integration around them."""
    D = np.array([-0.05, 0.03, 0.0003, -0.0002])
    ds = SyntheticDataset(
        duration=4.0, points_per_scan=4096, lidar_noise=0.004, seed=6,
        cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL, cam_d=D,
    )
    cfg = livo_config()
    cfg.camera = CameraConfig(
        width=W, height=H, fx=F, fy=F, cx=(W - 1) / 2.0, cy=(H - 1) / 2.0,
        d=D.tolist(),
    )
    pipe = Pipeline(cfg)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    for t, img in ds.images():
        pipe.push_img(t, img)
    outs = pipe.spin()
    assert len(outs) >= 25
    assert int(pipe.vio.vmap.n_pts) > 50
    assert pipe.vio.last_stats.get("tracked", 0) > 5
    base = ds.traj.base_pos
    errs = [
        np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
        for o in outs if o.t >= ds.traj.t_static + 0.5
    ]
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.08, f"distorted-camera LIVO ATE {ate:.4f} m"


@pytest.mark.slow
def test_camera_dropout_livo_continues_on_lio():
    """A 1 s camera outage mid-run (dropped frames / exposure stall):
    image groups simply stop arriving for that window — the LIO leg
    must carry the trajectory through unharmed and VIO must resume
    cleanly after (the reference behaves the same: no image callback,
    no detect)."""
    ds = SyntheticDataset(
        duration=6.0, points_per_scan=4096, lidar_noise=0.004, seed=7,
        cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL,
    )
    pipe = Pipeline(livo_config())
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    n_dropped = 0
    for t, img in ds.images():
        if 3.0 <= t < 4.0:
            n_dropped += 1
            continue
        pipe.push_img(t, img)
    assert n_dropped >= 8
    outs = pipe.spin() + pipe.finish()
    assert len(outs) >= 40
    assert pipe.vio.last_stats.get("tracked", 0) > 5  # VIO resumed
    base = ds.traj.base_pos
    tail = [
        np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
        for o in outs if o.t >= 3.0
    ]
    ate = np.sqrt(np.mean(np.square(tail)))
    assert ate < 0.06, f"camera-dropout ATE {ate:.4f} m"


def test_mapping_restart_mid_livo_stream():
    """Pipeline._mapping_restart on a FULL LIVO pipeline (the
    watchdog's action path incl. Vio.reset_map): invoked mid-stream it
    must rebuild both maps, keep the frame-id counter monotone, and
    VIO must re-populate and resume tracking on the remaining frames."""
    ds = SyntheticDataset(
        duration=6.0, points_per_scan=4096, lidar_noise=0.004, seed=5,
        cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL,
    )
    pipe = Pipeline(livo_config())
    evts = ([("L", beg, (beg, pts, t_rel))
             for beg, pts, t_rel in ds.lidar_scans_fast()]
            + [("I", t, (t, a, g)) for t, a, g in ds.imu_stream()]
            + [("C", t, (t, img)) for t, img in ds.images()])
    evts.sort(key=lambda e: e[1])
    fired = False
    for kind, t, payload in evts:
        {"L": pipe.push_lidar, "I": pipe.push_imu,
         "C": pipe.push_img}[kind](*payload)
        pipe.spin()
        if not fired and t >= 3.5 and pipe.init_done:
            fid_before = pipe.vio.fid
            assert int(pipe.vio.vmap.n_pts) > 20  # populated pre-reset
            pipe._mapping_restart(1.0)
            assert int(pipe.vio.vmap.n_pts) == 0  # visual map wiped
            assert pipe.vio.fid == fid_before  # fid continuity
            assert not pipe.map_built
            fired = True
    outs = pipe.finish() + pipe.outputs
    assert fired and pipe.auto_resets == 1
    # VIO resumed: map re-populated and tracking alive post-restart
    assert int(pipe.vio.vmap.n_pts) > 20
    assert pipe.vio.last_stats.get("tracked", 0) > 5
    pos = np.asarray([o.pos for o in outs])
    assert np.all(np.isfinite(pos)) and np.all(np.abs(pos) < 50.0)
