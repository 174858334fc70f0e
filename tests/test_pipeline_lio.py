"""End-to-end LIO-only pipeline test on a synthetic dataset.

The analogue of the reference's rosbag-replay system test (SURVEY.md §4):
a physically consistent synthetic world/trajectory/sensor suite with
exact ground truth; the pipeline must track the trajectory through IMU
init, map bootstrap, motion distortion, and the iterated EKF."""
import numpy as np
import pytest

from fastlivo_tpu.config import CapacityConfig, Config
from fastlivo_tpu.io.synthetic import SyntheticDataset
from fastlivo_tpu.pipeline import Pipeline


def small_config(img_enable=False):
    cfg = Config()
    cfg.img_enable = img_enable
    cfg.lidar_enable = True
    cfg.max_iteration = 6
    cfg.filter_size_surf = 0.3
    cfg.filter_size_map = 0.3
    cfg.laser_point_cov = 0.001
    cfg.capacity = CapacityConfig(
        map_table_size=1 << 17,
        max_points=4096,
        max_raw_points=8192,
        max_imu_per_group=64,
    )
    return cfg


@pytest.fixture(scope="module")
def lio_run():
    ds = SyntheticDataset(
        duration=6.0, points_per_scan=4096, lidar_noise=0.004, seed=3
    )
    cfg = small_config()
    pipe = Pipeline(cfg)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    outs = pipe.spin()
    return ds, pipe, outs


def test_pipeline_produces_frames(lio_run):
    ds, pipe, outs = lio_run
    # 60 scans, minus imu-init scans (~10) minus the map-bootstrap scan
    assert len(outs) >= 40


def test_trajectory_ate(lio_run):
    ds, pipe, outs = lio_run
    base = ds.traj.base_pos
    errs, rot_errs = [], []
    for o in outs:
        if o.t < ds.traj.t_static + 0.5:
            continue
        rot_gt, pos_gt = ds.traj.pose(o.t)
        errs.append(np.linalg.norm(o.pos - (pos_gt - base)))
        # quat [w,x,y,z] -> R
        w, x, y, z = o.quat
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        cosang = (np.trace(rot_gt.T @ R) - 1) / 2
        rot_errs.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
    ate = np.sqrt(np.mean(np.square(errs)))
    rot_rmse = np.sqrt(np.mean(np.square(rot_errs)))
    assert ate < 0.05, f"ATE {ate:.4f} m (errors {np.round(errs[:10], 3)}...)"
    assert rot_rmse < 1.0, f"rot RMSE {rot_rmse:.3f} deg"


def test_frames_track_motion(lio_run):
    ds, pipe, outs = lio_run
    # trajectory actually moves (not trivially static)
    moving = [o for o in outs if o.t > ds.traj.t_static + 1.5]
    p = np.array([o.pos for o in moving])
    assert np.ptp(p, axis=0).max() > 0.5


def test_active_points(lio_run):
    ds, pipe, outs = lio_run
    late = [o for o in outs if o.t > ds.traj.t_static + 0.5]
    frac = np.mean([o.n_active / max(o.n_points, 1) for o in late])
    assert frac > 0.7, f"only {frac:.2%} of points matched"


def test_pipeline_with_dense_backend():
    """End-to-end LIO with the rolling-grid map backend."""
    ds = SyntheticDataset(duration=4.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=13)
    cfg = small_config()
    cfg.capacity.map_backend = "dense"
    cfg.capacity.dense_dims = (128, 128, 32)
    pipe = Pipeline(cfg)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    outs = pipe.spin()
    base = ds.traj.base_pos
    errs = [np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
            for o in outs if o.t > 2.5]
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.05, f"dense-backend ATE {ate:.4f}"


@pytest.mark.slow
def test_async_read_outputs_identical(lio_run):
    """Deferred-readback mode (pipe.async_read, the serving deployment
    path): identical outputs to the synchronous pipeline — same frame
    count, bit-identical poses/counters — just materialized one frame
    late (finish() flushes the last one)."""
    _, _, outs_ref = lio_run
    # same seed => same data (the dataset RNG is stateful; re-iterating
    # the fixture's instance would draw fresh noise)
    ds = SyntheticDataset(
        duration=6.0, points_per_scan=4096, lidar_noise=0.004, seed=3
    )
    pipe = Pipeline(small_config())
    pipe.async_read = True
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    outs = pipe.spin() + pipe.finish()
    assert len(outs) == len(outs_ref)
    for a, b in zip(outs, outs_ref):
        assert a.t == b.t
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.quat, b.quat)
        assert (a.n_active, a.iters, a.n_points) == (
            b.n_active, b.iters, b.n_points)
        assert a.res_rms == b.res_rms
    np.testing.assert_array_equal(
        np.stack(pipe.trajectory), np.stack([
            np.array([o.t, *o.pos, o.quat[1], o.quat[2], o.quat[3],
                      o.quat[0]]) for o in outs_ref]))


@pytest.mark.slow
def test_async_read_interleaves_one_pending(lio_run):
    """At most one frame is ever pending, and spin() mid-stream returns
    the deferred frames as they resolve (ordering preserved)."""
    _, _, outs_ref = lio_run
    ds = SyntheticDataset(
        duration=6.0, points_per_scan=4096, lidar_noise=0.004, seed=3
    )
    pipe = Pipeline(small_config())
    pipe.async_read = True
    lidar = list(ds.lidar_scans_fast())
    imu = list(ds.imu_stream())
    li = ii = 0
    got = []
    # feed incrementally, one scan at a time (streaming arrival order)
    for beg, pts, t_rel in lidar:
        while ii < len(imu) and imu[ii][0] < beg + 0.15:
            pipe.push_imu(*imu[ii]); ii += 1
        pipe.push_lidar(beg, pts, t_rel)
        got += pipe.spin()
        assert len(pipe._pending) <= pipe.async_depth
    got += pipe.finish()
    assert len(got) == len(outs_ref)
    assert [o.t for o in got] == [o.t for o in outs_ref]


def test_profile_every_works_under_async_read():
    """--profile-every must populate the staged breakdown in the
    deferred-readback default too (advisor r3: the trigger used to live
    only on the sync-read path, making the flag a silent no-op with
    pipe.async_read=True)."""
    ds = SyntheticDataset(
        duration=2.5, points_per_scan=4096, lidar_noise=0.004, seed=3
    )
    pipe = Pipeline(small_config())
    pipe.async_read = True
    pipe.profile_every = 2
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    outs = pipe.spin() + pipe.finish()
    assert len(outs) > 4
    prof = pipe.last_stage_profile
    assert prof is not None
    assert set(prof) == {"undistort", "downsample", "ekf", "map"}
    assert all(v > 0.0 for v in prof.values())


@pytest.mark.slow
def test_varying_scan_sizes_grow_only_bucket():
    """Real sensors jitter around their nominal scan size; the fused
    step's pow2 shape bucket must grow monotonically (no flip-flopping
    retraces) and the pipeline must track through mixed-size scans."""
    ds = SyntheticDataset(
        duration=6.0, points_per_scan=4096, lidar_noise=0.004, seed=3
    )
    cfg = small_config()
    pipe = Pipeline(cfg)
    rng = np.random.default_rng(5)
    buckets = []
    for beg, pts, t_rel in ds.lidar_scans_fast():
        # truncate each scan to a random size straddling a pow2 boundary
        n = int(rng.integers(1900, 2600))
        pipe.push_lidar(beg, pts[:n], t_rel[:n])
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    outs = pipe.spin() + pipe.finish()
    assert len(outs) >= 40
    # grow-only bucket: settled at the largest pow2 seen, never smaller
    assert pipe._scan_bucket == 4096  # pow2 >= 2600, min 1024 -> 4096
    # trajectory still tracks (loose gate: mixed sizes, short run)
    errs = []
    for o in outs:
        if o.t < 2.5:
            continue
        _, gt_pos = ds.traj.pose(o.t)
        errs.append(np.linalg.norm(o.pos - (gt_pos - ds.traj.base_pos)))
    assert np.sqrt(np.mean(np.square(errs))) < 0.05


def test_imu_gap_mid_run_survives():
    """IMU dropouts (real rigs drop packets). Two scenarios pin the
    honest contract — the same one the reference offers (it has no
    relocalization; IMU_Processing extrapolates the head pose):

    1. A 0.4 s gap while STATIC: propagation extrapolation is exact,
       so the filter fully recovers to mm accuracy.
    2. A 0.4 s gap under MOTION: the constant-rate extrapolation drifts
       past the plane-match basin and the map takes wrong-pose
       insertions — the run must stay finite and bounded (no crash, no
       NaN, no runaway), but re-convergence is NOT promised.
    """
    from fastlivo_tpu.io.synthetic import SyntheticDataset

    # --- static-phase gap: full recovery ------------------------------
    ds = SyntheticDataset(duration=5.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=9)
    pipe = Pipeline(small_config())
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    n_dropped = 0
    for t, acc, gyr in ds.imu_stream():
        if 1.2 <= t < 1.6:  # inside the static window (t_static = 2.0)
            n_dropped += 1
            continue
        pipe.push_imu(t, acc, gyr)
    assert n_dropped >= 50
    outs = pipe.spin() + pipe.finish()
    assert len(outs) >= 35
    base = ds.traj.base_pos
    tail = [
        np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
        for o in outs if o.t >= 3.0
    ]
    assert np.sqrt(np.mean(np.square(tail))) < 0.02, (
        "static-phase IMU gap must fully recover")

    # --- motion-phase gap: bounded survival ---------------------------
    ds2 = SyntheticDataset(duration=5.0, points_per_scan=4096,
                           lidar_noise=0.004, seed=9)
    pipe2 = Pipeline(small_config())
    for beg, pts, t_rel in ds2.lidar_scans_fast():
        pipe2.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds2.imu_stream():
        if 2.5 <= t < 2.9:
            continue
        pipe2.push_imu(t, acc, gyr)
    outs2 = pipe2.spin() + pipe2.finish()
    assert len(outs2) >= 35
    pos = np.asarray([o.pos for o in outs2])
    assert np.all(np.isfinite(pos))
    assert np.all(np.abs(pos) < 50.0)  # bounded, inside the room world
    rms = np.asarray([o.res_rms for o in outs2])
    assert np.all(np.isfinite(rms))


def test_lidar_gap_mid_run_recovers():
    """A missing scan (sensor stall / dropped UDP burst): the sync layer
    just sees a longer inter-scan interval; the next group's IMU
    segment spans the gap and propagation bridges it. Static-phase gap
    -> full recovery (same contract as the IMU-gap test)."""
    from fastlivo_tpu.io.synthetic import SyntheticDataset

    ds = SyntheticDataset(duration=5.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=11)
    pipe = Pipeline(small_config())
    n_dropped = 0
    for beg, pts, t_rel in ds.lidar_scans_fast():
        if 1.0 <= beg < 1.5:
            n_dropped += 1
            continue
        pipe.push_lidar(beg, pts, t_rel)
    assert n_dropped >= 3
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    outs = pipe.spin() + pipe.finish()
    assert len(outs) >= 30
    base = ds.traj.base_pos
    tail = [
        np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
        for o in outs if o.t >= 3.0
    ]
    assert np.sqrt(np.mean(np.square(tail))) < 0.02, (
        "lidar gap during static phase must fully recover")


def test_nonfinite_and_far_outlier_returns_survive():
    """NaN padding (PointCloud2 no-return convention), inf returns
    (fog/sun artifacts — inf passes every range gate) and km-scale
    outliers injected into scans: the voxel filters drop non-finite
    rows (pcl::VoxelGrid's is-finite skip) and the match gates reject
    the outliers; the trajectory must stay finite and accurate."""
    from fastlivo_tpu.io.synthetic import SyntheticDataset

    ds = SyntheticDataset(duration=4.0, points_per_scan=2048,
                          lidar_noise=0.004, seed=5)
    pipe = Pipeline(small_config())
    rng = np.random.default_rng(0)
    for i, (beg, pts, t_rel) in enumerate(ds.lidar_scans_fast()):
        pts = np.array(pts)
        if i % 3 == 1:
            k = rng.integers(0, len(pts), 6)
            pts[k[0], :3] = [9.7e4, -8.1e4, 5.5e4]
            pts[k[1], :3] = [1.3e5, 2.2e5, -9e4]
            pts[k[2], 0] = np.nan
            pts[k[3], 1] = np.inf
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    outs = pipe.spin() + pipe.finish()
    assert len(outs) >= 25
    pos = np.asarray([o.pos for o in outs])
    assert np.all(np.isfinite(pos))
    base = ds.traj.base_pos
    tail = [
        np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
        for o in outs if o.t >= 3.0
    ]
    assert np.sqrt(np.mean(np.square(tail))) < 0.02


def test_divergence_watchdog_restarts_mapping():
    """capacity.auto_reset_rms: the motion-phase IMU gap scenario
    diverges permanently with the watchdog OFF (map poisoned, res_rms
    stays high — see test_imu_gap_mid_run_survives). With the watchdog
    ON the pipeline must detect the sustained res_rms rise, restart
    mapping at the current pose, and res_rms must return to the noise
    floor (drift frozen instead of compounding)."""
    import warnings
    from fastlivo_tpu.io.synthetic import SyntheticDataset

    ds = SyntheticDataset(duration=6.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=9)
    cfg = small_config()
    cfg.capacity.auto_reset_rms = 0.08
    cfg.capacity.auto_reset_frames = 5
    pipe = Pipeline(cfg)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        if 2.5 <= t < 2.9:
            continue
        pipe.push_imu(t, acc, gyr)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        outs = pipe.spin() + pipe.finish()
    assert pipe.auto_resets >= 1
    assert any("divergence watchdog" in str(x.message) for x in w)
    assert len(outs) >= 40
    pos = np.asarray([o.pos for o in outs])
    assert np.all(np.isfinite(pos)) and np.all(np.abs(pos) < 50.0)
    # post-restart health: res_rms back at the noise floor
    rms_tail = np.asarray([o.res_rms for o in outs[-12:] if o.res_rms > 0])
    assert len(rms_tail) >= 8
    assert np.median(rms_tail) < 0.08, rms_tail
    # and the drift FROZE: position change over the last second tracks
    # ground truth motion to cm-level again
    base = ds.traj.base_pos
    d_est = outs[-1].pos - outs[-11].pos
    d_gt = (ds.traj.pose(outs[-1].t)[1] - ds.traj.pose(outs[-11].t)[1])
    assert np.linalg.norm(d_est - d_gt) < 0.05, (d_est, d_gt)
