"""Synchronizer semantics vs sync_packages (laserMapping.cpp:520-690)."""
import numpy as np

from fastlivo_tpu.sync import Synchronizer


def mk_scan(beg, dur=0.1, n=50):
    t_rel = np.linspace(0, dur - 1e-3, n)
    pts = np.random.default_rng(0).normal(size=(n, 3))
    return beg, pts, t_rel


def push_imu_range(s, t0, t1, hz=200):
    t = t0
    while t <= t1:
        s.push_imu(t, [0, 0, 9.81], [0, 0, 0])
        t += 1.0 / hz


def test_lidar_only_grouping():
    s = Synchronizer(img_enable=False)
    s.push_lidar(*mk_scan(10.0))
    assert s.next_group() is None  # no IMU coverage yet
    push_imu_range(s, 9.95, 10.05)
    assert s.next_group() is None  # last imu < end+0.02
    push_imu_range(s, 10.06, 10.13)
    g = s.next_group()
    assert g is not None and g.is_lidar_end
    # all IMU <= scan end consumed into the group
    assert g.imu_t[-1] <= 10.0991 + 1e-9
    assert g.scan.beg_time == 10.0


def test_image_groups_interleave():
    s = Synchronizer(img_enable=True)
    s.push_lidar(*mk_scan(10.0))
    s.push_img(10.03, np.zeros((4, 4)))
    s.push_img(10.07, np.zeros((4, 4)))
    push_imu_range(s, 9.99, 10.15)
    gs = s.drain()
    kinds = [(g.is_lidar_end, round(g.img_offset_time, 3) if g.img is not None else None)
             for g in gs]
    assert kinds[0] == (False, 0.03)
    assert kinds[1] == (False, 0.07)
    assert kinds[2][0] is True
    # IMU partitioned by group boundaries
    assert gs[0].imu_t[-1] <= 10.03
    assert gs[1].imu_t[-1] <= 10.07
    assert all(gs[1].imu_t > 10.03)


def test_image_after_scan_end_waits():
    s = Synchronizer(img_enable=True)
    s.push_lidar(*mk_scan(10.0))
    s.push_img(10.5, np.zeros((4, 4)))  # belongs to a later scan
    push_imu_range(s, 9.99, 10.2)
    gs = s.drain()
    assert len(gs) == 1 and gs[0].is_lidar_end  # scan closes, image waits


def test_single_point_scan_dropped():
    s = Synchronizer(img_enable=True)
    s.push_lidar(10.0, np.zeros((1, 3)), np.zeros(1))
    s.push_img(10.01, np.zeros((4, 4)))
    push_imu_range(s, 9.99, 10.2)
    assert s.next_group() is None  # dropped with its paired image
    assert len(s.img_buf) == 0


def test_timestamp_regression_flags_reset():
    s = Synchronizer(img_enable=False)
    s.push_imu(10.0, [0, 0, 9.81], [0, 0, 0])
    s.push_imu(9.0, [0, 0, 9.81], [0, 0, 0])  # loop back
    assert s.reset_flagged


def test_plot_traces_smoke(tmp_path):
    import matplotlib  # noqa: F401  (skip silently if absent)

    from fastlivo_tpu.logging_util import TraceLogger, plot_traces
    from fastlivo_tpu.state import identity_state

    lg = TraceLogger(tmp_path)
    st = identity_state()
    for t in np.linspace(0, 1, 5):
        lg.log_pre(t, st)
        lg.log_post(t, st)
    lg.close()
    out = plot_traces(tmp_path)
    assert out.exists()


def test_degenerate_scan_does_not_stall_drain():
    """A <=1-point dropout scan must be consumed AND the ready scans
    behind it emitted in the SAME drain (the reference main loop
    retries sync_packages immediately; returning None used to stall
    until the next external push — review r5)."""
    s = Synchronizer(img_enable=False)
    # degenerate scan, then a complete one, with IMU cover past its end
    s.push_lidar(0.0, np.zeros((1, 4), np.float32), np.zeros(1))
    pts = np.random.default_rng(0).uniform(-1, 1, (100, 4)).astype(np.float32)
    s.push_lidar(0.1, pts, np.linspace(0, 0.09, 100))
    for k in range(50):  # cover past scan end (0.19) + margin
        s.push_imu(0.005 * k, np.zeros(3), np.zeros(3))
    groups = list(s.drain())
    assert len(groups) == 1 and groups[0].is_lidar_end
    assert groups[0].scan.beg_time == 0.1
