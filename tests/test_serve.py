"""Online serving mode: stream synthetic sensors over a socket, read
odometry back — the live-transport equivalent of the ROS node."""
import json
import socket

import numpy as np
import pytest

from fastlivo_tpu import serve
from fastlivo_tpu.io.synthetic import SyntheticDataset

from test_pipeline_lio import small_config


def test_socket_stream_lio(tmp_path):
    ds = SyntheticDataset(duration=3.0, points_per_scan=2048,
                          lidar_noise=0.004, seed=3)
    srv = serve.Server(small_config(), str(tmp_path / "sock"))
    srv.start_background()

    cli = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    cli.connect(srv.address)
    cli.settimeout(120)

    # interleave sensors in time order, like a live robot
    events = []
    for t, acc, gyr in ds.imu_stream():
        events.append((t, serve.encode_imu(t, acc, gyr)))
    for beg, pts, t_rel in ds.lidar_scans_fast():
        events.append((beg, serve.encode_lidar(
            beg, pts[:, :3], t_rel.astype(np.float32))))
    events.sort(key=lambda e: e[0])
    for _, msg in events:
        cli.sendall(msg)
    cli.sendall(serve.encode_flush())

    # read odometry lines until the flush ack
    buf = b""
    lines = []
    while True:
        chunk = cli.recv(65536)
        if not chunk:
            break
        buf += chunk
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            d = json.loads(line)
            if d.get("flushed"):
                cli.close()
                srv.wait(10)
                frames = [x for x in lines if "pos" in x]
                assert len(frames) > 10
                # tracks: early static frames near origin
                assert np.linalg.norm(frames[0]["pos"]) < 0.02
                assert all(np.isfinite(f["pos"]).all() is not False
                           for f in frames)
                # health surface: res_rms + watchdog counter on every
                # odometry line (0 = watchdog off / never fired)
                assert all("res_rms" in f and f["auto_resets"] == 0
                           for f in frames)
                return
            lines.append(d)
    raise AssertionError("no flush ack received")


@pytest.mark.slow
def test_socket_stream_livo(tmp_path):
    """Full LIVO over the socket: images interleave with scans."""
    from test_pipeline_livo import RCL, W, H, F, livo_config

    ds = SyntheticDataset(duration=2.5, points_per_scan=2048,
                          lidar_noise=0.004, seed=7,
                          cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL)
    srv = serve.Server(livo_config(), str(tmp_path / "sock"))
    srv.start_background()
    cli = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    cli.connect(srv.address)
    cli.settimeout(180)

    events = []
    for t, acc, gyr in ds.imu_stream():
        events.append((t, serve.encode_imu(t, acc, gyr)))
    for beg, pts, t_rel in ds.lidar_scans_fast():
        events.append((beg, serve.encode_lidar(
            beg, pts[:, :3], t_rel.astype(np.float32))))
    for t, img in ds.images():
        events.append((t, serve.encode_image(t, np.asarray(img, np.uint8))))
    events.sort(key=lambda e: e[0])
    for _, msg in events:
        cli.sendall(msg)
    cli.sendall(serve.encode_flush())

    buf = b""
    frames = []
    while True:
        chunk = cli.recv(65536)
        if not chunk:
            break
        buf += chunk
        done = False
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            d = json.loads(line)
            if d.get("flushed"):
                done = True
                break
            frames.append(d)
        if done:
            break
    cli.close()
    srv.wait(10)
    assert len(frames) > 5
    # the server's pipeline ran VIO frames
    assert srv.pipe.vio is not None and srv.pipe.vio.fid > 3


def test_tcp_server_binds_and_streams():
    """TCP transport variant (the unix-socket tests cover the protocol)."""
    srv = serve.Server(small_config(), ("127.0.0.1", 0))
    srv.start_background()
    host, port = srv.address
    cli = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    cli.connect((host, port))
    cli.settimeout(30)
    cli.sendall(serve.encode_imu(1.0, [0, 0, 9.81], [0, 0, 0]))
    cli.sendall(serve.encode_flush())
    buf = b""
    while b"\n" not in buf:
        buf += cli.recv(4096)
    assert json.loads(buf.split(b"\n")[0]).get("flushed")
    cli.close()
    srv.wait(5)


def test_bad_length_prefix_rejected():
    srv = serve.Server(small_config(), ("127.0.0.1", 0))
    srv.start_background()
    cli = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    cli.connect(srv.address)
    cli.settimeout(30)
    import struct

    cli.sendall(struct.pack("<I", 1 << 30))  # absurd length
    buf = b""
    while b"\n" not in buf:
        buf += cli.recv(4096)
    assert b"bad message length" in buf
    cli.close()
    srv.wait(5)


@pytest.mark.slow
def test_socket_loopback_reset_survives(tmp_path):
    """A timestamp regression arriving over the wire (client restarted
    its bag) must trigger the loop-back reset, not crash the server."""
    import warnings

    ds = SyntheticDataset(duration=2.5, points_per_scan=2048,
                          lidar_noise=0.004, seed=3)
    srv = serve.Server(small_config(), str(tmp_path / "sock"))
    srv.start_background()
    cli = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    cli.connect(srv.address)
    cli.settimeout(120)

    def send_all():
        events = []
        for t, acc, gyr in ds.imu_stream():
            events.append((t, serve.encode_imu(t, acc, gyr)))
        for beg, pts, t_rel in ds.lidar_scans_fast():
            events.append((beg, serve.encode_lidar(
                beg, pts[:, :3], t_rel.astype(np.float32))))
        events.sort(key=lambda e: e[0])
        for _, m in events:
            cli.sendall(m)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        send_all()
        cli.sendall(serve.encode_flush())
        send_all()  # restart from t=0: regression
        cli.sendall(serve.encode_flush())

        buf = b""
        flushes = 0
        while flushes < 2:
            chunk = cli.recv(65536)
            if not chunk:
                break
            buf += chunk
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                if json.loads(line).get("flushed"):
                    flushes += 1
    cli.close()
    srv.wait(10)
    assert flushes == 2  # server survived the regression


def test_subscriber_receives_broadcast(tmp_path):
    """Pub/sub parity: a second connection that publishes nothing still
    receives the full odometry stream (the rviz-subscriber role of the
    reference's rostopic publishers)."""
    ds = SyntheticDataset(duration=2.5, points_per_scan=2048,
                          lidar_noise=0.004, seed=5)
    srv = serve.Server(small_config(), str(tmp_path / "sock"))
    srv.start_background()

    sub = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sub.connect(srv.address)
    sub.settimeout(120)

    pub = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    pub.connect(srv.address)
    pub.settimeout(120)

    events = []
    for t, acc, gyr in ds.imu_stream():
        events.append((t, serve.encode_imu(t, acc, gyr)))
    for beg, pts, t_rel in ds.lidar_scans_fast():
        events.append((beg, serve.encode_lidar(
            beg, pts[:, :3], t_rel.astype(np.float32))))
    events.sort(key=lambda e: e[0])
    for _, msg in events:
        pub.sendall(msg)
    pub.sendall(serve.encode_flush())

    # the publisher drains its own stream until the flush ack...
    buf = b""
    pub_frames = 0
    done = False
    while not done:
        chunk = pub.recv(65536)
        if not chunk:
            break
        buf += chunk
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            d = json.loads(line)
            if d.get("flushed"):
                done = True
                break
            if "pos" in d:
                pub_frames += 1
    assert pub_frames > 5

    # ...and the silent subscriber must have received the same frames
    sub.setblocking(True)
    sub.settimeout(10)
    buf = b""
    sub_frames = 0
    try:
        while sub_frames < pub_frames:
            chunk = sub.recv(65536)
            if not chunk:
                break
            buf += chunk
            sub_frames = buf.count(b"\n")
    except socket.timeout:
        pass
    assert sub_frames >= pub_frames, (sub_frames, pub_frames)
    pub.close()
    sub.close()
    srv.wait(10)


def test_socket_stream_livo_block_read(tmp_path):
    """--block-read serving mode: block-packed readback over the wire.
    Frames still publish (late by up to ~2E events, drained by FLUSH)
    and track the same stream as the per-frame mode."""
    from test_pipeline_livo import RCL, W, H, F, livo_config

    ds = SyntheticDataset(duration=2.5, points_per_scan=2048,
                          lidar_noise=0.004, seed=7,
                          cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL)
    srv = serve.Server(livo_config(), str(tmp_path / "sock"))
    srv.pipe.enable_block_read(2)
    srv.start_background()
    cli = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    cli.connect(srv.address)
    cli.settimeout(180)

    events = []
    for t, acc, gyr in ds.imu_stream():
        events.append((t, serve.encode_imu(t, acc, gyr)))
    for beg, pts, t_rel in ds.lidar_scans_fast():
        events.append((beg, serve.encode_lidar(
            beg, pts[:, :3], t_rel.astype(np.float32))))
    for t, img in ds.images():
        events.append((t, serve.encode_image(t, np.asarray(img, np.uint8))))
    events.sort(key=lambda e: e[0])
    for _, msg in events:
        cli.sendall(msg)
    cli.sendall(serve.encode_flush())

    buf = b""
    frames = []
    while True:
        chunk = cli.recv(65536)
        if not chunk:
            break
        buf += chunk
        done = False
        while b"\n" in buf:
            line, buf = buf.split(b"\n", 1)
            d = json.loads(line)
            if d.get("flushed"):
                done = True
                break
            frames.append(d)
        if done:
            break
    cli.close()
    srv.wait(10)
    # every scan-end frame published despite block-packed reads
    assert len(frames) > 5
    assert all(np.isfinite(f["pos"]).all() for f in frames)
    assert np.linalg.norm(frames[0]["pos"]) < 0.02


def test_autosave_snapshot_resumable(tmp_path):
    """--autosave: the server periodically (and at shutdown) writes an
    atomic crash-recovery checkpoint carrying state + maps + IMU calib;
    a fresh Pipeline must warm_start from it with the EKF immediately
    active."""
    from fastlivo_tpu.io import checkpoint as ckpt
    from fastlivo_tpu.pipeline import Pipeline

    ds = SyntheticDataset(duration=3.0, points_per_scan=2048,
                          lidar_noise=0.004, seed=3)
    snap = tmp_path / "auto.npz"
    srv = serve.Server(small_config(), str(tmp_path / "sock"),
                       autosave=str(snap), autosave_every=8)
    srv.start_background()
    cli = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    cli.connect(srv.address)
    cli.settimeout(120)
    events = []
    for t, acc, gyr in ds.imu_stream():
        events.append((t, serve.encode_imu(t, acc, gyr)))
    for beg, pts, t_rel in ds.lidar_scans_fast():
        events.append((beg, serve.encode_lidar(
            beg, pts[:, :3], t_rel.astype(np.float32))))
    events.sort(key=lambda e: e[0])
    for _, msg in events:
        cli.sendall(msg)
    cli.sendall(serve.encode_flush())
    buf = b""
    while b'"flushed"' not in buf:
        chunk = cli.recv(65536)
        if not chunk:
            break
        buf += chunk
    cli.close()
    srv.wait(30)
    assert snap.exists(), "autosave snapshot missing after shutdown"
    assert not (tmp_path / "auto.npz.tmp").exists()  # atomic replace
    st, m, vm_, cal = ckpt.load(snap)
    assert cal is not None
    b = Pipeline(small_config()).warm_start(st, m, vm_, cal)
    assert b.init_done and b.map_built

    # restored map answers immediately: push one more scan + imu tail
    # and the EKF produces a frame with matches, no re-init window
    ds2 = SyntheticDataset(duration=3.2, points_per_scan=2048,
                           lidar_noise=0.004, seed=3)
    for beg, pts, t_rel in ds2.lidar_scans_fast():
        if beg >= 3.0:
            b.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds2.imu_stream():
        if t >= 3.0:
            b.push_imu(t, acc, gyr)
    outs = b.spin() + b.finish()
    assert len(outs) >= 1
    assert outs[0].n_active > 100, "EKF not active on first restored frame"


@pytest.mark.slow
def test_autosave_survives_hard_kill(tmp_path):
    """The crash scenario autosave exists for: the server process is
    KILLED mid-stream (no shutdown hook runs); a periodic snapshot must
    already be on disk and warm_start-able."""
    import subprocess
    import sys
    import time as _time

    from fastlivo_tpu.io import checkpoint as ckpt
    from fastlivo_tpu.pipeline import Pipeline

    ds = SyntheticDataset(duration=3.0, points_per_scan=2048,
                          lidar_noise=0.004, seed=3)
    snap = tmp_path / "crash.npz"
    sockp = str(tmp_path / "sock")
    proc = subprocess.Popen(
        [sys.executable, "-m", "fastlivo_tpu.serve",
         "--config", "/root/reference/config/avia.yaml",
         "--unix", sockp, "--autosave", str(snap), "--autosave-every", "5"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    try:
        assert "listening" in proc.stdout.readline()
        cli = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        cli.connect(sockp)
        cli.settimeout(120)
        events = []
        for t, acc, gyr in ds.imu_stream():
            events.append((t, serve.encode_imu(t, acc, gyr)))
        for beg, pts, t_rel in ds.lidar_scans_fast():
            events.append((beg, serve.encode_lidar(
                beg, pts[:, :3], t_rel.astype(np.float32))))
        events.sort(key=lambda e: e[0])
        for _, msg in events:
            cli.sendall(msg)
        cli.sendall(serve.encode_flush())
        buf = b""
        while b'"flushed"' not in buf:
            buf += cli.recv(65536)
        # wait for a periodic snapshot to land, then KILL (exact pid)
        for _ in range(100):
            if snap.exists():
                break
            _time.sleep(0.1)
        assert snap.exists(), "no periodic snapshot before the crash"
        proc.kill()  # the crash: no shutdown save runs
        proc.wait(10)
        cli.close()
    finally:
        if proc.poll() is None:
            proc.kill()
    st, m, vm_, cal = ckpt.load(snap)
    assert cal is not None
    b = Pipeline(small_config()).warm_start(st, m, vm_, cal)
    assert b.init_done and b.map_built

    # full crash-recovery loop: RESTART the server from its own
    # autosave (--load-ckpt + --autosave on the same path) and stream
    # the remaining sensor window — odometry must flow immediately
    proc2 = subprocess.Popen(
        [sys.executable, "-m", "fastlivo_tpu.serve",
         "--config", "/root/reference/config/avia.yaml",
         "--unix", sockp, "--autosave", str(snap),
         "--load-ckpt", str(snap), "--autosave-every", "5"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    try:
        boot = proc2.stdout.readline() + proc2.stdout.readline()
        assert "warm-started" in boot and "listening" in boot, boot
        ds2 = SyntheticDataset(duration=3.4, points_per_scan=2048,
                               lidar_noise=0.004, seed=3)
        cli2 = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        cli2.connect(sockp)
        cli2.settimeout(120)
        tail = []
        for t, acc, gyr in ds2.imu_stream():
            if t >= 3.0:
                tail.append((t, serve.encode_imu(t, acc, gyr)))
        for beg, pts, t_rel in ds2.lidar_scans_fast():
            if beg >= 3.0:
                tail.append((beg, serve.encode_lidar(
                    beg, pts[:, :3], t_rel.astype(np.float32))))
        tail.sort(key=lambda e: e[0])
        for _, msg in tail:
            cli2.sendall(msg)
        cli2.sendall(serve.encode_flush())
        buf2 = b""
        while b'"flushed"' not in buf2:
            chunk = cli2.recv(65536)
            if not chunk:
                break
            buf2 += chunk
        cli2.close()
        # odometry lines flowed from the restored state (no init gap)
        frames = [json.loads(x) for x in buf2.split(b"\n")
                  if x and b'"pos"' in x]
        assert len(frames) >= 2, buf2[:200]
        assert all(np.isfinite(f["pos"]).all() for f in frames)
    finally:
        if proc2.poll() is None:
            proc2.kill()
        proc2.wait(10)
