"""Online serving mode: stream synthetic sensors over a socket, read
odometry back — the live-transport equivalent of the ROS node."""
import json
import socket

import numpy as np

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
                return
            lines.append(d)
    raise AssertionError("no flush ack received")
