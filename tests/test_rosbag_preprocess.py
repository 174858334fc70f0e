"""rosbag reader + vendor preprocessing tests (self-built bag fixtures)."""
import bz2
import struct

import numpy as np
import pytest

from fastlivo_tpu.config import AVIA, OUST64, VELO16, XT32, PreprocessConfig
from fastlivo_tpu.io import rosbag as rb
from fastlivo_tpu import preprocess as pp


# --- tiny rosbag writer (test fixture only) ------------------------------

def _field(k: bytes, v: bytes) -> bytes:
    f = k + b"=" + v
    return struct.pack("<I", len(f)) + f


def _record(fields: dict, data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in fields.items())
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) + data


def _ros_string(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def _ros_header(stamp: float) -> bytes:
    secs = int(stamp)
    nsecs = int((stamp - secs) * 1e9)
    return struct.pack("<III", 7, secs, nsecs) + _ros_string(b"frame")


def make_imu_msg(stamp, acc, gyr) -> bytes:
    out = _ros_header(stamp)
    out += np.zeros(4).tobytes() + np.zeros(9).tobytes()
    out += np.asarray(gyr, np.float64).tobytes() + np.zeros(9).tobytes()
    out += np.asarray(acc, np.float64).tobytes() + np.zeros(9).tobytes()
    return out


def make_livox_msg(stamp, pts) -> bytes:
    """pts: structured array with offset_time/x/y/z/reflectivity/tag/line."""
    out = _ros_header(stamp)
    out += struct.pack("<QIB3B", int(stamp * 1e9), len(pts), 0, 0, 0, 0)
    out += struct.pack("<I", len(pts))
    for p in pts:
        out += struct.pack(
            "<Ifff3B", int(p["offset_time"]), p["x"], p["y"], p["z"],
            int(p["reflectivity"]), int(p["tag"]), int(p["line"]),
        )
    return out


def make_pc2_msg(stamp, xyz, intensity, t_off, ring) -> bytes:
    n = len(xyz)
    out = _ros_header(stamp)
    out += struct.pack("<II", 1, n)
    fields = [
        (b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1),
        (b"intensity", 12, 7, 1), (b"time", 16, 7, 1), (b"ring", 20, 4, 1),
    ]
    out += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        out += _ros_string(name) + struct.pack("<IBI", off, dt, cnt)
    point_step = 22
    out += struct.pack("<BII", 0, point_step, point_step * n)
    raw = bytearray()
    for i in range(n):
        raw += struct.pack(
            "<fffffH", xyz[i, 0], xyz[i, 1], xyz[i, 2],
            intensity[i], t_off[i], ring[i],
        )
    out += struct.pack("<I", len(raw)) + bytes(raw)
    out += struct.pack("<B", 1)
    return out


def build_bag(path, chunks):
    """chunks: list of (compression, [(conn_id, topic, type, stamp, raw)])."""
    blob = rb.MAGIC
    blob += _record(
        {b"op": b"\x03", b"index_pos": struct.pack("<Q", 0),
         b"conn_count": struct.pack("<I", 9), b"chunk_count": struct.pack("<I", len(chunks))},
        b"",
    )
    seen = set()
    for comp, msgs in chunks:
        inner = b""
        for cid, topic, mtype, stamp, raw in msgs:
            if cid not in seen:
                seen.add(cid)
                conn_hdr = (
                    _field(b"type", mtype.encode())
                    + _field(b"md5sum", b"x")
                    + _field(b"message_definition", b"")
                )
                inner += _record(
                    {b"op": b"\x07", b"conn": struct.pack("<I", cid),
                     b"topic": topic.encode()},
                    conn_hdr,
                )
            secs = int(stamp)
            nsecs = int((stamp - secs) * 1e9)
            inner += _record(
                {b"op": b"\x02", b"conn": struct.pack("<I", cid),
                 b"time": struct.pack("<II", secs, nsecs)},
                raw,
            )
        if comp == "bz2":
            data = bz2.compress(inner)
        elif comp == "lz4":
            from fastlivo_tpu.io import lz4 as lz4_mod

            data = lz4_mod.compress_frame(inner)
        else:
            data = inner
        blob += _record(
            {b"op": b"\x05", b"compression": comp.encode(),
             b"size": struct.pack("<I", len(inner))},
            data,
        )
    path.write_bytes(blob)


def test_roundtrip_bag(tmp_path):
    pts = np.zeros(4, dtype=[("offset_time", "u4"), ("x", "f4"), ("y", "f4"),
                             ("z", "f4"), ("reflectivity", "u1"),
                             ("tag", "u1"), ("line", "u1")])
    pts["x"] = [1, 2, 3, 4]
    pts["y"] = [0.5, 0.5, 0.5, 0.5]
    pts["offset_time"] = [0, 1000, 2000, 3000]
    pts["tag"] = 0x10
    xyz = np.array([[1.0, 0, 0], [0, 2, 0], [0, 0, 3]], np.float32)
    bag = tmp_path / "t.bag"
    build_bag(bag, [
        ("none", [
            (0, "/livox/imu", "sensor_msgs/Imu", 10.0,
             make_imu_msg(10.0, [0, 0, 9.81], [0.01, 0, 0])),
            (1, "/livox/lidar", "livox_ros_driver/CustomMsg", 10.05,
             make_livox_msg(10.05, pts)),
        ]),
        ("bz2", [
            (2, "/velodyne_points", "sensor_msgs/PointCloud2", 10.1,
             make_pc2_msg(10.1, xyz, np.array([1., 2, 3]),
                          np.array([0.0, 0.01, 0.02]), np.array([0, 1, 2]))),
        ]),
    ])
    got = list(rb.read_bag(bag))
    assert len(got) == 3
    (t0, ty0, s0, m0), (t1, ty1, s1, m1), (t2, ty2, s2, m2) = got
    assert ty0 == "sensor_msgs/Imu" and abs(m0["stamp"] - 10.0) < 1e-6
    np.testing.assert_allclose(m0["acc"], [0, 0, 9.81])
    np.testing.assert_allclose(m0["gyr"], [0.01, 0, 0])
    assert ty1 == "livox_ros_driver/CustomMsg"
    np.testing.assert_allclose(m1["points"]["x"], [1, 2, 3, 4])
    assert m1["points"]["offset_time"][2] == 2000
    assert ty2 == "sensor_msgs/PointCloud2"
    np.testing.assert_allclose(m2["points"]["x"], [1, 0, 0])
    np.testing.assert_allclose(m2["points"]["time"], [0, 0.01, 0.02], atol=1e-8)
    assert m2["points"]["ring"].tolist() == [0, 1, 2]


def test_lz4_block_and_frame_roundtrip():
    """Pure-Python LZ4 (io/lz4.py): known xxh32 vector, block round-trips
    covering literal-only / matched / overlapping-match paths, frame
    checksum enforcement."""
    import random

    from fastlivo_tpu.io import lz4

    assert lz4.xxh32(b"") == 0x02CC5D05  # reference test vector
    rng = random.Random(7)
    cases = [
        b"",
        b"x",
        b"abcd" * 200,              # long matches
        b"ab" * 30000,              # overlapping matches (offset < len)
        bytes(rng.getrandbits(8) for _ in range(5000)),  # incompressible
        bytes(2048),                # zero runs
        bytes(rng.getrandbits(8) for _ in range(64)) * 500,
    ]
    for c in cases:
        frame = lz4.compress_frame(c)
        assert lz4.decompress_frame(frame) == c
    # corrupt one content byte -> the content checksum must catch it
    frame = bytearray(lz4.compress_frame(b"fastlivo " * 1000))
    frame[len(frame) // 2] ^= 0xFF
    try:
        lz4.decompress_frame(bytes(frame))
        assert False, "corruption went undetected"
    except ValueError:
        pass


def test_lz4_compressed_bag_chunk(tmp_path):
    """An lz4-compressed chunk decodes through read_bag like bz2/none
    (rosbag storage spec's lz4 chunk compression, via roslz4 framing)."""
    bag = tmp_path / "lz.bag"
    build_bag(bag, [
        ("lz4", [
            (0, "/livox/imu", "sensor_msgs/Imu", 5.0,
             make_imu_msg(5.0, [0, 0, 9.8], [0.0, 0.02, 0.0])),
            (0, "/livox/imu", "sensor_msgs/Imu", 5.01,
             make_imu_msg(5.01, [0, 0.1, 9.8], [0.0, 0.02, 0.0])),
        ]),
    ])
    got = list(rb.read_bag(bag))
    assert len(got) == 2
    _, ty, _, m = got[1]
    assert ty == "sensor_msgs/Imu"
    np.testing.assert_allclose(m["acc"], [0, 0.1, 9.8])


def test_decode_avia_gates():
    cfg = PreprocessConfig(lidar_type=AVIA, n_scans=6, blind=0.5,
                           point_filter_num=1)
    N = 8
    xyz = np.tile(np.array([[2.0, 0.0, 0.0]]), (N, 1))
    xyz += np.arange(N)[:, None] * [[0.1, 0.0, 0.0]]
    tag = np.full(N, 0x10, np.uint8)
    tag[3] = 0x20  # filtered by tag
    line = np.zeros(N, np.uint8)
    line[4] = 10  # filtered by line
    refl = np.arange(N, dtype=np.float32)
    offs = np.arange(N) * 1e4  # ns
    pts, t = pp.decode_avia(xyz, refl, tag, line, offs, cfg)
    # index 0 always dropped, 3 (tag), 4 (line) dropped
    assert len(pts) == 5
    np.testing.assert_allclose(t, offs[[1, 2, 5, 6, 7]] * 1e-9)
    np.testing.assert_allclose(pts[:, 3], refl[[1, 2, 5, 6, 7]])


def test_decode_avia_stride_and_blind():
    cfg = PreprocessConfig(lidar_type=AVIA, n_scans=6, blind=1.0,
                           point_filter_num=2)
    N = 11
    xyz = np.stack([np.linspace(0.1, 5.0, N), np.zeros(N), np.zeros(N)], 1)
    pts, t = pp.decode_avia(
        xyz, np.zeros(N), np.full(N, 0x10, np.uint8), np.zeros(N, np.uint8),
        np.zeros(N), cfg,
    )
    # stride keeps every 2nd valid (indices 2,4,6,8,10), then blind>1.0
    kept_x = pts[:, 0]
    assert np.all(kept_x > 1.0)
    assert len(kept_x) <= 5


def test_decode_velodyne_yaw_reconstruction():
    cfg = PreprocessConfig(lidar_type=VELO16, n_scans=2, blind=0.1,
                           point_filter_num=1)
    # one ring sweeping clockwise (decreasing yaw = increasing offset)
    ang = np.linspace(0, -350, 36) * np.pi / 180
    xyz = np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], 1) * 5
    ring = np.zeros(36, np.int32)
    t0 = np.zeros(36)  # not given -> reconstruct
    pts, t = pp.decode_velodyne(xyz, np.zeros(36), t0, ring, cfg)
    assert len(t) == 35  # first point consumed
    assert np.all(np.diff(t) > -1e-9)  # monotone offsets
    assert t[-1] < 0.11  # a ~350deg sweep at 10Hz is < 100ms + slack


def test_decode_xt32_offsets():
    cfg = PreprocessConfig(lidar_type=XT32, n_scans=32, blind=0.5,
                           point_filter_num=1)
    xyz = np.tile([[3.0, 0, 0]], (5, 1))
    ts = 100.0 + np.arange(5) * 0.001
    pts, t = pp.decode_xt32(xyz, np.zeros(5), ts, cfg)
    np.testing.assert_allclose(t, np.arange(5) * 0.001, atol=1e-9)


def test_decode_ouster():
    cfg = PreprocessConfig(lidar_type=OUST64, n_scans=64, blind=1.0,
                           point_filter_num=3)
    N = 9
    xyz = np.tile([[2.0, 0, 0]], (N, 1))
    t_ns = np.arange(N) * 1e6
    pts, t = pp.decode_ouster(xyz, np.zeros(N), t_ns, np.zeros(N), cfg)
    assert len(pts) == 3  # stride 3 on the RAW index (i % 3 == 0, :235)
    np.testing.assert_allclose(t, [0.000, 0.003, 0.006])


def test_decode_compressed_image_png():
    """CompressedImage decode via PIL, with the RGB->BGR flip the
    pipeline expects (rosbag.py:decode_compressed_image)."""
    import io as _io

    from PIL import Image as PILImage

    from fastlivo_tpu.io.rosbag import decode_compressed_image

    img = np.zeros((8, 10, 3), np.uint8)
    img[..., 0] = 200  # red channel in RGB
    buf = _io.BytesIO()
    PILImage.fromarray(img).save(buf, format="PNG")
    raw = buf.getvalue()
    # serialized CompressedImage: header (seq,u32|stamp 2xu32|frame str),
    # format string, data bytes
    payload = (
        np.uint32(1).tobytes()
        + np.uint32(100).tobytes() + np.uint32(0).tobytes()
        + np.uint32(2).tobytes() + b"f0"
        + np.uint32(3).tobytes() + b"png"
        + np.uint32(len(raw)).tobytes() + raw
    )
    out = decode_compressed_image(payload)
    assert out["image"].shape == (8, 10, 3)
    # red in RGB -> channel 2 in BGR
    assert out["image"][0, 0, 2] == 200 and out["image"][0, 0, 0] == 0


def make_image_msg(stamp, img) -> bytes:
    """Serialize a sensor_msgs/Image (bgr8) in the rosbag wire format."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    out = _ros_header(stamp)
    out += struct.pack("<II", h, w)
    out += _ros_string(b"bgr8" if ch == 3 else b"mono8")
    out += struct.pack("<B", 0)  # is_bigendian
    out += struct.pack("<I", w * ch)  # step
    out += struct.pack("<I", h * w * ch) + img.tobytes()
    return out


def make_compressed_image_msg(stamp, img) -> bytes:
    """Serialize a sensor_msgs/CompressedImage (PNG) — the format real
    FAST-LIVO bags store (the reference launch re-inflates it with an
    image_transport republish node)."""
    import io as _io

    from PIL import Image as PILImage

    img = np.asarray(img, np.uint8)
    # PIL encodes RGB; decode_compressed_image flips back to BGR.
    # grayscale (2-D) frames carry no channel axis to flip.
    rgb = np.ascontiguousarray(img[..., ::-1]) if img.ndim == 3 else img
    buf = _io.BytesIO()
    PILImage.fromarray(rgb).save(buf, format="PNG")
    raw = buf.getvalue()
    out = _ros_header(stamp)
    out += _ros_string(b"png")
    out += struct.pack("<I", len(raw)) + raw
    return out


def _build_livo_bag(tmp_path, compressed: bool):
    from fastlivo_tpu.io.synthetic import SyntheticDataset
    from test_pipeline_livo import RCL, W, H, F

    ds = SyntheticDataset(duration=3.0, points_per_scan=2048, seed=11,
                          cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL)
    msgs = []
    for t, acc, gyr in ds.imu_stream():
        msgs.append((0, "/imu", "sensor_msgs/Imu", 100.0 + t,
                     make_imu_msg(100.0 + t, acc, gyr)))
    pdtype = np.dtype([("offset_time", "u4"), ("x", "f4"), ("y", "f4"),
                       ("z", "f4"), ("reflectivity", "u1"), ("tag", "u1"),
                       ("line", "u1")])
    for beg, pts, t_rel in ds.lidar_scans_fast():
        arr = np.zeros(len(pts), pdtype)
        arr["x"], arr["y"], arr["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
        arr["offset_time"] = (t_rel * 1e9).astype(np.uint64)
        arr["tag"] = 0x10
        msgs.append((1, "/lidar", "livox_ros_driver/CustomMsg", 100.0 + beg,
                     make_livox_msg(100.0 + beg, arr)))
    for t, img in ds.images():
        u8 = np.asarray(img, np.uint8)
        if compressed:
            msgs.append((2, "/img/compressed",
                         "sensor_msgs/CompressedImage", 100.0 + t,
                         make_compressed_image_msg(100.0 + t, u8)))
        else:
            msgs.append((2, "/img", "sensor_msgs/Image", 100.0 + t,
                         make_image_msg(100.0 + t, u8)))
    msgs.sort(key=lambda m: m[3])
    bag = tmp_path / "livo.bag"
    build_bag(bag, [("none", msgs)])
    return bag


def _run_livo_replay(tmp_path, compressed_images=False):
    """Drive the full CLI bag replay (LIVO); returns the trajectory."""
    import yaml

    from fastlivo_tpu import run as run_mod
    from test_pipeline_livo import RCL, W, H, F

    bag = _build_livo_bag(tmp_path, compressed=compressed_images)

    cam_yaml = tmp_path / "cam.yaml"
    cam_yaml.write_text(yaml.safe_dump({
        "cam_model": "Pinhole", "cam_width": W, "cam_height": H,
        "cam_fx": F, "cam_fy": F, "cam_cx": (W - 1) / 2.0,
        "cam_cy": (H - 1) / 2.0,
        "cam_d0": 0.0, "cam_d1": 0.0, "cam_d2": 0.0, "cam_d3": 0.0,
    }))
    cfg = {
        "img_enable": 1, "lidar_enable": 1, "max_iteration": 4,
        "filter_size_surf": 0.3, "filter_size_map": 0.3,
        "laser_point_cov": 0.001, "point_filter_num": 1,
        "grid_size": 32, "patch_size": 8, "outlier_threshold": 300.0,
        "img_point_cov": 100.0,
        "common": {"lid_topic": "/lidar", "imu_topic": "/imu"},
        "camera": {"img_topic": "/img",
                   "Rcl": RCL.ravel().tolist(), "Pcl": [0.0, 0.0, 0.0]},
        "preprocess": {"lidar_type": 1, "scan_line": 6, "blind": 0.1},
        "mapping": {"acc_cov_scale": 1.0, "gyr_cov_scale": 1.0,
                    "extrinsic_T": [0.0, 0.0, 0.0],
                    "extrinsic_R": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
        "capacity": {"map_table_size": 1 << 16, "max_points": 4096,
                     "max_raw_points": 8192, "max_imu_per_group": 64,
                     "vmap_points": 8192, "vmap_table_size": 1 << 15,
                     "frame_ring": 16, "max_cands": 4096},
    }
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "traj.txt"
    rc = run_mod.main([
        "--config", str(cfg_yaml), "--camera", str(cam_yaml),
        "--bag", str(bag), "--out", str(out),
    ])
    assert rc == 0
    traj = np.loadtxt(out).reshape(-1, 8)
    assert len(traj) > 10
    return traj


@pytest.mark.slow
def test_cli_bag_replay_livo(tmp_path):
    """Full LIVO through the bag path: Image messages interleave with
    livox scans; the pipeline must run VIO frames from the bag."""
    _run_livo_replay(tmp_path)


@pytest.mark.slow
def test_cli_bag_replay_livo_compressed_topic(tmp_path):
    """Same LIVO bag replay but the images arrive as PNG
    sensor_msgs/CompressedImage on <img_topic>/compressed — the layout
    real FAST-LIVO bags use (the reference needs a republish node;
    run_bag subscribes both names and decodes directly). PNG is
    lossless, so the trajectory must be IDENTICAL to the raw-Image
    replay."""
    (tmp_path / "raw").mkdir(exist_ok=True)
    raw = _run_livo_replay(tmp_path / "raw")
    comp = _run_livo_replay(tmp_path, compressed_images=True)
    np.testing.assert_array_equal(raw, comp)


def test_truncated_bag_salvages_prefix(tmp_path):
    """A bag ending in a partially written record (crashed recording —
    normally recoverable with `rosbag reindex`) must replay its complete
    prefix with a RuntimeWarning, not hang, segfault, or abort the run."""
    import pytest

    n = 4
    msgs = []
    for k in range(3):
        raw = make_pc2_msg(0.5 + 0.1 * k, np.zeros((n, 3), np.float32),
                           np.zeros(n), np.zeros(n), np.zeros(n, int))
        msgs.append((k + 1, "/points", "sensor_msgs/PointCloud2",
                     0.5 + 0.1 * k, raw))
    p = tmp_path / "full.bag"
    build_bag(p, [("none", msgs)])
    blob = p.read_bytes()
    full = list(rb.read_bag(p))
    assert len(full) == 3
    for frac in (0.3, 0.7, 0.95):
        q = tmp_path / f"cut_{frac}.bag"
        q.write_bytes(blob[: int(len(blob) * frac)])
        with pytest.warns(RuntimeWarning, match="truncated"):
            got = list(rb.read_bag(q))
        # whatever replayed is a prefix of the full replay
        assert len(got) <= len(full)
        for (t_a, top_a, _m_a), (t_b, top_b, _m_b) in zip(got, full):
            assert t_a == t_b and top_a == top_b


def test_non_bag_file_rejected(tmp_path):
    import pytest

    p = tmp_path / "not.bag"
    p.write_bytes(b"definitely not a rosbag v2.0 file" * 10)
    with pytest.raises(Exception):
        list(rb.read_bag(p))


# --- vendor PointCloud2 bags end-to-end through run_bag -------------------
#
# Real-bytes regression for every spinning-lidar decoder (the reference's
# de-facto fixtures are its demo bags, README.md:118-138): each test
# serializes the vendor driver's actual PointCloud2 field layout
# (padded offsets and all), writes a rosbag, and drives the full CLI
# (`run.main --bag`) — exercising read_bag -> decode_pointcloud2 ->
# _lidar_fields -> preprocess.decode_* -> Pipeline on raw bytes.

_VENDOR_LAYOUTS = {
    # name -> (fields [(name, offset, PF-datatype, np dtype)], point_step)
    # velodyne_pointcloud XYZIRT organized layout (preprocess.cpp:253-357)
    "velodyne": ([(b"x", 0, 7, "<f4"), (b"y", 4, 7, "<f4"),
                  (b"z", 8, 7, "<f4"), (b"intensity", 16, 7, "<f4"),
                  (b"ring", 20, 4, "<u2"), (b"time", 22, 7, "<f4")], 32),
    # ouster_ros os_cloud_node/points layout (preprocess.cpp:222-251)
    "ouster": ([(b"x", 0, 7, "<f4"), (b"y", 4, 7, "<f4"),
                (b"z", 8, 7, "<f4"), (b"intensity", 16, 7, "<f4"),
                (b"t", 20, 6, "<u4"), (b"reflectivity", 24, 4, "<u2"),
                (b"ring", 26, 2, "u1"), (b"ambient", 28, 4, "<u2"),
                (b"range", 32, 6, "<u4")], 48),
    # hesai_ros XT32 layout: absolute f64 timestamps (preprocess.cpp:436-466)
    "xt32": ([(b"x", 0, 7, "<f4"), (b"y", 4, 7, "<f4"),
              (b"z", 8, 7, "<f4"), (b"intensity", 16, 7, "<f4"),
              (b"timestamp", 24, 8, "<f8"), (b"ring", 32, 4, "<u2")], 40),
}


def make_vendor_pc2_msg(stamp, layout_name, **arrays) -> bytes:
    """Serialize a PointCloud2 with the named vendor's wire layout."""
    fields, point_step = _VENDOR_LAYOUTS[layout_name]
    n = len(arrays["x"])
    out = _ros_header(stamp)
    out += struct.pack("<II", 1, n)
    out += struct.pack("<I", len(fields))
    for name, off, dt, _np in fields:
        out += _ros_string(name) + struct.pack("<IBI", off, dt, 1)
    raw = np.zeros(n, dtype=np.dtype(
        {"names": [f[0].decode() for f in fields],
         "formats": [f[3] for f in fields],
         "offsets": [f[1] for f in fields], "itemsize": point_step}))
    for k, v in arrays.items():
        raw[k] = v
    blob = raw.tobytes()
    out += struct.pack("<BII", 0, point_step, point_step * n)
    out += struct.pack("<I", len(blob)) + blob
    out += struct.pack("<B", 1)
    return out


def _run_vendor_lio_replay(tmp_path, vendor, lidar_type, scan_line):
    import yaml

    from fastlivo_tpu import run as run_mod
    from fastlivo_tpu.io.synthetic import SyntheticDataset

    ds = SyntheticDataset(duration=3.0, points_per_scan=2048, seed=7)
    msgs = []
    for t, acc, gyr in ds.imu_stream():
        msgs.append((0, "/points_imu", "sensor_msgs/Imu", 100.0 + t,
                     make_imu_msg(100.0 + t, acc, gyr)))
    for beg, pts, t_rel in ds.lidar_scans_fast():
        n = len(pts)
        common = dict(x=pts[:, 0], y=pts[:, 1], z=pts[:, 2],
                      intensity=np.full(n, 17.0, np.float32))
        if vendor == "velodyne":
            extra = dict(ring=np.arange(n) % scan_line,
                         time=t_rel.astype(np.float32))
        elif vendor == "ouster":
            extra = dict(ring=np.arange(n) % scan_line,
                         t=(t_rel * 1e9).astype(np.uint32))
        else:  # xt32: absolute f64 per-point stamps
            extra = dict(ring=np.arange(n) % scan_line,
                         timestamp=100.0 + beg + t_rel)
        msgs.append((1, "/points", "sensor_msgs/PointCloud2", 100.0 + beg,
                     make_vendor_pc2_msg(100.0 + beg, vendor, **common,
                                         **extra)))
    msgs.sort(key=lambda m: m[3])
    bag = tmp_path / f"{vendor}.bag"
    build_bag(bag, [("none", msgs)])

    cfg = {
        "img_enable": 0, "lidar_enable": 1, "max_iteration": 4,
        "filter_size_surf": 0.3, "filter_size_map": 0.3,
        "laser_point_cov": 0.001, "point_filter_num": 1,
        "common": {"lid_topic": "/points", "imu_topic": "/points_imu"},
        "preprocess": {"lidar_type": lidar_type, "scan_line": scan_line,
                       "blind": 0.1},
        "mapping": {"acc_cov_scale": 1.0, "gyr_cov_scale": 1.0,
                    "extrinsic_T": [0.0, 0.0, 0.0],
                    "extrinsic_R": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
        "capacity": {"map_table_size": 1 << 16, "max_points": 4096,
                     "max_raw_points": 4096, "max_imu_per_group": 64},
    }
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "traj.txt"
    rc = run_mod.main(["--config", str(cfg_yaml), "--bag", str(bag),
                       "--out", str(out)])
    assert rc == 0
    traj = np.loadtxt(out).reshape(-1, 8)
    assert len(traj) > 12
    assert np.all(np.isfinite(traj))
    # localization sanity vs the dataset's ground-truth trajectory
    errs = []
    for row in traj:
        t = row[0] - 100.0
        if t < 1.0:
            continue  # filter convergence window
        gt = ds.traj.pose(t)[1] - ds.traj.base_pos
        errs.append(np.linalg.norm(row[1:4] - gt))
    assert errs and float(np.sqrt(np.mean(np.square(errs)))) < 0.05, (
        f"{vendor} replay ATE too high: {errs}"
    )
    return traj


@pytest.mark.slow
def test_cli_bag_replay_velodyne(tmp_path):
    """VLP-16 bag (XYZIRT fields, f32 per-point time) through the CLI."""
    _run_vendor_lio_replay(tmp_path, "velodyne", VELO16, 16)


@pytest.mark.slow
def test_cli_bag_replay_ouster(tmp_path):
    """OS1-64 bag (u32 nanosecond `t`, padded 48-byte points) end-to-end."""
    _run_vendor_lio_replay(tmp_path, "ouster", OUST64, 64)


@pytest.mark.slow
def test_cli_bag_replay_xt32(tmp_path):
    """Hesai XT32 bag (absolute f64 `timestamp` field) end-to-end."""
    _run_vendor_lio_replay(tmp_path, "xt32", XT32, 32)


def test_decode_image_mono16():
    """16-bit mono streams (mono16 / 16UC1, common for industrial
    cameras) must decode to the 8-bit grayscale the pipeline expects —
    previously they came out as a garbled (H, W, 2) uint8 array."""
    from fastlivo_tpu.io.rosbag import decode_image

    h, w = 6, 9
    img16 = (np.arange(h * w, dtype=np.uint16).reshape(h, w) * 700)
    payload = (
        _ros_header(5.0)
        + struct.pack("<II", h, w)
        + _ros_string(b"mono16")
        + struct.pack("<B", 0)
        + struct.pack("<I", w * 2)
        + struct.pack("<I", h * w * 2) + img16.astype("<u2").tobytes()
    )
    out = decode_image(payload)
    assert out["image"].shape == (h, w)
    assert out["image"].dtype == np.uint8
    np.testing.assert_array_equal(out["image"], (img16 >> 8).astype(np.uint8))
    # big-endian variant ("16UC1" with is_bigendian set)
    payload_be = (
        _ros_header(5.0)
        + struct.pack("<II", h, w)
        + _ros_string(b"16UC1")
        + struct.pack("<B", 1)
        + struct.pack("<I", w * 2)
        + struct.pack("<I", h * w * 2) + img16.astype(">u2").tobytes()
    )
    out_be = decode_image(payload_be)
    np.testing.assert_array_equal(out_be["image"], out["image"])


def test_decode_empty_messages_all_paths():
    """Livox drivers emit empty CustomMsgs during startup/stalls and
    PointCloud2 streams can carry zero-point frames: every decode path
    (all 4 vendor types, with and without feature extraction) must
    return an empty scan, not IndexError (the reference's per-point
    loops trivially no-op)."""
    from fastlivo_tpu import preprocess as pp
    from fastlivo_tpu.config import AVIA, OUST64, VELO16, XT32, Config

    empty = {
        "xyz": np.zeros((0, 3), np.float32),
        "reflectivity": np.zeros(0, np.float32),
        "tag": np.zeros(0, np.uint8), "line": np.zeros(0, np.uint8),
        "offset_time_ns": np.zeros(0, np.float64),
        "intensity": np.zeros(0, np.float32),
        "time_s": np.zeros(0, np.float64),
        "t_ns": np.zeros(0, np.float64),
        "ring": np.zeros(0, np.int32),
        "timestamp_s": np.zeros(0, np.float64),
    }
    for lt in (AVIA, VELO16, OUST64, XT32):
        for feats in (False, True):
            cfg = Config().preprocess
            cfg.lidar_type = lt
            cfg.feature_extract_enable = feats
            pts, t_rel = pp.decode(empty, cfg)
            assert pts.shape == (0, 4) and len(t_rel) == 0, (lt, feats)


def test_corrupt_chunk_skipped_keeps_rest(tmp_path):
    """Bit rot in ONE compressed chunk must not kill the replay: the
    chunk is skipped with a RuntimeWarning and every other chunk's
    messages still decode (mirrors the truncated-record degradation)."""
    import warnings

    t0 = 50.0
    mk = lambda t: (1, "/livox/imu", "sensor_msgs/Imu",
                    t, make_imu_msg(t, [0, 0, 9.8], [0, 0, 0]))
    chunks = [("lz4", [mk(t0 + 0.01 * k) for k in range(5)]),
              ("lz4", [mk(t0 + 1 + 0.01 * k) for k in range(5)]),
              ("lz4", [mk(t0 + 2 + 0.01 * k) for k in range(5)])]
    path = tmp_path / "rot.bag"
    build_bag(path, chunks)
    blob = bytearray(path.read_bytes())

    # walk the record framing to find the SECOND chunk's data payload
    i = len(rb.MAGIC)
    n_chunk = 0
    while i + 8 <= len(blob):
        (hlen,) = struct.unpack_from("<I", blob, i)
        hdr = rb._parse_header(bytes(blob[i + 4:i + 4 + hlen]))
        (dlen,) = struct.unpack_from("<I", blob, i + 4 + hlen)
        dstart = i + 8 + hlen
        if hdr["op"][0] == rb.OP_CHUNK:
            n_chunk += 1
            if n_chunk == 2:
                mid = dstart + dlen // 2
                for j in range(mid, min(mid + 16, dstart + dlen)):
                    blob[j] ^= 0xFF
                break
        i = dstart + dlen
    assert n_chunk == 2, "did not find the second chunk"
    path.write_bytes(bytes(blob))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        stamps = [t for top, ty, t, m in rb.read_bag(path)
                  if ty == "sensor_msgs/Imu"]
    assert any("chunk skipped" in str(x.message) for x in w), (
        [str(x.message) for x in w])
    # chunks 1 and 3 fully decoded; chunk 2's window absent
    assert len(stamps) == 10
    assert not any(t0 + 0.9 < s < t0 + 1.9 for s in stamps)
