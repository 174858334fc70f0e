"""CLI runner tests: synthetic replay and bag replay end-to-end."""
import numpy as np
import pytest
import yaml

from fastlivo_tpu import run as run_mod
from fastlivo_tpu.logging_util import ate_rmse, load_tum


def small_yaml(tmp_path, img_enable=0):
    cfg = {
        "img_enable": img_enable, "lidar_enable": 1, "max_iteration": 5,
        "filter_size_surf": 0.3, "filter_size_map": 0.3,
        "laser_point_cov": 0.001, "point_filter_num": 1,
        "common": {"lid_topic": "/lidar", "imu_topic": "/imu"},
        "preprocess": {"lidar_type": 1, "scan_line": 6, "blind": 0.1},
        "mapping": {"acc_cov_scale": 1.0, "gyr_cov_scale": 1.0,
                    "extrinsic_T": [0.0, 0.0, 0.0],
                    "extrinsic_R": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
        "capacity": {"map_table_size": 1 << 16, "max_points": 4096,
                     "max_raw_points": 8192, "max_imu_per_group": 64},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


@pytest.mark.slow
def test_cli_synthetic_lio(tmp_path):
    cfg = small_yaml(tmp_path)
    out = tmp_path / "traj.txt"
    rc = run_mod.main([
        "--config", str(cfg), "--synthetic", "--duration", "4",
        "--no-img", "--out", str(out), "--log-dir", str(tmp_path / "Log"),
    ])
    assert rc == 0
    traj = load_tum(out)
    assert len(traj) > 15
    assert (tmp_path / "Log" / "mat_out.txt").exists()
    # static phase: position near origin
    assert np.linalg.norm(traj[0, 1:4]) < 0.01


@pytest.mark.slow
def test_cli_bag_replay(tmp_path):
    """Build a small synthetic avia-format bag and replay it."""
    from test_rosbag_preprocess import build_bag, make_imu_msg, make_livox_msg
    from fastlivo_tpu.io.synthetic import SyntheticDataset

    ds = SyntheticDataset(duration=3.5, points_per_scan=2048, seed=9)
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
    msgs.sort(key=lambda m: m[3])
    bag = tmp_path / "synth.bag"
    build_bag(bag, [("none", msgs)])

    cfg = small_yaml(tmp_path)
    out = tmp_path / "traj.txt"
    rc = run_mod.main([
        "--config", str(cfg), "--bag", str(bag), "--out", str(out),
    ])
    assert rc == 0
    traj = load_tum(out)
    assert len(traj) > 10
    # trajectory follows ground truth (bag stamps offset by 100s)
    base = ds.traj.base_pos
    gt = []
    for r in traj:
        _, pos = ds.traj.pose(r[0] - 100.0)
        gt.append([r[0], *(pos - base)])
    ate = ate_rmse(traj, np.concatenate([np.asarray(gt), np.zeros((len(gt), 4))], 1))
    assert ate < 0.05, f"bag-replay ATE {ate}"


def make_ouster_pc2_msg(stamp, xyz, intensity, t_ns, ring):
    """sensor_msgs/PointCloud2 with the ouster field layout (t: uint32 ns)."""
    import struct
    from test_rosbag_preprocess import _ros_header, _ros_string

    n = len(xyz)
    out = _ros_header(stamp)
    out += struct.pack("<II", 1, n)
    fields = [
        (b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1),
        (b"intensity", 12, 7, 1), (b"t", 16, 6, 1), (b"ring", 20, 4, 1),
    ]
    out += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        out += _ros_string(name) + struct.pack("<IBI", off, dt, cnt)
    point_step = 22
    out += struct.pack("<BII", 0, point_step, point_step * n)
    raw = bytearray()
    for i in range(n):
        raw += struct.pack("<ffffIH", xyz[i, 0], xyz[i, 1], xyz[i, 2],
                           intensity[i], int(t_ns[i]), int(ring[i]))
    out += struct.pack("<I", len(raw)) + bytes(raw)
    out += struct.pack("<B", 1)
    return out


@pytest.mark.slow
def test_cli_ouster_bag_replay(tmp_path):
    """NTU-VIRAL-style rig: ouster PointCloud2 through the full stack."""
    import yaml
    from test_rosbag_preprocess import build_bag, make_imu_msg
    from fastlivo_tpu.io.synthetic import SyntheticDataset

    ds = SyntheticDataset(duration=3.5, points_per_scan=2048, seed=11)
    msgs = []
    for t, acc, gyr in ds.imu_stream():
        msgs.append((0, "/os/imu", "sensor_msgs/Imu", 50.0 + t,
                     make_imu_msg(50.0 + t, acc, gyr)))
    for beg, pts, t_rel in ds.lidar_scans_fast():
        msgs.append((1, "/os/points", "sensor_msgs/PointCloud2", 50.0 + beg,
                     make_ouster_pc2_msg(
                         50.0 + beg, pts, np.zeros(len(pts)),
                         (t_rel * 1e9).astype(np.uint64),
                         np.zeros(len(pts), np.int32))))
    msgs.sort(key=lambda m: m[3])
    bag = tmp_path / "oust.bag"
    build_bag(bag, [("bz2", msgs)])

    cfg = {
        "img_enable": 0, "lidar_enable": 1, "max_iteration": 5,
        "filter_size_surf": 0.3, "filter_size_map": 0.3, "point_filter_num": 1,
        "common": {"lid_topic": "/os/points", "imu_topic": "/os/imu"},
        "preprocess": {"lidar_type": 3, "scan_line": 16, "blind": 0.1},
        "mapping": {"acc_cov_scale": 1.0, "gyr_cov_scale": 1.0,
                    "extrinsic_T": [0, 0, 0],
                    "extrinsic_R": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
        "capacity": {"map_table_size": 1 << 16, "max_points": 4096,
                     "max_raw_points": 4096, "max_imu_per_group": 64},
    }
    p = tmp_path / "oust.yaml"
    p.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "traj.txt"
    rc = run_mod.main(["--config", str(p), "--bag", str(bag), "--out", str(out)])
    assert rc == 0
    traj = load_tum(out)
    assert len(traj) > 10
    base = ds.traj.base_pos
    errs = []
    for r in traj:
        _, pos = ds.traj.pose(r[0] - 50.0)
        errs.append(np.linalg.norm(r[1:4] - (pos - base)))
    assert np.sqrt(np.mean(np.square(errs))) < 0.05


def test_launch_file_resolution():
    """--launch resolves every reference launch file to its YAML pair
    (catkin's $(find pkg) -> package root), so the exact launch file a
    FAST-LIVO user runs drives this CLI (launch/mapping_*.launch)."""
    from fastlivo_tpu.config import parse_launch

    want = {
        "mapping_avia.launch": ("avia.yaml", "camera_pinhole.yaml"),
        "mapping_avia_marslvig.launch": ("MARS_LVIG.yaml",
                                         "camera_MARS_LVIG.yaml"),
        "mapping_avia_ntu.launch": ("NTU_VIRAL.yaml",
                                    "camera_NTU_VIRAL.yaml"),
        "mapping_mid360.launch": ("mid360.yaml", "camera_pinhole.yaml"),
    }
    for launch, (cfg_name, cam_name) in want.items():
        cfg, cam = parse_launch(f"/root/reference/launch/{launch}")
        assert cfg.name == cfg_name and cfg.exists()
        assert cam.name == cam_name and cam.exists()


def test_launch_flag_end_to_end(tmp_path):
    from fastlivo_tpu import run as run_mod

    out = tmp_path / "traj.txt"
    run_mod.main([
        "--launch", "/root/reference/launch/mapping_avia.launch",
        "--synthetic", "--duration", "2.5", "--no-img",
        "--out", str(out),
    ])
    import numpy as np

    traj = np.loadtxt(out)
    assert traj.shape[1] == 8 and len(traj) >= 3


def test_launch_parse_grouped_and_missing(tmp_path):
    """parse_launch corner cases: <group>-nested rosparams are found
    (searched recursively), and a $(find pkg) path that doesn't exist
    raises a clear FileNotFoundError instead of failing later at YAML
    load with a confusing message."""
    import pytest

    from fastlivo_tpu.config import parse_launch

    pkg = tmp_path / "mypkg"
    (pkg / "launch").mkdir(parents=True)
    (pkg / "config").mkdir()
    (pkg / "config" / "rig.yaml").write_text("lidar_enable: 1\n")
    (pkg / "config" / "cam.yaml").write_text("cam_model: Pinhole\n")

    grouped = pkg / "launch" / "grouped.launch"
    grouped.write_text("""<launch>
  <group>
    <rosparam command="load" file="$(find mypkg)/config/rig.yaml" />
  </group>
  <node pkg="x" type="y" name="z">
    <rosparam file="$(find mypkg)/config/cam.yaml" />
  </node>
</launch>""")
    cfg, cam = parse_launch(grouped)
    assert cfg.name == "rig.yaml" and cam.name == "cam.yaml"

    missing = pkg / "launch" / "missing.launch"
    missing.write_text("""<launch>
  <rosparam command="load" file="$(find mypkg)/config/nope.yaml" />
</launch>""")
    with pytest.raises(FileNotFoundError, match="nope.yaml"):
        parse_launch(missing)


@pytest.mark.slow
def test_bag_rate_pacing(tmp_path):
    """--rate paces bag replay by message stamps (rosbag play -r role):
    a 1.2 s bag at rate 2.0 must take >= ~0.6 s wall and produce the
    same trajectory as the unpaced replay."""
    import time as _time

    import test_rosbag_preprocess as T
    from fastlivo_tpu import run as run_mod

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()

    def go(sub, extra):
        ds_dir = tmp_path / sub
        bag = T._build_livo_bag(ds_dir, compressed=False)
        # reuse the LIVO helper's bag but run LIO-only for speed
        cfg = {
            "img_enable": 0, "lidar_enable": 1, "max_iteration": 4,
            "filter_size_surf": 0.3, "filter_size_map": 0.3,
            "laser_point_cov": 0.001, "point_filter_num": 1,
            "common": {"lid_topic": "/lidar", "imu_topic": "/imu"},
            "preprocess": {"lidar_type": 1, "scan_line": 6, "blind": 0.1},
            "mapping": {"acc_cov_scale": 1.0, "gyr_cov_scale": 1.0,
                        "extrinsic_T": [0.0, 0.0, 0.0],
                        "extrinsic_R": [1, 0, 0, 0, 1, 0, 0, 0, 1]},
            "capacity": {"map_table_size": 1 << 16, "max_points": 4096,
                         "max_raw_points": 8192, "max_imu_per_group": 64},
        }
        cfg_yaml = ds_dir / "cfg.yaml"
        import yaml as _y

        cfg_yaml.write_text(_y.safe_dump(cfg))
        out = ds_dir / "traj.txt"
        t0 = _time.perf_counter()
        run_mod.main(["--config", str(cfg_yaml), "--bag", str(bag),
                      "--out", str(out), "--no-img"] + extra)
        return np.loadtxt(out), _time.perf_counter() - t0

    fast, _ = go("a", [])
    paced, wall = go("b", ["--rate", "4.0"])
    # 3 s of data at 4x -> >= ~0.7 s of pacing sleep
    assert wall >= 0.6, wall
    np.testing.assert_array_equal(fast, paced)


def test_mesh_sharded_map_cli_end_to_end(tmp_path):
    """`run.py --mesh 8 --sharded-map` (the block-sharded map product
    mode) through the real CLI on the 8-virtual-device mesh."""
    from fastlivo_tpu import run as run_mod

    out = tmp_path / "traj.txt"
    run_mod.main([
        "--config", "/root/reference/config/avia.yaml",
        "--synthetic", "--duration", "2.0", "--no-img",
        "--mesh", "8", "--sharded-map", "--out", str(out),
    ])
    import numpy as np

    traj = np.loadtxt(out)
    assert traj.shape[1] == 8 and len(traj) >= 3
    assert np.all(np.isfinite(traj))


def test_sharded_map_requires_mesh():
    import pytest

    from fastlivo_tpu import run as run_mod

    with pytest.raises(SystemExit):
        run_mod.main([
            "--config", "/root/reference/config/avia.yaml",
            "--synthetic", "--duration", "1", "--no-img",
            "--sharded-map", "--out", "/tmp/x.txt",
        ])
