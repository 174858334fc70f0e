"""End-to-end pipeline runs with all four UNMODIFIED reference rig
configs (the benchmark suite of SURVEY §6: avia, mid360, NTU-VIRAL,
MARS-LVIG), LIO-only on synthetic data — exercising each rig's
extrinsics, noise scales, EKF iteration budget, and filter sizes
through the real config loader."""
import numpy as np
import pytest

from fastlivo_tpu.config import load_config
from fastlivo_tpu.io.synthetic import SyntheticDataset
from fastlivo_tpu.pipeline import Pipeline

RIGS = ["avia", "mid360", "NTU_VIRAL", "MARS_LVIG"]

pytestmark = pytest.mark.slow  # 4-rig end-to-end tracking (full tier)


@pytest.mark.parametrize("rig", RIGS)
def test_rig_config_lio_tracks(rig):
    cfg = load_config(f"/root/reference/config/{rig}.yaml")
    cfg.img_enable = False
    # shrink capacities so four rigs stay fast on one CPU core, but keep
    # every rig-specific estimator parameter from the YAML
    import dataclasses

    cfg.capacity = dataclasses.replace(
        cfg.capacity,
        map_backend="tiled",
        tiled_dir_dims=(32, 32, 16),
        tiled_pool=1024,
        max_points=4096,
        max_raw_points=8192,
        max_imu_per_group=64,
    )
    ds = SyntheticDataset(duration=4.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=13,
                          lid_rot=cfg.extrinsic_R, lid_off=cfg.extrinsic_T)
    pipe = Pipeline(cfg)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    outs = pipe.spin()
    assert len(outs) > 20, rig
    base = ds.traj.base_pos
    errs = []
    for o in outs:
        if o.t < ds.traj.t_static + 0.5:
            continue
        _, pos_gt = ds.traj.pose(o.t)
        errs.append(np.linalg.norm(o.pos - (pos_gt - base)))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.05, f"{rig}: ATE {ate:.4f} m"


def test_ntu_viral_rig_livo_tracks():
    """Full LIVO on the NTU-VIRAL rig's UNMODIFIED yaml pair: 752x480
    with strong radtan distortion (k1 = -0.288) and a grid that does
    NOT divide the image (752/40 -> gw 18) — geometry no other test
    exercises. The synthetic camera renders with the rig's true
    intrinsics/extrinsics."""
    cfg = load_config("/root/reference/config/NTU_VIRAL.yaml",
                      "/root/reference/config/camera_NTU_VIRAL.yaml")
    import dataclasses

    cfg.capacity = dataclasses.replace(
        cfg.capacity,
        map_backend="tiled", tiled_dir_dims=(32, 32, 16),
        tiled_pool=1024, max_points=4096, max_raw_points=8192,
        max_imu_per_group=64, vmap_points=8192,
        vmap_table_size=1 << 15, frame_ring=16, max_cands=4096,
    )
    cam = cfg.camera
    ds = SyntheticDataset(
        duration=3.5, points_per_scan=4096, lidar_noise=0.004, seed=13,
        lid_rot=cfg.extrinsic_R, lid_off=cfg.extrinsic_T,
        cam_hz=10.0, cam_size=(cam.width, cam.height), cam_f=cam.fx,
        cam_fy=cam.fy, cam_c=(cam.cx, cam.cy),
        cam_d=np.asarray(cam.d[:4]), Rcl=cfg.Rcl_mat, Pcl=cfg.Pcl_vec,
    )
    pipe = Pipeline(cfg)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    for t, img in ds.images():
        pipe.push_img(t, img)
    outs = pipe.spin() + pipe.finish()
    assert len(outs) >= 20
    assert pipe.vio is not None and pipe.vio.fid > 20  # VIO frames ran
    base = ds.traj.base_pos
    errs = [
        np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
        for o in outs if o.t >= ds.traj.t_static + 0.5
    ]
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.08, f"NTU-VIRAL LIVO ATE {ate:.4f} m"
    # the camera leg must actually have engaged at some point
    assert int(pipe.vio.vmap.n_pts) > 20


def test_mars_lvig_rig_livo_tracks():
    """Full LIVO on the MARS-LVIG rig's UNMODIFIED yaml pair: the
    suite's largest camera (1224x1024; grid 1224/40 -> gw 30, height
    1024/40 -> gh 25) with positive-k radtan — completes the
    camera-rig matrix (avia 640x512 and NTU 752x480 covered above)."""
    cfg = load_config("/root/reference/config/MARS_LVIG.yaml",
                      "/root/reference/config/camera_MARS_LVIG.yaml")
    import dataclasses

    cfg.capacity = dataclasses.replace(
        cfg.capacity,
        map_backend="tiled", tiled_dir_dims=(32, 32, 16),
        tiled_pool=1024, max_points=4096, max_raw_points=8192,
        max_imu_per_group=64, vmap_points=8192,
        vmap_table_size=1 << 15, frame_ring=8, max_cands=4096,
    )
    cam = cfg.camera
    ds = SyntheticDataset(
        duration=3.0, points_per_scan=4096, lidar_noise=0.004, seed=13,
        lid_rot=cfg.extrinsic_R, lid_off=cfg.extrinsic_T,
        cam_hz=10.0, cam_size=(cam.width, cam.height), cam_f=cam.fx,
        cam_fy=cam.fy, cam_c=(cam.cx, cam.cy),
        cam_d=np.asarray(cam.d[:4]), Rcl=cfg.Rcl_mat, Pcl=cfg.Pcl_vec,
    )
    pipe = Pipeline(cfg)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    for t, img in ds.images():
        pipe.push_img(t, img)
    outs = pipe.spin() + pipe.finish()
    assert len(outs) >= 15
    assert pipe.vio is not None and pipe.vio.fid > 15
    base = ds.traj.base_pos
    errs = [
        np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
        for o in outs if o.t >= ds.traj.t_static + 0.5
    ]
    ate = np.sqrt(np.mean(np.square(errs)))
    assert ate < 0.08, f"MARS-LVIG LIVO ATE {ate:.4f} m"
    assert int(pipe.vio.vmap.n_pts) > 20
