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
