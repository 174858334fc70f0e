"""All four reference rig configs must load with correct values."""
from pathlib import Path

import numpy as np
import pytest

from fastlivo_tpu import camera as cam_mod
from fastlivo_tpu.config import AVIA, OUST64, load_config

REF = Path("/root/reference/config")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference absent")


def test_avia_yaml():
    cfg = load_config(REF / "avia.yaml", REF / "camera_pinhole.yaml")
    assert cfg.max_iteration == 10
    assert cfg.preprocess.lidar_type == AVIA
    assert cfg.preprocess.n_scans == 6
    assert cfg.preprocess.blind == 4
    assert cfg.preprocess.point_filter_num == 2
    assert cfg.filter_size_surf == 0.15
    assert cfg.filter_size_map == 0.3
    assert cfg.cube_side_length == 20
    assert cfg.grid_size == 40 and cfg.patch_size == 8
    assert cfg.outlier_threshold == 300
    assert cfg.img_point_cov == 100 and cfg.laser_point_cov == 0.001
    assert cfg.mapping.acc_cov_scale == 100 and cfg.mapping.gyr_cov_scale == 10000
    np.testing.assert_allclose(cfg.extrinsic_T, [0.04165, 0.02326, -0.0284])
    assert cfg.lid_topic == "/livox/lidar" and cfg.imu_topic == "/livox/imu"
    assert cfg.img_topic == "/left_camera/image"
    # camera yaml
    assert cfg.camera.width == 640 and cfg.camera.height == 512
    np.testing.assert_allclose(cfg.camera.fx, 431.795259219)
    np.testing.assert_allclose(cfg.camera.d[0], -0.0944205499243979)
    # Rcl is a proper rotation
    R = cfg.Rcl_mat
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_ntu_viral_yaml():
    cfg = load_config(REF / "NTU_VIRAL.yaml", REF / "camera_NTU_VIRAL.yaml")
    assert cfg.preprocess.lidar_type == OUST64
    assert cfg.preprocess.n_scans == 16
    assert cfg.lid_topic == "/os1_cloud_node1/points"
    R = cfg.Rcl_mat
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_mars_lvig_yaml():
    cfg = load_config(REF / "MARS_LVIG.yaml", REF / "camera_MARS_LVIG.yaml")
    assert cfg.preprocess.lidar_type == AVIA
    assert cfg.camera.width > 0


def test_mid360_yaml():
    cfg = load_config(REF / "mid360.yaml", REF / "camera_pinhole.yaml")
    assert cfg.preprocess.lidar_type == AVIA  # mid360 ships as livox type 1
    assert cfg.preprocess.n_scans == 4


def test_camera_model_instantiates_all():
    for cam_yaml in ["camera_pinhole.yaml", "camera_NTU_VIRAL.yaml",
                     "camera_MARS_LVIG.yaml"]:
        cc = cam_mod.load_camera_yaml(REF / cam_yaml)
        cam = cam_mod.from_config(cc)
        import jax.numpy as jnp

        px = cam_mod.world2cam(cam, jnp.asarray([[0.1, -0.05, 2.0]]))
        f = cam_mod.cam2world(cam, px)
        assert np.isfinite(np.asarray(px)).all()
        assert abs(float(jnp.linalg.norm(f[0])) - 1.0) < 1e-5


@pytest.mark.slow
def test_vio_constructs_and_steps_at_all_rig_camera_sizes():
    """Static-shape smoke at each shipped camera geometry (grid dims,
    pack caps, candidate sizes): one fused VIO update on a flat image
    must run without shape/capacity asserts."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from fastlivo_tpu.config import load_config
    from fastlivo_tpu.state import identity_state
    from fastlivo_tpu.vio import Vio

    pairs = [
        ("avia.yaml", "camera_pinhole.yaml"),
        ("NTU_VIRAL.yaml", "camera_NTU_VIRAL.yaml"),
        ("MARS_LVIG.yaml", "camera_MARS_LVIG.yaml"),
    ]
    rng = np.random.default_rng(0)
    for rig, cam in pairs:
        cfg = load_config(f"/root/reference/config/{rig}",
                          f"/root/reference/config/{cam}")
        cfg.capacity = dataclasses.replace(
            cfg.capacity, vmap_points=2048, vmap_table_size=1 << 13,
            frame_ring=4, max_cands=2048, max_raw_points=4096,
        )
        vio = Vio(cfg)
        h, w = cfg.camera.height, cfg.camera.width
        img = rng.uniform(0, 255, (h, w)).astype(np.float32)
        cloud = rng.uniform(2, 10, (512, 3)).astype(np.float32)
        vio.set_last_cloud(cloud)
        s = identity_state()
        out = vio.update(s, s, img)
        assert np.all(np.isfinite(np.asarray(out.pos))), rig
