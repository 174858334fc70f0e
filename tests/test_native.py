"""Native (C++) ingestion kernels vs the numpy reference implementations."""
import numpy as np
import pytest

from fastlivo_tpu import native
from fastlivo_tpu import preprocess as pp
from fastlivo_tpu.config import AVIA, PreprocessConfig
from fastlivo_tpu.ops.voxel_filter import voxel_downsample

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library not built"
)

LIVOX_DT = np.dtype([("offset_time", "<u4"), ("x", "<f4"), ("y", "<f4"),
                     ("z", "<f4"), ("reflectivity", "u1"), ("tag", "u1"),
                     ("line", "u1")])


def test_decode_avia_matches_numpy():
    rng = np.random.default_rng(0)
    N = 5000
    arr = np.zeros(N, LIVOX_DT)
    xyz = rng.uniform(-10, 10, (N, 3)).astype(np.float32)
    arr["x"], arr["y"], arr["z"] = xyz.T
    arr["offset_time"] = np.arange(N) * 4000
    arr["reflectivity"] = rng.integers(0, 255, N)
    arr["tag"] = rng.choice([0x00, 0x10, 0x20, 0x30], N)
    arr["line"] = rng.integers(0, 8, N)
    cfg = PreprocessConfig(lidar_type=AVIA, n_scans=6, blind=2.0,
                           point_filter_num=3)
    got = native.decode_avia_native(arr, cfg.n_scans, cfg.blind,
                                    cfg.point_filter_num)
    ref_pts, ref_t = pp.decode_avia(
        xyz.astype(np.float64), arr["reflectivity"].astype(np.float32),
        arr["tag"], arr["line"], arr["offset_time"].astype(np.float64), cfg,
    )
    assert got is not None
    np.testing.assert_allclose(got[0], ref_pts, rtol=1e-6)
    np.testing.assert_allclose(got[1], ref_t, atol=1e-12)


def test_voxel_downsample_matches_numpy():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, (20000, 4)).astype(np.float32)
    got = native.voxel_downsample_native(pts, 0.4)
    ref, _ = voxel_downsample(pts, 0.4)
    assert got is not None
    out, mask = got
    assert mask.sum() == len(ref)
    # same first-occurrence order, same centroids
    np.testing.assert_allclose(out[: len(ref)], ref, rtol=1e-5, atol=1e-4)
