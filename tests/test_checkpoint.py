"""Checkpoint save/load roundtrip + voxel-map rebuild after churn."""
import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.io import checkpoint as ckpt
from fastlivo_tpu.ops import voxel_map as vm
from fastlivo_tpu.state import identity_state
from fastlivo_tpu import visual_map as vmap_mod


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = vm.empty_map(1 << 12, 0.4)
    pts = rng.uniform(-5, 5, (1024, 3)).astype(np.float32)
    m = vm.insert(m, jnp.asarray(pts), jnp.ones(1024, bool))
    s = identity_state()._replace(pos=jnp.asarray([1.0, 2.0, 3.0]))
    vmap = vmap_mod.empty_visual_map(n_points=64, n_obs=4, table_size=1 << 8,
                                     voxel_cap=4, ring=2, height=8, width=8)
    p = tmp_path / "ck.npz"
    ckpt.save(p, s, m, vmap)
    s2, m2, v2, cal2 = ckpt.load(p)
    np.testing.assert_allclose(np.asarray(s2.pos), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(s2.cov), np.asarray(s.cov))
    assert int(m2.count) == int(m.count)
    np.testing.assert_array_equal(np.asarray(m2.check), np.asarray(m.check))
    assert v2 is not None and v2.pos.shape == (64, 3)
    # loaded map still answers queries identically
    q = jnp.asarray(pts[:256])
    n1, d1, v1 = vm.knn(m, q, 5, 1, 8)
    n2, d2, vv2 = vm.knn(m2, q, 5, 1, 8)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_rebuild_compacts_after_churn():
    """Delete/insert cycles fragment probe chains; rebuild must restore a
    clean table with identical query behavior."""
    rng = np.random.default_rng(1)
    m = vm.empty_map(1 << 11, 0.5)
    for k in range(6):
        pts = rng.uniform(-6, 6, (512, 3)).astype(np.float32)
        m = vm.insert(m, jnp.asarray(pts), jnp.ones(512, bool))
        lo = jnp.asarray([[-7.0 + k, -7, -7]], jnp.float32)
        hi = jnp.asarray([[-3.0 + k, 7, 7]], jnp.float32)
        m = vm.delete_boxes(m, lo, hi)
    m3 = vm.rebuild(m)
    occ_m = (np.asarray(m.check) != -2147483648).sum()
    occ_3 = (np.asarray(m3.check) != -2147483648).sum()
    assert occ_3 <= occ_m  # duplicates removed
    assert int(m3.count) == occ_3
    # same stored point set
    sm = np.asarray(m.pts)[np.asarray(m.check) != -2147483648]
    s3 = np.asarray(m3.pts)[np.asarray(m3.check) != -2147483648]
    a = set(map(tuple, np.round(sm, 4)))
    b = set(map(tuple, np.round(s3, 4)))
    assert b <= a  # rebuild never invents points
    # rebuild keeps exactly one entry per occupied voxel (duplicates from
    # hole-fragmented probe chains are merged)
    uniq_voxels = len(np.unique(np.floor(sm / 0.5).astype(np.int64), axis=0))
    assert occ_3 == uniq_voxels


def test_tiled_map_roundtrip(tmp_path):
    """The default (tiled) backend must checkpoint/restore losslessly."""
    import numpy as np
    import jax.numpy as jnp
    from fastlivo_tpu.io import checkpoint
    from fastlivo_tpu.ops import tiled_map as tm
    from fastlivo_tpu.state import identity_state

    rng = np.random.default_rng(0)
    pts = rng.uniform(-8, 8, (1024, 3)).astype(np.float32)
    m = tm.insert(tm.empty_tiled_map((32, 32, 16), 256, 0.5),
                  jnp.asarray(pts), jnp.ones(1024, bool))
    p = tmp_path / "ck.npz"
    checkpoint.save(p, identity_state(), m)
    _, m2, _, _ = checkpoint.load(p)
    assert isinstance(m2, tm.TiledMap)
    q = jnp.asarray(pts[:128] + 0.01)
    n1, d1, v1 = tm.knn(m, q, 5, 1)
    n2, d2, v2 = tm.knn(m2, q, 5, 1)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_warm_restart_continues_tracking(tmp_path):
    """TRUE warm restart: run half a stream, --save-ckpt (incl. the IMU
    calibration), restore into a FRESH pipeline, continue the remaining
    stream. The restored process must skip the 200-sample static IMU
    init, engage the EKF on the first frame, and keep tracking ground
    truth across the restart boundary."""
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline_lio import small_config
    from fastlivo_tpu.io.synthetic import SyntheticDataset
    from fastlivo_tpu.pipeline import Pipeline

    ds = SyntheticDataset(duration=6.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=4)
    scans = list(ds.lidar_scans_fast())
    imus = list(ds.imu_stream())
    T_SPLIT = 3.0

    a = Pipeline(small_config())
    for beg, pts, t_rel in scans:
        if beg < T_SPLIT:
            a.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in imus:
        if t < T_SPLIT + 0.05:  # close A's final scan group (end 3.0)
            a.push_imu(t, acc, gyr)
    outs_a = a.spin() + a.finish()
    assert len(outs_a) >= 15 and a.init_done
    p = tmp_path / "warm.npz"
    ckpt.save(p, a.state, a.map, None, calib=a.calib)

    b = Pipeline(small_config())
    b.warm_start(*ckpt.load(p))
    assert b.init_done and b.calib is not None and b.map_built
    for beg, pts, t_rel in scans:
        if beg >= T_SPLIT:
            b.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in imus:
        if t >= T_SPLIT:
            b.push_imu(t, acc, gyr)
    outs_b = b.spin() + b.finish()
    # every post-split scan frame produced output (no re-init window)
    n_scans_b = sum(1 for beg, _, _ in scans if beg >= T_SPLIT)
    assert len(outs_b) >= n_scans_b - 1
    base = ds.traj.base_pos
    errs = [
        np.linalg.norm(o.pos - (ds.traj.pose(o.t)[1] - base))
        for o in outs_b
    ]
    # tracking continues across the boundary, incl. the FIRST frames
    assert np.max(errs[:5]) < 0.05, errs[:5]
    assert np.sqrt(np.mean(np.square(errs))) < 0.03, "warm restart drifted"
