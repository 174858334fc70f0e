"""Dense rolling-grid map backend: parity with the hash backend."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastlivo_tpu.ops import dense_map as dm
from fastlivo_tpu.ops import voxel_map as vm

rng = np.random.default_rng(0)
DIMS = (64, 64, 32)


def _insert(m, pts):
    pad = np.zeros((((len(pts) + 255) // 256) * 256, 3), np.float32)
    pad[: len(pts)] = pts
    mask = np.zeros(len(pad), bool)
    mask[: len(pts)] = True
    return dm.insert(m, jnp.asarray(pad), jnp.asarray(mask))


def test_insert_and_knn_matches_hash_backend():
    pts = rng.uniform(-8, 8, (3000, 3)).astype(np.float32)
    md = _insert(dm.empty_dense_map(DIMS, 0.5), pts)
    mh = vm.empty_map(1 << 14, 0.5)
    pad = np.zeros((3072, 3), np.float32); pad[:3000] = pts
    mask = np.zeros(3072, bool); mask[:3000] = True
    mh = vm.insert(mh, jnp.asarray(pad), jnp.asarray(mask))
    assert int(md.count) == int(mh.count)  # same voxel occupancy

    q = jnp.asarray(pts[:512] + 0.03)
    nd_, dd, vd = dm.knn(md, q, 5, 1)
    nh_, dh, vh = vm.knn(mh, q, 5, 1, 12)
    np.testing.assert_allclose(np.asarray(dd), np.asarray(dh), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(vd), np.asarray(vh))


def test_nearest_to_center_downsample():
    m = dm.empty_dense_map(DIMS, 0.5)
    pts = np.array([[0.1, 0.1, 0.1], [0.24, 0.24, 0.24], [0.4, 0.4, 0.4]],
                   np.float32)  # same voxel; middle nearest center (0.25^3)
    m = _insert(m, pts)
    assert int(m.count) == 1
    occ = np.asarray(m.check) != -2147483648
    np.testing.assert_allclose(np.asarray(m.pts)[occ][0], pts[1], atol=1e-6)


def test_aliased_cell_evicts_stale():
    m = dm.empty_dense_map(DIMS, 0.5)
    # two voxels one grid period apart in x: 64 * 0.5 = 32 m
    m = _insert(m, np.array([[0.1, 0.1, 0.1]], np.float32))
    m = _insert(m, np.array([[32.1, 0.1, 0.1]], np.float32))
    # newer occupant wins the shared cell
    q = jnp.asarray(np.array([[32.1, 0.1, 0.1]], np.float32))
    _, d2, valid = dm.knn(m, q, 1, 1)
    assert bool(valid[0, 0]) and float(d2[0, 0]) < 1e-6
    q0 = jnp.asarray(np.array([[0.1, 0.1, 0.1]], np.float32))
    _, _, valid0 = dm.knn(m, q0, 1, 1)
    assert not bool(valid0[0, 0])  # stale voxel gone


def test_delete_boxes_dense():
    pts = rng.uniform(-8, 8, (2000, 3)).astype(np.float32)
    m = _insert(dm.empty_dense_map(DIMS, 0.5), pts)
    m2 = dm.delete_boxes(m, jnp.asarray([[-10, -10, -10]], jnp.float32),
                         jnp.asarray([[0, 10, 10]], jnp.float32))
    occ = np.asarray(m2.check) != -2147483648
    stored = np.asarray(m2.pts)[occ]
    assert np.all(stored[:, 0] > -0.5)
    assert int(m2.count) == occ.sum()


def test_lio_update_with_dense_backend():
    from fastlivo_tpu import lio
    from fastlivo_tpu.ops import so3
    from fastlivo_tpu.state import identity_state
    from test_lio import make_room_points, scan_from_pose

    world = make_room_points(step=0.15)
    m = _insert(dm.empty_dense_map((128, 128, 32), 0.3), world)
    rot_t = np.asarray(so3.exp(jnp.asarray([0.02, -0.01, 0.08])))
    pos_t = np.array([0.3, -0.2, 1.1])
    scan = scan_from_pose(world, rot_t, pos_t, n=2048)
    s = identity_state()._replace(
        rot=jnp.asarray(rot_t @ np.asarray(so3.exp(jnp.asarray([0.008, 0.01, -0.008])))),
        pos=jnp.asarray(pos_t + [0.04, -0.03, 0.02]),
    )
    res = lio.lio_update(
        s, m, jnp.asarray(scan), jnp.ones(2048, bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        laser_point_cov=0.001, max_iter=6, knn_radius=1,
    )
    assert np.linalg.norm(np.asarray(res.state.pos) - pos_t) < 2e-2
    assert int(res.n_active) > 1500


def test_build_host_matches_bulk_device_insert():
    pts = rng.uniform(-8, 8, (3000, 3)).astype(np.float32)
    pad = np.zeros((3072, 3), np.float32); pad[:3000] = pts
    mask = np.zeros(3072, bool); mask[:3000] = True
    md = dm.insert(dm.empty_dense_map(DIMS, 0.5), jnp.asarray(pad),
                   jnp.asarray(mask))
    mh = dm.build_host(pts, DIMS, 0.5)
    assert int(mh.count) == int(md.count)
    q = jnp.asarray(pts[:512] + 0.03)
    nd_, dd, vd = dm.knn(md, q, 5, 1)
    nh_, dh, vh = dm.knn(mh, q, 5, 1)
    np.testing.assert_array_equal(np.asarray(vd), np.asarray(vh))
    np.testing.assert_allclose(np.asarray(dd), np.asarray(dh), atol=1e-6)
