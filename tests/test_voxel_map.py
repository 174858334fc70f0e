import jax.numpy as jnp
import numpy as np
import pytest

from fastlivo_tpu.ops import voxel_map as vm

rng = np.random.default_rng(3)
TBL = 1 << 12


def _insert(m, pts):
    pts = jnp.asarray(np.asarray(pts, dtype=np.float32))
    return vm.insert(m, pts, jnp.ones(pts.shape[0], dtype=bool))


def test_insert_and_count():
    m = vm.empty_map(TBL, 0.5)
    pts = rng.uniform(-10, 10, size=(500, 3))
    m = _insert(m, pts)
    vox = np.unique(np.floor(pts / 0.5).astype(np.int32), axis=0)
    assert int(m.count) == len(vox)


def test_downsample_keeps_nearest_to_center():
    m = vm.empty_map(TBL, 1.0)
    # two points in voxel (0,0,0): center (0.5,0.5,0.5)
    pts = np.array([[0.9, 0.9, 0.9], [0.6, 0.5, 0.5]], dtype=np.float32)
    m = _insert(m, pts)
    assert int(m.count) == 1
    stored = np.asarray(m.pts)[np.asarray(m.check) != -2147483648]
    np.testing.assert_allclose(stored[0], [0.6, 0.5, 0.5])


def test_downsample_across_batches():
    m = vm.empty_map(TBL, 1.0)
    m = _insert(m, np.array([[0.9, 0.9, 0.9]]))
    m = _insert(m, np.array([[0.45, 0.55, 0.5]]))  # nearer center, replaces
    m = _insert(m, np.array([[0.99, 0.01, 0.01]]))  # farther, ignored
    assert int(m.count) == 1
    stored = np.asarray(m.pts)[np.asarray(m.check) != -2147483648]
    np.testing.assert_allclose(stored[0], [0.45, 0.55, 0.5])


def test_knn_matches_bruteforce():
    m = vm.empty_map(TBL, 0.4)
    pts = rng.uniform(-4, 4, size=(800, 3)).astype(np.float32)
    m = _insert(m, pts)
    occ = np.asarray(m.check) != -2147483648
    stored = np.asarray(m.pts)[occ]
    q = rng.uniform(-3, 3, size=(64, 3)).astype(np.float32)
    neigh, d2, nvalid = vm.knn(m, jnp.asarray(q), k=5, radius=2)
    neigh, d2, nvalid = map(np.asarray, (neigh, d2, nvalid))
    # any neighbor within (radius-1)*voxel of the query is guaranteed to
    # fall in a covered voxel regardless of in-voxel position
    max_r = (2 - 1) * 0.4
    for i in range(64):
        bf = np.sort(np.sum((stored - q[i]) ** 2, axis=-1))[:5]
        got = np.sort(d2[i][nvalid[i]])
        # every true neighbor closer than the guaranteed coverage radius
        # must be found exactly
        covered = bf[bf <= max_r**2]
        np.testing.assert_allclose(got[: len(covered)], covered, rtol=1e-4)


def test_knn_empty_regions_invalid():
    m = vm.empty_map(TBL, 0.5)
    m = _insert(m, np.zeros((1, 3)) + 0.25)
    q = jnp.asarray(np.array([[100.0, 100, 100]], dtype=np.float32))
    _, _, nvalid = vm.knn(m, q, k=5)
    assert not np.any(np.asarray(nvalid))


def test_delete_boxes():
    m = vm.empty_map(TBL, 0.5)
    pts = rng.uniform(-5, 5, size=(400, 3)).astype(np.float32)
    m = _insert(m, pts)
    lo = jnp.asarray(np.array([[-10, -10, -10]], dtype=np.float32))
    hi = jnp.asarray(np.array([[0, 10, 10]], dtype=np.float32))
    m2 = vm.delete_boxes(m, lo, hi)
    occ = np.asarray(m2.check) != -2147483648
    stored = np.asarray(m2.pts)[occ]
    # every surviving voxel center is x > 0
    assert np.all(stored[:, 0] > -0.5)
    assert int(m2.count) == occ.sum()


@pytest.mark.slow
def test_rebuild_preserves_points():
    m = vm.empty_map(TBL, 0.5)
    pts = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    m = _insert(m, pts)
    m2 = vm.rebuild(m)
    assert int(m2.count) == int(m.count)
    occ1 = np.asarray(m.check) != -2147483648
    occ2 = np.asarray(m2.check) != -2147483648
    s1 = np.asarray(m.pts)[occ1]
    s2 = np.asarray(m2.pts)[occ2]
    s1 = s1[np.lexsort(s1.T)]
    s2 = s2[np.lexsort(s2.T)]
    np.testing.assert_allclose(s1, s2)


def test_insert_after_delete_still_queryable():
    m = vm.empty_map(1 << 10, 0.5)  # smallish table to force collisions
    pts = rng.uniform(-3, 3, size=(150, 3)).astype(np.float32)
    m = _insert(m, pts)
    m = vm.delete_boxes(
        m,
        jnp.asarray(np.array([[-3, -3, -3]], dtype=np.float32)),
        jnp.asarray(np.array([[0, 0, 0]], dtype=np.float32)),
    )
    pts2 = rng.uniform(-3, 3, size=(150, 3)).astype(np.float32)
    m = _insert(m, pts2)
    # all inserted batch-2 points must be findable as their own neighbors
    neigh, d2, nvalid = vm.knn(m, jnp.asarray(pts2), k=1, radius=1)
    assert np.all(np.asarray(nvalid)[:, 0])
    assert np.all(np.asarray(d2)[:, 0] < 0.75)


def test_mix64_np_matches_device():
    # the host twin must be bit-identical: build_host uses it for check
    # hashes that device-side lookups later compare against
    keys = rng.integers(-(1 << 20), 1 << 20, size=(4096, 3)).astype(np.int32)
    keys[:8] = [[0, 0, 0], [1, 0, 0], [-1, -1, -1],
                [2**31 - 1 >> 12, 0, 5], [7, -7, 7],
                [1 << 19, -(1 << 19), 3], [42, 42, 42], [-1, 0, 1]]
    dev = np.asarray(vm._mix64(jnp.asarray(keys)))
    host = vm._mix64_np(keys)
    assert dev.dtype == host.dtype == np.uint32
    np.testing.assert_array_equal(dev, host)


def test_sentinels_are_host_scalars():
    """Regression guard for the relay-taint rules (voxel_map._mix64_np):
    module-level sentinels must be HOST (numpy) scalars — as device
    scalars, any host-side int()/comparison is a D2H readback, and the
    first D2H permanently degrades the relay session's dispatch floor
    ~500x. (jnp scalars would still compute correctly, which is why only
    a type check catches the regression.)"""
    from fastlivo_tpu import visual_map as vmap_mod

    for name, v in (("voxel_map.EMPTY_CHECK", vm.EMPTY_CHECK),
                    ("voxel_map.BIG", vm.BIG),
                    ("visual_map.EMPTY", vmap_mod.EMPTY)):
        assert isinstance(v, np.generic), (
            f"{name} is {type(v)}; must be a numpy scalar (host-side)")
