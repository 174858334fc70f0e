"""Tiled two-level map backend: parity with the hash backend, long-range
coverage, pool allocation/compaction, and churn behavior."""
import numpy as np
import pytest
import jax.numpy as jnp

from fastlivo_tpu.ops import tiled_map as tm
from fastlivo_tpu.ops import voxel_map as vm

rng = np.random.default_rng(0)
DIMS = (32, 32, 16)  # tiles -> spans 128x128x64 voxels
POOL = 512


def _insert(m, pts):
    pad = np.zeros((((len(pts) + 255) // 256) * 256, 3), np.float32)
    pad[: len(pts)] = pts
    mask = np.zeros(len(pad), bool)
    mask[: len(pts)] = True
    return tm.insert(m, jnp.asarray(pad), jnp.asarray(mask))


def test_insert_and_knn_matches_hash_backend():
    pts = rng.uniform(-8, 8, (3000, 3)).astype(np.float32)
    mt = _insert(tm.empty_tiled_map(DIMS, POOL, 0.5), pts)
    mh = vm.empty_map(1 << 14, 0.5)
    pad = np.zeros((3072, 3), np.float32); pad[:3000] = pts
    mask = np.zeros(3072, bool); mask[:3000] = True
    mh = vm.insert(mh, jnp.asarray(pad), jnp.asarray(mask))

    q = jnp.asarray(pts[:512] + 0.03)
    nt_, dt, vt = tm.knn(mt, q, 5, 1)
    nh_, dh, vh = vm.knn(mh, q, 5, 1, 12)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(dh), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(vt), np.asarray(vh))


def test_nearest_to_center_downsample():
    m = tm.empty_tiled_map(DIMS, POOL, 0.5)
    pts = np.array([[0.1, 0.1, 0.1], [0.24, 0.24, 0.24], [0.4, 0.4, 0.4]],
                   np.float32)  # same voxel; middle nearest center (0.25^3)
    m = _insert(m, pts)
    n, d2, v = tm.knn(m, jnp.asarray(pts[:1]), 5, 1)
    kept = np.asarray(n)[0][np.asarray(v)[0]]
    assert len(kept) == 1
    np.testing.assert_allclose(kept[0], pts[1], atol=1e-6)


def test_downsample_across_batches():
    """Stored point survives unless the new batch point is nearer the
    voxel center (ikd_Tree.cpp:391-411)."""
    m = tm.empty_tiled_map(DIMS, POOL, 0.5)
    m = _insert(m, np.array([[0.25, 0.25, 0.26]], np.float32))  # near center
    m = _insert(m, np.array([[0.05, 0.05, 0.05]], np.float32))  # far corner
    n, d2, v = tm.knn(m, jnp.asarray([[0.25, 0.25, 0.25]], np.float32), 5, 1)
    kept = np.asarray(n)[0][np.asarray(v)[0]]
    np.testing.assert_allclose(kept[0], [0.25, 0.25, 0.26], atol=1e-6)
    # now a closer-to-center point replaces it
    m = _insert(m, np.array([[0.251, 0.251, 0.251]], np.float32))
    n, d2, v = tm.knn(m, jnp.asarray([[0.25, 0.25, 0.25]], np.float32), 5, 1)
    kept = np.asarray(n)[0][np.asarray(v)[0]]
    np.testing.assert_allclose(kept[0], [0.251, 0.251, 0.251], atol=1e-6)


def test_long_range_no_alias_thrash():
    """Points 100 m apart (beyond any single-grid dense span at these
    dims) must coexist: the tile directory wraps only at
    dims*8*voxel = 128 m here, so both stay live."""
    m = tm.empty_tiled_map(DIMS, POOL, 0.5)
    a = np.array([[0.1, 0.1, 0.1]], np.float32)
    b = np.array([[100.1, 0.1, 0.1]], np.float32)
    m = _insert(m, a)
    m = _insert(m, b)
    for q in (a, b):
        n, d2, v = tm.knn(m, jnp.asarray(q), 1, 1)
        assert bool(np.asarray(v)[0, 0])
        np.testing.assert_allclose(np.asarray(n)[0, 0], q[0], atol=1e-6)


def test_directory_alias_evicts_stale_tile():
    """Tiles exactly one directory period apart alias; the newer tile
    evicts the older (spatial-LRU, dense_map semantics)."""
    m = tm.empty_tiled_map(DIMS, POOL, 0.5)
    span_x = DIMS[0] * tm.TS * 0.5  # 128 m
    a = np.array([[0.1, 0.1, 0.1]], np.float32)
    b = a + np.array([[span_x, 0, 0]], np.float32)
    m = _insert(m, a)
    m = _insert(m, b)
    n, d2, v = tm.knn(m, jnp.asarray(b), 1, 1)
    assert bool(np.asarray(v)[0, 0])
    n, d2, v = tm.knn(m, jnp.asarray(a), 1, 1)
    assert not bool(np.asarray(v)[0, 0])  # evicted


def test_delete_boxes_and_reinsert():
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    m = _insert(tm.empty_tiled_map(DIMS, POOL, 0.5), pts)
    lo = jnp.asarray([[-10.0, -10.0, -10.0]], jnp.float32)
    hi = jnp.asarray([[0.0, 10.0, 10.0]], jnp.float32)
    m = tm.delete_boxes(m, lo, hi)
    q_del = jnp.asarray([[-3.0, 1.0, 1.0]], jnp.float32)
    n, d2, v = tm.knn(m, q_del, 5, 2)
    # everything near the deleted half-space within radius is gone
    pts_near = pts[(np.abs(pts[:, 0] + 3) < 1.2) & (np.abs(pts[:, 1] - 1) < 1.2)]
    if len(pts_near):
        assert not np.asarray(v).any()
    # reinsert into the deleted region works
    m = _insert(m, np.array([[-3.0, 1.0, 1.0]], np.float32))
    n, d2, v = tm.knn(m, q_del, 1, 1)
    assert bool(np.asarray(v)[0, 0])


def test_pool_exhaustion_drops_and_counts():
    m = tm.empty_tiled_map(DIMS, pool_tiles=4, voxel_size=0.5)
    # 8 widely-separated tiles; only 4 fit
    pts = np.array([[8.0 * i, 0.1, 0.1] for i in range(8)], np.float32)
    m = _insert(m, pts)
    assert int(m.n_alloc) == 4
    assert int(m.n_dropped) == 4


def test_compact_reclaims_dead_tiles():
    m = tm.empty_tiled_map(DIMS, POOL, 0.5)
    pts = rng.uniform(-20, 20, (4000, 3)).astype(np.float32)
    m = _insert(m, pts)
    used0 = int(m.n_alloc)
    assert used0 > 10
    # delete everything with x < 0 -> many dead tiles
    m = tm.delete_boxes(
        m,
        jnp.asarray([[-100.0, -100.0, -100.0]], jnp.float32),
        jnp.asarray([[0.0, 100.0, 100.0]], jnp.float32),
    )
    m2 = tm.compact(m)
    assert int(m2.n_alloc) < used0
    # surviving points still queryable with identical results
    q = jnp.asarray(pts[pts[:, 0] > 1][:256] + 0.01)
    n1, d1, v1 = tm.knn(m, q, 5, 1)
    n2, d2_, v2 = tm.knn(m2, q, 5, 1)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2_), atol=1e-6)


def test_churn_quality_stays_flat():
    """Insert/delete/compact cycles: kNN recall vs brute force must not
    degrade (the VERDICT churn criterion for map maintenance)."""
    m = tm.empty_tiled_map(DIMS, POOL, 0.5)
    live = None
    for cycle in range(6):
        pts = rng.uniform(-10, 10, (1500, 3)).astype(np.float32)
        pts[:, 0] += cycle * 3.0  # drifting window
        m = _insert(m, pts)
        lo = jnp.asarray([[-100.0 + 0, -100, -100]], jnp.float32)
        hi = jnp.asarray([[cycle * 3.0 - 8.0, 100, 100]], jnp.float32)
        m = tm.delete_boxes(m, lo, hi)
        if cycle % 2 == 1:
            m = tm.compact(m)
        live = pts[pts[:, 0] > cycle * 3.0 - 8.0 + 0.6]
    q = jnp.asarray(live[:200])
    n, d2, v = tm.knn(m, q, 1, 1)
    # every recently-inserted live point has a neighbor within the
    # downsample resolution
    assert bool(np.asarray(v)[:, 0].all())
    assert float(np.asarray(d2)[:, 0].max()) < 0.5 ** 2 * 3


def test_lio_update_with_tiled_backend():
    """The LIO iterated EKF converges against the tiled backend (same
    room world and perturbation as the dense-backend test)."""
    from fastlivo_tpu import lio
    from fastlivo_tpu.ops import so3
    from fastlivo_tpu.state import identity_state
    from test_lio import make_room_points, scan_from_pose

    world = make_room_points(step=0.15)
    m = _insert(tm.empty_tiled_map(DIMS, POOL, 0.3), world)
    rot_t = np.asarray(so3.exp(jnp.asarray([0.02, -0.01, 0.08])))
    pos_t = np.array([0.3, -0.2, 1.1])
    scan = scan_from_pose(world, rot_t, pos_t, n=2048)
    s = identity_state()._replace(
        rot=jnp.asarray(
            rot_t @ np.asarray(so3.exp(jnp.asarray([0.008, 0.01, -0.008])))
        ),
        pos=jnp.asarray(pos_t + [0.04, -0.03, 0.02]),
    )
    res = lio.lio_update(
        s, m, jnp.asarray(scan), jnp.ones(2048, bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        laser_point_cov=0.001, max_iter=6, knn_radius=1, max_probe=8,
    )
    assert np.linalg.norm(np.asarray(res.state.pos) - pos_t) < 2e-2
    assert int(res.n_active) > 1500


def test_build_host_matches_device_inserts():
    """Host-side bulk build must answer kNN identically to chunked
    device inserts of the same stream."""
    pts = rng.uniform(-8, 8, (3000, 3)).astype(np.float32)
    md = _insert(tm.empty_tiled_map(DIMS, POOL, 0.5), pts)
    mh = tm.build_host(pts, DIMS, POOL, 0.5)
    q = jnp.asarray(pts[:512] + 0.03)
    nd_, dd, vd = tm.knn(md, q, 5, 1)
    nh_, dh, vh = tm.knn(mh, q, 5, 1)
    np.testing.assert_array_equal(np.asarray(vd), np.asarray(vh))
    np.testing.assert_allclose(np.asarray(dd), np.asarray(dh), atol=1e-6)
    assert int(mh.n_alloc) == int(md.n_alloc)


@pytest.mark.slow
def test_randomized_churn_differential_vs_hash():
    """Randomized insert/delete/query sequence: the tiled backend must
    agree with the hash backend (same downsample-to-voxel-center
    semantics) on every kNN answer after every mutation step."""
    from fastlivo_tpu.ops import voxel_map as vm

    rng = np.random.default_rng(42)
    t = tm.empty_tiled_map((32, 32, 16), 256, 0.5)
    h = vm.empty_map(1 << 14, 0.5)
    for step in range(6):
        pts = rng.uniform(-6, 6, (512, 3)).astype(np.float32)
        mask = rng.uniform(size=512) < 0.9
        t = tm.insert(t, jnp.asarray(pts), jnp.asarray(mask))
        h = vm.insert(h, jnp.asarray(pts), jnp.asarray(mask))
        if step % 2 == 1:
            lo = rng.uniform(-6, 0, (1, 3)).astype(np.float32)
            hi = lo + rng.uniform(0.5, 2.0, (1, 3)).astype(np.float32)
            t = tm.delete_boxes(t, jnp.asarray(lo), jnp.asarray(hi))
            h = vm.delete_boxes(h, jnp.asarray(lo), jnp.asarray(hi))
        q = rng.uniform(-5, 5, (128, 3)).astype(np.float32)
        tn, td2, tv = tm.knn(t, jnp.asarray(q), k=5, radius=1)
        hn, hd2, hv = vm.knn(h, jnp.asarray(q), k=5, radius=1)
        np.testing.assert_array_equal(np.asarray(tv), np.asarray(hv))
        np.testing.assert_allclose(
            np.where(np.asarray(tv), np.asarray(td2), 0.0),
            np.where(np.asarray(hv), np.asarray(hd2), 0.0),
            atol=1e-5,
        )
        # the realized neighbor POINTS agree too (sorted per query)
        tp = np.sort(np.where(np.asarray(tv)[..., None],
                              np.asarray(tn), 0.0), axis=1)
        hp = np.sort(np.where(np.asarray(hv)[..., None],
                              np.asarray(hn), 0.0), axis=1)
        np.testing.assert_allclose(tp, hp, atol=1e-5)


def test_long_excursion_bounded_without_delete_boxes():
    """Map boundedness in the SHIPPED default mode (`slider: ref`),
    where the reference-quirk slider's delete boxes are provably no-ops
    at stock cube sizes (lio.LocalMapTracker docstring): the pool must
    stay bounded by the tiled map's OWN mechanisms alone —

      1. directory WRAP eviction: once the walk exceeds the directory
         span, a new tile aliases the dir cell of the tile one span
         behind and reuses its pool slot (insert's aliased branch;
         the evicted tile's cells self-invalidate by hash mismatch);
      2. load-factor COMPACTION (the pipeline trigger, _maybe_rebuild):
         reclaims slots whose tiles lost every live cell.

    Walk a wall-building sensor 5x the directory span (~1.6 km at a
    256 m span) with the pipeline's 0.85 trigger; the pool must never
    exhaust (no dropped inserts after the warm-up lap), and the map
    must stay queryable around the current position the whole way.
    """
    dims = (64, 64, 16)  # 256 m span at 0.5 m voxels — scaled replica
    pool = 3072          # of the shipped (128,128,64)/16384 ratios
    span_m = dims[0] * 8 * 0.5
    t = tm.empty_tiled_map(dims, pool, 0.5)
    rng = np.random.default_rng(5)
    step_m, n_steps = 8.0, int(5 * span_m / 8.0)  # 1.6 km
    drops_after_warm = 0
    rates = []
    for k in range(n_steps):
        x = k * step_m
        # a wall slab around the sensor: ~60 m ahead/behind, 3 m tall
        pts = np.stack([
            x + rng.uniform(-30, 30, 2048),
            rng.uniform(-10, 10, 2048),
            rng.uniform(0, 3, 2048),
        ], axis=1).astype(np.float32)
        before = int(t.n_dropped)
        t = tm.insert(t, jnp.asarray(pts), jnp.ones(len(pts), bool))
        if k * step_m > span_m:  # past the first wrap
            drops_after_warm += int(t.n_dropped) - before
        if float(t.n_alloc) > 0.85 * pool:  # the pipeline trigger
            t = tm.compact(t)
        assert int(t.n_alloc) <= pool
        # the CURRENT neighborhood must remain fully queryable
        q = np.stack([
            x + rng.uniform(-20, 20, 64),
            rng.uniform(-8, 8, 64),
            rng.uniform(0.5, 2.5, 64),
        ], axis=1).astype(np.float32)
        _, _, valid = tm.knn(t, jnp.asarray(q), k=5, radius=1)
        rates.append(float(np.asarray(valid)[:, 0].mean()))
        # the wall is sparse (~16% voxel fill at this density), so the
        # absolute hit rate sits near 0.85; what boundedness must
        # guarantee is that it NEVER COLLAPSES as the pool churns
        assert rates[-1] > 0.7, f"step {k}: hit rate {rates[-1]}"
    # ... and that steady-state queryability never degrades vs lap 1
    lap = max(n_steps // 5, 1)
    assert np.mean(rates[-lap:]) > np.mean(rates[:lap]) - 0.05, (
        np.mean(rates[:lap]), np.mean(rates[-lap:]))
    assert drops_after_warm == 0, (
        f"{drops_after_warm} points dropped in steady state — pool not "
        "bounded by wrap eviction + compaction alone"
    )


def test_directory_aliasing_batch_insert_keeps_winner_cells():
    """Review-r5 repro: two tiles aliasing one directory cell inside one
    batch. The losing tile's point shares an in-tile cell with one of
    the winner's points; the winner's point must survive (the old
    group-head selection let the alias suppress it silently)."""
    t = tm.empty_tiled_map((4, 4, 4), 16, 0.5)
    # tile A = tile coords (0,0,0); tile B = (4,0,0) aliases A's
    # directory cell at dims=4. a2 and b share in-tile cell (0,0,1).
    a1 = np.array([0.1, 0.1, 0.1], np.float32)        # A, cell (0,0,0)
    a2 = np.array([0.1, 0.1, 0.9], np.float32)        # A, cell (0,0,1)
    b = np.array([16.25, 0.25, 0.75], np.float32)     # B, cell (0,0,1), tiny d2c
    pts = jnp.asarray(np.stack([a1, a2, b]))
    t2 = tm.insert(t, pts, jnp.ones(3, bool))
    live, n = tm.extract_points(t2)
    got = {tuple(np.round(p, 3)) for p in live}
    assert tuple(np.round(a1, 3)) in got, "winner cell (0,0,0) lost"
    assert tuple(np.round(a2, 3)) in got, "winner cell (0,0,1) lost"
    assert n == 2
    assert int(t2.n_dropped) == 1  # the aliasing loser is counted


def test_build_host_directory_aliasing_matches_device():
    """Review-r5 repro: build_host on two directory-aliasing tiles must
    keep the owner's point like sequential device inserts do (the old
    unmasked group-head computation returned 0 live points)."""
    p0 = np.array([[0.1, 0.1, 0.1]], np.float32)   # tile (0,0,0)
    p1 = np.array([[16.1, 0.1, 0.1]], np.float32)  # tile (4,0,0): aliases
    mb = tm.build_host(np.concatenate([p0, p1]), (4, 4, 4), 16, 0.5)
    live_b, n_b = tm.extract_points(mb)

    md = tm.empty_tiled_map((4, 4, 4), 16, 0.5)
    md = tm.insert(md, jnp.asarray(p0), jnp.ones(1, bool))
    md = tm.insert(md, jnp.asarray(p1), jnp.ones(1, bool))
    live_d, n_d = tm.extract_points(md)
    assert n_b == n_d == 1
    np.testing.assert_allclose(live_b, live_d, atol=1e-6)
