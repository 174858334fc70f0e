"""SoA visual map tests: point/obs lifecycle, voxel index, ref selection."""
import numpy as np
import jax.numpy as jnp

from fastlivo_tpu import visual_map as vmap


def small_map():
    return vmap.empty_visual_map(
        n_points=256, n_obs=4, table_size=1 << 10, voxel_cap=4, ring=4,
        height=32, width=40,
    )


def id_pose():
    return jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)


def test_add_points_and_voxel_lookup():
    m = small_map()
    pts = jnp.asarray([
        [0.1, 0.1, 0.1],
        [0.2, 0.2, 0.2],   # same 0.5-voxel
        [3.0, 3.0, 3.0],   # different voxel
        [9.9, 9.9, 9.9],   # masked out
    ], jnp.float32)
    rcw, pcw = id_pose()
    m = vmap.add_points(
        m, pts, jnp.zeros((4, 2)),
        rcw, pcw, jnp.asarray([5., 6., 7., 8.]), jnp.int32(0),
        jnp.asarray([True, True, True, False]),
    )
    assert int(m.n_pts) == 3
    np.testing.assert_allclose(np.asarray(m.pos[:3]), np.asarray(pts[:3]))
    idx, valid = vmap.gather_voxel_points(
        m, jnp.asarray([[0, 0, 0], [6, 6, 6], [9, 9, 9]], jnp.int32),
        jnp.ones(3, bool),
    )
    # voxel (0,0,0) holds points 0 and 1
    got0 = set(np.asarray(idx[0])[np.asarray(valid[0])].tolist())
    assert got0 == {0, 1}
    got1 = set(np.asarray(idx[1])[np.asarray(valid[1])].tolist())
    assert got1 == {2}
    assert not np.any(np.asarray(valid[2]))  # empty voxel


def test_add_points_capacity_drop():
    m = small_map()
    rcw, pcw = id_pose()
    B = 300  # exceeds NP=256
    pts = jnp.asarray(np.random.default_rng(0).uniform(0, 50, (B, 3)), jnp.float32)
    m = vmap.add_points(
        m, pts, jnp.zeros((B, 2)), rcw, pcw,
        jnp.zeros(B), jnp.int32(0), jnp.ones(B, bool),
    )
    assert int(m.n_pts) == 256


def test_observation_ring_and_eviction():
    m = small_map()
    rcw, pcw = id_pose()
    pts = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    m = vmap.add_points(
        m, pts, jnp.zeros((1, 2)), rcw, pcw,
        jnp.asarray([5.0]), jnp.int32(0), jnp.ones(1, bool),
    )
    # add 5 more obs from different camera positions (ring cap 4)
    for k in range(1, 6):
        pcw_k = jnp.asarray([-float(k), 0.0, 0.0], jnp.float32)  # campos (k,0,0)
        m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(k))
        m = vmap.add_observations(
            m, jnp.asarray([0], jnp.int32), jnp.asarray([[k * 2.0, 0.0]]),
            rcw, pcw_k, jnp.asarray([9.0]),
            jnp.int32(k), jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
        )
    assert int(m.n_obs[0]) == 4  # capped
    # newest obs (fid=5) must be present
    assert 5 in np.asarray(m.obs_fid[0]).tolist()


def test_close_view_obs_picks_best_angle():
    m = small_map()
    rcw, _ = id_pose()
    pt = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(0))
    # first obs from camera at origin (dir (0,0,-1) from point)
    m = vmap.add_points(
        m, pt, jnp.zeros((1, 2)), rcw,
        jnp.zeros(3, jnp.float32), jnp.asarray([1.0]), jnp.int32(0),
        jnp.ones(1, bool),
    )
    # second obs from the side (campos (4, 0, 5)): dir (1,0,0)
    rcw2 = jnp.eye(3, dtype=jnp.float32)
    pcw2 = -(rcw2 @ jnp.asarray([4.0, 0.0, 5.0], jnp.float32))
    m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(1))
    m = vmap.add_observations(
        m, jnp.asarray([0], jnp.int32), jnp.asarray([[7.0, 8.0]]),
        rcw2, pcw2, jnp.asarray([2.0]),
        jnp.int32(1), jnp.ones(1, jnp.int32), jnp.ones(1, bool),
    )
    # current camera near origin -> first obs is closest in angle
    ref = vmap.close_view_obs(m, jnp.asarray([0], jnp.int32),
                              jnp.asarray([0.5, 0.0, 0.1], jnp.float32))
    assert bool(ref["ok"][0])
    assert int(ref["fid"][0]) == 0
    # current camera from the side -> second obs wins
    ref2 = vmap.close_view_obs(m, jnp.asarray([0], jnp.int32),
                               jnp.asarray([4.0, 0.2, 5.0], jnp.float32))
    assert int(ref2["fid"][0]) == 1
    # perpendicular view (> 60 deg from both) -> rejected
    ref3 = vmap.close_view_obs(m, jnp.asarray([0], jnp.int32),
                               jnp.asarray([0.0, 6.0, 5.0], jnp.float32))
    assert not bool(ref3["ok"][0])


def test_referenced_image_survives_pool_churn():
    """shared_ptr retention parity (feature.h:40): an image stays in the
    pool as long as a live observation references it, however many
    frames later — push_image only reuses DEAD slots."""
    m = small_map()  # pool of 4
    rcw, pcw = id_pose()
    m = vmap.push_image(m, jnp.full((32, 40), 7.0), jnp.int32(0))
    m = vmap.add_points(
        m, jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32), jnp.zeros((1, 2)),
        rcw, pcw, jnp.asarray([1.0]),
        jnp.int32(0), jnp.ones(1, bool),
    )
    # push 12 unreferenced images (3x the pool size): they must churn
    # through the 3 dead slots and never touch fid 0's
    for k in range(1, 13):
        m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(k))
    ref = vmap.close_view_obs(m, jnp.asarray([0], jnp.int32),
                              jnp.asarray([0.0, 0.0, 0.0], jnp.float32))
    assert bool(ref["ok"][0])
    slot = int(ref["slot"][0])
    assert int(m.img_fid[slot]) == 0
    assert float(m.imgs[slot, 0, 0]) == 7.0


def test_pool_saturation_evicts_oldest():
    """Only when every slot is live-referenced does the pool evict (LRU)
    — the single bounded-memory divergence from the reference."""
    m = small_map()  # pool of 4
    rcw, pcw = id_pose()
    for k in range(4):
        m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(k))
        m = vmap.add_points(
            m, jnp.asarray([[float(k), 0.0, 5.0]], jnp.float32),
            jnp.zeros((1, 2)), rcw, pcw, jnp.asarray([1.0]),
            jnp.int32(k), jnp.ones(1, bool),
        )
    m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(4))
    # fid 0 (oldest live) was evicted -> point 0's obs is unusable
    ref0 = vmap.close_view_obs(m, jnp.asarray([0], jnp.int32),
                               jnp.asarray([0.0, 0.0, 0.0], jnp.float32))
    assert not bool(ref0["ok"][0])
    # fids 1-3 survive
    for k in range(1, 4):
        refk = vmap.close_view_obs(
            m, jnp.asarray([k], jnp.int32),
            jnp.asarray([float(k), 0.0, 0.0], jnp.float32),
        )
        assert bool(refk["ok"][0]), k


def test_push_image_idempotent_slot():
    """Re-pushing the same fid reuses its slot instead of burning a
    second one."""
    m = small_map()
    m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(5))
    m = vmap.push_image(m, jnp.full((32, 40), 3.0), jnp.int32(5))
    assert int(jnp.sum(m.img_fid == 5)) == 1
    assert int(jnp.sum(m.img_fid >= 0)) == 1


def test_pool_allocation_survives_huge_fids():
    """The eviction key is RANK-based, so allocation stays correct for
    arbitrarily large frame ids (the old fid-packed key assumed
    fid < 2^22 ~ 116 h of 10 Hz frames; ADVICE r4)."""
    big = 1 << 30  # far beyond the old packing's safe range
    m = small_map()  # pool of 4
    rcw, pcw = id_pose()
    m = vmap.push_image(m, jnp.full((32, 40), 7.0), jnp.int32(big))
    m = vmap.add_points(
        m, jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32), jnp.zeros((1, 2)),
        rcw, pcw, jnp.asarray([1.0]), jnp.int32(big), jnp.ones(1, bool),
    )
    # churn 12 unreferenced huge-fid images: the live slot must survive
    for k in range(1, 13):
        m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(big + k))
    ref = vmap.close_view_obs(m, jnp.asarray([0], jnp.int32),
                              jnp.asarray([0.0, 0.0, 0.0], jnp.float32))
    assert bool(ref["ok"][0])
    assert float(m.imgs[int(ref["slot"][0]), 0, 0]) == 7.0


def test_compact_reclaims_capacity_and_keeps_queries():
    """visual_map.compact drops far points, keeps near ones, and the
    rebuilt voxel index answers gather_voxel_points identically for the
    surviving content."""
    import jax.numpy as jnp
    import numpy as np

    from fastlivo_tpu import visual_map as vmap_mod

    m = vmap_mod.empty_visual_map(
        n_points=512, n_obs=4, table_size=1 << 12, voxel_cap=8, ring=4,
        height=32, width=32,
    )
    rng = np.random.default_rng(0)
    near = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    far = rng.uniform(50, 60, (100, 3)).astype(np.float32)
    pts = np.concatenate([near, far])
    B = len(pts)
    m = vmap_mod.add_points(
        m, jnp.asarray(pts), jnp.zeros((B, 2), jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.ones(B, jnp.float32),
        jnp.int32(0), jnp.ones(B, bool),
    )
    assert int(m.n_pts) == 200
    m2 = vmap_mod.compact(m, jnp.zeros(3, jnp.float32), jnp.float32(10.0))
    assert int(m2.n_pts) == 100
    # surviving points sit at the front, positions preserved
    np.testing.assert_allclose(np.asarray(m2.pos[:100]), near, atol=1e-6)
    # the rebuilt index resolves every near voxel to its points
    vox = np.unique(np.floor(near / vmap_mod.VOXEL_SIZE).astype(np.int32),
                    axis=0)
    pad = np.zeros((128, 3), np.int32)
    pad[: len(vox)] = vox
    vmask = np.zeros(128, bool)
    vmask[: len(vox)] = True
    idx, valid = vmap_mod.gather_voxel_points(
        m2, jnp.asarray(pad), jnp.asarray(vmask)
    )
    got = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert got == set(range(100)), (len(got), min(got, default=-1))
    # far voxels resolve to nothing
    fvox = np.unique(np.floor(far / vmap_mod.VOXEL_SIZE).astype(np.int32),
                     axis=0)
    pad[: len(fvox)] = fvox[:128]
    idx, valid = vmap_mod.gather_voxel_points(
        m2, jnp.asarray(pad), jnp.asarray(vmask)
    )
    assert not np.asarray(valid)[: len(fvox)].any()


def test_compact_releases_image_refs():
    """A point dropped by compact releases its image references: the
    freed slot becomes DEAD and is reused before any live slot."""
    m = small_map()  # pool of 4
    rcw, pcw = id_pose()
    # point 0 near origin (kept), point 1 far (compacted away)
    for k, pos in ((0, [0.0, 0.0, 1.0]), (1, [90.0, 0.0, 1.0])):
        m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(k))
        m = vmap.add_points(
            m, jnp.asarray([pos], jnp.float32), jnp.zeros((1, 2)),
            rcw, pcw, jnp.asarray([1.0]), jnp.int32(k), jnp.ones(1, bool),
        )
    m = vmap.compact(m, jnp.zeros(3, jnp.float32), jnp.float32(10.0))
    assert int(m.n_pts) == 1
    refs = vmap._live_slot_refs(m)
    slot1 = int(jnp.argmax(m.img_fid == 1))
    assert int(refs[slot1]) == 0  # fid 1's image is dead after compact
    slot0 = int(jnp.argmax(m.img_fid == 0))
    assert int(refs[slot0]) == 1  # kept point still holds fid 0
    # fill the two empty slots, then one more: the DEAD fid-1 slot must
    # be reclaimed while the live fid-0 image survives
    for k in range(2, 5):
        m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(k))
    assert not bool(jnp.any(m.img_fid == 1))
    assert bool(jnp.any(m.img_fid == 0))


def test_compact_blanks_dropped_obs():
    """A row dropped by compact and later reused by add_points must not
    resurrect the dropped point's observations: with pool retention
    their reference images can still be alive, making a stale obs a
    selectable (and WRONG) close_view_obs candidate for the new point."""
    m = small_map()
    rcw, pcw = id_pose()
    m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(0))
    m = vmap.add_points(
        m, jnp.asarray([[50.0, 0.0, 5.0]], jnp.float32), jnp.zeros((1, 2)),
        rcw, pcw, jnp.asarray([1.0]), jnp.int32(0), jnp.ones(1, bool),
    )
    m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(1))
    m = vmap.add_observations(
        m, jnp.asarray([0], jnp.int32), jnp.asarray([[1.0, 1.0]]),
        rcw, jnp.asarray([-50.0, 0.0, -4.0], jnp.float32),
        jnp.asarray([2.0]), jnp.int32(1), jnp.zeros(1, jnp.int32),
        jnp.ones(1, bool),
    )
    m = vmap.compact(m, jnp.zeros(3, jnp.float32), jnp.float32(10.0))
    assert int(m.n_pts) == 0
    assert int(jnp.sum(m.obs_fid >= 0)) == 0  # all obs blanked
    # reuse row 0 for a new point; only its creation obs may exist
    m = vmap.push_image(m, jnp.zeros((32, 40)), jnp.int32(2))
    m = vmap.add_points(
        m, jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32), jnp.zeros((1, 2)),
        rcw, pcw, jnp.asarray([1.0]), jnp.int32(2), jnp.ones(1, bool),
    )
    fids = np.asarray(m.obs_fid[0])
    assert fids[0] == 2 and (fids[1:] == -1).all(), fids
