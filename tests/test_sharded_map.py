"""Voxel-block-sharded map: equality vs the single-device path on the
8-virtual-device CPU mesh (SURVEY §2.3 north-star row)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastlivo_tpu import imu as imu_mod
from fastlivo_tpu import lio as lio_mod
from fastlivo_tpu.ops import tiled_map as tm
from fastlivo_tpu.parallel import sharded, sharded_map as sm
from fastlivo_tpu.state import identity_state

rng = np.random.default_rng(0)
N_DEV = 8
N_PTS = 2048


def _world():
    from test_lio import make_room_points

    return make_room_points(step=0.15)


def _calib():
    return imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0),
        cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )


def _imu_block(P=16):
    acc = np.tile(np.array([0.0, 0.0, 9.81], np.float32), (P, 1))
    gyr = np.zeros((P, 3), np.float32)
    dt = np.full(P, 0.005, np.float32)
    offs = np.cumsum(dt).astype(np.float32)
    valid = np.ones(P, bool)
    return (jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dt),
            jnp.asarray(offs), jnp.asarray(valid), jnp.float32(0.0))


def _insert_all(m, pts):
    pad = np.zeros((((len(pts) + 255) // 256) * 256, 3), np.float32)
    pad[: len(pts)] = pts
    mask = np.zeros(len(pad), bool)
    mask[: len(pts)] = True
    return tm.insert(m, jnp.asarray(pad), jnp.asarray(mask))


@pytest.fixture(scope="module")
def built():
    """World inserted into (a) one full map, (b) 8 ownership shards."""
    world = _world()
    full = _insert_all(tm.empty_tiled_map((64, 64, 32), 2048, 0.3), world)

    shards = sm.make_shards(N_DEV, (64, 64, 32), 512, 0.3)
    mesh = sharded.make_mesh(N_DEV)
    pad = np.zeros((((len(world) + 255) // 256) * 256, 3), np.float32)
    pad[: len(world)] = world
    mask = np.zeros(len(pad), bool)
    mask[: len(world)] = True

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def ins(shard, w, wm):
        local = jax.tree.map(lambda x: x[0], shard)
        my = jax.lax.axis_index("dp")
        l2 = sm.shard_insert(local, w, wm, my, N_DEV)
        return jax.tree.map(lambda x: x[None], l2)

    fn = shard_map(
        ins, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("dp"), shards), P(), P()),
        out_specs=jax.tree.map(lambda _: P("dp"), shards),
        check_vma=False,
    )
    shards = fn(shards, jnp.asarray(pad), jnp.asarray(mask))
    return world, full, shards, mesh


def test_ownership_partition_is_disjoint_and_complete(built):
    world, full, shards, mesh = built
    # every shard's tiles belong to that owner, and the union of live
    # cells equals the full map's
    from fastlivo_tpu.ops.voxel_map import _mix64

    total = 0
    for d in range(N_DEV):
        local = jax.tree.map(lambda x: np.asarray(x)[d], shards)
        n_alloc = int(local.n_alloc)
        if not n_alloc:
            continue
        sk = np.asarray(local.slot_key)[:n_alloc]
        owners = np.asarray(sm.owner_of(jnp.asarray(sk), N_DEV))
        assert (owners == d).all()
        cc = np.asarray(local.cell_check).reshape(-1, tm.TC)[:n_alloc]
        schk = np.asarray(
            (_mix64(jnp.asarray(sk)) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        )
        total += int((cc == schk[:, None]).sum())
    # full map live cells
    T = full.slot_key.shape[0]
    fchk = np.asarray(
        (_mix64(full.slot_key) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    )
    alloc = np.arange(T) < int(full.n_alloc)
    flive = (np.asarray(full.cell_check).reshape(T, tm.TC)[alloc]
             == fchk[alloc][:, None]).sum()
    assert total == int(flive), (total, int(flive))


@pytest.mark.slow
def test_snapshot_knn_matches_full_map(built):
    world, full, shards, mesh = built
    q = jnp.asarray(world[:512] + 0.02)
    lo = jnp.asarray(world.min(0) - 0.5)
    hi = jnp.asarray(world.max(0) + 0.5)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def snap_knn(shard, qq):
        local = jax.tree.map(lambda x: x[0], shard)
        snap, _ = sm.exchange_snapshot(local, lo, hi, 512, "dp")
        n, d2, v = tm.knn(snap, qq, 5, 1)
        return n, d2, v

    fn = shard_map(
        snap_knn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("dp"), shards), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    n_s, d_s, v_s = fn(shards, q)
    n_f, d_f, v_f = tm.knn(full, q, 5, 1)
    np.testing.assert_array_equal(np.asarray(v_s), np.asarray(v_f))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_f), atol=1e-5)


@pytest.mark.slow
def test_blockmap_scan_step_matches_single_device(built):
    world, full, shards, mesh = built
    calib = _calib()
    acc, gyr, dt, offs, valid, tail = _imu_block()
    state = identity_state()._replace(
        pos=jnp.asarray([0.05, -0.04, 0.03]),
        grav=jnp.asarray([0.0, 0.0, -9.81]),
    )
    z3 = jnp.zeros(3, jnp.float32)
    ridx = rng.choice(len(world), N_PTS, replace=False)
    scan = (world[ridx] + rng.normal(0, 0.003, (N_PTS, 3))).astype(np.float32)
    t_rel = np.linspace(0, 0.08, N_PTS).astype(np.float32)
    pmask = np.ones(N_PTS, bool)

    st_s, shards2, n_act_s, snap_tiles = sm.sharded_blockmap_scan_step(
        mesh, state, shards,
        acc, gyr, dt, offs, jnp.asarray(valid), tail, z3, z3, calib,
        jnp.asarray(scan), jnp.asarray(t_rel), jnp.asarray(pmask),
        laser_point_cov=0.001, max_iter=4, knn_radius=1, k_exch=512,
    )
    assert int(snap_tiles) > 10

    # single-device reference: same propagate/undistort/EKF/insert
    st1, pose, _, _ = imu_mod.propagate(
        state, acc, gyr, dt, offs, jnp.asarray(valid), tail, z3, z3, calib
    )
    und = imu_mod.undistort(
        st1, pose, jnp.asarray(scan), jnp.asarray(t_rel), jnp.asarray(pmask),
        calib,
    )
    res = lio_mod.lio_update(
        st1, full, und, jnp.asarray(pmask), calib.lid_rot, calib.lid_off,
        laser_point_cov=0.001, max_iter=4, knn_radius=1,
    )
    np.testing.assert_allclose(
        np.asarray(st_s.pos), np.asarray(res.state.pos), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st_s.rot), np.asarray(res.state.rot), atol=1e-6
    )
    assert int(n_act_s) == int(res.n_active)

    # inserted points landed in the right shards: union still answers
    # kNN like the updated full map
    full2 = tm.insert(full, res.pts_world, jnp.asarray(pmask))
    lo = jnp.asarray(world.min(0) - 0.5)
    hi = jnp.asarray(world.max(0) + 0.5)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def snap_knn(shard, qq):
        local = jax.tree.map(lambda x: x[0], shard)
        snap, _ = sm.exchange_snapshot(local, lo, hi, 512, "dp")
        return tm.knn(snap, qq, 5, 1)

    q = jnp.asarray(world[100:356] + 0.02)
    fn = shard_map(
        snap_knn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("dp"), shards2), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    n_s, d_s, v_s = fn(shards2, q)
    n_f, d_f, v_f = tm.knn(full2, q, 5, 1)
    np.testing.assert_array_equal(np.asarray(v_s), np.asarray(v_f))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_f), atol=1e-5)


@pytest.mark.slow
def test_blockmap_multi_frame_trajectory(built):
    """Several consecutive scan steps with a moving sensor: the
    block-sharded path tracks the single-device path across frames
    (halo exchange + ownership inserts compose over time), and
    per-shard compaction reclaims pool slots after deletes."""
    world, full0, shards, mesh = built
    calib = _calib()
    z3 = jnp.zeros(3, jnp.float32)
    state_s = identity_state()._replace(grav=jnp.asarray([0.0, 0.0, -9.81]))
    state_f = state_s
    full = full0
    acc, gyr, dt, offs, valid, tail = _imu_block()
    for k in range(3):
        ridx = rng.choice(len(world), N_PTS, replace=False)
        scan = (world[ridx] + rng.normal(0, 0.003, (N_PTS, 3))).astype(np.float32)
        t_rel = np.linspace(0, 0.08, N_PTS).astype(np.float32)
        pmask = np.ones(N_PTS, bool)
        state_s, shards, n_s, _ = sm.sharded_blockmap_scan_step(
            mesh, state_s, shards,
            acc, gyr, dt, offs, jnp.asarray(valid), tail, z3, z3, calib,
            jnp.asarray(scan), jnp.asarray(t_rel), jnp.asarray(pmask),
            laser_point_cov=0.001, max_iter=4, knn_radius=1, k_exch=512,
        )
        st1, pose, _, _ = imu_mod.propagate(
            state_f, acc, gyr, dt, offs, jnp.asarray(valid), tail, z3, z3,
            calib,
        )
        und = imu_mod.undistort(
            st1, pose, jnp.asarray(scan), jnp.asarray(t_rel),
            jnp.asarray(pmask), calib,
        )
        res = lio_mod.lio_update(
            st1, full, und, jnp.asarray(pmask), calib.lid_rot, calib.lid_off,
            laser_point_cov=0.001, max_iter=4, knn_radius=1,
        )
        state_f = res.state
        full = tm.insert(full, res.pts_world, jnp.asarray(pmask))
        np.testing.assert_allclose(
            np.asarray(state_s.pos), np.asarray(state_f.pos), atol=5e-5
        ), k
    # distributed compaction keeps shard pools consistent
    shards2 = sm.sharded_compact(mesh, shards)
    tot_before = int(np.asarray(shards.n_alloc).sum())
    tot_after = int(np.asarray(shards2.n_alloc).sum())
    assert 0 < tot_after <= tot_before
