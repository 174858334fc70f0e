"""Voxel-block-sharded map with per-scan halo exchange (multi-chip).

The round-1 SPMD path replicated the map on every device (sharded.py),
capping map size at one chip's HBM. This module block-partitions the
TILED map (ops/tiled_map.py) across the mesh — the SURVEY §2.3 north
star ("partition voxel blocks across devices, halo-exchange boundary
blocks"):

  OWNERSHIP — tiles are striped along x in slabs of `slab_tiles`
  (default 4 tiles = 16 m at 0.5 m voxels): owner(tile) =
  floor(tile_x / slab) mod n_dev. Each device's pool holds only its
  owned tiles, so map capacity scales with the mesh.

  INSERT — the world batch is shard-local; each device masks it by
  ownership and inserts into its own shard. No map-sized traffic; the
  only exchange is the all-gather of the (small) point batch that the
  row-sharded EKF already performs.

  QUERY (the halo exchange) — kNN during the EKF needs tiles from
  every owner. Before the update, each device selects its owned tiles
  intersecting the scan's AABB (pmin/pmax-reduced over the mesh,
  padded by one voxel) and the mesh all-gathers those blocks into a
  per-scan SNAPSHOT map, replicated on every device. The iterated EKF
  then runs exactly as in the replicated design (rows sharded, psum'd
  HtH/Htz) against the snapshot. Exchange volume is the scan's working
  set (hundreds of tiles ~ a few MB over ICI), not the map.

All functions here are written to run INSIDE `shard_map`; the public
`sharded_blockmap_scan_step` wraps them. Per-device shards live as a
TiledMap pytree with a leading device axis, sharded over the mesh axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import imu as imu_mod
from .. import lio as lio_mod
from ..ops import tiled_map as tm
from ..ops.voxel_map import EMPTY_CHECK, _mix64
from ..state import NavState

SLAB_TILES = 4  # ownership slab width (tiles) along x


def owner_of(tkey: jnp.ndarray, n_dev: int, slab: int = SLAB_TILES):
    """Tile coords (..., 3) -> owning device index (floor-div striping;
    jnp int // is floor division, correct for negative coordinates)."""
    return ((tkey[..., 0] // slab) % n_dev + n_dev) % n_dev


def make_shards(n_dev: int, dims=(128, 128, 64), pool_tiles=4096,
                voxel_size=0.5) -> tm.TiledMap:
    """Per-device empty shards, stacked on a leading device axis (to be
    placed with in_spec P(axis) so each device holds one shard)."""
    one = tm.empty_tiled_map(dims, pool_tiles, voxel_size)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_dev,) + x.shape), one
    )


def shard_insert(local: tm.TiledMap, world: jnp.ndarray, wmask: jnp.ndarray,
                 my_idx, n_dev: int, slab: int = SLAB_TILES) -> tm.TiledMap:
    """Ownership-masked insert into this device's shard (runs per-device
    inside shard_map; `world`/`wmask` are the full gathered batch)."""
    keys = tm.voxel_of(world, local.voxel_size)
    tkey, _ = tm._tile_of(keys)
    mine = wmask & (owner_of(tkey, n_dev, slab) == my_idx)
    return tm.insert(local, world, mine)


def extract_blocks(local: tm.TiledMap, lo: jnp.ndarray, hi: jnp.ndarray,
                   k_exch: int):
    """Select up to k_exch owned tiles whose AABB intersects [lo, hi]
    (world coords). Returns (keys (k,3), cell_check (k,512),
    pts (k,512,3), valid (k,), n_dropped)."""
    T = local.slot_key.shape[0]
    vs = local.voxel_size
    tile_m = vs * tm.TS
    t_lo = local.slot_key.astype(vs.dtype) * tile_m
    t_hi = t_lo + tile_m
    allocated = jnp.arange(T, dtype=jnp.int32) < local.n_alloc
    hit = (
        allocated
        & jnp.all(t_hi >= lo[None, :], axis=-1)
        & jnp.all(t_lo <= hi[None, :], axis=-1)
    )
    rank = jnp.cumsum(hit.astype(jnp.int32)) - 1
    sel = hit & (rank < k_exch)
    out_idx = jnp.where(sel, rank, k_exch)
    keys = (
        jnp.zeros((k_exch, 3), jnp.int32)
        .at[out_idx]
        .set(local.slot_key, mode="drop")
    )
    valid = jnp.zeros(k_exch, bool).at[out_idx].set(True, mode="drop")
    cc = local.cell_check.reshape(T, tm.TC)
    pp = local.pts.reshape(T, tm.TC, 3)
    # invert the selection: which slot feeds each output row
    slot_of = (
        jnp.zeros(k_exch, jnp.int32)
        .at[out_idx]
        .set(jnp.arange(T, dtype=jnp.int32), mode="drop")
    )
    cells_check = jnp.where(valid[:, None], cc[slot_of], EMPTY_CHECK)
    cells_pts = jnp.where(valid[:, None, None], pp[slot_of], 0.0)
    dropped = jnp.sum(hit, dtype=jnp.int32) - jnp.sum(sel, dtype=jnp.int32)
    return keys, cells_check, cells_pts, valid, dropped


def build_snapshot(keys, cells_check, cells_pts, valid, voxel_size,
                   dir_dims=(64, 64, 32)) -> tm.TiledMap:
    """Assemble a replicated TiledMap from gathered blocks. Owned tiles
    are globally unique, so directory writes cannot conflict (directory
    wrap aliasing would need two tiles dir_dims*8*voxel apart inside one
    scan footprint — 256 m span at the defaults; the product path passes
    the map's own dims, giving the snapshot the full 512 m span)."""
    K = keys.shape[0]
    import numpy as np

    D = dir_dims[0] * dir_dims[1] * dir_dims[2]
    log2 = jnp.asarray([int(np.log2(d)) for d in dir_dims], jnp.int32)
    snap = tm.TiledMap(
        dir_check=jnp.full(D, EMPTY_CHECK, jnp.int32),
        dir_slot=jnp.zeros(D, jnp.int32),
        cell_check=cells_check.reshape(K * tm.TC),
        pts=cells_pts.reshape(K * tm.TC, 3),
        slot_key=keys,
        n_alloc=jnp.sum(valid, dtype=jnp.int32),
        n_dropped=jnp.int32(0),
        voxel_size=voxel_size,
        log2_dims=log2,
    )
    dir_idx, chk = tm._dir_of(snap, keys)
    widx = jnp.where(valid, dir_idx, D)
    return snap._replace(
        dir_check=snap.dir_check.at[widx].set(chk, mode="drop"),
        dir_slot=snap.dir_slot.at[widx].set(
            jnp.arange(K, dtype=jnp.int32), mode="drop"
        ),
    )


def exchange_snapshot(local: tm.TiledMap, lo, hi, k_exch: int,
                      axis: str, dir_dims=(64, 64, 32)):
    """The halo exchange: every device contributes its owned blocks in
    the scan AABB; the mesh all-gathers them into a replicated snapshot.

    Returns (snapshot, dropped): `dropped` is the psum'd count of owned
    tiles inside the AABB that did NOT fit the k_exch budget — a
    nonzero value means the snapshot is missing real map content and
    kNN parity is degraded (size `capacity.halo_tiles` up). The product
    path folds it into the shard's n_dropped data-loss counter."""
    keys, cc, pp, valid, dropped = extract_blocks(local, lo, hi, k_exch)
    keys_g = jax.lax.all_gather(keys, axis, tiled=True)
    cc_g = jax.lax.all_gather(cc, axis, tiled=True)
    pp_g = jax.lax.all_gather(pp, axis, tiled=True)
    valid_g = jax.lax.all_gather(valid, axis, tiled=True)
    snap = build_snapshot(keys_g, cc_g, pp_g, valid_g, local.voxel_size,
                          dir_dims=dir_dims)
    return snap, jax.lax.psum(dropped, axis)


def sharded_blockmap_scan_step(
    mesh: Mesh,
    state: NavState,
    shards: tm.TiledMap,  # leading device axis (from make_shards)
    acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt, acc_s_last, angvel_last,
    calib: imu_mod.ImuCalib,
    pts_body, t_rel, pmask,  # sharded over points
    laser_point_cov: float,
    max_iter: int = 4,
    knn_radius: int = 1,
    k_exch: int = 1024,
    axis: str = "dp",
):
    """Full per-scan step with the BLOCK-SHARDED map: IMU propagation
    (replicated) -> undistortion (sharded rows) -> halo exchange into a
    scan snapshot -> iterated EKF vs the snapshot (sharded rows, psum)
    -> ownership-masked insert into each device's shard.

    Returns (state', shards', n_active, snapshot_tiles)."""
    n_dev = mesh.shape[axis]

    def step(state, shard, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
             acc_s_last, angvel_last, pts_body, t_rel, pmask):
        local = jax.tree.map(lambda x: x[0], shard)
        my_idx = jax.lax.axis_index(axis)
        st, pose, _, _ = imu_mod.propagate(
            state, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
            acc_s_last, angvel_last, calib,
        )
        und = imu_mod.undistort(st, pose, pts_body, t_rel, pmask, calib)
        # scan AABB in world coords (prior pose), padded by one voxel
        rot32 = st.rot.astype(und.dtype)
        pos32 = st.pos.astype(und.dtype)
        w_prior = (und @ calib.lid_rot.T + calib.lid_off) @ rot32.T + pos32
        big = jnp.asarray(3.0e37, und.dtype)
        w_lo = jnp.min(jnp.where(pmask[:, None], w_prior, big), axis=0)
        w_hi = jnp.max(jnp.where(pmask[:, None], w_prior, -big), axis=0)
        w_lo = jax.lax.pmin(w_lo, axis) - 2.0 * local.voxel_size
        w_hi = jax.lax.pmax(w_hi, axis) + 2.0 * local.voxel_size

        snap, _halo_dropped = exchange_snapshot(local, w_lo, w_hi,
                                                k_exch, axis)
        res = lio_mod.lio_update(
            st, snap, und, pmask, calib.lid_rot, calib.lid_off,
            laser_point_cov=laser_point_cov, max_iter=max_iter,
            knn_radius=knn_radius, axis_name=axis,
        )
        world = jax.lax.all_gather(res.pts_world, axis, tiled=True)
        wmask = jax.lax.all_gather(pmask, axis, tiled=True)
        local2 = shard_insert(local, world, wmask, my_idx, n_dev)
        shard2 = jax.tree.map(lambda x: x[None], local2)
        return res.state, shard2, res.n_active, snap.n_alloc

    rep = P()
    shd = P(axis)
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: rep, state),
            jax.tree.map(lambda _: shd, shards),
            rep, rep, rep, rep, rep, rep, rep, rep,
            shd, shd, shd,
        ),
        out_specs=(
            jax.tree.map(lambda _: rep, state),
            jax.tree.map(lambda _: shd, shards),
            rep, rep,
        ),
        check_vma=False,
    )
    return fn(state, shards, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
              acc_s_last, angvel_last, pts_body, t_rel, pmask)


def sharded_compact(mesh: Mesh, shards: tm.TiledMap,
                    axis: str = "dp") -> tm.TiledMap:
    """Per-shard pool compaction (tiled_map.compact on every device's
    shard) — the distributed form of the pipeline's load-factor
    maintenance. Ownership is untouched (compact only renumbers slots
    within a shard)."""
    def local(shard):
        l = jax.tree.map(lambda x: x[0], shard)
        l2 = tm.compact(l)
        return jax.tree.map(lambda x: x[None], l2)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), shards),),
        out_specs=jax.tree.map(lambda _: P(axis), shards),
        check_vma=False,
    )
    return fn(shards)
