"""Tiled two-level point map: long-range extent at dense-grid speed.

Third map backend (same API as ops/voxel_map and ops/dense_map),
replacing the reference's ikd-Tree (ikd_Tree.cpp:337-457) for rigs whose
local map outgrows a single rolling grid:

  LEVEL 1 — tile directory: a dense rolling grid over 8x8x8-voxel TILES
  (wrap-around indexing + a 31-bit verification hash, exactly the
  dense_map scheme but 512x coarser). At 0.5 m voxels and (128,128,64)
  tile dims it spans 512x512x256 m — past the reference's
  DET_RANGE=300 m (laserMapping.cpp:83) — in 1M directory entries.

  LEVEL 2 — tile pool: a fixed pool of T tiles, each 512 cells holding
  one point (the on-insert nearest-to-voxel-center downsample of
  ikd_Tree.cpp:391-411). Tiles are allocated on demand, so memory
  follows the OCCUPIED surface (~tens of MB), not the spanned volume.

Every lookup is two dependent gathers (directory -> pool), no probe
loops, no hash chains — the op-cost profile the TPU relay rewards
(plain gathers are fast; probe chains and giant scatter-reductions are
not; see BASELINE.md caveats). Insert resolves in-batch duplicates with
ONE 16k-element sort instead of a grid-sized scatter-min, so no
multi-MB scatter buffer exists anywhere in the step.

Eviction/invalidation is generation-free: each live cell stores its
owning tile's verification hash. Reusing a pool slot for a different
tile instantly invalidates the old cells (their stored hash no longer
matches), so eviction costs zero writes. `compact` (the
Criterion_Check/rebuild analogue, ikd_Tree.cpp:1018-1035) reclaims
fully-dead tiles so unbounded trajectories don't exhaust the pool.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .voxel_map import (
    BIG, EMPTY_CHECK, _mix64, _mix64_np, _neighbor_offsets, voxel_of,
)

TS = 8  # tile side (voxels); tile = TS^3 = 512 cells
TC = TS * TS * TS


class TiledMap(NamedTuple):
    dir_check: jnp.ndarray  # (D,) int32 tile verification hash; EMPTY_CHECK free
    dir_slot: jnp.ndarray  # (D,) int32 pool slot of the tile
    cell_check: jnp.ndarray  # (T*512,) int32 == owning tile hash when live
    pts: jnp.ndarray  # (T*512, 3) f32 stored world point
    slot_key: jnp.ndarray  # (T, 3) int32 tile coordinate per slot
    n_alloc: jnp.ndarray  # () int32 allocated slots
    n_dropped: jnp.ndarray  # () int32 points dropped on pool exhaustion
    voxel_size: jnp.ndarray  # () f32
    log2_dims: jnp.ndarray  # (3,) int32 log2 of DIRECTORY dims (tiles)


def empty_tiled_map(
    dims: tuple = (128, 128, 64),
    pool_tiles: int = 16384,
    voxel_size: float = 0.5,
    dtype=jnp.float32,
) -> TiledMap:
    """dims: directory extent in TILES (power-of-two each); span in
    meters = dims * 8 * voxel_size per axis."""
    for d in dims:
        assert d & (d - 1) == 0, "dims must be powers of two"
    D = dims[0] * dims[1] * dims[2]
    T = pool_tiles
    return TiledMap(
        dir_check=jnp.full(D, EMPTY_CHECK, jnp.int32),
        dir_slot=jnp.zeros(D, jnp.int32),
        cell_check=jnp.full(T * TC, EMPTY_CHECK, jnp.int32),
        pts=jnp.zeros((T * TC, 3), dtype),
        slot_key=jnp.zeros((T, 3), jnp.int32),
        n_alloc=jnp.int32(0),
        n_dropped=jnp.int32(0),
        voxel_size=jnp.asarray(voxel_size, dtype),
        log2_dims=jnp.asarray([int(np.log2(d)) for d in dims], jnp.int32),
    )


def _tile_of(keys: jnp.ndarray):
    """Voxel coords -> (tile coords, flat in-tile cell offset).
    Arithmetic >> floors correctly for negative coordinates."""
    tkey = keys >> TS.bit_length() - 1  # >> 3
    ofs = keys & (TS - 1)
    cofs = (ofs[..., 0] << 6) | (ofs[..., 1] << 3) | ofs[..., 2]
    return tkey, cofs


def _dir_of(m: TiledMap, tkey: jnp.ndarray):
    """Tile coords -> (wrapped directory index, verification hash)."""
    l2 = m.log2_dims
    kx = tkey[..., 0] & ((1 << l2[0]) - 1)
    ky = tkey[..., 1] & ((1 << l2[1]) - 1)
    kz = tkey[..., 2] & ((1 << l2[2]) - 1)
    flat = (kx << (l2[1] + l2[2])) | (ky << l2[2]) | kz
    check = (_mix64(tkey) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    return flat.astype(jnp.int32), check


@functools.partial(jax.jit, static_argnames=("max_probe",))
def insert(m: TiledMap, pts: jnp.ndarray, valid: jnp.ndarray,
           max_probe: int = 0) -> TiledMap:
    """Insert-with-downsample (ikd_Tree.cpp:391-417 semantics).
    `max_probe` accepted (ignored) for API parity.

    ONE sort serves both winner selections: the key packs
    (dir_idx, in-tile cell, distance-to-center bits), so the head of
    each dir_idx group is the tile winner (any point of the tile writes
    identical directory values) and the head of each (dir_idx, cell)
    group is the nearest-to-center cell winner. The relay charges
    composites per executed op — two argsorts were the insert's cost."""
    T = m.slot_key.shape[0]
    D = m.dir_check.shape[0]
    assert D <= 1 << 22, "directory too large for the packed sort key"
    B = pts.shape[0]
    vs = m.voxel_size
    keys = voxel_of(pts, vs)
    tkey, cofs = _tile_of(keys)
    dir_idx, chk = _dir_of(m, tkey)

    cur_chk = m.dir_check[dir_idx]
    cur_slot = m.dir_slot[dir_idx]

    center = (keys.astype(pts.dtype) + 0.5) * vs
    d2c = jnp.sum((pts - center) ** 2, axis=-1)
    d2c_bits = jax.lax.bitcast_convert_type(
        d2c.astype(jnp.float32), jnp.int32
    ).astype(jnp.int64)  # non-negative float: bit order == value order
    gkey = (dir_idx.astype(jnp.int64) << 40) | (
        cofs.astype(jnp.int64) << 31) | d2c_bits
    gkey = jnp.where(valid, gkey, jnp.int64(D) << 40)  # invalid -> end
    order = jnp.argsort(gkey)
    sg = gkey[order]
    sdir = sg >> 40  # == dir_idx for valid rows, D for invalid
    scell = sg >> 31  # == (dir_idx << 9) | cofs for valid rows
    tile_head = jnp.concatenate(
        [jnp.ones(1, bool), sdir[1:] != sdir[:-1]]
    ) & (sdir < D)
    cell_head = jnp.concatenate(
        [jnp.ones(1, bool), scell[1:] != scell[:-1]]
    ) & (sdir < D)
    is_winner = jnp.zeros(B, bool).at[order].set(tile_head)

    # aliased tiles reuse the evicted occupant's slot (old cells
    # self-invalidate by hash mismatch); fresh tiles allocate. Heads of
    # already-live tiles take the aliased branch and rewrite their
    # current directory values (harmless no-op writes).
    aliased = is_winner & (cur_chk != EMPTY_CHECK)
    fresh = is_winner & (cur_chk == EMPTY_CHECK)
    rank = jnp.cumsum(fresh.astype(jnp.int32)) - 1
    new_slot = m.n_alloc + rank
    overflow = fresh & (new_slot >= T)
    slot_w = jnp.where(aliased, cur_slot, new_slot)
    write_dir = is_winner & ~overflow
    widx = jnp.where(write_dir, dir_idx, D)
    dir_check2 = m.dir_check.at[widx].set(chk, mode="drop")
    dir_slot2 = m.dir_slot.at[widx].set(slot_w, mode="drop")
    sidx = jnp.where(write_dir, slot_w, T)
    slot_key2 = m.slot_key.at[sidx].set(tkey, mode="drop")
    n_alloc2 = jnp.minimum(
        m.n_alloc + jnp.sum(fresh, dtype=jnp.int32), jnp.int32(T)
    )

    # -- re-gather: every point now sees its tile's slot (or a stale
    # entry if its winner overflowed -> point dropped)
    got_chk = dir_check2[dir_idx]
    slot = dir_slot2[dir_idx]
    ok = valid & (got_chk == chk)
    pool_idx = jnp.clip(slot, 0, T - 1) * TC + cofs

    # cell winner = the FIRST OK row of each (dir_idx, cofs) group in
    # d2c order — NOT the group head: the head can be a row of a
    # directory-ALIASING losing tile (same dir_idx, different chk) or a
    # dropped row, which silently suppressed the true winner's write
    # (review r5, repro'd: one of two valid points lost). ok rows of a
    # group all share the winning tile, so first-ok == nearest-to-
    # center among the survivors. Segmented first-ok via cumsums (the
    # insert's one-sort budget is preserved).
    ok_s = ok[order]
    csum = jnp.cumsum(ok_s.astype(jnp.int32))
    excl = csum - ok_s.astype(jnp.int32)  # exclusive count
    base = jax.lax.cummax(jnp.where(cell_head, excl, -1))
    first_ok_s = ok_s & (csum - base == 1)
    cell_winner = jnp.zeros(B, bool).at[order].set(first_ok_s)

    stored = m.pts[pool_idx]
    stored_live = m.cell_check[pool_idx] == chk
    stored_d2c = jnp.sum((stored - center) ** 2, axis=-1)
    write = cell_winner & ok & (~stored_live | (d2c < stored_d2c))
    pidx = jnp.where(write, pool_idx, T * TC)
    cell_check2 = m.cell_check.at[pidx].set(chk, mode="drop")
    pts2 = m.pts.at[pidx].set(pts, mode="drop")
    dropped = jnp.sum(valid & ~ok, dtype=jnp.int32)
    return TiledMap(
        dir_check2, dir_slot2, cell_check2, pts2, slot_key2,
        n_alloc2, m.n_dropped + dropped, vs, m.log2_dims,
    )


@functools.partial(jax.jit, static_argnames=("radius", "max_probe"))
def knn_candidates(m: TiledMap, queries: jnp.ndarray, radius: int = 1,
                   max_probe: int = 0):
    """Two-gather neighborhood candidate block: (cpts, found)."""
    T = m.slot_key.shape[0]
    base = voxel_of(queries, m.voxel_size)
    offs = jnp.asarray(_neighbor_offsets(radius))
    cand = base[:, None, :] + offs[None, :, :]  # (N, M, 3)
    tkey, cofs = _tile_of(cand)
    dir_idx, chk = _dir_of(m, tkey)
    tile_ok = m.dir_check[dir_idx] == chk
    slot = m.dir_slot[dir_idx]
    pool_idx = jnp.clip(slot, 0, T - 1) * TC + cofs
    found = tile_ok & (m.cell_check[pool_idx] == chk)
    cpts = m.pts[pool_idx.reshape(-1)].reshape(*cand.shape[:2], 3)
    return cpts, found


@functools.partial(jax.jit, static_argnames=("k", "radius"))
def knn(m: TiledMap, queries: jnp.ndarray, k: int = 5, radius: int = 1,
        max_probe: int = 0):
    """Bounded k-NN over the 27-voxel neighborhood: two dependent
    gathers per candidate (directory, then pool), no probing."""
    from .voxel_map import topk_from_candidates

    cpts, found = knn_candidates(m, queries, radius)
    return topk_from_candidates(cpts, found, queries, k)


def _cell_voxels(m: TiledMap):
    """(T*512, 3) voxel coordinate of every pool cell."""
    T = m.slot_key.shape[0]
    i = jnp.arange(TC, dtype=jnp.int32)
    ofs = jnp.stack([i >> 6, (i >> 3) & 7, i & 7], axis=-1)  # (512, 3)
    return (
        m.slot_key[:, None, :] * TS + ofs[None, :, :]
    ).reshape(T * TC, 3)


@jax.jit
def delete_boxes(m: TiledMap, boxes_lo: jnp.ndarray, boxes_hi: jnp.ndarray) -> TiledMap:
    """Clear cells whose voxel center lies in any box (Delete_Point_Boxes
    role, ikd_Tree.cpp:501). Elementwise over the pool; boxes unrolled."""
    vox = _cell_voxels(m)
    centers = (vox.astype(m.pts.dtype) + 0.5) * m.voxel_size
    kill = jnp.zeros(centers.shape[0], bool)
    for b in range(boxes_lo.shape[0]):
        inside = jnp.all(centers >= boxes_lo[b], axis=-1) & jnp.all(
            centers <= boxes_hi[b], axis=-1
        )
        kill = kill | inside
    return m._replace(
        cell_check=jnp.where(kill, EMPTY_CHECK, m.cell_check)
    )


@jax.jit
def compact(m: TiledMap) -> TiledMap:
    """Reclaim pool slots whose tiles have no live cell (the rebuild /
    Criterion_Check role, ikd_Tree.cpp:1018-1035): keeps live tiles in
    allocation order, remaps the directory, resets n_dropped."""
    T = m.slot_key.shape[0]
    slot_chk = (_mix64(m.slot_key) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    live = m.cell_check.reshape(T, TC) == slot_chk[:, None]
    allocated = jnp.arange(T, dtype=jnp.int32) < m.n_alloc
    keep = allocated & jnp.any(live, axis=1)
    # stable partition: kept slots first, original order
    perm = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    inv = jnp.zeros(T, jnp.int32).at[perm].set(jnp.arange(T, dtype=jnp.int32))
    n_keep = jnp.sum(keep, dtype=jnp.int32)
    remap = jnp.where(keep, inv, -1)

    pts2 = m.pts.reshape(T, TC, 3)[perm].reshape(T * TC, 3)
    cc2 = m.cell_check.reshape(T, TC)[perm].reshape(T * TC)
    sk2 = m.slot_key[perm]

    new_slot = remap[jnp.clip(m.dir_slot, 0, T - 1)]
    dir_ok = (m.dir_check != EMPTY_CHECK) & (new_slot >= 0)
    return TiledMap(
        dir_check=jnp.where(dir_ok, m.dir_check, EMPTY_CHECK),
        dir_slot=jnp.where(dir_ok, new_slot, 0),
        cell_check=cc2,
        pts=pts2,
        slot_key=sk2,
        n_alloc=n_keep,
        n_dropped=jnp.int32(0),
        voxel_size=m.voxel_size,
        log2_dims=m.log2_dims,
    )


def load_factor(m: TiledMap) -> float:
    """Fraction of the pool allocated (host-side DEBUG helper).

    NOTE: `float(m.n_alloc)` is a blocking device->host read — through
    the axon relay the first D2H degrades the session dispatch floor
    (ops/voxel_map.py:100). The pipeline's compaction trigger does NOT
    use this: it reads occupancy from the packed per-frame stats row
    (pipeline._maybe_rebuild)."""
    return float(m.n_alloc) / m.slot_key.shape[0]


def extract_points(m: TiledMap):
    """(pts (L, 3), count) — all live map points, host-side (for map
    export / debugging; the PCD surface of laserMapping.cpp:1839-1855)."""
    T = m.slot_key.shape[0]
    slot_chk = np.asarray(
        (_mix64(m.slot_key) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    )
    cc = np.asarray(m.cell_check).reshape(T, TC)
    alloc = np.arange(T) < int(m.n_alloc)
    live = (cc == slot_chk[:, None]) & alloc[:, None]
    pts = np.asarray(m.pts).reshape(T, TC, 3)[live]
    return pts, len(pts)


def build_host(pts: np.ndarray, dims=(128, 128, 64), pool_tiles=16384,
               voxel_size=0.5) -> TiledMap:
    """Bulk map construction on the HOST (vectorized numpy), matching a
    sequence of device `insert` calls in final content: one point per
    voxel (nearest the voxel center), tiles allocated in first-
    appearance order, directory-aliased tiles resolved last-writer-wins.

    Exists because the standalone insert executable is pure compile
    overhead in bootstrap paths (frame_step/lio carry their own fused
    insert); building host-side uploads finished arrays instead.
    Equality-tested against device inserts in tests/test_tiled_map.py."""
    for d in dims:
        assert d & (d - 1) == 0
    pts = np.asarray(pts, np.float32)
    vs = np.float32(voxel_size)
    keys = np.floor(pts / vs).astype(np.int32)
    center = (keys.astype(np.float32) + 0.5) * vs
    d2c = np.sum((pts - center) ** 2, axis=1)

    tkey = keys >> 3
    cofs = ((keys[:, 0] & 7) << 6) | ((keys[:, 1] & 7) << 3) | (keys[:, 2] & 7)
    l2 = [int(np.log2(d)) for d in dims]
    kx = tkey[:, 0] & ((1 << l2[0]) - 1)
    ky = tkey[:, 1] & ((1 << l2[1]) - 1)
    kz = tkey[:, 2] & ((1 << l2[2]) - 1)
    dir_idx = ((kx.astype(np.int64) << (l2[1] + l2[2]))
               | (ky.astype(np.int64) << l2[2]) | kz.astype(np.int64))
    # host-side hash: a device _mix64 + readback here would taint the
    # relay session's dispatch floor for the whole process (see
    # voxel_map._mix64_np)
    chk = (_mix64_np(tkey) & np.uint32(0x7FFFFFFF)).astype(np.int32)

    D = dims[0] * dims[1] * dims[2]
    T = pool_tiles

    # --- directory: last-writer-wins per aliased dir_idx ----------------
    # unique TILES in first-appearance order (stream semantics)
    tile_id = (dir_idx << 31) | chk.astype(np.int64)  # tile identity
    _, first_pos = np.unique(tile_id, return_index=True)
    first_pos.sort()
    tiles_di = dir_idx[first_pos]
    tiles_chk = chk[first_pos]
    tiles_key = tkey[first_pos]
    # aliased dir cells: the LAST tile (by appearance) owns the cell
    owner_of_di = {}
    for j in range(len(first_pos)):  # loop over unique tiles only (small)
        owner_of_di[int(tiles_di[j])] = j
    owner = np.array([owner_of_di[int(d_)] for d_ in tiles_di], np.int64)
    is_owner = owner == np.arange(len(tiles_di))
    # allocate slots in first-appearance order; aliased non-owners still
    # consumed a slot in the sequential semantics only if they appeared
    # before the evictor — for bulk build we allocate for OWNERS only
    # (content-equivalent: evicted tiles hold no live cells)
    own_idx = np.nonzero(is_owner)[0]
    if len(own_idx) > T:
        own_idx = own_idx[:T]
    n_alloc = len(own_idx)

    dir_check = np.full(D, int(EMPTY_CHECK), np.int32)
    dir_slot = np.zeros(D, np.int32)
    dir_check[tiles_di[own_idx]] = tiles_chk[own_idx]
    dir_slot[tiles_di[own_idx]] = np.arange(n_alloc, dtype=np.int32)
    slot_key = np.zeros((T, 3), np.int32)
    slot_key[:n_alloc] = tiles_key[own_idx]

    # --- cells: nearest-to-center per voxel among owner-tile points -----
    ok = dir_check[dir_idx] == chk  # points whose tile survived
    slot = dir_slot[dir_idx].astype(np.int64)
    pool_idx = slot * TC + cofs
    # group heads on the MASKED index: a dropped (~ok) point sharing a
    # raw pool_idx with a survivor (directory-aliasing tile, or a
    # pool-overflow row reading dir_slot's default 0) must not steal
    # the survivor's group head and suppress its write (review r5,
    # repro'd: 0 live points where device inserts keep 1)
    pool_m = np.where(ok, pool_idx, -1)
    order = np.lexsort((d2c, pool_m))
    ps = pool_m[order]
    oks = ok[order]
    headm = np.ones(len(ps), bool)
    headm[1:] = ps[1:] != ps[:-1]
    win = headm & oks
    widx = ps[win]
    cell_check = np.full(T * TC, int(EMPTY_CHECK), np.int32)
    pool_pts = np.zeros((T * TC, 3), np.float32)
    cell_check[widx] = chk[order][win]
    pool_pts[widx] = pts[order][win]
    dropped = int(np.sum(~ok))

    return TiledMap(
        dir_check=jnp.asarray(dir_check),
        dir_slot=jnp.asarray(dir_slot),
        cell_check=jnp.asarray(cell_check),
        pts=jnp.asarray(pool_pts),
        slot_key=jnp.asarray(slot_key),
        n_alloc=jnp.int32(n_alloc),
        n_dropped=jnp.int32(dropped),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
        log2_dims=jnp.asarray(l2, jnp.int32),
    )
