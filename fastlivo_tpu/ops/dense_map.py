"""Dense rolling-grid point map — the direct-indexed ikd-Tree replacement.

Alternative backend to ops/voxel_map (same semantics, same API): instead
of an open-addressing hash table, the map is a dense 3-D grid with
wrap-around (rolling) indexing — cell = voxel coordinate mod grid dims.
Every lookup is ONE computed index: no probe loops, no hash chains, no
collisions-by-construction. A per-cell 31-bit verification key rejects
aliased content (voxels whose coordinates differ by a grid period), and
an aliased insert simply evicts the stale occupant — spatially-LRU
forgetting that bounds memory to dims^3 cells regardless of trajectory
length (the sliding-local-map deletion of laserMapping.cpp:363-421
removes most stale cells first anyway).

Memory: dims=(256,256,64) at 0.3 m voxels spans 76x76x19 m and costs
dims^3 * 16 B = 67 MB — sized for the small-cube rigs (avia.yaml's
cube_side_length=20). Use the hash backend for sparse long-range maps.

kNN traffic per query: 27 check gathers + 27 point-row gathers, vs the
hash backend's 27*probe_depth check gathers — ~8x less.
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


class DenseMap(NamedTuple):
    check: jnp.ndarray  # (G,) int32 voxel verification hash; EMPTY_CHECK=free
    pts: jnp.ndarray  # (G, 3) f32 stored world point
    count: jnp.ndarray  # () int32 occupied cells
    voxel_size: jnp.ndarray  # () f32
    log2_dims: jnp.ndarray  # (3,) int32 log2 of grid dims (static content)


def empty_dense_map(
    dims: tuple, voxel_size: float, dtype=jnp.float32
) -> DenseMap:
    """dims: (Nx, Ny, Nz), each a power of two."""
    for d in dims:
        assert d & (d - 1) == 0, "dims must be powers of two"
    G = dims[0] * dims[1] * dims[2]
    return DenseMap(
        check=jnp.full(G, EMPTY_CHECK, jnp.int32),
        pts=jnp.zeros((G, 3), dtype),
        count=jnp.int32(0),
        voxel_size=jnp.asarray(voxel_size, dtype),
        log2_dims=jnp.asarray([int(np.log2(d)) for d in dims], jnp.int32),
    )


def _cell_check(m: DenseMap, keys: jnp.ndarray):
    """Voxel coords (..., 3) -> (flat wrapped cell index, verify hash)."""
    l2 = m.log2_dims
    kx = keys[..., 0] & ((1 << l2[0]) - 1)
    ky = keys[..., 1] & ((1 << l2[1]) - 1)
    kz = keys[..., 2] & ((1 << l2[2]) - 1)
    flat = (kx << (l2[1] + l2[2])) | (ky << l2[2]) | kz
    check = (_mix64(keys) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    return flat.astype(jnp.int32), check


@functools.partial(jax.jit, static_argnames=("max_probe",))
def insert(m: DenseMap, pts: jnp.ndarray, valid: jnp.ndarray,
           max_probe: int = 0) -> DenseMap:
    """Insert-with-downsample (ikd_Tree.cpp:391-417 semantics): per
    voxel keep the point nearest the voxel center among batch + stored.
    An aliased occupant (different voxel, same wrapped cell) is evicted.

    No sort needed: the in-batch winner per cell is resolved with one
    packed scatter-min. `max_probe` accepted (ignored) for backend API
    parity with the hash map."""
    assert pts.shape[0] < (1 << 24), (
        "dense insert packs the batch row into 24 bits; split batches "
        f"of {pts.shape[0]} rows"
    )
    G = m.check.shape[0]
    vs = m.voxel_size
    keys = voxel_of(pts, vs)
    cell, check = _cell_check(m, keys)
    center = (keys.astype(pts.dtype) + 0.5) * vs
    d2c = jnp.sum((pts - center) ** 2, axis=-1)
    d2c = jnp.where(valid, d2c, BIG)

    # in-batch winner per cell: scatter-min of (d2c bits, row)
    B = pts.shape[0]
    d2c_bits = jax.lax.bitcast_convert_type(d2c.astype(jnp.float32), jnp.int32)
    packed = (d2c_bits.astype(jnp.int64) << 24) | jnp.arange(B, dtype=jnp.int64)
    tgt = jnp.where(valid, cell, G)
    cell_min = (
        jnp.full(G, 0x7FFFFFFFFFFFFFFF, jnp.int64).at[tgt].min(packed, mode="drop")
    )
    win_row = (cell_min[cell] & jnp.int64(0xFFFFFF)).astype(jnp.int32)
    is_winner = valid & (win_row == jnp.arange(B, dtype=jnp.int32))

    cur = m.check[cell]
    stored = m.pts[cell]
    stored_d2c = jnp.sum((stored - center) ** 2, axis=-1)
    is_empty = cur == EMPTY_CHECK
    is_mine = cur == check
    aliased = (~is_empty) & (~is_mine)  # stale occupant: evict
    write = is_winner & (is_empty | aliased | (is_mine & (d2c < stored_d2c)))
    widx = jnp.where(write, cell, G)
    new_check = m.check.at[widx].set(check, mode="drop")
    new_pts = m.pts.at[widx].set(pts, mode="drop")
    gained = jnp.sum(write & is_empty, dtype=jnp.int32)
    return DenseMap(new_check, new_pts, m.count + gained, vs, m.log2_dims)


@functools.partial(jax.jit, static_argnames=("radius", "max_probe"))
def knn_candidates(m: DenseMap, queries: jnp.ndarray, radius: int = 1,
                   max_probe: int = 0):
    """Direct-indexed neighborhood candidate block: (cpts, found)."""
    base = voxel_of(queries, m.voxel_size)
    offs = jnp.asarray(_neighbor_offsets(radius))
    cand = base[:, None, :] + offs[None, :, :]  # (N, M, 3)
    cell, qcheck = _cell_check(m, cand)
    found = m.check[cell] == qcheck
    cpts = m.pts[cell.reshape(-1)].reshape(*cand.shape[:2], 3)
    return cpts, found


@functools.partial(jax.jit, static_argnames=("k", "radius"))
def knn(m: DenseMap, queries: jnp.ndarray, k: int = 5, radius: int = 1,
        max_probe: int = 0):
    """Bounded k-NN: direct 27-neighborhood lookups (no probing).
    `max_probe` accepted (ignored) for API parity with voxel_map.knn."""
    from .voxel_map import topk_from_candidates

    cpts, found = knn_candidates(m, queries, radius)
    return topk_from_candidates(cpts, found, queries, k)


@jax.jit
def delete_boxes(m: DenseMap, boxes_lo: jnp.ndarray, boxes_hi: jnp.ndarray) -> DenseMap:
    """Clear cells whose (true, unaliased) voxel center lies in any box;
    centers are recomputed from the stored points."""
    occupied = m.check != EMPTY_CHECK
    keys = voxel_of(m.pts, m.voxel_size)
    centers = (keys.astype(m.pts.dtype) + 0.5) * m.voxel_size
    ge = jnp.all(centers[:, None, :] >= boxes_lo[None], axis=-1)
    le = jnp.all(centers[:, None, :] <= boxes_hi[None], axis=-1)
    kill = occupied & jnp.any(ge & le, axis=-1)
    return DenseMap(
        jnp.where(kill, EMPTY_CHECK, m.check),
        m.pts,
        m.count - jnp.sum(kill, dtype=jnp.int32),
        m.voxel_size,
        m.log2_dims,
    )


def extract_points(m: DenseMap):
    """(pts (L, 3), count) — all live map points (map export surface)."""
    occ = np.asarray(m.check) != int(EMPTY_CHECK)
    pts = np.asarray(m.pts)[occ]
    return pts, len(pts)


def build_host(pts: np.ndarray, dims=(256, 256, 64),
               voxel_size=0.5) -> DenseMap:
    """Bulk map construction on the host (vectorized numpy), equivalent
    to ONE device `insert` of the whole batch: per wrapped cell, the
    point nearest its own voxel center wins (ties across aliased voxels
    resolve by distance, like the packed scatter-min). Removes the
    standalone-insert compile from bootstrap paths."""
    for d in dims:
        assert d & (d - 1) == 0
    pts = np.asarray(pts, np.float32)
    vs = np.float32(voxel_size)
    keys = np.floor(pts / vs).astype(np.int32)
    center = (keys.astype(np.float32) + 0.5) * vs
    d2c = np.sum((pts - center) ** 2, axis=1)
    l2 = [int(np.log2(d)) for d in dims]
    kx = keys[:, 0] & ((1 << l2[0]) - 1)
    ky = keys[:, 1] & ((1 << l2[1]) - 1)
    kz = keys[:, 2] & ((1 << l2[2]) - 1)
    cell = ((kx.astype(np.int64) << (l2[1] + l2[2]))
            | (ky.astype(np.int64) << l2[2]) | kz.astype(np.int64))
    # host-side hash (a device readback here would taint the relay
    # session's dispatch floor — see voxel_map._mix64_np)
    chk = (_mix64_np(keys) & np.uint32(0x7FFFFFFF)).astype(np.int32)
    order = np.lexsort((d2c, cell))
    cs = cell[order]
    head = np.ones(len(cs), bool)
    head[1:] = cs[1:] != cs[:-1]
    win = order[head]
    G = dims[0] * dims[1] * dims[2]
    check = np.full(G, int(EMPTY_CHECK), np.int32)
    pool = np.zeros((G, 3), np.float32)
    check[cell[win]] = chk[win]
    pool[cell[win]] = pts[win]
    return DenseMap(
        check=jnp.asarray(check),
        pts=jnp.asarray(pool),
        count=jnp.int32(len(win)),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
        log2_dims=jnp.asarray(l2, jnp.int32),
    )
