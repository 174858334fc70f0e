"""Device-side incremental voxel-hash point map — the ikd-Tree replacement.

The reference maintains its LiDAR map in an incremental k-d tree with
on-insert voxel downsampling that keeps (asymptotically) one point per
`filter_size_map` voxel — the point nearest the voxel center
(reference: include/ikd-Tree/ikd_Tree.cpp:382-457). This module keeps that
*semantics* but re-designs the *structure* for TPU/XLA:

  - The map IS a fixed-capacity open-addressing hash table over voxel
    coordinates; each slot stores exactly one world-frame point.
  - Slot identity is a 31-bit verification hash of the voxel coordinate
    (`check`), NOT the coordinate itself: the kNN/insert probe loops then
    gather ONE int32 per probe instead of 3-4 — random HBM gathers are
    the TPU bottleneck here (measured 20+ ms/scan with row gathers). A
    check collision (two voxels, same probe slot, same 31-bit hash,
    ~2^-31 per probe) at worst admits one far-away candidate that the
    distance gates reject.
  - Insert-with-downsample = batched probe/claim loop (fixed probe depth,
    masked scatters); the nearest-to-center rule is a conditional update.
  - k-nearest-neighbor search (ikd_Tree.cpp:350-380) = probe the
    (2R+1)^3 voxel neighborhood of each query, then one row gather of the
    resolved points and top-k by distance — no tree, no heap, no rebuild
    thread (ikd_Tree.cpp:187-301 has no equivalent: nothing to rebalance).
  - Sliding-local-map box deletion (laserMapping.cpp:363-421,
    ikd_Tree.cpp:501) = one masked full-table pass (voxel centers are
    recomputed from the stored points).

Deletions leave holes in probe chains; the query loop probes a fixed
depth without early exit so hits behind holes are still found. A hole can
make a later insert of an existing key claim an earlier slot, creating a
benign duplicate voxel entry; duplicates are removed wholesale by
`rebuild` (cheap full-table compaction).

All shapes are static; `valid` masks carry the dynamic sizes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy (NOT jnp) scalars: these are read on the host (e.g. build_host's
# int(EMPTY_CHECK)); as device scalars every such read would be a D2H
# transfer, and the FIRST D2H of any size flips this container's relay
# session into a ~27 ms blocking-dispatch mode (see _mix64_np docstring)
EMPTY_CHECK = np.int32(-2147483648)  # sentinel in check[]
BIG = np.float32(1e30)


class VoxelMap(NamedTuple):
    check: jnp.ndarray  # (T,) int32 voxel verification hash; EMPTY_CHECK=free
    pts: jnp.ndarray  # (T, 3) f32 stored world point
    count: jnp.ndarray  # () int32 occupied slots
    voxel_size: jnp.ndarray  # () f32


def empty_map(table_size: int, voxel_size: float, dtype=jnp.float32) -> VoxelMap:
    assert table_size & (table_size - 1) == 0, "table_size must be a power of two"
    return VoxelMap(
        check=jnp.full(table_size, EMPTY_CHECK, dtype=jnp.int32),
        pts=jnp.zeros((table_size, 3), dtype=dtype),
        count=jnp.int32(0),
        voxel_size=jnp.asarray(voxel_size, dtype),
    )


def voxel_of(p: jnp.ndarray, voxel_size) -> jnp.ndarray:
    """World point -> int32 voxel coordinate (floor)."""
    return jnp.floor(p / voxel_size).astype(jnp.int32)


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer (avalanche)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> jnp.uint32(16))


def _mix64(keys: jnp.ndarray) -> jnp.ndarray:
    """Chained 32-bit murmur mixes over the voxel coordinate. Multiply-
    XOR hashes of small integer coordinates collide badly (measured ~3%
    31-bit collisions on a few hundred voxels); chained finalizers reach
    the birthday floor (~5 collisions per 200k keys at 31 bits) without
    uint64 arithmetic, which TPUs emulate expensively. Name kept from
    the original splitmix64 variant; returns uint32."""
    u = keys.astype(jnp.uint32)
    h = _fmix32(u[..., 0] * jnp.uint32(0x9E3779B1))
    h = _fmix32(h ^ (u[..., 1] * jnp.uint32(0x85EBCA77)))
    return _fmix32(h ^ (u[..., 2] * jnp.uint32(0xC2B2AE3D)))


def _mix64_np(keys) -> "np.ndarray":
    """Host-side numpy twin of `_mix64`, bit-identical (uint32 wraps).

    Exists so bulk host builders (tiled_map/dense_map `build_host`) never
    touch the device: on this container's relay, the FIRST device->host
    readback of any size permanently degrades the session's blocking-
    dispatch floor from ~0.06 ms to ~27 ms (measured 2026-08-17), so the
    check-hash must be computable without a device round-trip."""
    import numpy as np

    def fmix32(h):
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        return h ^ (h >> np.uint32(16))

    u = np.asarray(keys).astype(np.uint32)
    with np.errstate(over="ignore"):
        h = fmix32(u[..., 0] * np.uint32(0x9E3779B1))
        h = fmix32(h ^ (u[..., 1] * np.uint32(0x85EBCA77)))
        return fmix32(h ^ (u[..., 2] * np.uint32(0xC2B2AE3D)))


def _slot_check(keys: jnp.ndarray, mask: int):
    """One mix, two decorrelated outputs: probe slot and verify hash."""
    z = _mix64(keys)
    # slot from high bits, check from low 31: decorrelated enough after
    # full avalanche
    slot = (z >> jnp.uint32(13)).astype(jnp.int32) & jnp.int32(mask)
    check = (z & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)  # never sentinel
    return slot, check


@functools.partial(jax.jit, static_argnames=("max_probe",))
def insert(m: VoxelMap, pts: jnp.ndarray, valid: jnp.ndarray, max_probe: int = 12) -> VoxelMap:
    """Insert a batch of world points with voxel downsampling.

    Per voxel, the surviving point is the one nearest the voxel center,
    among both the batch members and any previously stored point —
    matching ikd-Tree Add_Points(downsample_on=true)
    (ikd_Tree.cpp:391-417).

    Deliberately NOT donated: buffer donation permanently drops every
    subsequent dispatch in the session into a slow path on the axon
    TPU relay (measured 0.04 ms -> 1.5-27 ms per dispatch after one
    donated call); the table copy it would save costs ~20 us of HBM
    bandwidth on real hardware.
    """
    T = m.check.shape[0]
    mask = T - 1
    vs = m.voxel_size
    keys = voxel_of(pts, vs)
    center = (keys.astype(pts.dtype) + 0.5) * vs
    d2c = jnp.sum((pts - center) ** 2, axis=-1)

    slot0, checks = _slot_check(keys, mask)
    d2c = jnp.where(valid, d2c, BIG)

    # --- in-batch dedup: keep the nearest-to-center point per voxel -----
    order = jnp.lexsort((d2c, keys[:, 0], keys[:, 1], keys[:, 2]))
    keys_s = keys[order]
    pts_s = pts[order]
    checks_s = checks[order]
    valid_s = valid[order]
    same_as_prev = jnp.all(keys_s == jnp.roll(keys_s, 1, axis=0), axis=-1)
    same_as_prev = same_as_prev.at[0].set(False)
    winner = valid_s & ~same_as_prev

    tc, tp, cnt = m.check, m.pts, m.count
    slot = slot0[order]
    done = ~winner
    # stored-point distance-to-center vs the inserting point's center
    center_s = (keys_s.astype(pts.dtype) + 0.5) * vs
    d2c_s = jnp.sum((pts_s - center_s) ** 2, axis=-1)
    for _ in range(max_probe):
        cur = tc[slot]
        is_empty = cur == EMPTY_CHECK
        is_mine = (cur == checks_s) & ~done
        claim = is_empty & ~done
        claim_idx = jnp.where(claim, slot, T)
        tc = tc.at[claim_idx].set(checks_s, mode="drop")
        won = claim & (tc[slot] == checks_s)
        # nearest-to-center replacement for existing voxels
        stored = tp[slot]
        stored_d2c = jnp.sum((stored - center_s) ** 2, axis=-1)
        write = won | (is_mine & (d2c_s < stored_d2c))
        widx = jnp.where(write, slot, T)
        tp = tp.at[widx].set(pts_s, mode="drop")
        cnt = cnt + jnp.sum(won, dtype=jnp.int32)
        done = done | is_mine | won
        slot = (slot + 1) & mask
    return VoxelMap(tc, tp, cnt, vs)


def _neighbor_offsets(radius: int) -> np.ndarray:
    r = np.arange(-radius, radius + 1, dtype=np.int32)
    g = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    # visit near voxels first so top_k ties favor close cells
    return g[np.argsort(np.sum(g * g, axis=-1), kind="stable")]


def topk_from_candidates(cpts: jnp.ndarray, found: jnp.ndarray,
                         queries: jnp.ndarray, k: int):
    """Rank a gathered candidate block (N, M, 3) against (possibly moved)
    queries and return the k nearest — the re-rank half of `knn`, shared
    by every backend and by the LIO rematch candidate cache."""
    d2 = jnp.sum((cpts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(found, d2, BIG)
    neg_d2, idx = jax.lax.top_k(-d2, k)
    nd2 = -neg_d2
    nvalid = nd2 < BIG * 0.5
    neigh = jnp.take_along_axis(cpts, idx[..., None], axis=1)
    neigh = jnp.where(nvalid[..., None], neigh, 0.0)
    return neigh, nd2, nvalid


@functools.partial(jax.jit, static_argnames=("radius", "max_probe"))
def knn_candidates(
    m: VoxelMap,
    queries: jnp.ndarray,
    radius: int = 2,
    max_probe: int = 12,
):
    """Gather the (2*radius+1)^3-neighborhood candidate block for each
    query: (cpts (N, M, 3), found (N, M))."""
    T = m.check.shape[0]
    mask = T - 1
    base = voxel_of(queries, m.voxel_size)  # (N, 3)
    offs = jnp.asarray(_neighbor_offsets(radius))  # (M, 3)
    cand = base[:, None, :] + offs[None, :, :]  # (N, M, 3)
    slot, qcheck = _slot_check(cand, mask)  # (N, M) each
    found = jnp.zeros(slot.shape, dtype=bool)
    resolved = jnp.full(slot.shape, T, dtype=jnp.int32)
    for _ in range(max_probe):
        cur = m.check[slot]  # (N, M) single-int32 gather
        hit = (cur == qcheck) & ~found
        resolved = jnp.where(hit, slot, resolved)
        found = found | hit
        slot = (slot + 1) & mask
    safe = jnp.minimum(resolved, T - 1)
    cpts = m.pts[safe.reshape(-1)].reshape(cand.shape[0], cand.shape[1], 3)
    return cpts, found


@functools.partial(jax.jit, static_argnames=("k", "radius", "max_probe"))
def knn(
    m: VoxelMap,
    queries: jnp.ndarray,
    k: int = 5,
    radius: int = 2,
    max_probe: int = 12,
):
    """Bounded k-nearest-neighbor over the voxel map.

    For each query, probes the (2*radius+1)^3 surrounding voxels (one
    int32 check gather per probe step), then gathers the resolved points
    once and returns the k nearest. TPU-native stand-in for
    KD_TREE::Nearest_Search (ikd_Tree.cpp:350-380); the LIO gate
    `sqDist(5th) <= 5 m^2` (laserMapping.cpp:1549) means only near-range
    neighbors matter, which the bounded neighborhood covers.

    Returns:
      neigh: (N, k, 3) neighbor points (zeros where invalid)
      d2:    (N, k) squared distances (BIG where invalid)
      nvalid:(N, k) bool
    """
    cpts, found = knn_candidates(m, queries, radius, max_probe)
    return topk_from_candidates(cpts, found, queries, k)


@jax.jit
def delete_boxes(m: VoxelMap, boxes_lo: jnp.ndarray, boxes_hi: jnp.ndarray) -> VoxelMap:
    """Remove all points inside any of the axis-aligned boxes.

    boxes_lo/hi: (B, 3); a box with lo > hi is inert (use for padding).
    Equivalent of KD_TREE::Delete_Point_Boxes (ikd_Tree.cpp:501) driven by
    lasermap_fov_segment (laserMapping.cpp:363-421). Voxel centers are
    recomputed from the stored points (each point lies in its voxel).
    """
    occupied = m.check != EMPTY_CHECK
    keys = voxel_of(m.pts, m.voxel_size)
    centers = (keys.astype(m.pts.dtype) + 0.5) * m.voxel_size  # (T, 3)
    ge = jnp.all(centers[:, None, :] >= boxes_lo[None], axis=-1)
    le = jnp.all(centers[:, None, :] <= boxes_hi[None], axis=-1)
    inside_any = jnp.any(ge & le, axis=-1)
    kill = occupied & inside_any
    check = jnp.where(kill, EMPTY_CHECK, m.check)
    count = m.count - jnp.sum(kill, dtype=jnp.int32)
    return VoxelMap(check, m.pts, count, m.voxel_size)


@jax.jit
def rebuild(m: VoxelMap) -> VoxelMap:
    """Full compaction: re-insert every occupied slot into a fresh table.

    Removes duplicate voxel entries and hole-fragmented probe chains that
    accumulate after many delete/insert cycles (the batched analogue of
    the ikd-Tree background rebuild, ikd_Tree.cpp:187-301 — but O(T)
    on-device instead of a pthread)."""
    occupied = m.check != EMPTY_CHECK
    fresh = empty_map(m.check.shape[0], 1.0, dtype=m.pts.dtype)._replace(
        voxel_size=m.voxel_size
    )
    # deeper probe budget than the per-frame insert: rebuild runs rarely
    # and must not drop entries even at high load factors
    return insert(fresh, m.pts, occupied, max_probe=32)


def extract_points(m: VoxelMap):
    """(pts (L, 3), count) — all live map points (map export surface)."""
    occ = np.asarray(m.check) != int(EMPTY_CHECK)
    pts = np.asarray(m.pts)[occ]
    return pts, len(pts)
