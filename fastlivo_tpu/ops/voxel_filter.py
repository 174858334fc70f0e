"""Scan voxel-grid downsampling (host side).

Equivalent of the reference's `pcl::VoxelGrid` scan filters
(reference: src/laserMapping.cpp:172-173, 1398-1399 with leaf
`filter_size_surf`; src/lidar_selection.cpp:352-353 with 0.2 m): each
occupied voxel is reduced to the centroid of its points. Runs on the
host as part of per-frame ingestion (the scan is still host-resident at
this point); returns a fixed-capacity padded array + mask so the device
pipeline keeps static shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("max_out",))
def voxel_downsample_device(
    pts: jnp.ndarray, valid: jnp.ndarray, leaf, max_out: int
):
    """Device-side centroid voxel filter with a fixed output capacity.

    Same centroid-per-voxel semantics as `voxel_downsample` but fully
    on-device (sort + segmented mean + masked scatter), so the scan can
    flow undistort -> downsample -> EKF without a host roundtrip.
    Output order is sorted-voxel-key order (the host version keeps scan
    order; downstream code never relies on order). Voxels beyond
    `max_out` are dropped.

    Args:   pts (N, C>=3); valid (N,) bool; leaf: scalar.
    Returns (out (max_out, C), mask (max_out,)).
    """
    N, C = pts.shape
    # non-finite returns (PointCloud2 no-return NaN padding; inf from
    # fog/sun artifacts — inf>blind^2 passes every decoder range gate)
    # are dropped here, mirroring pcl::VoxelGrid's is-finite skip; one
    # surviving NaN poisons the EKF state within a frame
    valid = valid & jnp.all(jnp.isfinite(pts[:, :3]), axis=-1)
    keys = jnp.floor(pts[:, :3] / leaf).astype(jnp.int64)
    # pack 3x20-bit offset coords into ONE sort key (scheme of the host
    # path below, one bit narrower so the invalid marker 2^62 sorts
    # last): a single-operand argsort + single-compare group boundaries
    # cost fewer ops than a 4-array lexsort
    packed = (
        ((keys[:, 0] + (1 << 19)) & 0xFFFFF) << 40
        | ((keys[:, 1] + (1 << 19)) & 0xFFFFF) << 20
        | ((keys[:, 2] + (1 << 19)) & 0xFFFFF)
    )
    packed = jnp.where(valid, packed, jnp.int64(1) << 62)
    order = jnp.argsort(packed)
    sp = packed[order]
    ps = pts[order]
    vs = valid[order]
    start = jnp.concatenate(
        [jnp.ones(1, bool), sp[1:] != sp[:-1]]
    ) & vs
    seg = jnp.cumsum(start.astype(jnp.int32)) - 1  # (N,)
    seg = jnp.where(vs, seg, max_out)  # invalid rows dropped
    seg = jnp.minimum(seg, max_out)  # overflow dropped
    sums = jnp.zeros((max_out, C), pts.dtype).at[seg].add(
        jnp.where(vs[:, None], ps, 0.0), mode="drop"
    )
    cnt = jnp.zeros(max_out, pts.dtype).at[seg].add(
        vs.astype(pts.dtype), mode="drop"
    )
    mask = cnt > 0
    out = sums / jnp.maximum(cnt, 1.0)[:, None]
    return jnp.where(mask[:, None], out, 0.0), mask


def voxel_downsample(
    pts: np.ndarray, leaf: float, max_out: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Centroid-per-voxel downsample.

    Args:
      pts: (N, 3+C) float array; extra columns are averaged alongside xyz.
      leaf: voxel edge length.
      max_out: if given, output is padded/truncated to this many rows and
        a validity mask is returned. Truncation keeps the first voxels in
        scan order (stable), mirroring no particular reference order —
        PCL's output order is voxel-index order, which downstream code
        never relies on.

    Returns:
      (out, mask): out (M, 3+C) f32, mask (M,) bool. Without max_out,
      M is the number of occupied voxels and mask is all-true.
    """
    pts = np.asarray(pts, dtype=np.float64)
    if pts.ndim == 2 and len(pts):
        # pcl::VoxelGrid is-finite skip (see voxel_downsample_device)
        pts = pts[np.all(np.isfinite(pts[:, :3]), axis=1)]
    if pts.size == 0:
        M = max_out or 0
        return np.zeros((M, pts.shape[1] if pts.ndim == 2 else 3), np.float32), np.zeros(M, bool)
    keys = np.floor(pts[:, :3] / leaf).astype(np.int64)
    # pack 3x21-bit signed coords into one int64 key
    packed = (
        ((keys[:, 0] + (1 << 20)) & 0x1FFFFF)
        | (((keys[:, 1] + (1 << 20)) & 0x1FFFFF) << 21)
        | (((keys[:, 2] + (1 << 20)) & 0x1FFFFF) << 42)
    )
    order = np.argsort(packed, kind="stable")
    sp = packed[order]
    first = np.ones(len(sp), bool)
    first[1:] = sp[1:] != sp[:-1]
    group = np.cumsum(first) - 1
    nv = group[-1] + 1
    sums = np.zeros((nv, pts.shape[1]), np.float64)
    np.add.at(sums, group, pts[order])
    counts = np.bincount(group, minlength=nv).astype(np.float64)
    cent = sums / counts[:, None]
    # restore scan order: voxel labeled by first occurrence
    first_idx = np.full(nv, len(pts), np.int64)
    np.minimum.at(first_idx, group, order)
    cent = cent[np.argsort(first_idx, kind="stable")]
    out = cent.astype(np.float32)
    if max_out is None:
        return out, np.ones(len(out), bool)
    M = max_out
    mask = np.zeros(M, bool)
    n = min(len(out), M)
    buf = np.zeros((M, pts.shape[1]), np.float32)
    buf[:n] = out[:n]
    mask[:n] = True
    return buf, mask


@functools.partial(jax.jit, static_argnames=("max_out", "grid_log2"))
def voxel_downsample_scatter(
    pts: jnp.ndarray, valid: jnp.ndarray, leaf, max_out: int,
    grid_log2: tuple = (8, 8, 6),
):
    """Sort-free device voxel filter: centroid accumulation by scatter
    into a wrapped dense cell grid (2^sum(grid_log2) cells), then
    prefix-sum compaction into `max_out` slots.

    ~3 scatters + one cumsum instead of a 4-key lexsort. NOTE: measured
    SLOWER than `voxel_downsample_device` inside the fused frame program
    on the axon v5e stack (572k -> 223k pts/s; large scatter buffers are
    a slow op class there) — kept as an alternative for stacks where
    sorts dominate. A rare within-scan cell alias (two voxels one grid
    period apart) drops the losing voxel's points (the claim phase is
    last-writer-wins) — benign for a scan filter. Output order is
    grid-cell order.
    """
    from . import dense_map as dmod  # local import; avoids cycle at load

    N, C = pts.shape
    l2 = grid_log2
    G = 1 << (l2[0] + l2[1] + l2[2])
    valid = valid & jnp.all(jnp.isfinite(pts[:, :3]), axis=-1)
    keys = jnp.floor(pts[:, :3] / leaf).astype(jnp.int32)
    kx = keys[:, 0] & ((1 << l2[0]) - 1)
    ky = keys[:, 1] & ((1 << l2[1]) - 1)
    kz = keys[:, 2] & ((1 << l2[2]) - 1)
    cell = ((kx << (l2[1] + l2[2])) | (ky << l2[2]) | kz).astype(jnp.int32)
    check = (dmod._mix64(keys) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    tgt = jnp.where(valid, cell, G)
    # claim: last writer wins the cell
    claimed = jnp.full(G, -1, jnp.int32).at[tgt].set(check, mode="drop")
    mine = valid & (claimed[cell] == check)
    tgt = jnp.where(mine, cell, G)
    sums = jnp.zeros((G, C), pts.dtype).at[tgt].add(
        jnp.where(mine[:, None], pts, 0.0), mode="drop"
    )
    cnt = jnp.zeros(G, pts.dtype).at[tgt].add(
        mine.astype(pts.dtype), mode="drop"
    )
    occ = cnt > 0
    slot = jnp.cumsum(occ.astype(jnp.int32)) - 1
    slot = jnp.where(occ & (slot < max_out), slot, max_out)
    out = jnp.zeros((max_out, C), pts.dtype).at[slot].set(
        sums / jnp.maximum(cnt, 1.0)[:, None], mode="drop"
    )
    mask = jnp.zeros(max_out, bool).at[slot].set(occ, mode="drop")
    return out, mask
