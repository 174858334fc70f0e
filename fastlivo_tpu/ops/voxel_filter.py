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

import numpy as np


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
