"""ctypes bindings for the native host-runtime library (native/ingest.cpp).

The reference's host runtime is C++ (decoders in preprocess.cpp, scan
filters via pcl::VoxelGrid); this module exposes the equivalent native
kernels with graceful fallback to the numpy implementations when the
shared library hasn't been built. Build with `make -C native` (g++ only,
no external deps); `load()` attempts that automatically once.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libfastlivo_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # always invoke make: it is an incremental no-op when the .so is
    # fresh (~30 ms) and rebuilds a STALE library after source updates
    # (load used to skip the build whenever the file merely existed)
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), "libfastlivo_native.so"],
            capture_output=True, timeout=120,
            check=not _LIB_PATH.exists(),
        )
    except Exception:
        if not _LIB_PATH.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.decode_avia.restype = ctypes.c_int
    lib.decode_avia.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    try:
        # round-5 symbols: a stale prebuilt .so on a box where make
        # failed may lack them — the older entry points must keep
        # working (graceful-degradation contract of this loader)
        lib.lz4_decompress_block.restype = ctypes.c_longlong
        lib.lz4_decompress_block.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_longlong,
        ]
        lib.xxh32_native.restype = ctypes.c_uint32
        lib.xxh32_native.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_uint32,
        ]
    except AttributeError:
        pass  # io/lz4._native probes the symbol and falls back
    lib.voxel_downsample_f32.restype = ctypes.c_int
    lib.voxel_downsample_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def decode_avia_native(points: np.ndarray, n_scans: int, blind: float,
                       point_filter_num: int):
    """points: structured array with the livox CustomPoint layout
    (offset_time u4, x/y/z f4, reflectivity/tag/line u1). Returns
    (xyzi (M,4) f32, t_rel (M,) f64) or None if the library is absent."""
    lib = load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(points)
    assert buf.dtype.itemsize == 19, buf.dtype
    n = len(buf)
    out_xyzi = np.empty((n, 4), np.float32)
    out_t = np.empty(n, np.float64)
    m = lib.decode_avia(
        buf.ctypes.data, n, n_scans, blind, point_filter_num,
        out_xyzi.ctypes.data, out_t.ctypes.data,
    )
    return out_xyzi[:m], out_t[:m]


def voxel_downsample_native(pts: np.ndarray, leaf: float,
                            max_out: int | None = None):
    """Centroid voxel filter; same contract as
    ops.voxel_filter.voxel_downsample. None if the library is absent."""
    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    n, cols = pts.shape
    if cols > 8:
        # the kernel accumulates at most 8 columns (sum[8]); wider rows
        # would return uninitialized memory in the extra columns —
        # fall back to the numpy path, which averages ALL columns
        return None
    cap = n if max_out is None else max(n, max_out)
    out = np.empty((cap, cols), np.float32)
    m = lib.voxel_downsample_f32(
        pts.ctypes.data, n, cols, leaf, out.ctypes.data, cap
    )
    if max_out is None:
        return out[:m], np.ones(m, bool)
    buf = np.zeros((max_out, cols), np.float32)
    k = min(m, max_out)
    buf[:k] = out[:k]
    mask = np.zeros(max_out, bool)
    mask[:k] = True
    return buf, mask


def give_feature_ring_native(pl, curv, rng, dista, blind, point_filter_num,
                             is_avia):
    """One ring through the native give_feature (native/ingest.cpp).
    Same contract as features.give_feature; None if library absent."""
    lib = load()
    if lib is None:
        return None
    if not hasattr(lib, "_gf_bound"):
        lib.give_feature_ring.restype = ctypes.c_int
        lib.give_feature_ring.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib._gf_bound = True
    pl = np.ascontiguousarray(pl, np.float64)
    curv = np.ascontiguousarray(curv, np.float64)
    rng = np.ascontiguousarray(rng, np.float64)
    dista = np.ascontiguousarray(dista, np.float64)
    n = len(pl)
    cap = max(n, 8)
    surf = np.empty((cap, 4), np.float64)
    corn = np.empty((cap, 4), np.float64)
    counts = np.zeros(2, np.int32)
    rc = lib.give_feature_ring(
        pl.ctypes.data, curv.ctypes.data, rng.ctypes.data, dista.ctypes.data,
        n, blind, point_filter_num, int(is_avia),
        surf.ctypes.data, cap, corn.ctypes.data, cap, counts.ctypes.data,
    )
    if rc != 0:
        return None
    return surf[: counts[0]].copy(), corn[: counts[1]].copy()
