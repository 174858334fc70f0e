"""Fused per-scan device step: one dispatch per lidar frame.

Chains undistortion (imu.undistort) -> device voxel filter
(ops.voxel_filter.voxel_downsample_device) -> iterated EKF
(lio.lio_update) -> map insertion (ops.voxel_map.insert) inside a single
jit, so the steady-state lidar frame costs one host->device dispatch and
returns only small outputs (state, counts). This matters twice over: it
amortizes per-dispatch overhead (severe through the axon relay,
nontrivial anywhere), and it lets XLA overlap the stages.

The bootstrap paths (IMU init, first-map build, pre-EKF warm-up) stay on
the unfused pipeline path — they run a handful of times per session.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import imu as imu_mod
from . import lio as lio_mod
from .ops import dense_map as dm
from .ops import voxel_filter as vf
from .ops import voxel_map as vm
from .state import NavState, pack24


@functools.partial(jax.jit, static_argnames=("R",))
def stage_scan(w: jnp.ndarray, R: int):
    """One packed (B+1, 4) f32 upload -> ((R,3) pts, (R,) t_rel, (R,)
    mask) at the fused step's static capacity shape. Rows [0:B] carry
    [x y z t_rel]; row B carries the live count in column 0. B is the
    caller's pow2 bucket >= the scan size — uploading the zero-padded
    full-capacity buffers instead costs ~3x the wire (each relay upload
    also pays a flat ~2 ms service, so one pack beats three arrays)."""
    B = w.shape[0] - 1
    n = w[B, 0].astype(jnp.int32)
    pts = w[:B, 0:3]
    trel = w[:B, 3]
    if B < R:
        pts = jnp.zeros((R, 3), w.dtype).at[:B].set(pts)
        trel = jnp.zeros(R, w.dtype).at[:B].set(trel)
    mask = jnp.arange(R) < n
    return pts, trel, mask


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_points", "max_iter", "knn_radius", "max_probe", "dense_out",
        "cache_knn", "mixed_gain", "plane_fit", "pallas_knn",
    ),
)
def lidar_frame_step(
    state: NavState,  # propagated prior at scan end
    m: vm.VoxelMap,
    pose: imu_mod.PoseTable,  # merged per-scan table
    calib: imu_mod.ImuCalib,
    pts_raw: jnp.ndarray,  # (R, 3) raw lidar-frame points
    t_rel: jnp.ndarray,  # (R,)
    rmask: jnp.ndarray,  # (R,)
    filter_size_surf,
    laser_point_cov: float,
    max_points: int,
    max_iter: int,
    knn_radius: int,
    max_probe: int,
    dense_out: bool = True,
    cache_knn: bool = False,
    mixed_gain: bool = False,
    plane_fit: str = "tls",
    pallas_knn: bool = False,
):
    """Returns (posterior state, new map, down (max_points,3), dmask,
    n_active, iters, pts_world_dense (R,3) | zeros, active (max_points,),
    stats (29,) f64).

    `active` marks the downsampled points whose point-to-plane residual
    fed the final update — the /cloud_effected observability surface
    (publish_effect_world, laserMapping.cpp:871-885).

    `stats` (29,) packs [n_down, n_active, iters, pack24(posterior),
    residual_rms, map_occupancy] so an interactive caller gets every host-needed
    scalar plus the logged state row in ONE device->host transfer with
    no extra dispatch (each blocking read through the axon relay is a
    ~30 ms round trip). residual_rms is the posterior point-to-plane
    RMS over active rows — the online filter-health signal."""
    und = imu_mod.undistort(state, pose, pts_raw, t_rel, rmask, calib)
    down, dmask = vf.voxel_downsample_device(
        und, rmask, filter_size_surf, max_points
    )
    res = lio_mod.lio_update(
        state, m, down, dmask, calib.lid_rot, calib.lid_off,
        laser_point_cov=laser_point_cov, max_iter=max_iter,
        knn_radius=knn_radius, max_probe=max_probe,
        cache_knn=cache_knn, mixed_gain=mixed_gain, plane_fit=plane_fit,
        pallas_knn=pallas_knn,
    )
    # map insert at the posterior (map_incremental, laserMapping.cpp:692)
    # — res.pts_world IS the downsampled batch at the posterior pose
    # (lio_update's final world_pts), so no re-transform here
    rot32 = res.state.rot.astype(down.dtype)
    pos32 = res.state.pos.astype(down.dtype)
    world = res.pts_world
    mod = lio_mod.map_module(m)
    if mod is vm:
        m2 = vm.insert(m, world, dmask, max_probe=max_probe)
    else:
        m2 = mod.insert(m, world, dmask)
    if dense_out:
        dense_world = (
            und @ calib.lid_rot.T + calib.lid_off
        ) @ rot32.T + pos32
        dense_world = jnp.where(rmask[:, None], dense_world, 0.0)
    else:
        dense_world = jnp.zeros((1, 3), down.dtype)
    head = jnp.stack([
        jnp.sum(dmask).astype(jnp.float64),
        res.n_active.astype(jnp.float64),
        res.iters.astype(jnp.float64),
    ])
    # posterior point-to-plane residual RMS over the active rows: an
    # ONLINE filter-health signal (rises on degeneracy/divergence long
    # before the trajectory visibly breaks; no ground truth needed) —
    # rides the same packed transfer, costing nothing extra
    n_act_safe = jnp.maximum(res.n_active.astype(jnp.float64), 1.0)
    res_rms = jnp.sqrt(
        jnp.sum(jnp.where(res.active, res.res.astype(jnp.float64), 0.0)
                ** 2) / n_act_safe
    )
    # map occupancy rides the packed row so load-factor checks
    # (_maybe_rebuild) never issue a blocking device read mid-stream —
    # float(map.n_alloc) drains the whole dispatch queue through the
    # relay (~a block of compute) before returning
    occ = (m2.n_alloc if hasattr(m2, "n_alloc") else m2.count)
    stats = jnp.concatenate([head, pack24(res.state), res_rms[None],
                             occ.astype(jnp.float64)[None]])
    return (res.state, m2, down, dmask, res.n_active, res.iters,
            dense_world, res.active, stats)


# Donating variant (capacity.donate_maps): the map argument's buffers
# are DONATED so the insert scatters update in place instead of copying
# the whole map every frame (~134 MB/frame at the shipped 16384-tile
# pool — comparable to the entire step's HBM traffic). ATTACHED
# HARDWARE ONLY: one donated dispatch permanently drops the axon relay
# session into a 1.5-27 ms slow path (ops/voxel_map.insert note), so
# the default stays copy-based. Callers must not touch the donated map
# value afterwards (Pipeline replaces self.map with the output
# immediately).
lidar_frame_step_donated = functools.partial(
    jax.jit,
    static_argnames=(
        "max_points", "max_iter", "knn_radius", "max_probe", "dense_out",
        "cache_knn", "mixed_gain", "plane_fit", "pallas_knn",
    ),
    donate_argnums=(1,),
)(lidar_frame_step.__wrapped__)
