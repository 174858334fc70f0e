"""Multi-chip SPMD scan step: residual rows sharded over a device mesh.

The reference is single-process (SURVEY.md §2.3: no NCCL/MPI backend
exists; OpenMP parallelizes the per-point loop, laserMapping.cpp:1516).
The TPU-native scaling axis is data parallelism over measurement rows:

  - the padded point batch is row-partitioned over mesh axis "dp"
    (`shard_map`); the voxel-hash map, the 18-dim state, and the
    extrinsics are replicated;
  - each device gathers kNN / fits planes / assembles its H-row block;
  - the 6x6 HᵀH and 6-vector Hᵀz partial sums are `psum`-all-reduced
    over ICI (the only cross-device traffic: ~160 B per EKF iteration);
  - every device runs the identical (tiny, replicated) 18x18 solve, so
    the iterated-EKF control flow stays lockstep without broadcasts.

Insertion here keeps the map replicated: world points are computed
shard-local, all-gathered, and each device applies the identical
batched scatter — the right trade below ~1 GB of map. For maps that
outgrow one chip's HBM, `parallel/sharded_map.py` block-partitions the
tiled map across the mesh (slab ownership + per-scan halo exchange).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import imu as imu_mod
from .. import lio as lio_mod
from ..ops import voxel_map as vm
from ..state import NavState


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis,))


def sharded_lio_update(
    mesh: Mesh,
    state: NavState,
    m: vm.VoxelMap,
    pts_body: jnp.ndarray,  # (N, 3); N divisible by mesh axis size
    pmask: jnp.ndarray,
    lid_rot: jnp.ndarray,
    lid_off: jnp.ndarray,
    laser_point_cov: float,
    max_iter: int = 4,
    knn_radius: int = 2,
    max_probe: int = 12,
    axis: str = "dp",
    plane_fit: str = "tls",
) -> lio_mod.LioResult:
    """`lio.lio_update` with the point batch sharded over `axis`.

    Returns the same LioResult; state/n_active/iters are replicated,
    pts_world/active/res keep the input point sharding.
    """

    def local(state, m, pts, mask, lr, lo):
        return lio_mod.lio_update(
            state, m, pts, mask, lr, lo,
            laser_point_cov=laser_point_cov,
            max_iter=max_iter,
            knn_radius=knn_radius,
            max_probe=max_probe,
            axis_name=axis,
            plane_fit=plane_fit,
        )

    rep = P()
    shd = P(axis)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: rep, state),
            jax.tree.map(lambda _: rep, m),
            shd, shd, rep, rep,
        ),
        out_specs=lio_mod.LioResult(
            state=jax.tree.map(lambda _: rep, state),
            pts_world=shd,
            active=shd,
            res=shd,
            n_active=rep,
            iters=rep,
        ),
        check_vma=False,
    )
    return fn(state, m, pts_body, pmask, lid_rot, lid_off)


def sharded_scan_step(
    mesh: Mesh,
    state: NavState,
    m: vm.VoxelMap,
    # propagation inputs (replicated; the IMU recursion is sequential+tiny)
    acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt, acc_s_last, angvel_last,
    calib: imu_mod.ImuCalib,
    # scan (sharded over points)
    pts_body, t_rel, pmask,
    laser_point_cov: float,
    max_iter: int = 4,
    knn_radius: int = 1,
    max_probe: int = 8,
    axis: str = "dp",
    plane_fit: str = "tls",
):
    """The FULL per-scan step under SPMD: IMU propagation (replicated)
    -> undistortion (sharded rows) -> iterated EKF (sharded rows, psum
    reductions) -> map insertion (all-gather + replicated scatter).

    Library building block, exercised by tests/test_sharded.py; the
    PRODUCT multichip path (and __graft_entry__.dryrun_multichip) runs
    parallel/product.MeshRunner through Pipeline(cfg, mesh=...)."""

    def step(state, m, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
             acc_s_last, angvel_last, pts_body, t_rel, pmask):
        st, pose, acc_l, ang_l = imu_mod.propagate(
            state, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
            acc_s_last, angvel_last, calib,
        )
        und = imu_mod.undistort(st, pose, pts_body, t_rel, pmask, calib)
        res = lio_mod.lio_update(
            st, m, und, pmask, calib.lid_rot, calib.lid_off,
            laser_point_cov=laser_point_cov, max_iter=max_iter,
            knn_radius=knn_radius, max_probe=max_probe, axis_name=axis,
            plane_fit=plane_fit,
        )
        # map insert: replicated scatter of the all-gathered world
        # batch, dispatched by backend (the hash backend takes the SAME
        # max_probe as the search — a deeper insert than search probes
        # would hide points from subsequent kNN)
        world = jax.lax.all_gather(res.pts_world, axis, tiled=True)
        wmask = jax.lax.all_gather(pmask, axis, tiled=True)
        mod = lio_mod.map_module(m)
        if mod is vm:
            m2 = vm.insert(m, world, wmask, max_probe=max_probe)
        else:
            m2 = mod.insert(m, world, wmask)
        return res.state, m2, res.n_active, acc_l, ang_l

    rep = P()
    shd = P(axis)
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: rep, state),
            jax.tree.map(lambda _: rep, m),
            rep, rep, rep, rep, rep, rep, rep, rep,
            shd, shd, shd,
        ),
        out_specs=(
            jax.tree.map(lambda _: rep, state),
            jax.tree.map(lambda _: rep, m),
            rep, rep, rep,
        ),
        check_vma=False,
    )
    return fn(state, m, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
              acc_s_last, angvel_last, pts_body, t_rel, pmask)


def sharded_photometric_update(
    mesh: Mesh,
    state,
    prior,
    cam,
    img,
    tr_pos, tr_patch, tr_slevel, tr_valid,
    Rci, Pci, Jdphi_dR, Jdp_dR,
    img_point_cov: float,
    patch_size: int,
    level: int,
    max_iter: int,
    axis: str = "dp",
    robust: str = "none",
):
    """vio.photometric_update with the tracked set row-partitioned over
    `axis` (image and state replicated): each device assembles its
    patch-residual block; HtH/Htz and the error norm are psum-reduced,
    so the coarse-to-fine iterated update stays lockstep."""
    from .. import vio as vio_mod

    def local(state, prior, cam, img, tp, tpa, tsl, tv):
        return vio_mod.photometric_update(
            state, prior, cam, img, tp, tpa, tsl, tv,
            Rci, Pci, Jdphi_dR, Jdp_dR,
            img_point_cov=img_point_cov, patch_size=patch_size,
            level=level, max_iter=max_iter, axis_name=axis,
            robust=robust,
        )

    rep = P()
    shd = P(axis)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: rep, state),
            jax.tree.map(lambda _: rep, prior),
            jax.tree.map(lambda _: rep, cam),
            rep, shd, shd, shd, shd,
        ),
        out_specs=(
            jax.tree.map(lambda _: rep, state),
            rep,  # G (18,6)
            shd,  # per-point errors
            rep,  # mean error
            rep,  # iteration count
        ),
        check_vma=False,
    )
    return fn(state, prior, cam, img, tr_pos, tr_patch, tr_slevel, tr_valid)
