"""Product-surface SPMD: the fused per-frame steps over a device mesh.

`parallel/sharded.py` holds the library-level sharded kernels (one
EKF update, one scan step) used by tests and the driver dryrun; this
module is the PRODUCT wiring: drop-in SPMD replacements for
`frame_step.lidar_frame_step` and `vio.vio_frame_step` with identical
call signatures and return pytrees, compiled once per (mesh, statics)
and consumed by `Pipeline`/`Vio` when the user passes ``--mesh N``
(run.py / serve.py) or ``Pipeline(cfg, mesh=...)``.

Sharding scheme (SURVEY.md §2.3's residual-row data parallelism — the
TPU-native replacement for the reference's OpenMP per-point loop,
laserMapping.cpp:1516):

  lidar frame (`MeshRunner.lidar_frame_step`):
    - the RAW point batch is row-partitioned over mesh axis "dp";
      undistortion runs shard-local (pose table replicated);
    - the undistorted scan is all-gathered (R·12 B over ICI) and the
      voxel downsample runs REPLICATED — its sorted-segment semantics
      make an exact sharded merge cost more than it saves, and
      replication keeps the downsampled batch bit-identical to the
      single-device path;
    - the iterated EKF consumes shard-local row slices of the
      downsampled batch; HᵀH/Hᵀz partials are psum-all-reduced inside
      `lio.lio_update` (~340 B per iteration over ICI), so every device
      runs the identical tiny 18x18 solve in lockstep;
    - map insertion and the dense world cloud are computed replicated
      from the gathered batch: identical scatters keep the replicated
      map bit-identical across devices.

  camera frame (`MeshRunner.vio_frame_step`): all inputs ride in
  replicated; `vio.vio_frame_step(axis_name=...)` internally
  row-partitions the candidate scoring (NC rows), the grid-cell winner
  phases incl. patch warps (G cells), the new-point Shi-Tomasi scoring
  (M rows), and the photometric EKF rows, reducing with pmin/pmax/psum
  and all-gathering the tracked set for the replicated visual-map
  scatters — see vio.select_tracked / select_new_points docstrings.

Numerical contract vs single-device: every per-row quantity is
bit-identical (same values, same ops); the only divergence is the
grouping of the f32 HᵀH/Hᵀz row reductions (shard partials + psum vs
one full-batch matmul), i.e. f32-epsilon per EKF iteration. End-to-end
trajectory equality is pinned by tests/test_mesh_product.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import imu as imu_mod
from .. import lio as lio_mod
from ..ops import voxel_filter as vf
from ..state import pack24


class MeshRunner:
    """Compiled SPMD frame steps for one mesh, cached per static config.

    One instance is shared by `Pipeline` (lidar frames) and `Vio`
    (camera frames); `check_capacity` rejects padded capacities the
    mesh size does not divide (the shipped capacities are powers of
    two, so any power-of-two mesh divides them)."""

    def __init__(self, mesh: Mesh, axis: str = "dp",
                 sharded_map: bool = False, halo_tiles: int = 256,
                 snap_dims: tuple = (128, 128, 64),
                 donate_maps: bool = False):
        """`sharded_map`: the lidar step consumes/returns a BLOCK-SHARDED
        map (a TiledMap with a leading device axis, one ownership-striped
        shard per device — parallel/sharded_backend.ShardedTiledBackend)
        instead of a replicated map: per-device map HBM scales ~1/N.
        kNN runs against a per-scan halo SNAPSHOT all-gathered from the
        owners (sharded_map.exchange_snapshot, `halo_tiles` contributed
        per device), so EKF semantics are unchanged — trajectory
        equality vs the replicated mesh path is pinned by
        tests/test_mesh_product.py."""
        self.mesh = mesh
        self.axis = axis
        self.n = mesh.shape[axis]
        self.sharded_map = sharded_map
        self.halo_tiles = halo_tiles
        # donate the map/visual-map argument buffers (in-place scatters
        # instead of a whole-map copy per frame; capacity.donate_maps —
        # see frame_step.lidar_frame_step_donated)
        self.donate_maps = donate_maps
        # snapshot directory dims: the map's own dims (full span) so a
        # wide scan AABB cannot wrap-alias inside the snapshot
        self.snap_dims = tuple(snap_dims)
        self._lidar_cache = {}
        self._vio_cache = {}

    def check_capacity(self, cap) -> None:
        for name in ("max_raw_points", "max_points"):
            v = getattr(cap, name)
            if v % self.n:
                raise ValueError(
                    f"capacity.{name}={v} is not divisible by the mesh "
                    f"size {self.n}; pad it to a multiple"
                )
        if self.sharded_map:
            for name in ("frame_ring", "vmap_points"):
                v = getattr(cap, name)
                if v % self.n:
                    raise ValueError(
                        f"capacity.{name}={v} is not divisible by the "
                        f"mesh size {self.n} (pool slots and obs-ring "
                        "rows shard in slabs under --sharded-map)"
                    )

    # -- lidar ----------------------------------------------------------
    def lidar_frame_step(self, state, m, pose, calib, pts_raw, t_rel,
                         rmask, filter_size_surf, laser_point_cov, *,
                         max_points, max_iter, knn_radius, max_probe,
                         dense_out=True, cache_knn=False,
                         mixed_gain=False, plane_fit="tls",
                         pallas_knn=False):
        """Drop-in for `frame_step.lidar_frame_step` (same returns)."""
        key = (max_points, max_iter, knn_radius, max_probe, dense_out,
               cache_knn, mixed_gain, plane_fit, pallas_knn,
               type(m).__name__, pts_raw.shape[0])
        fn = self._lidar_cache.get(key)
        if fn is None:
            build = (self._build_lidar_sharded_map if self.sharded_map
                     else self._build_lidar)
            fn = build(
                max_points=max_points, max_iter=max_iter,
                knn_radius=knn_radius, max_probe=max_probe,
                dense_out=dense_out, cache_knn=cache_knn,
                mixed_gain=mixed_gain, plane_fit=plane_fit,
                pallas_knn=pallas_knn,
            )
            self._lidar_cache[key] = fn
        return fn(state, m, pose, calib, pts_raw, t_rel, rmask,
                  jnp.asarray(filter_size_surf, pts_raw.dtype),
                  jnp.asarray(laser_point_cov, jnp.float32))

    def _build_lidar(self, *, max_points, max_iter, knn_radius, max_probe,
                     dense_out, cache_knn, mixed_gain, plane_fit,
                     pallas_knn=False):
        axis, n = self.axis, self.n
        if max_points % n:
            raise ValueError(
                f"max_points={max_points} not divisible by mesh size {n}"
            )
        mp_l = max_points // n

        def local(state, m, pose, calib, raw_l, trel_l, rmask_l, fss,
                  laser_point_cov):
            # shard-local undistortion over the raw rows
            und_l = imu_mod.undistort(state, pose, raw_l, trel_l,
                                      rmask_l, calib)
            # gather the scan (R·12 B over ICI) for the exact replicated
            # downsample; tiled all_gather restores the original row order
            und = jax.lax.all_gather(und_l, axis, tiled=True)
            rmask = jax.lax.all_gather(rmask_l, axis, tiled=True)
            down, dmask = vf.voxel_downsample_device(
                und, rmask, fss, max_points
            )
            i = jax.lax.axis_index(axis)
            down_l = jax.lax.dynamic_slice_in_dim(down, i * mp_l, mp_l)
            dmask_l = jax.lax.dynamic_slice_in_dim(dmask, i * mp_l, mp_l)
            res = lio_mod.lio_update(
                state, m, down_l, dmask_l, calib.lid_rot, calib.lid_off,
                laser_point_cov=laser_point_cov, max_iter=max_iter,
                knn_radius=knn_radius, max_probe=max_probe,
                axis_name=axis, cache_knn=cache_knn,
                mixed_gain=mixed_gain, plane_fit=plane_fit,
                pallas_knn=pallas_knn,
            )
            # replicated insert at the replicated posterior: identical
            # scatters keep the map bit-identical on every device
            # (map_incremental, laserMapping.cpp:692)
            rot32 = res.state.rot.astype(down.dtype)
            pos32 = res.state.pos.astype(down.dtype)
            p_imu = down @ calib.lid_rot.T + calib.lid_off
            world = p_imu @ rot32.T + pos32
            mod = lio_mod.map_module(m)
            from ..ops import voxel_map as vm_mod

            if mod is vm_mod:
                m2 = vm_mod.insert(m, world, dmask, max_probe=max_probe)
            else:
                m2 = mod.insert(m, world, dmask)
            if dense_out:
                dense_world = (
                    und @ calib.lid_rot.T + calib.lid_off
                ) @ rot32.T + pos32
                dense_world = jnp.where(rmask[:, None], dense_world, 0.0)
            else:
                dense_world = jnp.zeros((1, 3), down.dtype)
            active = jax.lax.all_gather(res.active, axis, tiled=True)
            resid = jax.lax.all_gather(res.res, axis, tiled=True)
            head = jnp.stack([
                jnp.sum(dmask).astype(jnp.float64),
                res.n_active.astype(jnp.float64),
                res.iters.astype(jnp.float64),
            ])
            n_act_safe = jnp.maximum(res.n_active.astype(jnp.float64), 1.0)
            res_rms = jnp.sqrt(
                jnp.sum(jnp.where(active, resid.astype(jnp.float64), 0.0)
                        ** 2) / n_act_safe
            )
            occ = (m2.n_alloc if hasattr(m2, "n_alloc") else m2.count)
            stats = jnp.concatenate([head, pack24(res.state),
                                     res_rms[None],
                                     occ.astype(jnp.float64)[None]])
            return (res.state, m2, down, dmask, res.n_active, res.iters,
                    dense_world, active, stats)

        shd = P(axis)
        rep = P()
        smapped = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(rep, rep, rep, rep, shd, shd, shd, rep, rep),
            out_specs=(rep, rep, rep, rep, rep, rep, rep, rep, rep),
            check_vma=False,
        )
        donate = (1,) if self.donate_maps else ()
        return jax.jit(smapped, donate_argnums=donate)

    def _build_lidar_sharded_map(self, *, max_points, max_iter, knn_radius,
                                 max_probe, dense_out, cache_knn,
                                 mixed_gain, plane_fit, pallas_knn=False):
        """The `sharded_map=True` lidar step: identical call protocol and
        returns as `_build_lidar`, but `m` is the block-sharded map (one
        ownership-striped TiledMap shard per device, leading device
        axis). Flow per frame (SURVEY §2.3 halo-exchange north star):

          undistort (sharded rows) -> all-gather scan -> replicated
          voxel downsample -> scan-AABB HALO EXCHANGE into a replicated
          per-scan snapshot (sharded_map.exchange_snapshot; each owner
          contributes its tiles inside the padded AABB) -> iterated EKF
          against the snapshot (sharded rows, psum'd HᵀH/Hᵀz — exactly
          the replicated path's math) -> ownership-masked insert into
          each device's own shard (ikd_Tree.cpp:382-457 semantics per
          owner).

        kNN parity vs the full map holds because queries reach at most
        (knn_radius+1) voxels beyond the scan AABB (pad includes a
        0.5 m margin for per-iteration state motion); the snapshot
        carries every owned tile intersecting that padded box, up to
        halo_tiles per device."""
        from . import sharded_map as sm

        axis, n = self.axis, self.n
        halo = self.halo_tiles
        snap_dims = self.snap_dims
        if max_points % n:
            raise ValueError(
                f"max_points={max_points} not divisible by mesh size {n}"
            )
        mp_l = max_points // n

        def local(state, shard, pose, calib, raw_l, trel_l, rmask_l, fss,
                  laser_point_cov):
            local_map = jax.tree.map(lambda x: x[0], shard)
            my_idx = jax.lax.axis_index(axis)
            und_l = imu_mod.undistort(state, pose, raw_l, trel_l,
                                      rmask_l, calib)
            und = jax.lax.all_gather(und_l, axis, tiled=True)
            rmask = jax.lax.all_gather(rmask_l, axis, tiled=True)
            down, dmask = vf.voxel_downsample_device(
                und, rmask, fss, max_points
            )
            down_l = jax.lax.dynamic_slice_in_dim(down, my_idx * mp_l, mp_l)
            dmask_l = jax.lax.dynamic_slice_in_dim(
                dmask, my_idx * mp_l, mp_l)
            # scan AABB at the PRIOR pose (replicated — no pmin needed:
            # down is identical on every device), padded by the kNN
            # neighborhood reach plus a margin for the cm-scale state
            # motion across EKF iterations
            rot32 = state.rot.astype(down.dtype)
            pos32 = state.pos.astype(down.dtype)
            w_prior = (down @ calib.lid_rot.T + calib.lid_off
                       ) @ rot32.T + pos32
            big = jnp.asarray(3.0e37, down.dtype)
            lo = jnp.min(jnp.where(dmask[:, None], w_prior, big), axis=0)
            hi = jnp.max(jnp.where(dmask[:, None], w_prior, -big), axis=0)
            vs = local_map.voxel_size
            pad = (knn_radius + 1) * vs + jnp.asarray(0.5, down.dtype)
            snap, halo_dropped = sm.exchange_snapshot(
                local_map, lo - pad, hi + pad, halo, axis,
                dir_dims=snap_dims,
            )
            res = lio_mod.lio_update(
                state, snap, down_l, dmask_l, calib.lid_rot, calib.lid_off,
                laser_point_cov=laser_point_cov, max_iter=max_iter,
                knn_radius=knn_radius, max_probe=max_probe,
                axis_name=axis, cache_knn=cache_knn,
                mixed_gain=mixed_gain, plane_fit=plane_fit,
                pallas_knn=pallas_knn,
            )
            # ownership-masked insert at the replicated posterior: each
            # device applies exactly the inserts the replicated map
            # would apply to its owned tiles (map_incremental,
            # laserMapping.cpp:692)
            rot32p = res.state.rot.astype(down.dtype)
            pos32p = res.state.pos.astype(down.dtype)
            p_imu = down @ calib.lid_rot.T + calib.lid_off
            world = p_imu @ rot32p.T + pos32p
            local2 = sm.shard_insert(local_map, world, dmask, my_idx, n)
            # halo overflow is DATA LOSS for this scan's kNN (missing
            # tiles -> missed neighbors): fold the psum'd count into the
            # shard's monotone n_dropped counter so it is observable
            # (tests + `extract_points`-style audits); size
            # capacity.halo_tiles so this stays zero
            local2 = local2._replace(
                n_dropped=local2.n_dropped + halo_dropped)
            if dense_out:
                dense_world = (
                    und @ calib.lid_rot.T + calib.lid_off
                ) @ rot32p.T + pos32p
                dense_world = jnp.where(rmask[:, None], dense_world, 0.0)
            else:
                dense_world = jnp.zeros((1, 3), down.dtype)
            active = jax.lax.all_gather(res.active, axis, tiled=True)
            resid = jax.lax.all_gather(res.res, axis, tiled=True)
            head = jnp.stack([
                jnp.sum(dmask).astype(jnp.float64),
                res.n_active.astype(jnp.float64),
                res.iters.astype(jnp.float64),
            ])
            n_act_safe = jnp.maximum(res.n_active.astype(jnp.float64), 1.0)
            res_rms = jnp.sqrt(
                jnp.sum(jnp.where(active, resid.astype(jnp.float64), 0.0)
                        ** 2) / n_act_safe
            )
            # occupancy = the FULLEST shard's allocation (the binding
            # pool constraint for the load-factor compaction trigger)
            occ = jax.lax.pmax(local2.n_alloc, axis)
            stats = jnp.concatenate([head, pack24(res.state),
                                     res_rms[None],
                                     occ.astype(jnp.float64)[None]])
            shard2 = jax.tree.map(lambda x: x[None], local2)
            return (res.state, shard2, down, dmask, res.n_active,
                    res.iters, dense_world, active, stats)

        shd = P(axis)
        rep = P()
        smapped = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(rep, shd, rep, rep, shd, shd, shd, rep, rep),
            out_specs=(rep, shd, rep, rep, rep, rep, rep, rep, rep),
            check_vma=False,
        )
        donate = (1,) if self.donate_maps else ()
        return jax.jit(smapped, donate_argnums=donate)

    # -- camera ---------------------------------------------------------
    def vio_frame_step(self, vm, cam, state, prior, gray, meta, cloud,
                       Rci, Pci, Jdphi_dR, Jdp_dR,
                       outlier_threshold, ncc_thre, img_point_cov, *,
                       grid_size, patch_size, gw, gh, ncc_en, max_iter,
                       max_pg, robust="none"):
        """Drop-in for `vio.vio_frame_step` (same returns, replicated)."""
        key = (grid_size, patch_size, gw, gh, ncc_en, max_iter,
               max_pg, robust, gray.shape, vm.pos.shape[0])
        fn = self._vio_cache.get(key)
        if fn is None:
            fn = self._build_vio(
                grid_size=grid_size, patch_size=patch_size, gw=gw, gh=gh,
                ncc_en=ncc_en, max_iter=max_iter,
                max_pg=max_pg, robust=robust,
            )
            self._vio_cache[key] = fn
        f32 = jnp.float32
        return fn(vm, cam, state, prior, gray, meta, cloud,
                  Rci, Pci, Jdphi_dR, Jdp_dR,
                  jnp.asarray(outlier_threshold, f32),
                  jnp.asarray(ncc_thre, f32),
                  jnp.asarray(img_point_cov))

    def _build_vio(self, **statics):
        from .. import vio as vio_mod
        from .. import visual_map as vmap_mod

        rep = P()
        if not self.sharded_map:
            local = functools.partial(
                vio_mod.vio_frame_step, axis_name=self.axis, **statics
            )
            in_specs = (rep,) * 14
            out_specs = (rep,) * 11
        else:
            # --sharded-map: the reference-image pool rides sharded
            # (slot-slab per device); everything else replicated. The
            # step's pool_axis branch owner-gathers the warps and
            # owner-writes the push (vio.select_tracked docstring).
            local = functools.partial(
                vio_mod.vio_frame_step, axis_name=self.axis,
                vmap_axis=self.axis, **statics
            )
            obs = P(self.axis)
            vm_spec = vmap_mod.VisualMap(
                **{f: rep for f in vmap_mod.VisualMap._fields}
            )._replace(imgs=obs, obs_px=obs, obs_rcw=obs, obs_pcw=obs,
                       obs_slot=obs, obs_fid=obs, obs_level=obs)
            in_specs = (vm_spec,) + (rep,) * 13
            out_specs = (rep, vm_spec) + (rep,) * 9
        smapped = shard_map(
            local,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
        donate = (0,) if self.donate_maps else ()  # the VisualMap
        return jax.jit(smapped, donate_argnums=donate)
