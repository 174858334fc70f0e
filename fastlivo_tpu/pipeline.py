"""Per-frame orchestration: the `main()` loop of the framework.

Host-side equivalent of the reference's node loop
(reference: src/laserMapping.cpp:1260-1818) wired to the device-side
subsystems: IMU propagation (imu.py), the voxel-hash map (ops/voxel_map),
the LIO iterated EKF (lio.py), and — when images are enabled — the
VIO photometric update (vio.py).

Frame protocol per measurement group (sync.py):
  - IMU-init phase: accumulate static samples (IMU_init,
    IMU_Processing.cpp:137-182); groups are consumed without estimation;
    `first_lidar_time` tracks the current scan begin until ready.
  - image group (`is_lidar_end=False`): propagate state+cov to the image
    time; run the VIO update (laserMapping.cpp:1319-1390).
  - lidar-end group: propagate to scan end, motion-compensate the whole
    scan into the scan-end lidar frame using the merged per-scan pose
    table (deviation from the reference documented in imu.py: consistent
    time origins across segments), slide the local map
    (lasermap_fov_segment :363-421), voxel-downsample, run the LIO
    iterated EKF (:1506-1732) once `flg_EKF_inited` (0.5 s after
    `first_lidar_time`, :79,1317), then insert the scan into the map
    (map_incremental :692-706).
"""
from __future__ import annotations

import dataclasses
import time
import warnings
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from . import imu as imu_mod
from . import lio as lio_mod
from . import state as state_mod
from .config import Config
from .ops import voxel_map as vm
from .ops.voxel_filter import voxel_downsample, voxel_downsample_device
from .state import NavState, identity_state
from .sync import MeasureGroup, Synchronizer

INIT_TIME = 0.5  # seconds before the EKF activates (laserMapping.cpp:79)
REBUILD_CHECK_EVERY = 32  # frames between map load-factor checks


def _read_back(stats_j, dense_j, N):
    """Reader-thread job (async_read): the frame's ONLY blocking
    device->host transfers, off the critical path."""
    stats = np.asarray(stats_j)
    dense = np.asarray(dense_j)[:N] if dense_j is not None else None
    return stats, dense


@dataclasses.dataclass
class FrameOutput:
    t: float  # scan end time (odometry stamp)
    pos: np.ndarray  # (3,)
    quat: np.ndarray  # (4,) [w, x, y, z]
    vel: np.ndarray  # (3,)
    n_active: int
    iters: int
    n_points: int
    timing: dict
    # posterior point-to-plane residual RMS over active rows — online
    # filter-health signal (no ground truth needed); 0 during warm-up
    res_rms: float = 0.0
    pts_world: Optional[np.ndarray] = None  # dense undistorted world cloud
    intensity: Optional[np.ndarray] = None  # per-point, aligned with pts_world


class Pipeline:
    def __init__(self, cfg: Config, vio=None, log_dir=None, mesh=None,
                 sharded_map: bool = False):
        """`mesh`: optional `jax.sharding.Mesh` — runs the fused lidar
        and camera frame steps SPMD over its devices (parallel/product
        .py MeshRunner; `--mesh N` on the CLIs). Same call protocol,
        same outputs; trajectories match single-device to f32-reduction
        epsilon (tests/test_mesh_product.py).

        `sharded_map` (requires `mesh` + the tiled backend): BLOCK-SHARD
        the geometric map across the mesh — each device's pool holds
        only its ownership slab (~tiled_pool/N tiles), and the EKF's kNN
        runs against a per-scan halo snapshot all-gathered from the
        owners (parallel/sharded_backend + sharded_map; `--sharded-map`
        on the CLIs). Per-device map HBM scales ~1/N; trajectories match
        the replicated-map mesh path (tests/test_mesh_product.py)."""
        self.cfg = cfg
        self.logger = None
        if log_dir is not None:
            from .logging_util import TraceLogger

            self.logger = TraceLogger(log_dir)
        cap = cfg.capacity
        # merged per-scan pose-table capacity: a scan accumulates one
        # segment per measurement group (scan end + interleaved images),
        # each bounded by max_imu_per_group rows plus its start row
        self.max_scan_poses = max(8 * (cap.max_imu_per_group + 1), 128)
        self._decimation_warned = False
        self.rgb_cloud: List[np.ndarray] = []  # accumulated (x,y,z,r,g,b)
        self.sync = Synchronizer(img_enable=cfg.img_enable)
        self.initializer = imu_mod.ImuInitializer()
        self.init_done = False
        self.calib: Optional[imu_mod.ImuCalib] = None
        self.state: NavState = identity_state()
        if sharded_map:
            if mesh is None:
                raise ValueError("sharded_map requires a mesh")
            if cap.map_backend != "tiled":
                raise ValueError(
                    "sharded_map requires the tiled map backend "
                    f"(map_backend={cap.map_backend!r})"
                )
            from .parallel.sharded_backend import ShardedTiledBackend

            self._map_mod = ShardedTiledBackend(mesh)
            self._make_map = lambda: self._map_mod.empty(
                cap.tiled_dir_dims, cap.tiled_pool, cfg.filter_size_map
            )
            self.map = self._make_map()
        elif cap.map_backend == "dense":
            from .ops import dense_map as dm

            self._make_map = lambda: dm.empty_dense_map(
                cap.dense_dims, cfg.filter_size_map)
            self.map = self._make_map()
            self._map_mod = dm
        elif cap.map_backend == "tiled":
            from .ops import tiled_map as tmod

            self._make_map = lambda: tmod.empty_tiled_map(
                cap.tiled_dir_dims, cap.tiled_pool, cfg.filter_size_map
            )
            self.map = self._make_map()
            self._map_mod = tmod
        else:
            self._make_map = lambda: vm.empty_map(
                cap.map_table_size, cfg.filter_size_map)
            self.map = self._make_map()
            self._map_mod = vm
        self.map_built = False
        self._rms_high_streak = 0
        self.auto_resets = 0  # divergence-watchdog restart count
        self._frames_since_rebuild_check = 0
        # per-frame jit scalar args cached as committed device arrays —
        # passing a Python float re-uploads a scalar every call (~2 ms
        # of relay service each). Dtypes preserve the original traced
        # semantics exactly: filter_size_surf was already f32 at the
        # call site; laser_point_cov is consumed via asarray(·, f64).
        self._fss_dev = jnp.float32(cfg.filter_size_surf)
        self._lpc_dev = jnp.asarray(float(cfg.laser_point_cov), jnp.float64)
        # grow-only pow2 shape buckets (see _stage_scan / _propagate):
        # stable executable shapes under sensor-size jitter
        self._scan_bucket = 0
        self._imu_bucket = 0
        self.profile_every = 0  # >0: staged re-dispatch every N frames
        self._n_steady = 0  # steady-state lidar frames (profile cadence)
        self.last_stage_profile: Optional[dict] = None
        self.tracker = lio_mod.LocalMapTracker(cfg.cube_side_length,
                                               mode=cap.slider)
        self.mesh_runner = None
        if mesh is not None:
            from .parallel.product import MeshRunner

            self.mesh_runner = MeshRunner(
                mesh, sharded_map=sharded_map, halo_tiles=cap.halo_tiles,
                snap_dims=cap.tiled_dir_dims,
                donate_maps=cap.donate_maps,
            )
            self.mesh_runner.check_capacity(cap)
        if vio is None and cfg.img_enable:
            from .vio import Vio

            vio = Vio(cfg, mesh_runner=self.mesh_runner)
        self.vio = vio

        self.first_lidar_time: Optional[float] = None
        self.ready = False
        self.last_imu: Optional[tuple] = None  # (t, acc, gyr)
        self.last_group_end: Optional[float] = None
        self.acc_s_last = jnp.zeros(3, jnp.float32)
        self.angvel_last = jnp.zeros(3, jnp.float32)
        # per-scan pose-table segments: (device pose pack, host kept-row
        # indices) per consumed group — merged on device per scan
        self._scan_tables: List[tuple] = []
        self._scan_id = None
        self.outputs: List[FrameOutput] = []
        self.on_frame = None  # per-frame callback (e.g. viz.LiveViewer.update)
        # DEVICE pose pack of the last consumed IMU group (its final row
        # is pack24 of the propagated state), refreshed per group and
        # invalidated by any update; only materialized (one device read)
        # when trace logging needs the mat_pre row
        self._prop_pack_dev = None
        # host pack24 of the previous frame's posterior — free from the
        # frame's packed stats read; feeds the local-map slider
        self._last_post = None
        # host copy of the map's occupancy scalar, refreshed from each
        # frame's packed stats row (stats[28]) — lets _maybe_rebuild's
        # load-factor check run without a blocking device read (which
        # drains the whole dispatch queue through the relay). None until
        # the first fused frame resolves, or after a compact/rebuild.
        self._map_occ_host: Optional[float] = None
        # device handle of the last fused frame's full dense cloud
        # (handed to the VIO without a host round trip)
        self._dense_dev = None
        self.trajectory: List[np.ndarray] = []  # TUM rows
        # /cloud_effected parity: (down_pts, active_mask) of the last frame
        self.last_effect = None
        # current frame's dense world cloud (device handle, overwritten
        # each frame — bounded); FrameOutput.pts_world is materialized
        # only when a consumer (PCD/viz) is configured
        self.last_dense = None
        # opt-in for library consumers that read outputs[i].pts_world
        # after a run without enabling PCD saving or a viz hook: forces
        # per-frame materialization of the dense cloud (one extra
        # blocking device read per frame) — see docs/API.md
        self.materialize_dense = False
        # opt-in (eval runs): collect the per-frame posterior covariance
        # for consistency metrics (eval.py NEES); costs one extra
        # device read per frame, so off in production
        self.collect_cov = False
        self.covs: List[np.ndarray] = []
        # DEFERRED READBACK (opt-in, serving/interactive): the fused
        # frame's single blocking stats read moves to a reader thread
        # and resolves `async_depth` frames later (at the END of that
        # frame's processing, after its dispatches), so the ~30-75 ms
        # relay round trip overlaps whole frames of host prep + dispatch
        # instead of serializing with them. Steady-state frame wall
        # converges to ~(host_work + RTT)/(depth+1). FrameOutputs then
        # materialize `async_depth` frames late (call `finish()` at end
        # of stream); timing reflects dispatch wall only; the map slider
        # consumes a posterior `async_depth` frames old (same class of
        # deviation as the documented one-frame slider lag — cm against
        # a 450 m slide margin). Exactly ONE blocking read per frame.
        self._async_read = False
        self.async_depth = 1
        self._reader = None
        self._pending: List[dict] = []
        # BLOCK-PACKED READBACK (replay.BlockReadCollector, set by the
        # LIVO block replayer): the fused frame hands its packed stats
        # row to the collector as a DEVICE handle and emits nothing; the
        # collector stacks a whole block's rows on device and
        # materializes them in ONE transfer. Offline-replay-only: a
        # per-frame read costs a full relay service interval (~55 ms)
        # even off the critical path, so read COUNT — not op count — is
        # what bounds per-frame replay modes (docs/PERF_ANALYSIS.md r3).
        self.read_collector = None
        # True when THIS pipeline installed the collector via
        # enable_block_read (live mode): spin()/finish() then own the
        # flush/drain cadence. Replayer-installed collectors manage
        # their own cadence and must not be double-flushed.
        self._own_collector = False

    @property
    def async_read(self) -> bool:
        return self._async_read

    @async_read.setter
    def async_read(self, v: bool):
        self._async_read = bool(v)
        if self.vio is not None:
            # camera frames get the same deferred-readback treatment
            # (vio.update submits its stats read and resolves it at the
            # next camera frame); debug mode keeps sync reads (overlay)
            self.vio.async_read = self._async_read

    # --- ingestion passthrough ------------------------------------------
    def push_lidar(self, stamp, pts, t_rel):
        self.sync.push_lidar(stamp, pts, t_rel)

    def push_imu(self, stamp, acc, gyr):
        self.sync.push_imu(stamp, acc, gyr)

    def push_img(self, stamp, img):
        self.sync.push_img(stamp, img)

    def spin(self) -> List[FrameOutput]:
        """Process every ready measurement group; returns new frame
        outputs (with `async_read`, a frame's output materializes at the
        NEXT frame — call `finish()` at end of stream for the last one)."""
        n0 = len(self.outputs)
        if self.sync.reset_flagged:
            self._reset_imu()
            self.sync.reset_flagged = False
        for g in self.sync.drain():
            self._process_group(g)
            c = self.read_collector
            if self._own_collector and c is not None and len(c) >= c.E:
                c.flush()
        if not self.async_read and self._pending:
            # async_read was toggled off mid-stream with frames still in
            # flight: resolve them now (asserting here crashed the
            # toggle path; review r5)
            self._resolve_pending()
        return self.outputs[n0:]

    def finish(self) -> List[FrameOutput]:
        """Resolve all deferred frames (async_read / block-read modes)
        at end of stream; returns the late outputs (empty in sync
        mode)."""
        n0 = len(self.outputs)
        if self._own_collector and self.read_collector is not None:
            self.read_collector.drain()
        self._resolve_pending()
        if self.vio is not None:
            self.vio.resolve_pending()
        return self.outputs[n0:]

    def enable_block_read(self, block: int) -> None:
        """LIVE block-packed readback (`serve.py --block-read E`): pack
        every `block` measurement EVENTS' stats rows (a lidar frame and
        a camera frame are one event each) into ONE deferred device
        read, flushed at event granularity from `spin()`.

        The per-frame deferred-read path (`async_read`) pays a relay
        read service interval per event; the collector's packed rows
        divide that bound by `block`, and even at block=1 its
        no-read-on-dispatch structure measured the full-LIVO pair at
        84.5 ms vs 146 ms for per-frame deferred reads — identical to
        E=8 block replay (scripts/bench_livo_modes.py, same session).
        Outputs are bit-identical, materialized up to ~2*block events
        late (BlockReadCollector.flush emits the previous block after
        dispatching the current one) — at 10+10 Hz and block=2 that is
        ~100-200 ms of output latency for ~1.7x pair throughput.

        Per-frame host consumers (trace logging, PCD save, on_frame
        hook, materialize_dense, collect_cov, debug) need per-frame
        reads and are rejected, mirroring LivoBlockReplayer's
        fallback condition."""
        from .replay import BlockReadCollector

        if (self.logger is not None or self.cfg.pcd_save_en
                or self.on_frame is not None or self.materialize_dense
                or self.collect_cov or self.cfg.debug):
            raise ValueError(
                "enable_block_read: per-frame consumers (logging, PCD, "
                "on_frame, materialize_dense, collect_cov, debug) need "
                "per-frame reads; use async_read instead"
            )
        c = BlockReadCollector(self, int(block))
        self.read_collector = c
        self._own_collector = True
        if self.vio is not None:
            self.vio.read_collector = c

    def _ensure_reader(self):
        if self._reader is None:
            from concurrent.futures import ThreadPoolExecutor

            self._reader = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fastlivo-read"
            )
        return self._reader

    def _resolve_oldest(self) -> Optional[FrameOutput]:
        """Materialize the oldest deferred frame: its D2H transfer has
        been riding the reader thread for up to `async_depth` frames of
        host work, so this blocks only for the round trip's remainder."""
        if not self._pending:
            return None
        pend = self._pending.pop(0)
        stats, dense_np = pend["fut"].result()
        if len(stats) > 28:
            self._map_occ_host = float(stats[28])
        return self._emit_output(
            scan=pend["scan"],
            post_pack=stats[3:27],
            n_down=int(stats[0]), n_active=int(stats[1]),
            iters=int(stats[2]), res_rms=float(stats[27]),
            dense_world=dense_np, inten_np=pend["inten_np"],
            cov_handle=pend["cov_handle"], timing=pend["timing"],
        )

    def _resolve_pending(self) -> None:
        """Drain every deferred frame (stream end / reset barriers)."""
        while self._pending:
            self._resolve_oldest()

    def _reset_imu(self):
        """Loop-back recovery (laserMapping.cpp:1273-1279 'reset when
        rosbag play back' + ImuProcess::Reset, IMU_Processing.cpp:31-44):
        a sensor-timestamp regression cleared the sync buffers; restart
        IMU initialization and drop the propagation context so stale
        timestamps cannot poison the next groups. The estimator state
        itself is kept, matching the reference (only p_imu is reset)."""
        warnings.warn("sensor loop-back detected: resetting IMU processor",
                      RuntimeWarning)
        self._resolve_pending()  # flush any deferred frame before reset
        self.initializer = imu_mod.ImuInitializer()
        self.init_done = False
        self.calib = None
        self.last_imu = None
        self.last_group_end = None
        self.acc_s_last = jnp.zeros(3, jnp.float32)
        self.angvel_last = jnp.zeros(3, jnp.float32)
        self._scan_tables = []
        self._scan_id = None
        self.sync.reset_open_scan()

    def warm_start(self, state, m, visual=None, calib=None):
        """Restore a checkpoint (io/checkpoint.load's tuple) into this
        pipeline. With `calib` (snapshots taken by --save-ckpt carry
        it), the 200-sample static IMU initialization is SKIPPED — rig
        calibration is not trajectory state — and the EKF engages on
        the first post-restore scan (the restored state is already
        converged; re-running the INIT_TIME warm-up would insert
        uncorrected scans). Without calib (older snapshots), the
        restored maps load but IMU init re-runs on the live stream."""
        from . import lio as lio_mod

        self.state = state
        self.map = m
        self._map_mod = lio_mod.map_module(m)  # checkpoint wins over cfg
        self.map_built = True
        if visual is not None and self.vio is not None:
            self.vio.vmap = visual
        if calib is not None:
            self.calib = calib
            self.init_done = True
        return self

    def checkpointable_map(self):
        """The map as a single-device artifact for io/checkpoint.save.
        Under --sharded-map the shards' live points merge into one
        TiledMap (ownership is disjoint, so build_host reproduces the
        exact content; a restored map re-shards from the stream)."""
        if getattr(self._map_mod, "is_sharded", False):
            from .ops import tiled_map as tmod

            pts_all, _ = self._map_mod.extract_points(self.map)
            cap = self.cfg.capacity
            return tmod.build_host(
                pts_all, cap.tiled_dir_dims, cap.tiled_pool,
                float(self.cfg.filter_size_map),
            )
        return self.map

    # --- internals -------------------------------------------------------
    def _feed_initializer(self, g: MeasureGroup):
        for i in range(len(g.imu_t)):
            self.initializer.push(g.imu_acc[i], g.imu_gyr[i])
        if len(g.imu_t):
            self.last_imu = (g.imu_t[-1], g.imu_acc[-1], g.imu_gyr[-1])
        if self.initializer.done:
            cfg = self.cfg
            self.calib = self.initializer.calib(
                cfg.mapping.acc_cov_scale,
                cfg.mapping.gyr_cov_scale,
                cfg.extrinsic_R,
                cfg.extrinsic_T,
            )
            grav = self.initializer.gravity()
            self.state = self.state._replace(
                grav=jnp.asarray(grav, jnp.float64),
                bg=jnp.asarray(self.initializer.mean_gyr, jnp.float64),
                rot=jnp.eye(3, dtype=jnp.float64),
            )
            self.init_done = True
            self._prop_pack_dev = None  # state changed outside propagation
            self.last_group_end = g.scan.beg_time if g.scan else float(g.imu_t[-1])

    def _propagate(self, g: MeasureGroup, end_time: float):
        """Propagate state+cov over the group's IMU block; stash the pose
        segment for scan-end undistortion."""
        scan = g.scan
        cap = self.cfg.capacity.max_imu_per_group
        # prepend the previous group's last sample (IMU_Processing.cpp:618)
        if self.last_imu is not None:
            imu_t = np.concatenate([[self.last_imu[0]], g.imu_t])
            imu_acc = np.concatenate([[self.last_imu[1]], g.imu_acc])
            imu_gyr = np.concatenate([[self.last_imu[2]], g.imu_gyr])
        else:
            imu_t, imu_acc, imu_gyr = g.imu_t, g.imu_acc, g.imu_gyr
        if len(g.imu_t):
            self.last_imu = (g.imu_t[-1], g.imu_acc[-1], g.imu_gyr[-1])

        if self.last_group_end is None:
            # warm restart: the first post-restore group anchors the
            # IMU-time continuity at its own start (the checkpoint gap
            # is not integrated)
            self.last_group_end = (scan.beg_time if scan is not None
                                   else float(imu_t[0]))
        acc_avg, gyr_avg, dt, offs, valid, tail_dt, row0_off = imu_mod.prepare_pairs(
            imu_t, imu_acc, imu_gyr,
            beg_time=scan.beg_time,
            end_time=end_time,
            last_end_time=self.last_group_end,
            max_pairs=cap,
        )
        if self.logger is not None and self.first_lidar_time is not None:
            # per-pair averaged IMU trace (fout_imu, IMU_Processing.cpp:681:
            # head stamp rel. first lidar, raw angvel_avr, raw acc_avr)
            for i in np.nonzero(valid)[0]:
                self.logger.log_imu(
                    imu_t[i] - self.first_lidar_time, acc_avg[i], gyr_avg[i]
                )
        # ONE fused dispatch (propagate + on-device pose pack) fed from
        # ONE packed upload per group — interactive frame time through
        # the relay is round-trip-count-bound, not compute-bound, and
        # each device_put costs a ~2 ms service interval regardless of
        # size (7 separate uploads here measured ~13 ms of pure wire)
        # pow2-bucket the scan length to the group's live pair count:
        # the relay prices composite executables per EXECUTED op, so
        # propagating over the full 64-row capacity when a 20 Hz event
        # group carries ~10 IMU pairs paid ~4-6x the 18x18 f64
        # covariance recursion for rows that are masked no-ops
        n_rows = max(len(imu_t) - 1, 0)
        B = min(cap, 1 << max(3, int(max(n_rows - 1, 1)).bit_length()))
        B = max(B, self._imu_bucket)  # grow-only (see _stage_scan)
        self._imu_bucket = B
        wire = imu_mod.pack_pairs_wire(
            acc_avg[:B], gyr_avg[:B], dt[:B], offs[:B], valid[:B],
            tail_dt, row0_off
        )
        st, pose_pack, self.acc_s_last, self.angvel_last = (
            imu_mod.propagate_wire(
                self.state, jnp.asarray(wire),
                self.acc_s_last, self.angvel_last, self.calib,
            )
        )
        self.state = st
        self._prop_pack_dev = pose_pack
        self.last_group_end = end_time
        # kept rows: row0 + the valid pairs (host-known, no device read)
        keep = np.concatenate([[True], valid[:B]])
        self._scan_tables.append(
            (pose_pack, np.nonzero(keep)[0].astype(np.int32))
        )

    def _merged_pose_table(self) -> imu_mod.PoseTable:
        """Per-scan pose table merged ON DEVICE from the groups' pose
        packs (imu.merge_pose_packs) — the host only builds the int32
        gather plan, so the interactive path pays zero device reads
        here (each read is a full relay round trip)."""
        segs = self._scan_tables
        flat, off = [], 0
        for pack, idx in segs:
            flat.append(idx + off)
            off += pack.shape[0] - 1  # base rows (last row = state pack)
        flat = np.concatenate(flat)
        M = self.max_scan_poses
        if len(flat) > M:
            raise ValueError(f"scan pose table overflow: {len(flat)} > {M}")
        K = len(flat)
        idx_p = np.full(M, flat[-1], np.int32)
        idx_p[:K] = flat
        valid = np.zeros(M, bool)
        valid[:K] = True
        return imu_mod.merge_pose_packs(
            tuple(p for p, _ in segs), jnp.asarray(idx_p),
            jnp.asarray(valid), m_out=M,
        )

    def _process_group(self, g: MeasureGroup) -> Optional[FrameOutput]:
        if self.cfg.debug:
            g.debug_show()  # laserMapping.cpp:1295-1298
        scan = g.scan
        if scan is not None and self._scan_id is not scan:
            self._scan_id = scan
            self._scan_tables = []

        if not self.init_done:
            self._feed_initializer(g)
            if scan is not None:
                self.first_lidar_time = scan.beg_time
            return None
        if self.first_lidar_time is None and scan is not None:
            # warm restart (warm_start with calib): only then is
            # init_done True with no lidar seen — backdate the epoch so
            # ekf_inited is true from the first frame
            self.first_lidar_time = scan.beg_time - INIT_TIME

        t0 = time.perf_counter()
        end_time = scan.end_time if g.is_lidar_end else scan.beg_time + g.img_offset_time
        self._propagate(g, end_time)
        state_propagat = self.state

        if not g.is_lidar_end:
            # VIO update at the image timestamp (laserMapping.cpp:
            # 1319-1390). The reference runs detect on EVERY image group
            # once the IMU is initialized — it has no EKF-inited gate
            # here (a previous INIT_TIME gate suppressed the first 0.5 s
            # of images; removed for parity). Its only guard is
            # `first_lidar_time < 10` (:1323) — an EPOCH-seconds check
            # that is inert on real bags (epoch >> 10) and would disable
            # VIO entirely on zero-based synthetic clocks, so that quirk
            # is deliberately not reproduced.
            if self.vio is not None and self.ready and self.first_lidar_time is not None:
                self.state = self.vio.update(self.state, state_propagat, g.img)
                self._prop_pack_dev = None  # posterior != propagated
            return None

        # ---- lidar-end frame: undistort whole scan ----------------------
        if self.logger is not None:
            # propagated (pre-update) state row = the final row of the
            # group's device pose pack; materializing it costs one
            # device read per frame, paid only when trace logging is on
            self.logger.log_pre(
                scan.end_time,
                np.asarray(self._prop_pack_dev[-1])
                if self._prop_pack_dev is not None
                else state_mod.pack24_host(self.state))
        pose_table = self._merged_pose_table()
        cap = self.cfg.capacity
        N = len(scan.pts)
        rawcap = cap.max_raw_points
        if N > rawcap:
            stride = -(-N // rawcap)
            if not self._decimation_warned:
                self._decimation_warned = True
                warnings.warn(
                    f"raw scan of {N} points exceeds capacity.max_raw_points="
                    f"{rawcap}; stride-decimating by {stride} (coverage loss)."
                    " Raise the capacity to keep full scans.",
                    RuntimeWarning,
                )
            sel = slice(0, N, stride)
            pts_np = scan.pts[sel, :3]
            t_rel_np = scan.t_rel[sel]
            N = len(pts_np)
            inten_np = (scan.pts[sel, 3] if scan.pts.shape[1] > 3 else None)
        else:
            pts_np, t_rel_np = scan.pts[:, :3], scan.t_rel
            inten_np = (scan.pts[:, 3] if scan.pts.shape[1] > 3 else None)
        if not self.ready:
            self.ready = True
        ekf_inited = (
            self.first_lidar_time is not None
            and scan.beg_time - self.first_lidar_time >= INIT_TIME
        )

        # ---- sliding local map (lasermap_fov_segment) --------------------
        # The reference slides on the PREDICTED position; we use the
        # previous frame's posterior (already on the host from its
        # packed stats read) to avoid a dedicated device read. The
        # difference is one frame of motion (~cm) against a slide
        # margin of MOV_THRESHOLD*DET_RANGE (hundreds of meters) —
        # documented deviation, cannot change which boxes slide.
        pos_np = (self._last_post[9:12] if self._last_post is not None
                  else np.asarray(self.state.pos))
        boxes = self.tracker.update(pos_np)
        if boxes and self.map_built:
            lo = np.asarray([b[0] for b in boxes], np.float32)
            hi = np.asarray([b[1] for b in boxes], np.float32)
            self.map = self._map_mod.delete_boxes(
                self.map, jnp.asarray(lo), jnp.asarray(hi)
            )
        self._maybe_rebuild()

        fused = (
            self.map_built and ekf_inited and self.cfg.lidar_enable
        )
        dense_world = None
        if fused:
            # ---- steady state: one fused dispatch per frame --------------
            statics = dict(
                max_points=cap.max_points,
                max_iter=self.cfg.max_iteration,
                knn_radius=cap.knn_voxel_radius,
                max_probe=cap.max_probe,
                dense_out=self.cfg.dense_map_enable,
                cache_knn=cap.cache_knn,
                mixed_gain=cap.mixed_gain,
                plane_fit=cap.plane_fit,
                pallas_knn=cap.pallas_knn,
            )
            if self.mesh_runner is not None:
                step_fn = self.mesh_runner.lidar_frame_step
            elif cap.donate_maps:
                # in-place map update (attached hardware; see
                # frame_step.lidar_frame_step_donated) — self.map is
                # replaced by the output right below, so the donated
                # buffers are never reused
                from .frame_step import lidar_frame_step_donated as step_fn
            else:
                from .frame_step import lidar_frame_step as step_fn

            pts_j, trel_j, pmask_j, B = self._stage_scan(pts_np, t_rel_np, N)
            # the downsample output can never exceed the live input
            # count, so the EKF batch shape shrinks with the bucket
            statics["max_points"] = min(cap.max_points, B)
            (st, m2, down_j, dmask_j, n_act_j, iters_j,
             dense_j, active_j, stats_j) = step_fn(
                self.state, self.map, pose_table, self.calib,
                pts_j, trel_j, pmask_j,
                self._fss_dev,
                laser_point_cov=self._lpc_dev,
                **statics,
            )
            self.state = st
            self._prop_pack_dev = None  # posterior != propagated
            self.map = m2
            # staged profile cadence is mode-independent: the deferred-
            # readback default must not silently disable --profile-every
            # (the trigger used to live only on the sync path below)
            self._n_steady += 1
            profile_now = bool(
                self.profile_every
                and self._n_steady % self.profile_every == 0
            )
            if profile_now:
                buf, trel, pmask = self._pad_scan_np(pts_np, t_rel_np, N)
                self.last_stage_profile = self._profile_stages(
                    pose_table, buf, trel, pmask, cap
                )
            if self.async_read or self.read_collector is not None:
                # DEFERRED READBACK: hand the packed stats row (and the
                # dense cloud, if a consumer needs it) to the reader
                # thread and return; the read resolves at the next
                # frame, overlapping the relay round trip with that
                # frame's host prep + dispatch. Device handles that
                # downstream consumers need THIS frame are wired now.
                if self.cfg.dense_map_enable:
                    self.last_dense = dense_j[:N]
                    self._dense_dev = dense_j
                    if self.vio is not None:
                        self.vio.set_last_cloud_device(self._dense_dev, N)
                self.last_effect = (down_j, active_j)
                t_done = time.perf_counter()
                if self.read_collector is not None:
                    # block-packed mode: no read at all — the collector
                    # stacks the block's rows device-side and emits all
                    # frames from one transfer at the block boundary
                    self.read_collector.add_lidar(stats_j, dict(
                        scan=scan, inten_np=inten_np, cov_handle=st.cov,
                        timing={"undistort": 0.0, "downsample": 0.0,
                                "ekf": t_done - t0, "map": 0.0,
                                "total": t_done - t0},
                    ))
                    return None
                need_dense = self.cfg.dense_map_enable and (
                    self.cfg.pcd_save_en or self.on_frame is not None
                    or self.materialize_dense
                )
                fut = self._ensure_reader().submit(
                    _read_back, stats_j,
                    dense_j if need_dense else None, N,
                )
                self._pending.append(dict(
                    fut=fut, scan=scan, inten_np=inten_np, N=N,
                    cov_handle=st.cov,
                    timing={
                        "undistort": 0.0, "downsample": 0.0,
                        "ekf": t_done - t0, "map": 0.0,
                        "total": t_done - t0,
                    },
                ))
                # resolve AFTER this frame's dispatches: the oldest
                # pending read has had `async_depth` frames of head start
                out = None
                while len(self._pending) > self.async_depth:
                    out = self._resolve_oldest()
                return out
            # counters + posterior state in ONE packed transfer with no
            # extra dispatch: the fused step returns them pre-packed
            # (each blocking device read is a full relay round trip;
            # these used to be ~8 separate reads per frame)
            stats = np.asarray(stats_j)
            n_down, n_active, iters = (int(stats[0]), int(stats[1]),
                                       int(stats[2]))
            post_pack = stats[3:27]
            res_rms = float(stats[27])
            self._map_occ_host = float(stats[28])
            if self.cfg.dense_map_enable:
                # materialize (a blocking transfer) only when a consumer
                # exists this frame (PCD accumulation, viz hook). The
                # VIO is NOT such a consumer: it takes the device handle
                # directly (set_last_cloud_device below). With no
                # consumer, FrameOutput.pts_world stays None — keeping a
                # device handle per output would pin ~N*12 B of HBM per
                # frame forever in a long serving session; the CURRENT
                # frame's cloud remains reachable as pipe.last_dense.
                need_dense = (self.cfg.pcd_save_en
                              or self.on_frame is not None
                              or self.materialize_dense)
                dense_world = (np.asarray(dense_j)[:N] if need_dense
                               else None)
                self.last_dense = dense_j[:N]
                self._dense_dev = dense_j
            # kept as DEVICE arrays: the /cloud_effected surface is only
            # materialized if a consumer reads it (np.asarray works)
            self.last_effect = (down_j, active_j)
            # one fused dispatch: attribute the whole span to "ekf"
            t_undistort = t_down = t0
            t_ekf = t_map = time.perf_counter()
        else:
            # ---- bootstrap path (first frames): staged -------------------
            lid_rot = self.calib.lid_rot
            lid_off = self.calib.lid_off
            buf, trel, pmask = self._pad_scan_np(pts_np, t_rel_np, N)
            und = imu_mod.undistort(
                self.state, pose_table, jnp.asarray(buf), jnp.asarray(trel),
                jnp.asarray(pmask), self.calib,
            )
            feats_undistort = np.asarray(und)[:N]
            t_undistort = time.perf_counter()

            from . import native as native_mod

            got = native_mod.voxel_downsample_native(
                feats_undistort, self.cfg.filter_size_surf, max_out=cap.max_points
            )
            if got is not None:
                down, dmask = got
            else:
                down, dmask = voxel_downsample(
                    feats_undistort, self.cfg.filter_size_surf,
                    max_out=cap.max_points,
                )
            n_down = int(dmask.sum())
            t_down = time.perf_counter()

            # first frame: build the map and return (laserMapping.cpp:1411)
            if not self.map_built:
                if n_down > 5:
                    world = self._to_world(down, dmask, lid_rot, lid_off)
                    self.map = self._map_mod.insert(
                        self.map, world, jnp.asarray(dmask)
                    )
                    self.map_built = True
                return None

            iters = 0
            n_active = 0
            t_ekf = time.perf_counter()
            world = self._to_world(down, dmask, lid_rot, lid_off)
            self.map = self._map_mod.insert(self.map, world, jnp.asarray(dmask))
            t_map = time.perf_counter()
            if self.cfg.dense_map_enable:
                rot_tmp = np.asarray(self.state.rot, np.float64)
                pos_tmp = np.asarray(self.state.pos, np.float64)
                R_wl = rot_tmp @ self.cfg.extrinsic_R
                t_wl = rot_tmp @ self.cfg.extrinsic_T + pos_tmp
                dense_world = feats_undistort @ R_wl.T + t_wl

        if not fused:
            # staged/bootstrap path: one packed read of the posterior
            post_pack = state_mod.pack24_host(self.state)
            res_rms = 0.0  # no EKF residuals before warm-up completes
        out = self._emit_output(
            scan=scan, post_pack=post_pack, n_down=n_down,
            n_active=n_active, iters=iters, res_rms=res_rms,
            dense_world=dense_world, inten_np=inten_np,
            cov_handle=self.state.cov,
            timing={
                "undistort": t_undistort - t0,
                "downsample": t_down - t_undistort,
                "ekf": t_ekf - t_down,
                "map": t_map - t_ekf,
                "total": t_map - t0,
            },
        )
        if self.vio is not None:
            if fused and self.cfg.dense_map_enable:
                # device-to-device handoff: only the row count crosses
                self.vio.set_last_cloud_device(self._dense_dev, N)
            else:
                self.vio.set_last_cloud(out.pts_world)
        return out

    def _emit_output(self, *, scan, post_pack, n_down, n_active, iters,
                     res_rms, dense_world, inten_np, cov_handle,
                     timing) -> FrameOutput:
        """Host-side frame finalization: logging, FrameOutput assembly,
        PCD accumulation, hooks, trajectory. Shared by the synchronous
        path and the deferred-readback resolution (`_resolve_pending`)."""
        self._last_post = post_pack  # feeds next frame's map slider
        if self.logger is not None:
            self.logger.log_post(scan.end_time, post_pack,
                                 n_points=len(scan.pts))
            self.logger.log_pos(scan.beg_time - (self.first_lidar_time or 0.0),
                                post_pack)
        # COPY the pose slices: np.asarray of a device array is
        # zero-copy on the CPU backend, so a FrameOutput holding VIEWS
        # of post_pack would pin the whole packed stats buffer per frame
        # forever (tests/test_sync_points.py memory-boundedness guard)
        rot_np = np.array(post_pack[0:9]).reshape(3, 3)
        pos_np = np.array(post_pack[9:12])
        from .logging_util import rot_to_quat_wxyz as _rot_to_quat

        quat = _rot_to_quat(rot_np)
        out = FrameOutput(
            t=scan.end_time,
            pos=pos_np,
            quat=quat,
            vel=np.array(post_pack[12:15]),
            n_active=n_active,
            iters=iters,
            n_points=n_down,
            res_rms=res_rms,
            timing=timing,
        )
        if self.cfg.dense_map_enable and dense_world is not None:
            # world-frame dense cloud at the posterior (pcl_wait_pub,
            # laserMapping.cpp:1764-1772) — feeds the VIO depth pipeline
            out.pts_world = dense_world
            if inten_np is not None:
                # per-point intensity rides along in scan order (the
                # reference's LIO-mode PCD is intensity-colored
                # PointXYZI, README 4.1 / laserMapping.cpp:780-807)
                out.intensity = np.asarray(inten_np[: len(dense_world)],
                                           np.float32)
        if self.cfg.pose_output_en and self.logger is not None:
            # camera_pose.txt (fout_tum, laserMapping.cpp:1738-1748):
            # world->camera pose of the latest image frame
            rcw, pcw = None, None
            if self.vio is not None:
                self.vio.resolve_pending()  # async mode: freshest pose
            if self.vio is not None and self.vio.last_rcw is not None:
                rcw, pcw = self.vio.last_rcw, self.vio.last_pcw
            elif self.vio is not None:
                # no image seen yet: derive from the current state
                rcw = np.asarray(self.vio.Rci) @ rot_np.T
                pcw = -rcw @ pos_np + np.asarray(self.vio.Pci)
            if rcw is not None:
                self.logger.log_camera_pose(scan.beg_time, rcw, pcw)
        if (
            self.cfg.pcd_save_en
            and self.vio is not None
            and out.pts_world is not None
        ):
            # accumulated RGB world cloud (pcl_wait_save,
            # laserMapping.cpp:726-746, 778): paint the frame's cloud
            # from the latest image, keep in-frame points only
            cmask, rgb = self.vio.colorize(out.pts_world)
            if cmask.any():
                self.rgb_cloud.append(
                    np.concatenate([out.pts_world[cmask], rgb[cmask]], axis=1)
                )
        if self.collect_cov:
            self.covs.append(np.asarray(cov_handle))
        self.outputs.append(out)
        if self.on_frame is not None:
            # live-visualization / user hook (rviz publish point,
            # laserMapping.cpp:1377-1389 publish_* call sites)
            self.on_frame(out)
        self.trajectory.append(
            np.array([out.t, *pos_np, quat[1], quat[2], quat[3], quat[0]])
        )
        # divergence watchdog (capacity.auto_reset_rms): res_rms is the
        # health signal — a sustained rise means the filter lost the
        # map (docs/MIGRATION.md "Sensor-anomaly behavior")
        thr = self.cfg.capacity.auto_reset_rms
        if thr > 0.0 and res_rms > 0.0:
            if res_rms > thr:
                self._rms_high_streak += 1
                if self._rms_high_streak >= self.cfg.capacity.auto_reset_frames:
                    self._mapping_restart(res_rms)
            else:
                self._rms_high_streak = 0
        return out

    def _mapping_restart(self, res_rms: float):
        """Divergence-watchdog action (beyond-reference; default off
        via capacity.auto_reset_rms = 0): rebuild the geometric and
        visual maps from scratch at the CURRENT pose, keeping the
        state/trajectory. After losing track there is no
        relocalization (the reference has none either, and its
        poisoned ikd-tree keeps feeding wrong matches forever); the
        restart freezes the accumulated offset so drift stops
        compounding and res_rms returns to the noise floor. In block
        replay the restart lands at the next block boundary."""
        import warnings

        warnings.warn(
            f"divergence watchdog: res_rms {res_rms:.3f} > "
            f"{self.cfg.capacity.auto_reset_rms} for "
            f"{self._rms_high_streak} frames — restarting mapping at "
            "the current pose",
            RuntimeWarning,
        )
        self.map = self._make_map()
        self.map_built = False
        self.tracker = lio_mod.LocalMapTracker(
            self.cfg.cube_side_length, mode=self.cfg.capacity.slider)
        if self.vio is not None:
            self.vio.reset_map()
        # Re-anchor the state, not just the map: a diverged ATTITUDE
        # misprojects gravity, which pumps velocity error every IMU
        # sample and re-poisons the fresh map within a second (measured
        # on the motion-gap scenario: vel_err 1.2 -> 2.6 m/s after a
        # map-only restart). Zero the velocity and re-open the
        # covariance on rotation/velocity/biases/gravity so the EKF
        # re-estimates them against the fresh map + accelerometer.
        cov = np.array(self.state.cov, np.float64)  # writable copy
        for blk, var in ((slice(0, 3), 0.1), (slice(6, 9), 1.0),
                         (slice(9, 12), 1e-3), (slice(12, 15), 1e-2),
                         (slice(15, 18), 0.1)):
            sub = cov[blk, blk]
            np.fill_diagonal(sub, np.maximum(np.diagonal(sub), var))
        self.state = self.state._replace(
            vel=jnp.zeros(3, self.state.vel.dtype),
            cov=jnp.asarray(cov),
        )
        self._rms_high_streak = -3 * self.cfg.capacity.auto_reset_frames
        # ^ cooldown: no re-trigger while the filter re-converges —
        # repeated map wipes would starve the estimator
        self.auto_resets += 1

    def _profile_stages(self, pose_table, buf, trel, pmask, cap) -> dict:
        """Per-stage timing breakdown for the fused steady state (the
        reference's per-frame printf surface, laserMapping.cpp:1805:
        match/solve/ICP/map-incre). The fused dispatch can't be split, so
        every `profile_every` frames the four stages are ALSO dispatched
        separately (results discarded) and their wall times recorded in
        `last_stage_profile` (milliseconds)."""
        if getattr(self._map_mod, "is_sharded", False):
            # the staged single-device re-dispatch has no meaning for a
            # block-sharded map (the stages are collective ops)
            return None
        import jax

        times = {}
        t0 = time.perf_counter()
        und = imu_mod.undistort(
            self.state, pose_table, jnp.asarray(buf), jnp.asarray(trel),
            jnp.asarray(pmask), self.calib,
        )
        jax.block_until_ready(und)
        times["undistort"] = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        down, dmask = voxel_downsample_device(
            und, jnp.asarray(pmask), jnp.float32(self.cfg.filter_size_surf),
            cap.max_points,
        )
        jax.block_until_ready(down)
        times["downsample"] = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        res = lio_mod.lio_update(
            self.state, self.map, down, dmask,
            jnp.asarray(self.cfg.extrinsic_R, jnp.float32),
            jnp.asarray(self.cfg.extrinsic_T, jnp.float32),
            laser_point_cov=self.cfg.laser_point_cov,
            max_iter=self.cfg.max_iteration,
            knn_radius=cap.knn_voxel_radius, max_probe=cap.max_probe,
        )
        jax.block_until_ready(res.state.pos)
        times["ekf"] = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        world = self._to_world(down, dmask,
                               jnp.asarray(self.cfg.extrinsic_R, jnp.float32),
                               jnp.asarray(self.cfg.extrinsic_T, jnp.float32))
        if self._map_mod is vm:
            m2 = vm.insert(self.map, world, dmask,
                           max_probe=self.cfg.capacity.max_probe)
        else:
            m2 = self._map_mod.insert(self.map, world, dmask)
        jax.block_until_ready(m2.pts)
        times["map"] = (time.perf_counter() - t0) * 1e3
        return times

    def _maybe_rebuild(self):
        """Load-factor-triggered map maintenance (the ikd-Tree
        Criterion_Check/rebuild role, ikd_Tree.cpp:1018-1035): the tiled
        backend compacts away dead tiles when the pool nears capacity;
        the hash backend re-inserts into a fresh table when occupancy
        (incl. hole-fragmented probe chains) crosses its threshold.
        Runs at most every REBUILD_CHECK_EVERY frames — an O(map) op
        that must stay off the steady-state frame path."""
        if not self.map_built:
            return
        self._frames_since_rebuild_check += 1
        if self._frames_since_rebuild_check < REBUILD_CHECK_EVERY:
            return
        self._frames_since_rebuild_check = 0
        from .ops import tiled_map as tmod

        # occupancy from the packed stats row when available (a few
        # frames stale under deferred readback — irrelevant against a
        # 0.85 load-factor threshold); fall back to a blocking device
        # read only before the first fused frame has resolved
        occ = self._map_occ_host
        if getattr(self._map_mod, "is_sharded", False):
            # sharded map: stats[28] carries the FULLEST shard's
            # allocation (pmax over the mesh); compare against the
            # per-shard pool — the binding constraint
            if occ is None:
                occ = self._map_mod.max_occupancy(self.map)
            if occ > 0.85 * self._map_mod.pool_per_shard(self.map):
                self.map = self._map_mod.compact(self.map)
                self._map_occ_host = None
        elif self._map_mod is tmod:
            if occ is None:
                occ = float(self.map.n_alloc)
            if occ > 0.85 * self.map.slot_key.shape[0]:
                self.map = tmod.compact(self.map)
                self._map_occ_host = None  # stale post-compact
        elif self._map_mod is vm:
            if occ is None:
                occ = float(self.map.count)
            if occ > 0.7 * self.map.check.shape[0]:
                self.map = vm.rebuild(self.map)
                self._map_occ_host = None
        # visual-map capacity: drop points outside the local cube when
        # the point pool nears exhaustion (the reference's feat_map only
        # ever grows; see visual_map.compact)
        if self.vio is not None:
            vmap = self.vio.vmap
            n_pts = self.vio._n_pts_host
            if n_pts is None:
                n_pts = int(vmap.n_pts)
            if n_pts > 0.9 * vmap.pos.shape[0]:
                from . import visual_map as vmap_mod

                self.vio.vmap = vmap_mod.compact(
                    vmap,
                    jnp.asarray(np.asarray(self.state.pos), jnp.float32),
                    jnp.float32(self.cfg.cube_side_length),
                )
                self.vio._n_pts_host = None

    def _pad_scan_np(self, pts_np, t_rel_np, N):
        """Zero-padded (rawcap,) host scan buffers — bootstrap/profile
        paths only; the fused steady path stages on device instead
        (`_stage_scan`) to keep the uploaded bytes at the scan's size."""
        rawcap = self.cfg.capacity.max_raw_points
        buf = np.zeros((rawcap, 3), np.float32)
        buf[:N] = pts_np
        trel = np.zeros(rawcap, np.float32)
        trel[:N] = t_rel_np
        pmask = np.zeros(rawcap, bool)
        pmask[:N] = True
        return buf, trel, pmask

    def _stage_scan(self, pts_np, t_rel_np, N):
        """ONE packed pow2-bucketed upload for the scan (points + t_rel
        + count), masked on device AT THE BUCKET SHAPE (not rawcap):
        the fused frame step then runs every stage — undistortion,
        downsample, EKF, insert — at pow2-of-the-scan-size shapes.
        Returns (pts (B,3), t_rel (B,), mask (B,), B). Two wins through
        the relay: the padded 3-array upload was ~13 ms of wire per
        frame at 8k-point scans in a 32k-capacity rig (the pack is
        ~4 ms), and the degraded relay mode prices executables by their
        array shapes — lio_update at N=16384 measures 39 ms vs 16 ms at
        N=4096 for identical content. One compile per distinct bucket."""
        rawcap = self.cfg.capacity.max_raw_points
        B = min(rawcap, 1 << max(10, int(max(N - 1, 1)).bit_length()))
        # monotonic: real sensors jitter around their nominal scan size,
        # and a bucket that flips across a pow2 boundary would retrace
        # the fused step (a multi-second remote compile) every crossing.
        # Growing-only costs at most one recompile per boundary reached.
        B = max(B, self._scan_bucket)
        self._scan_bucket = B
        w = np.zeros((B + 1, 4), np.float32)
        w[:N, 0:3] = pts_np
        w[:N, 3] = t_rel_np
        w[B, 0] = N
        from .frame_step import stage_scan

        return (*stage_scan(jnp.asarray(w), R=B), B)

    def _to_world(self, pts_body, mask, lid_rot, lid_off):
        p = jnp.asarray(pts_body)
        p_imu = p @ lid_rot.T + lid_off
        # cast the f64 pose down: the map and point batches stay f32
        rot32 = self.state.rot.astype(jnp.float32)
        pos32 = self.state.pos.astype(jnp.float32)
        return p_imu @ rot32.T + pos32

    def tum_trajectory(self) -> np.ndarray:
        """(T, 8) TUM rows: t x y z qx qy qz qw (laserMapping.cpp:1738-1748)."""
        return np.asarray(self.trajectory)
