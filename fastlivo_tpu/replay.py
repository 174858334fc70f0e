"""Batched offline replay: K lidar frames per device dispatch.

Online operation pays one host->device dispatch per frame
(frame_step.lidar_frame_step). For OFFLINE bag replay — the reference's
own benchmark modality (rosbag playback, README.md:118-138) — frames
can be staged ahead, so this module chains K full scan steps
(IMU propagation -> undistortion -> iterated EKF -> map insertion)
inside one `lax.scan`: one dispatch per K frames. The host-side pair
preparation (imu.prepare_pairs) depends only on timestamps, never on
the estimated state, so whole blocks stage without lookahead hazards.

Semantics vs the per-frame path (both deviations bounded and tested):
  - the sliding-local-map box deletion (lasermap_fov_segment,
    laserMapping.cpp:363-421) runs once per BLOCK instead of per frame —
    within a block (<= ~1 s of motion) the slide moves meters at most;
  - LIO-only: image groups cannot interleave inside a block (the
    camera path stays on the per-frame pipeline).

Per-frame pre/post states are emitted from the scan (`ys`), so the
mat_pre/mat_out trace surface and the TUM trajectory are identical in
shape to the per-frame path. PCD/RGB-cloud accumulation and the debug
overlay stay on the per-frame path (they need per-frame host access to
the dense cloud/image).
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from . import imu as imu_mod
from . import lio as lio_mod
from .ops import voxel_filter as vf
from .state import NavState


@functools.partial(
    jax.jit,
    static_argnames=("max_points", "max_iter", "knn_radius", "max_probe",
                     "plane_fit"),
)
def lidar_block_step(
    state: NavState,
    m,
    calib: imu_mod.ImuCalib,
    # per-frame stacked inputs, leading axis K
    acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt, row0_off,
    pts_raw, t_rel, rmask,
    acc_s_last, angvel_last,
    filter_size_surf,
    laser_point_cov: float,
    max_points: int,
    max_iter: int,
    knn_radius: int,
    max_probe: int,
    plane_fit: str = "tls",
):
    """K chained scan steps in one executable.

    Returns (state', map', acc_s_last', angvel_last', ys) with ys a
    single packed (K, 43) f64 array (_pack_summary layout; tail =
    [n_active, iters, res_rms, map_occupancy]) — ONE host read per block instead of 11
    (each blocking read through the relay is a ~30-65 ms round trip).
    res_rms is the posterior point-to-plane residual RMS, the online
    filter-health signal (frame_step.py)."""

    # the carried world-acc/gyro continuation must match propagate's
    # output dtype (the state dtype) or the scan carry types diverge
    acc_s_last = acc_s_last.astype(state.pos.dtype)
    angvel_last = angvel_last.astype(state.pos.dtype)

    def step(carry, inp):
        st, mm, acc_s, angv = carry
        (a, g, d, o, pv, td, r0, pts, tr, pm) = inp
        st1, pose, acc_s2, angv2 = imu_mod.propagate(
            st, a, g, d, o, pv, td, acc_s, angv, calib, row0_off=r0
        )
        und = imu_mod.undistort(st1, pose, pts, tr, pm, calib)
        down, dmask = vf.voxel_downsample_device(
            und, pm, filter_size_surf, max_points
        )
        res = lio_mod.lio_update(
            st1, mm, down, dmask, calib.lid_rot, calib.lid_off,
            laser_point_cov=laser_point_cov, max_iter=max_iter,
            knn_radius=knn_radius, max_probe=max_probe,
            plane_fit=plane_fit,
        )
        mod = lio_mod.map_module(mm)
        rot32 = res.state.rot.astype(down.dtype)
        pos32 = res.state.pos.astype(down.dtype)
        world = (down @ calib.lid_rot.T + calib.lid_off) @ rot32.T + pos32
        if mod is lio_mod.vm:
            m2 = mod.insert(mm, world, dmask, max_probe=max_probe)
        else:
            m2 = mod.insert(mm, world, dmask)
        n_safe = jnp.maximum(res.n_active.astype(jnp.float64), 1.0)
        res_rms = jnp.sqrt(jnp.sum(
            jnp.where(res.active, res.res.astype(jnp.float64), 0.0) ** 2
        ) / n_safe)
        occ = (m2.n_alloc if hasattr(m2, "n_alloc") else m2.count)
        ys = _pack_summary(st1, res.state,
                           (res.n_active, res.iters, res_rms, occ))
        return (res.state, m2, acc_s2, angv2), ys

    (st_f, m_f, acc_f, ang_f), ys = jax.lax.scan(
        step,
        (state, m, acc_s_last, angvel_last),
        (acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt, row0_off,
         pts_raw, t_rel, rmask),
    )
    return st_f, m_f, acc_f, ang_f, ys


SUMMARY_TAIL = 39  # counters start here in a packed summary row


def _pack_summary(st1, st2, tail):
    """ONE f64 row per event: [pre rot9|pos3|vel3 (0:15), post
    rot9|pos3|vel3|bg3|ba3|grav3 (15:39), *tail counters (39:)]. The
    single layout shared by lidar_block_step and `_unpack_summary` —
    edit here, never at call sites."""
    f64 = jnp.float64
    return jnp.concatenate([
        st1.rot.reshape(9).astype(f64), st1.pos.astype(f64),
        st1.vel.astype(f64),
        st2.rot.reshape(9).astype(f64), st2.pos.astype(f64),
        st2.vel.astype(f64), st2.bg.astype(f64), st2.ba.astype(f64),
        st2.grav.astype(f64),
        jnp.stack([t.astype(f64) for t in tail]),
    ])


def _unpack_summary(rows):
    """Host-side inverse of `_pack_summary` over (E, >=39) rows."""
    E = len(rows)
    return {
        "pre_R": rows[:, 0:9].reshape(E, 3, 3),
        "pre_p": rows[:, 9:12], "pre_v": rows[:, 12:15],
        "po_R": rows[:, 15:24].reshape(E, 3, 3),
        "po_p": rows[:, 24:27], "po_v": rows[:, 27:30],
        "po_bg": rows[:, 30:33], "po_ba": rows[:, 33:36],
        "po_gv": rows[:, 36:39],
        "tail": rows[:, SUMMARY_TAIL:],
    }


class BlockReplayer:
    """Drives a Pipeline's steady state in K-frame blocks.

    Usage: feed all sensor data into the pipeline's synchronizer, then
    call `run()`. Bootstrap frames (IMU init, map build, pre-EKF warmup)
    go through the normal per-frame path; once the pipeline is in its
    fused steady state, the remaining lidar-end groups are staged and
    dispatched in blocks."""

    def __init__(self, pipe, block: int = 8):
        assert not pipe.cfg.img_enable, "block replay is LIO-only"
        self.pipe = pipe
        self.K = block
        # previous block's packed posterior rows (host) — feed the map
        # slider and the logger's pre-row biases without device reads
        self._last_po_pos = None
        self._last_po_bias = None
        self._scan_bucket = 0  # grow-only pow2 shape buckets (_stage)
        self._imu_bucket = 0

    def _stage(self, groups):
        """Host-side staging of K groups into stacked device inputs.

        Shapes are pow2-bucketed to the block's content (largest scan,
        largest IMU-pair count) instead of the rig capacities — the
        degraded relay prices executables by array shape, and a 32k-
        capacity rig streaming 8k-point scans paid 4x on every stacked
        array (same lever as pipeline._stage_scan). One compile per
        distinct (scan bucket, imu bucket) pair."""
        p = self.pipe
        cap = p.cfg.capacity
        n_scan_max = max(min(len(g.scan.pts), cap.max_raw_points)
                         for g in groups)
        n_imu_max = max(len(g.imu_t) + 1 for g in groups)
        P = min(cap.max_imu_per_group,
                1 << max(3, int(max(n_imu_max - 1, 1)).bit_length()))
        R = min(cap.max_raw_points,
                1 << max(10, int(max(n_scan_max - 1, 1)).bit_length()))
        # grow-only: block-to-block bucket flips would retrace the
        # fused block step (multi-second remote compile) every flip
        P = self._imu_bucket = max(P, self._imu_bucket)
        R = self._scan_bucket = max(R, self._scan_bucket)
        K = len(groups)
        A = np.zeros((K, P, 3), np.float32)
        G = np.zeros((K, P, 3), np.float32)
        D = np.zeros((K, P), np.float32)
        O = np.full((K, P), imu_mod.BIG_T, np.float32)
        V = np.zeros((K, P), bool)
        TD = np.zeros(K, np.float32)
        R0 = np.zeros(K, np.float32)
        PTS = np.zeros((K, R, 3), np.float32)
        TR = np.zeros((K, R), np.float32)
        PM = np.zeros((K, R), bool)
        ts = []
        for k, g in enumerate(groups):
            scan = g.scan
            end_time = scan.end_time
            ts.append(end_time)
            if p.last_imu is not None:
                imu_t = np.concatenate([[p.last_imu[0]], g.imu_t])
                imu_acc = np.concatenate([[p.last_imu[1]], g.imu_acc])
                imu_gyr = np.concatenate([[p.last_imu[2]], g.imu_gyr])
            else:
                imu_t, imu_acc, imu_gyr = g.imu_t, g.imu_acc, g.imu_gyr
            if len(g.imu_t):
                p.last_imu = (g.imu_t[-1], g.imu_acc[-1], g.imu_gyr[-1])
            a, gy, d, o, v, td, r0 = imu_mod.prepare_pairs(
                imu_t, imu_acc, imu_gyr,
                beg_time=scan.beg_time, end_time=end_time,
                last_end_time=p.last_group_end, max_pairs=P,
            )
            A[k], G[k], D[k], O[k], V[k], TD[k], R0[k] = a, gy, d, o, v, td, r0
            p.last_group_end = end_time
            if p.logger is not None and p.first_lidar_time is not None:
                for i in np.nonzero(v)[0]:
                    p.logger.log_imu(
                        imu_t[i] - p.first_lidar_time, a[i], gy[i]
                    )
            pts_use, trel_use = scan.pts, scan.t_rel
            if len(pts_use) > R:
                # same stride decimation as the per-frame path
                # (pipeline._process_group): tail-TRUNCATION would bias
                # away the scan's latter angular sweep
                import warnings

                stride = -(-len(pts_use) // R)
                if not p._decimation_warned:
                    p._decimation_warned = True
                    warnings.warn(
                        f"raw scan of {len(pts_use)} points exceeds "
                        f"capacity.max_raw_points={R}; stride-decimating "
                        f"by {stride} (coverage loss). Raise the "
                        "capacity to keep full scans.", RuntimeWarning)
                idx = np.arange(0, len(pts_use), stride)
                pts_use, trel_use = pts_use[idx], trel_use[idx]
            n = min(len(pts_use), R)
            PTS[k, :n] = pts_use[:n, :3]
            TR[k, :n] = trel_use[:n]
            PM[k, :n] = True
        return (A, G, D, O, V, TD, R0, PTS, TR, PM), ts

    def run(self) -> List:
        """Process everything currently in the synchronizer. Returns the
        pipeline's FrameOutput list (appended in place as usual)."""
        p = self.pipe
        if p.sync.reset_flagged:
            p._reset_imu()
            p.sync.reset_flagged = False
        pending = []
        for g in p.sync.drain():
            if not (p.map_built and p.init_done and p.ready
                    and g.is_lidar_end):
                # bootstrap path per-frame
                if pending:
                    self._flush(pending)
                    pending = []
                p._process_group(g)
                # per-frame processing moved p.state: the cached packed
                # posterior rows no longer describe it
                self._last_po_pos = self._last_po_bias = None
                continue
            from .pipeline import INIT_TIME

            ekf_inited = (
                p.first_lidar_time is not None
                and g.scan.beg_time - p.first_lidar_time >= INIT_TIME
            )
            if not ekf_inited:
                if pending:
                    self._flush(pending)
                    pending = []
                p._process_group(g)
                self._last_po_pos = self._last_po_bias = None
                continue
            pending.append(g)
            if len(pending) == self.K:
                self._flush(pending)
                pending = []
        if pending:
            self._flush(pending)
        return p.outputs

    def _flush(self, groups):
        import time as _time

        from .logging_util import rot_to_quat_wxyz as _rot_to_quat
        from .pipeline import FrameOutput

        p = self.pipe
        cap = p.cfg.capacity
        t0 = _time.perf_counter()
        # one sliding-map maintenance pass per block; previous block's
        # packed posterior position avoids a device read
        pos_np = (self._last_po_pos if self._last_po_pos is not None
                  else np.asarray(p.state.pos))
        boxes = p.tracker.update(pos_np)
        if boxes and p.map_built:
            lo = np.asarray([b[0] for b in boxes], np.float32)
            hi = np.asarray([b[1] for b in boxes], np.float32)
            p.map = p._map_mod.delete_boxes(
                p.map, jnp.asarray(lo), jnp.asarray(hi)
            )
        p._maybe_rebuild()
        pre_bias_state = p.state
        (A, G, D, O, V, TD, R0, PTS, TR, PM), ts = self._stage(groups)
        st, m2, acc_f, ang_f, ys = lidar_block_step(
            p.state, p.map, p.calib,
            jnp.asarray(A), jnp.asarray(G), jnp.asarray(D), jnp.asarray(O),
            jnp.asarray(V), jnp.asarray(TD), jnp.asarray(R0),
            jnp.asarray(PTS), jnp.asarray(TR), jnp.asarray(PM),
            p.acc_s_last, p.angvel_last,
            jnp.float32(p.cfg.filter_size_surf),
            laser_point_cov=p.cfg.laser_point_cov,
            max_points=min(cap.max_points, PTS.shape[1]),
            max_iter=p.cfg.max_iteration,
            knn_radius=cap.knn_voxel_radius,
            max_probe=cap.max_probe,
            plane_fit=cap.plane_fit,
        )
        p.state = st
        p.map = m2
        p.acc_s_last, p.angvel_last = acc_f, ang_f
        K = len(groups)
        # ONE packed read for the whole block's summaries — the read IS
        # the block's dominant cost, so `wall` is taken after it
        # (review r5: timings used to exclude the device round trip)
        u = _unpack_summary(np.asarray(ys))
        wall = _time.perf_counter() - t0
        pre_R, pre_p, pre_v = u["pre_R"], u["pre_p"], u["pre_v"]
        po_R, po_p, po_v = u["po_R"], u["po_p"], u["po_v"]
        po_bg, po_ba, po_gv = u["po_bg"], u["po_ba"], u["po_gv"]
        n_act, iters = u["tail"][:, 0], u["tail"][:, 1]
        res_rms = u["tail"][:, 2]
        p._map_occ_host = float(u["tail"][-1, 3])
        self._last_po_pos = po_p[-1]
        # keep the PIPELINE's slider input fresh too: _process_group's
        # local-map tracker reads p._last_post (pack24 layout) — stale
        # after a long block replay it could delete map regions around
        # the CURRENT pose on a later spin() (review r5)
        p._last_post = np.concatenate([
            po_R[-1].reshape(9), po_p[-1], po_v[-1],
            po_bg[-1], po_ba[-1], po_gv[-1]])
        if p.logger is not None:
            if self._last_po_bias is not None:
                bg0, ba0, gv0 = self._last_po_bias
            else:
                bg0 = np.asarray(pre_bias_state.bg)
                ba0 = np.asarray(pre_bias_state.ba)
                gv0 = np.asarray(pre_bias_state.grav)
        self._last_po_bias = (po_bg[-1], po_ba[-1], po_gv[-1])
        for k in range(K):
            if p.logger is not None:
                # pre-row biases are the previous frame's posterior
                # (propagation never changes them; golden-trace property)
                pbg = bg0 if k == 0 else po_bg[k - 1]
                pba = ba0 if k == 0 else po_ba[k - 1]
                pgv = gv0 if k == 0 else po_gv[k - 1]
                pre = NavState(pre_R[k], pre_p[k], pre_v[k],
                               pbg, pba, pgv, st.cov)
                post = NavState(po_R[k], po_p[k], po_v[k],
                                po_bg[k], po_ba[k], po_gv[k], st.cov)
                p.logger.log_pre(ts[k], pre)
                p.logger.log_post(ts[k], post,
                                  n_points=len(groups[k].scan.pts))
            quat = _rot_to_quat(po_R[k].astype(np.float64))
            out = FrameOutput(
                t=ts[k], pos=po_p[k].astype(np.float64), quat=quat,
                vel=po_v[k].astype(np.float64),
                n_active=int(n_act[k]), iters=int(iters[k]), n_points=0,
                timing={"undistort": 0.0, "downsample": 0.0,
                        "ekf": wall / K, "map": 0.0, "total": wall / K},
                res_rms=float(res_rms[k]),
            )
            p.outputs.append(out)
            p.trajectory.append(np.array(
                [out.t, *out.pos, quat[1], quat[2], quat[3], quat[0]]
            ))


# ---------------------------------------------------------------------
# Full-LIVO block replay: chained per-frame dispatches, block-packed
# readback.


@jax.jit
def _stack_rows(*rows):
    """Stack the block's packed stats rows — its single D2H transfer.
    All rows are (29,) f64 (the camera row is zero-padded to the lidar
    row's width inside vio_frame_step) and flush pads the count to the
    block size, so exactly ONE executable shape covers every flush of a
    replay — a retrace per event pattern would pay a multi-second
    remote compile mid-run."""
    return jnp.stack([r.astype(jnp.float64) for r in rows])


class BlockReadCollector:
    """Accumulates per-frame packed stats rows as DEVICE handles and
    materializes a whole block in ONE device->host transfer.

    Measured r3 (docs/PERF_ANALYSIS.md): a per-frame read costs a full
    relay service interval (~55 ms) even when deferred onto a reader
    thread — LIO-only offline replay with per-frame deferred reads runs
    59.7 ms/frame while its op execution is ~0.3 ms, i.e. read COUNT is
    what bounds every per-frame replay mode. Packing a block's rows
    device-side divides that bound by the block size.

    The pipeline/Vio hand rows over in dispatch order (lidar rows carry
    the _emit_output metadata; camera rows apply via Vio._apply_stats),
    so flushing preserves exact per-frame output order and content.
    """

    def __init__(self, pipe, block: int):
        self.pipe = pipe
        self.E = block
        self.entries: List = []  # ("lidar", meta) | ("cam", None)
        self.rows: List = []     # device f64 rows, dispatch order
        self._pad_row = None     # lazy (29,) zero row for partial blocks
        self._reader = None
        self._inflight = None    # (future, entries) of the previous flush

    def __len__(self):
        return len(self.entries)

    def add_lidar(self, stats_j, meta: dict):
        self.rows.append(stats_j)
        self.entries.append(("lidar", meta))

    def add_cam(self, stats_j):
        self.rows.append(stats_j)
        self.entries.append(("cam", None))

    def flush(self):
        """Submit this block's single packed read to the reader thread
        and emit the PREVIOUS block's frames (whose read has had a whole
        block of head start) — even the one read per block stays off the
        dispatch critical path. Call `drain()` at end of stream."""
        if not self.entries:
            return
        rows = self.rows
        if len(rows) < self.E:
            # pad partial blocks to the block size: _stack_rows then
            # sees one shape signature for the whole replay (no
            # mid-run retrace); padded rows are never consumed
            if self._pad_row is None:
                self._pad_row = jnp.zeros(29, jnp.float64)
            rows = rows + [self._pad_row] * (self.E - len(rows))
        if self._reader is None:
            from concurrent.futures import ThreadPoolExecutor

            self._reader = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fastlivo-block-read"
            )
        inflight = (
            self._reader.submit(np.asarray, _stack_rows(*rows)),
            list(self.entries),
        )
        self.entries.clear()
        self.rows.clear()
        prev, self._inflight = self._inflight, inflight
        if prev is not None:
            self._emit(prev)

    def drain(self):
        """End-of-stream barrier: flush and emit everything pending."""
        self.flush()
        if self._inflight is not None:
            prev, self._inflight = self._inflight, None
            self._emit(prev)

    def _emit(self, inflight):
        fut, entries = inflight
        arr = fut.result()
        p = self.pipe
        for (kind, meta), row in zip(entries, arr):
            if kind == "lidar":
                p._map_occ_host = float(row[28])
                p._emit_output(
                    scan=meta["scan"], post_pack=row[3:27],
                    n_down=int(row[0]), n_active=int(row[1]),
                    iters=int(row[2]), res_rms=float(row[27]),
                    dense_world=None, inten_np=meta["inten_np"],
                    cov_handle=meta["cov_handle"], timing=meta["timing"],
                )
            else:
                p.vio._apply_stats(row)


class LivoBlockReplayer:
    """Offline full-LIVO replay in blocks of E measurement events.

    Round-3 redesign, in two measured steps (docs/PERF_ANALYSIS.md
    "Round 3"; all numbers same-session A/Bs on a 12 s synthetic LIVO
    run through the TPU relay):

    1. The round-2 single mega-executable (a lax.scan whose body
       lax.cond-switched between the lidar and camera branches) was
       retired: 194 ms per lidar+camera pair vs 123 ms for chained
       per-frame dispatches — the scan/cond machinery re-threads the
       geometric map pool and the visual-map SoA through every event's
       branch outputs, which XLA cannot always alias, so each event
       paid whole-state copies the per-frame executables never make;
       it also compiled an E-times-larger program (~10 min through the
       relay) and bought only dispatch amortization (~20 us each on
       attached hardware) in return.
    2. Per-frame readbacks were then shown to be the binding constraint
       (each costs a ~55 ms relay service interval even deferred onto a
       reader thread), so a block now performs E back-to-back dispatches
       of the SAME fused per-frame executables with NO reads at all —
       each frame's packed stats row joins a device-side stack
       (BlockReadCollector) and the whole block materializes in ONE
       transfer at the boundary.

    Because the executables ARE the per-frame path, block outputs match
    per-frame outputs exactly, except that the sliding-local-map trigger
    consumes a posterior E to 2E-1 frames old instead of 1
    (BlockReadCollector.flush emits the PREVIOUS block's rows after
    dispatching the current one, adding a block of lag on top of the
    block boundary itself) — the same class of deviation as the
    documented one-frame slider lag (decimetres of motion against a
    hundreds-of-meters slide margin); tests/test_replay.py pins the
    trajectory agreement.

    Per-frame consumers that need per-frame host data (trace logging,
    PCD/RGB accumulation, viz hooks, materialize_dense, collect_cov,
    debug) are incompatible with block-packed emission; with any of
    them configured the replayer falls back to chained dispatches with
    E-deep deferred readback (same executables, one deferred read per
    frame).

    The LIO-only BlockReplayer above keeps its scan-fused
    lidar_block_step: it additionally amortizes the per-dispatch cost,
    which at ~0.2-0.5 ms of per-frame work is worth another ~10x there.
    """

    def __init__(self, pipe, block: int = 8):
        # works LIO-only too (vio None): chained per-frame dispatches
        # with block-packed readback, no scan-carried map
        self.pipe = pipe
        self.E = max(int(block), 1)

    def _per_frame_consumers(self) -> bool:
        p = self.pipe
        return (p.logger is not None or p.cfg.pcd_save_en
                or p.on_frame is not None or p.materialize_dense
                or p.collect_cov or p.cfg.debug)

    def run(self) -> List:
        p = self.pipe
        if self._per_frame_consumers():
            return self._run_deferred()
        collector = BlockReadCollector(p, self.E)
        prev = (p.read_collector,
                p.vio.read_collector if p.vio is not None else None)
        p.read_collector = collector
        if p.vio is not None:
            p.vio.read_collector = collector
        try:
            if p.sync.reset_flagged:
                p._reset_imu()
                p.sync.reset_flagged = False
            for g in p.sync.drain():
                p._process_group(g)
                if len(collector) >= self.E:
                    collector.flush()
            collector.drain()
            p.finish()  # warm-up frames may have used deferred reads
        finally:
            p.read_collector = prev[0]
            if p.vio is not None:
                p.vio.read_collector = prev[1]
        return p.outputs

    def _run_deferred(self) -> List:
        """Fallback for per-frame consumers: chained dispatches with
        E-deep deferred readback (one read per frame, off the critical
        path by up to E frames)."""
        p = self.pipe
        prev = (p.async_read, p.async_depth,
                p.vio.async_depth if p.vio is not None else None)
        p.async_read = True
        p.async_depth = self.E
        if p.vio is not None:
            p.vio.async_depth = self.E
        try:
            p.spin()
            p.finish()  # end-of-stream barrier: resolve the deferred tail
        finally:
            p.async_read = prev[0]
            p.async_depth = prev[1]
            if p.vio is not None:
                p.vio.async_depth = prev[2]
        return p.outputs
