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
    single packed (K, 42) f64 array (_pack_summary layout; tail =
    [n_active, iters, res_rms]) — ONE host read per block instead of 11
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
        ys = _pack_summary(st1, res.state,
                           (res.n_active, res.iters, res_rms))
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
    single layout shared by lidar_block_step / livo_block_step and
    `_unpack_summary` — edit here, never at call sites."""
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

    def _stage(self, groups):
        """Host-side staging of K groups into stacked device inputs."""
        p = self.pipe
        cap = p.cfg.capacity
        P = cap.max_imu_per_group
        R = cap.max_raw_points
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
            n = min(len(scan.pts), R)
            PTS[k, :n] = scan.pts[:n, :3]
            TR[k, :n] = scan.t_rel[:n]
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
            ekf_inited = (
                p.first_lidar_time is not None
                and g.scan.beg_time - p.first_lidar_time >= 0.5
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

        from .io.synthetic import _rot_to_quat
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
            max_points=cap.max_points,
            max_iter=p.cfg.max_iteration,
            knn_radius=cap.knn_voxel_radius,
            max_probe=cap.max_probe,
            plane_fit=cap.plane_fit,
        )
        p.state = st
        p.map = m2
        p.acc_s_last, p.angvel_last = acc_f, ang_f
        wall = _time.perf_counter() - t0
        K = len(groups)
        # ONE packed read for the whole block's summaries
        u = _unpack_summary(np.asarray(ys))
        pre_R, pre_p, pre_v = u["pre_R"], u["pre_p"], u["pre_v"]
        po_R, po_p, po_v = u["po_R"], u["po_p"], u["po_v"]
        po_bg, po_ba, po_gv = u["po_bg"], u["po_ba"], u["po_gv"]
        n_act, iters = u["tail"][:, 0], u["tail"][:, 1]
        res_rms = u["tail"][:, 2]
        self._last_po_pos = po_p[-1]
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
                p.logger.log_post(ts[k], post)
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
# Full-LIVO event blocks: lidar-end AND camera events in one dispatch.

@functools.partial(
    jax.jit,
    static_argnames=(
        "max_points", "max_iter", "knn_radius", "max_probe", "pose_rows",
        "grid_size", "patch_size", "gw", "gh", "ncc_en", "max_vox", "max_pg",
        "robust", "plane_fit",
    ),
)
def livo_block_step(
    state: NavState,
    m,
    vmap,
    cam,
    calib: imu_mod.ImuCalib,
    Rci, Pci, Jdphi_dR, Jdp_dR,
    # per-event stacked inputs, leading axis E
    is_lidar,  # (E,) bool
    acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt, row0_off,
    pts_raw, t_rel, rmask,  # (E, R, ...) zeros on image events
    gray, fid,  # (E, H, W) / (E,) zeros on lidar events
    acc_s_last, angvel_last,
    last_cloud, last_cmask,  # (R, 3)/(R,) carried VIO depth cloud
    filter_size_surf,
    outlier_threshold, ncc_thre, img_point_cov,
    laser_point_cov: float,
    max_points: int,
    max_iter: int,
    knn_radius: int,
    max_probe: int,
    pose_rows: int,
    grid_size: int,
    patch_size: int,
    gw: int,
    gh: int,
    ncc_en: bool,
    max_vox: int,
    max_pg: int,
    robust: str = "none",
    plane_fit: str = "tls",
):
    """E interleaved LIVO events (scan-ends and camera frames) chained
    in one executable. The reference's event protocol (sync_packages
    groups + segmented mid-scan propagation, laserMapping.cpp:520-690 /
    IMU_Processing.cpp:621-646) runs inside a lax.scan:

      - every event first propagates state+cov over its IMU block and
        compact-appends the segment's pose rows into a carried
        merged-pose-table buffer (the per-scan undistortion table);
      - lidar events undistort the full scan against that buffer, run
        the iterated point-to-plane EKF, insert into the map, refresh
        the carried VIO depth cloud, and reset the pose buffer;
      - camera events run the fused photometric frame
        (vio.vio_frame_step) against the carried depth cloud.

    The two branches live in one lax.cond whose operands/outputs share a
    single pytree type (each branch passes the other subsystem's state
    through untouched).

    Returns (state', m', vmap', acc_s', angvel', last_cloud',
    last_cmask', ys) with ys a packed (E+1, 43) f64 array
    (_pack_summary layout; tail = [n_primary, n_secondary, is_lidar,
    res_rms]); the final row's column 0 carries the carried depth
    cloud's valid count — ONE host read per block."""
    from .vio import vio_frame_step

    dtype = pts_raw.dtype
    M = pose_rows
    acc_s_last = acc_s_last.astype(state.pos.dtype)
    angvel_last = angvel_last.astype(state.pos.dtype)
    pose0 = imu_mod.PoseTable(
        offs=jnp.full(M, imu_mod.BIG_T, dtype),
        rot=jnp.zeros((M, 3, 3), dtype),
        pos=jnp.zeros((M, 3), dtype),
        vel=jnp.zeros((M, 3), dtype),
        acc=jnp.zeros((M, 3), dtype),
        gyr=jnp.zeros((M, 3), dtype),
    )

    def step(carry, inp):
        st, mm, vm_, acc_s, angv, buf, cnt, lc, lcm = carry
        (isl, a, g, d, o, pv, td, r0, pts, tr, pm, gr, fi) = inp
        st1, seg, acc2, ang2 = imu_mod.propagate(
            st, a, g, d, o, pv, td, acc_s, angv, calib, row0_off=r0
        )
        # compact-append the segment (row0 + valid pair rows) into the
        # carried per-scan table (the host-side _merged_pose_table role)
        keep = jnp.concatenate([jnp.ones(1, bool), pv])
        dst = cnt + jnp.cumsum(keep.astype(jnp.int32)) - 1
        dst = jnp.where(keep & (dst < M), dst, M)
        buf = imu_mod.PoseTable(
            offs=buf.offs.at[dst].set(seg.offs.astype(dtype), mode="drop"),
            rot=buf.rot.at[dst].set(seg.rot.astype(dtype), mode="drop"),
            pos=buf.pos.at[dst].set(seg.pos.astype(dtype), mode="drop"),
            vel=buf.vel.at[dst].set(seg.vel.astype(dtype), mode="drop"),
            acc=buf.acc.at[dst].set(seg.acc.astype(dtype), mode="drop"),
            gyr=buf.gyr.at[dst].set(seg.gyr.astype(dtype), mode="drop"),
        )
        cnt = jnp.minimum(cnt + jnp.sum(keep, dtype=jnp.int32), M)

        def lidar_branch(_):
            und = imu_mod.undistort(st1, buf, pts, tr, pm, calib)
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
            rot32 = res.state.rot.astype(dtype)
            pos32 = res.state.pos.astype(dtype)
            world_down = (
                down @ calib.lid_rot.T + calib.lid_off
            ) @ rot32.T + pos32
            if mod is lio_mod.vm:
                m2 = mod.insert(mm, world_down, dmask, max_probe=max_probe)
            else:
                m2 = mod.insert(mm, world_down, dmask)
            dense = (und @ calib.lid_rot.T + calib.lid_off) @ rot32.T + pos32
            n_safe = jnp.maximum(res.n_active.astype(jnp.float64), 1.0)
            rms = jnp.sqrt(jnp.sum(
                jnp.where(res.active, res.res.astype(jnp.float64), 0.0)
                ** 2) / n_safe)
            return (res.state, m2, vm_, dense, pm, pose0, jnp.int32(0),
                    res.n_active, res.iters, rms)

        def image_branch(_):
            (st2, vm2, _ti, _tv, _opc, _perr, _err, n_tr, _n_add,
             its, _stats) = vio_frame_step(
                vm_, cam, st1, st1, gr, fi, lc, lcm,
                Rci, Pci, Jdphi_dR, Jdp_dR,
                outlier_threshold, ncc_thre, img_point_cov,
                grid_size=grid_size, patch_size=patch_size, gw=gw, gh=gh,
                ncc_en=ncc_en, max_iter=max_iter, max_vox=max_vox,
                max_pg=max_pg, robust=robust,
            )
            return (st2, mm, vm2, lc, lcm, buf, cnt, n_tr, its,
                    jnp.float64(0.0))

        (st2, m2, vm2, lc2, lcm2, buf2, cnt2, n1, n2, rms) = jax.lax.cond(
            isl, lidar_branch, image_branch, None
        )
        # ONE packed summary row per event (_pack_summary layout; tail =
        # [n_primary, n_secondary, is_lidar]) so the host reads the
        # whole block's summaries in a single transfer (each blocking
        # read through the relay is a ~30-65 ms round trip; the tuple
        # form cost 12 reads per block)
        ys = _pack_summary(st1, st2, (n1, n2, isl, rms))
        return (st2, m2, vm2, acc2, ang2, buf2, cnt2, lc2, lcm2), ys

    carry0 = (state, m, vmap, acc_s_last, angvel_last, pose0, jnp.int32(0),
              last_cloud, last_cmask)
    (st_f, m_f, vm_f, acc_f, ang_f, _buf, _cnt, lc_f, lcm_f), ys = (
        jax.lax.scan(
            step, carry0,
            (is_lidar, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
             row0_off, pts_raw, t_rel, rmask, gray, fid),
        )
    )
    # block-level extras ride the same pack as a final row: [0] = valid
    # count of the carried depth cloud (the host's _steady gate)
    extra = jnp.zeros((1, 43), jnp.float64).at[0, 0].set(
        jnp.sum(lcm_f).astype(jnp.float64)
    )
    ys = jnp.concatenate([ys, extra], axis=0)
    return st_f, m_f, vm_f, acc_f, ang_f, lc_f, lcm_f, ys


class LivoBlockReplayer:
    """Full-LIVO offline replay: E mixed events (scan-ends + camera
    frames) per dispatch via livo_block_step. Bootstrap frames run
    per-frame; once the pipeline is in steady state (map built, EKF
    inited, a depth cloud exists for the VIO), events are staged in
    blocks."""

    def __init__(self, pipe, block: int = 8):
        assert pipe.cfg.img_enable and pipe.vio is not None
        self.pipe = pipe
        self.E = block
        # block-to-block device carry: (cloud, mask) of the VIO depth
        # cloud + host count, and the previous block's final posterior
        # row — avoids a compact-on-host + re-upload round trip per
        # block (and makes the between-block cloud representation
        # identical to the within-block one)
        self._lc_dev = None
        self._lc_n = 0
        self._last_po_pos = None
        self._last_po_bias = None

    def _steady(self, g) -> bool:
        p = self.pipe
        if not (p.map_built and p.init_done and p.ready):
            return False
        if p.first_lidar_time is None:
            return False
        if g.scan.beg_time - p.first_lidar_time < 0.5:
            return False
        if self._lc_dev is not None:
            return self._lc_n >= 10
        v = p.vio
        # a per-frame fused _process_group hands the depth cloud to the
        # Vio as a DEVICE handle (set_last_cloud_device) and nulls
        # last_cloud — steady-state must recognize that carry too, or
        # one bootstrap interleave would silently ratchet the replayer
        # into per-frame dispatch for the rest of the run
        if v._last_cloud_dev is not None:
            return v._last_cloud_dev[1] >= 10
        return v.last_cloud is not None and len(v.last_cloud) >= 10

    def _materialize_cloud(self):
        """Hand the device-carried depth cloud back to the host Vio
        (compacted, as its host path expects) — paid only when leaving
        block mode (bootstrap interleave or end of run)."""
        if self._lc_dev is None:
            return
        lc_f, lcm_f = self._lc_dev
        m_np = np.asarray(lcm_f)
        # route through set_last_cloud so the Vio's last_cloud /
        # _last_cloud_dev invariant is maintained in one place
        self.pipe.vio.set_last_cloud(np.asarray(lc_f)[m_np])
        self._lc_dev = None

    def run(self) -> List:
        p = self.pipe
        if p.sync.reset_flagged:
            p._reset_imu()
            p.sync.reset_flagged = False
        pending = []
        for g in p.sync.drain():
            if not self._steady(g):
                if pending:
                    self._flush(pending)
                    pending = []
                self._materialize_cloud()
                p._process_group(g)
                # per-frame processing moved p.state: drop the cached
                # packed posterior rows
                self._last_po_pos = self._last_po_bias = None
                continue
            pending.append(g)
            if len(pending) == self.E:
                self._flush(pending)
                pending = []
        if pending:
            self._flush(pending)
        self._materialize_cloud()
        return p.outputs

    def _flush(self, groups):
        import time as _time

        import jax.numpy as jnp

        from .io.synthetic import _rot_to_quat
        from .pipeline import FrameOutput

        p = self.pipe
        v = p.vio
        cap = p.cfg.capacity
        P = cap.max_imu_per_group
        R = cap.max_raw_points
        E = len(groups)
        H, W = v.cam.height, v.cam.width
        t0 = _time.perf_counter()

        # previous block's final posterior position (already on host
        # from its packed read) feeds the map slider without a device
        # read; first block falls back to one read
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
        pre_bias = p.state

        ISL = np.zeros(E, bool)
        A = np.zeros((E, P, 3), np.float32)
        G = np.zeros((E, P, 3), np.float32)
        D = np.zeros((E, P), np.float32)
        O = np.full((E, P), imu_mod.BIG_T, np.float32)
        V = np.zeros((E, P), bool)
        TD = np.zeros(E, np.float32)
        R0 = np.zeros(E, np.float32)
        PTS = np.zeros((E, R, 3), np.float32)
        TR = np.zeros((E, R), np.float32)
        PM = np.zeros((E, R), bool)
        GRAY = np.zeros((E, H, W), np.float32)
        FID = np.zeros(E, np.int32)
        ts = []
        n_img = 0
        for k, g in enumerate(groups):
            scan = g.scan
            ISL[k] = g.is_lidar_end
            end_time = (scan.end_time if g.is_lidar_end
                        else scan.beg_time + g.img_offset_time)
            ts.append(end_time)
            if p.last_imu is not None:
                imu_t = np.concatenate([[p.last_imu[0]], g.imu_t])
                imu_acc = np.concatenate([[p.last_imu[1]], g.imu_acc])
                imu_gyr = np.concatenate([[p.last_imu[2]], g.imu_gyr])
            else:
                imu_t, imu_acc, imu_gyr = g.imu_t, g.imu_acc, g.imu_gyr
            if len(g.imu_t):
                p.last_imu = (g.imu_t[-1], g.imu_acc[-1], g.imu_gyr[-1])
            a, gy, d, o, vv, td, r0 = imu_mod.prepare_pairs(
                imu_t, imu_acc, imu_gyr,
                beg_time=scan.beg_time, end_time=end_time,
                last_end_time=p.last_group_end, max_pairs=P,
            )
            A[k], G[k], D[k], O[k], V[k], TD[k], R0[k] = a, gy, d, o, vv, td, r0
            p.last_group_end = end_time
            if p.logger is not None and p.first_lidar_time is not None:
                for i in np.nonzero(vv)[0]:
                    p.logger.log_imu(imu_t[i] - p.first_lidar_time, a[i], gy[i])
            if g.is_lidar_end:
                n = min(len(scan.pts), R)
                PTS[k, :n] = scan.pts[:n, :3]
                TR[k, :n] = scan.t_rel[:n]
                PM[k, :n] = True
            else:
                v.last_bgr = v._resize_color(g.img)
                GRAY[k] = v._to_gray(g.img)
                FID[k] = v.fid + n_img
                n_img += 1

        if self._lc_dev is not None:
            # device-resident carry from the previous block: no host
            # compaction, no re-upload
            lc0_j, lcm0_j = self._lc_dev
        elif v._last_cloud_dev is not None:
            # carry handed over by a per-frame fused lidar step: the
            # cloud never left the device; only the count is on host
            cloud_dev, n0 = v._last_cloud_dev
            lc0_j = cloud_dev
            lcm0_j = jnp.asarray(np.arange(R) < min(n0, R))
        else:
            lc0 = np.zeros((R, 3), np.float32)
            lcm0 = np.zeros(R, bool)
            n0 = min(len(v.last_cloud), R)
            lc0[:n0] = v.last_cloud[:n0, :3]
            lcm0[:n0] = True
            lc0_j, lcm0_j = jnp.asarray(lc0), jnp.asarray(lcm0)

        cfg = p.cfg
        (st, m2, vm2, acc_f, ang_f, lc_f, lcm_f, ys) = livo_block_step(
            p.state, p.map, v.vmap, v.cam, p.calib,
            v.Rci, v.Pci, v.Jdphi_dR, v.Jdp_dR,
            jnp.asarray(ISL),
            jnp.asarray(A), jnp.asarray(G), jnp.asarray(D), jnp.asarray(O),
            jnp.asarray(V), jnp.asarray(TD), jnp.asarray(R0),
            jnp.asarray(PTS), jnp.asarray(TR), jnp.asarray(PM),
            jnp.asarray(GRAY), jnp.asarray(FID),
            p.acc_s_last, p.angvel_last,
            lc0_j, lcm0_j,
            jnp.float32(cfg.filter_size_surf),
            cfg.outlier_threshold, cfg.ncc_thre, cfg.img_point_cov,
            laser_point_cov=cfg.laser_point_cov,
            max_points=cap.max_points, max_iter=cfg.max_iteration,
            knn_radius=cap.knn_voxel_radius, max_probe=cap.max_probe,
            pose_rows=p.max_scan_poses,
            grid_size=v.grid_size, patch_size=v.patch_size,
            gw=v.gw, gh=v.gh, ncc_en=cfg.ncc_en,
            max_vox=v.max_vox, max_pg=v.max_pg,
            robust=cap.vio_robust, plane_fit=cap.plane_fit,
        )
        p.state = st
        p.map = m2
        v.vmap = vm2
        p.acc_s_last, p.angvel_last = acc_f, ang_f
        v.fid += n_img
        # the carried depth cloud stays ON DEVICE between blocks; the
        # valid count rides the packed summary row below
        self._lc_dev = (lc_f, lcm_f)
        # block carry is now authoritative: clear both Vio-side forms
        v.last_cloud = None
        v._last_cloud_dev = None

        # ONE packed read for the whole block: per-event pre/post state
        # summaries + counters, plus block extras in the final row
        ys_np = np.asarray(ys)
        self._lc_n = int(ys_np[E, 0])
        u = _unpack_summary(ys_np[:E])
        pre_R, pre_p, pre_v = u["pre_R"], u["pre_p"], u["pre_v"]
        po_R, po_p, po_v = u["po_R"], u["po_p"], u["po_v"]
        po_bg, po_ba, po_gv = u["po_bg"], u["po_ba"], u["po_gv"]
        n1, n2 = u["tail"][:, 0], u["tail"][:, 1]
        isl = u["tail"][:, 2] > 0.5
        res_rms = u["tail"][:, 3]
        self._last_po_pos = po_p[-1]
        rot_f = po_R[-1].astype(np.float32)
        v.last_rcw = np.asarray(v.Rci) @ rot_f.T
        v.last_pcw = (
            -v.last_rcw @ po_p[-1].astype(np.float32) + np.asarray(v.Pci)
        )
        wall = _time.perf_counter() - t0

        if p.logger is not None:
            # block-entry bias/grav rows (pre-state for event 0): from
            # the previous block's packed posterior when available
            if self._last_po_bias is not None:
                bg0, ba0, gv0 = self._last_po_bias
            else:
                bg0 = np.asarray(pre_bias.bg)
                ba0 = np.asarray(pre_bias.ba)
                gv0 = np.asarray(pre_bias.grav)
        self._last_po_bias = (po_bg[-1], po_ba[-1], po_gv[-1])
        n_lid = max(int(isl.sum()), 1)
        for k in range(E):
            if p.logger is not None:
                pbg = bg0 if k == 0 else po_bg[k - 1]
                pba = ba0 if k == 0 else po_ba[k - 1]
                pgv = gv0 if k == 0 else po_gv[k - 1]
                pre = NavState(pre_R[k], pre_p[k], pre_v[k],
                               pbg, pba, pgv, st.cov)
                post = NavState(po_R[k], po_p[k], po_v[k],
                                po_bg[k], po_ba[k], po_gv[k], st.cov)
                p.logger.log_pre(ts[k], pre)
                p.logger.log_post(ts[k], post)
            if not isl[k]:
                v.last_stats = {"tracked": int(n1[k]), "added": 0,
                                "err": 0.0}
                continue
            if p.cfg.pose_output_en and p.logger is not None:
                rcw_k = np.asarray(v.Rci) @ po_R[k].astype(np.float32).T
                pcw_k = (-rcw_k @ po_p[k].astype(np.float32)
                         + np.asarray(v.Pci))
                p.logger.log_camera_pose(groups[k].scan.beg_time, rcw_k, pcw_k)
            if p.logger is not None:
                post_k = NavState(po_R[k], po_p[k], po_v[k], po_bg[k],
                                  po_ba[k], po_gv[k], st.cov)
                p.logger.log_pos(
                    groups[k].scan.beg_time - (p.first_lidar_time or 0.0),
                    post_k,
                )
            quat = _rot_to_quat(po_R[k].astype(np.float64))
            out = FrameOutput(
                t=ts[k], pos=po_p[k].astype(np.float64), quat=quat,
                vel=po_v[k].astype(np.float64),
                n_active=int(n1[k]), iters=int(n2[k]), n_points=0,
                timing={"undistort": 0.0, "downsample": 0.0,
                        "ekf": wall / n_lid, "map": 0.0,
                        "total": wall / n_lid},
                res_rms=float(res_rms[k]),
            )
            p.outputs.append(out)
            p.trajectory.append(np.array(
                [out.t, *out.pos, quat[1], quat[2], quat[3], quat[0]]
            ))
