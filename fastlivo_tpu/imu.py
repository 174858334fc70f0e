"""IMU initialization, forward propagation and scan undistortion.

TPU-native re-design of the reference ImuProcess
(reference: src/IMU_Processing.cpp):

  - static initialization (IMU_init, :137-181): host-side numpy
    (runs once over the first ~200 samples, nothing to accelerate);
  - forward state+covariance propagation (UndistortPcl :657-755):
    one `lax.scan` over padded IMU sample pairs with a validity mask —
    the 18x18 transition F_x and process noise blocks are identical to
    the reference (:701-717);
  - backward per-point undistortion (:774-808): fully vectorized — each
    point finds its IMU pose interval by searchsorted and applies the
    closed-form compensation transform. No per-point loop.

Numerical layout: absolute timestamps never reach the device. The host
computes per-pair dt and per-sample offsets (relative to the segment
start) in float64 and ships only small f32 quantities.

Deviation from the reference (documented): the reference compares point
offsets measured from `lidar_beg_time` against pose offsets measured
from `max(lidar_beg_time, last_update_time)` (IMU_Processing.cpp:621,
:787), which shifts undistortion origins for scans interleaved with
image updates. Here both use the same origin (the scan begin), and
points earlier than the pose table are extrapolated backward from the
first pose.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import so3
from .state import DIM_STATE, G_M_S2, NavState

BIG_T = 1e30
MAX_INI_COUNT = 200  # reference: IMU_Processing.h:36


class ImuCalib(NamedTuple):
    """Per-run IMU calibration constants (device)."""

    acc_scale: jnp.ndarray  # () G / |mean_acc| (IMU_Processing.cpp:685)
    cov_acc: jnp.ndarray  # (3,) scaled accel noise
    cov_gyr: jnp.ndarray  # (3,) scaled gyro noise
    cov_bias_acc: jnp.ndarray  # (3,)
    cov_bias_gyr: jnp.ndarray  # (3,)
    lid_rot: jnp.ndarray  # (3, 3) R: lidar frame -> IMU frame
    lid_off: jnp.ndarray  # (3,) t: lidar origin in IMU frame


class PoseTable(NamedTuple):
    """IMU-rate pose samples for undistortion (Pose6D equivalent,
    common_lib.h:396-411). Row 0 is the segment-start state."""

    offs: jnp.ndarray  # (M,) seconds from segment begin; BIG_T if invalid
    rot: jnp.ndarray  # (M, 3, 3)
    pos: jnp.ndarray  # (M, 3)
    vel: jnp.ndarray  # (M, 3)
    acc: jnp.ndarray  # (M, 3) world-frame specific acceleration
    gyr: jnp.ndarray  # (M, 3) bias-corrected body angular velocity


@jax.jit
def _pack_pose(pose: "PoseTable", state) -> jnp.ndarray:
    """Flatten a PoseTable (+ the full segment-end state) to one
    (M+1, 24) f64 array so the host can read it in a SINGLE device->host
    transfer (each blocking transfer through the relay costs a full
    ~30 ms round trip once the session streams results; 6 leaf reads per
    group dominated interactive frame time). Rows 0..M-1 are the table
    ([offs, rot9, pos3, vel3, acc3, gyr3], 2 pad cols); the last row is
    the propagated state's pack24 (state.pack24) — it feeds both the
    mat_pre trace row and the local-map slider without extra reads.
    f64 throughout: the table is the undistortion pose input and the
    trace row is logged at %.8f."""
    from .state import pack24

    M = pose.offs.shape[0]
    f = jnp.float64
    base = jnp.concatenate(
        [pose.offs[:, None].astype(f), pose.rot.reshape(M, 9).astype(f),
         pose.pos.astype(f), pose.vel.astype(f), pose.acc.astype(f),
         pose.gyr.astype(f), jnp.zeros((M, 2), f)], axis=1)
    return jnp.concatenate([base, pack24(state)[None, :]], axis=0)


@functools.partial(jax.jit, static_argnames=("m_out",))
def merge_pose_packs(packs, flat_idx, row_valid, m_out: int):
    """Merge per-group pose packs (from `propagate_packed`) into the
    fixed-size per-scan PoseTable ENTIRELY ON DEVICE — the interactive
    pipeline's replacement for a host-side merge that needed one
    blocking device->host read per IMU group (a full ~30-65 ms relay
    round trip each).

    packs: tuple of (Bi+1, 24) f64 packs; the last row of each (the
    segment-end state) is dropped here. flat_idx (m_out,) i32 indexes
    the row-concatenation of the packs' base rows: the host computes
    kept-row indices (row0 + valid pairs) and pads by repeating the
    last kept index — replicating the previous host merge's
    `buf[len:] = a[-1]` padding. row_valid (m_out,) marks real rows;
    padded rows get offs=BIG_T (same sentinel as before). Output
    fields are f32, matching the host merge's cast.

    Compile-count note: every pack has the FIXED shape (max_pairs+2,
    24) because prepare_pairs pads each group to capacity, so the jit
    signature varies only in len(packs) = groups per scan (1 for LIO;
    1 + images for LIVO) — a handful of compilations, not one per
    IMU-count combination."""
    base = jnp.concatenate([p[:-1] for p in packs], axis=0)
    rows = base[flat_idx].astype(jnp.float32)  # (m_out, 24)
    offs = jnp.where(row_valid, rows[:, 0], jnp.float32(BIG_T))
    return PoseTable(
        offs=offs,
        rot=rows[:, 1:10].reshape(m_out, 3, 3),
        pos=rows[:, 10:13],
        vel=rows[:, 13:16],
        acc=rows[:, 16:19],
        gyr=rows[:, 19:22],
    )


@jax.jit
def propagate_packed(s, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
                     acc_s_last, angvel_last, calib, row0_off=0.0):
    """`propagate` with the pose table pre-packed ON DEVICE: one fused
    dispatch returning (state, (M+1,24) pack, acc_s_last, angvel_last),
    so an interactive frame pays one dispatch + one blocking read per
    IMU group instead of two dispatches + six reads."""
    st, pose, a_last, g_last = propagate(
        s, acc_avg, gyr_avg, dt, offs, pair_valid, tail_dt,
        acc_s_last, angvel_last, calib, row0_off,
    )
    return st, _pack_pose(pose, st), a_last, g_last


def pack_pairs_wire(acc_avg, gyr_avg, dt, offs, valid, tail_dt, row0_off):
    """Host-side: everything `prepare_pairs` returned in ONE (P+1, 9)
    f32 array. A device_put through the relay costs ~2 ms of service
    REGARDLESS of size, so the seven per-group uploads were ~13 ms of
    pure wire overhead per measurement event; one packed array is one."""
    P = len(dt)
    w = np.zeros((P + 1, 9), np.float32)
    w[:P, 0:3] = acc_avg
    w[:P, 3:6] = gyr_avg
    w[:P, 6] = dt
    w[:P, 7] = offs
    w[:P, 8] = valid
    w[P, 0] = tail_dt
    w[P, 1] = row0_off
    return w


@jax.jit
def propagate_wire(s, wire, acc_s_last, angvel_last, calib):
    """`propagate_packed` fed from a single `pack_pairs_wire` upload."""
    P = wire.shape[0] - 1
    return propagate_packed(
        s, wire[:P, 0:3], wire[:P, 3:6], wire[:P, 6], wire[:P, 7],
        wire[:P, 8] > 0.5, wire[P, 0], acc_s_last, angvel_last, calib,
        row0_off=wire[P, 1],
    )


class ImuInitializer:
    """Host-side static initializer (IMU_init, IMU_Processing.cpp:137-181).

    Accumulates running mean/variance of accel & gyro over the first
    MAX_INI_COUNT samples, then yields gravity, gyro bias and the noise
    covariances (scaled per Process2, :830-835)."""

    def __init__(self):
        self.n = 0
        self.mean_acc = np.array([0.0, 0.0, -1.0])
        self.mean_gyr = np.zeros(3)
        self.cov_acc = np.full(3, 0.1)
        self.cov_gyr = np.full(3, 0.1)

    def push(self, acc: np.ndarray, gyr: np.ndarray) -> None:
        if self.n == 0:
            # b_first_frame_ branch (:144-152): seed the means with the
            # first sample. Its for-loop pass is a no-op for the MEANS
            # (cur == mean) but NOT for the covariances: with N = 1 the
            # reference multiplies the 0.1 Reset() seed by (N-1)/N = 0,
            # i.e. the first pass ZEROES cov_acc/cov_gyr. Skipping that
            # (the old behavior) left a +0.1/N bias — cov_gyr ~40x a
            # typical static gyro variance after 200 samples, inflating
            # the attitude process noise from the first frame.
            self.mean_acc = np.asarray(acc, dtype=np.float64).copy()
            self.mean_gyr = np.asarray(gyr, dtype=np.float64).copy()
            self.cov_acc = np.zeros(3)
            self.cov_gyr = np.zeros(3)
            self.n = 1
            return
        # the reference processes the i-th sample with divisor N = i
        # (N increments AFTER each sample, :172); self.n counts samples
        # already consumed, so sample i = self.n + 1 uses N = self.n + 1.
        # (A previous off-by-one used N = self.n, which made the second
        # sample fully overwrite the mean and zero the covariance.)
        n = self.n + 1
        da = acc - self.mean_acc
        dg = gyr - self.mean_gyr
        self.mean_acc += da / n
        self.mean_gyr += dg / n
        self.cov_acc = self.cov_acc * (n - 1.0) / n + (acc - self.mean_acc) * (
            acc - self.mean_acc
        ) * (n - 1.0) / (n * n)
        self.cov_gyr = self.cov_gyr * (n - 1.0) / n + (gyr - self.mean_gyr) * (
            gyr - self.mean_gyr
        ) * (n - 1.0) / (n * n)
        self.n += 1

    @property
    def done(self) -> bool:
        # reference: init completes when init_iter_num (= samples + 1)
        # exceeds MAX_INI_COUNT (laserMapping gate), i.e. after
        # MAX_INI_COUNT samples
        return self.n + 1 > MAX_INI_COUNT

    def gravity(self) -> np.ndarray:
        return -self.mean_acc / np.linalg.norm(self.mean_acc) * G_M_S2

    def calib(
        self,
        acc_cov_scale: float,
        gyr_cov_scale: float,
        lid_rot: np.ndarray,
        lid_off: np.ndarray,
        bias_cov: float = 1e-5,
        dtype=jnp.float32,
    ) -> ImuCalib:
        norm = np.linalg.norm(self.mean_acc)
        cov_acc = self.cov_acc * (G_M_S2 / norm) ** 2 * acc_cov_scale
        cov_gyr = self.cov_gyr * gyr_cov_scale
        return ImuCalib(
            acc_scale=jnp.asarray(G_M_S2 / norm, dtype),
            cov_acc=jnp.asarray(cov_acc, dtype),
            cov_gyr=jnp.asarray(cov_gyr, dtype),
            cov_bias_acc=jnp.full(3, bias_cov, dtype),
            cov_bias_gyr=jnp.full(3, bias_cov, dtype),
            lid_rot=jnp.asarray(lid_rot, dtype),
            lid_off=jnp.asarray(lid_off, dtype),
        )


@jax.jit
def propagate(
    s: NavState,
    acc_avg: jnp.ndarray,  # (P, 3) raw pairwise-averaged accelerometer
    gyr_avg: jnp.ndarray,  # (P, 3) raw pairwise-averaged gyro
    dt: jnp.ndarray,  # (P,) seconds (host-computed in f64)
    offs: jnp.ndarray,  # (P,) tail offset from segment begin; BIG_T pad
    pair_valid: jnp.ndarray,  # (P,) bool
    tail_dt: jnp.ndarray,  # () signed seconds: segment end - last imu
    acc_s_last: jnp.ndarray,  # (3,) world acc at segment start
    angvel_last: jnp.ndarray,  # (3,) body gyro at segment start
    calib: ImuCalib,
    row0_off: jnp.ndarray | float = 0.0,  # segment-start offset from scan begin
):
    """Forward propagation over one measurement group.

    Returns (state at segment end, PoseTable of P+1 rows,
    acc_s_last', angvel_last').
    Mirrors IMU_Processing.cpp:657-755 (state/cov recursion) including
    the signed tail extrapolation to the segment end time (:739-755).
    """
    dtype = s.pos.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        rot, pos, vel, cov = carry
        a_raw, w_raw, dti, valid = inp
        w = w_raw - s.bg
        a = a_raw * calib.acc_scale - s.ba

        exp_f = so3.exp(w * dti)
        a_skew = so3.skew(a)

        # F_x blocks (IMU_Processing.cpp:704-710)
        F = jnp.eye(DIM_STATE, dtype=dtype)
        F = F.at[0:3, 0:3].set(so3.exp(-w * dti))
        F = F.at[0:3, 9:12].set(-eye3 * dti)
        F = F.at[3:6, 6:9].set(eye3 * dti)
        F = F.at[6:9, 0:3].set(-(rot @ a_skew) * dti)
        F = F.at[6:9, 12:15].set(-rot * dti)
        F = F.at[6:9, 15:18].set(eye3 * dti)

        Q = jnp.zeros((DIM_STATE, DIM_STATE), dtype=dtype)
        dt2 = dti * dti
        Q = Q.at[0:3, 0:3].set(jnp.diag(calib.cov_gyr) * dt2)
        Q = Q.at[6:9, 6:9].set((rot * calib.cov_acc[None, :]) @ rot.T * dt2)
        Q = Q.at[9:12, 9:12].set(jnp.diag(calib.cov_bias_gyr) * dt2)
        Q = Q.at[12:15, 12:15].set(jnp.diag(calib.cov_bias_acc) * dt2)

        cov_n = F @ cov @ F.T + Q
        rot_n = rot @ exp_f
        acc_w = rot_n @ a + s.grav
        pos_n = pos + vel * dti + 0.5 * acc_w * dt2
        vel_n = vel + acc_w * dti

        new_carry = tuple(
            jnp.where(valid, n, o)
            for n, o in zip((rot_n, pos_n, vel_n, cov_n), (rot, pos, vel, cov))
        )
        out = (new_carry[0], new_carry[1], new_carry[2],
               jnp.where(valid, acc_w, jnp.zeros(3, dtype)),
               jnp.where(valid, w, jnp.zeros(3, dtype)))
        return new_carry, out

    init = (s.rot, s.pos, s.vel, s.cov)
    (rot_e, pos_e, vel_e, cov_e), (rots, poss, vels, accs, gyrs) = jax.lax.scan(
        step, init, (acc_avg, gyr_avg, dt, pair_valid)
    )

    # rows for invalid pairs repeat the carried state; host sets their
    # offsets (0.0 for leading skipped pairs so they alias row 0, BIG_T
    # for tail padding so searchsorted never selects them). Their acc/gyr
    # alias the segment-start values.
    accs = jnp.where(pair_valid[:, None], accs, acc_s_last[None])
    gyrs = jnp.where(pair_valid[:, None], gyrs, angvel_last[None])
    pose = PoseTable(
        offs=jnp.concatenate(
            [jnp.asarray(row0_off, dtype).reshape(1), offs.astype(dtype)]
        ),
        rot=jnp.concatenate([s.rot[None], rots]),
        pos=jnp.concatenate([s.pos[None], poss]),
        vel=jnp.concatenate([s.vel[None], vels]),
        acc=jnp.concatenate([acc_s_last[None], accs]),
        gyr=jnp.concatenate([angvel_last[None], gyrs]),
    )

    # carry forward the world acc / body gyro at the last valid pair
    any_valid = jnp.any(pair_valid)
    idxs = jnp.arange(pair_valid.shape[0], dtype=jnp.int32)
    last_idx = jnp.maximum(jnp.max(jnp.where(pair_valid, idxs, -1)), 0)
    acc_last = jnp.where(any_valid, accs[last_idx], acc_s_last)
    gyr_last = jnp.where(any_valid, gyrs[last_idx], angvel_last)

    # signed tail extrapolation to the exact segment end time (:739-755)
    sdt = tail_dt.astype(dtype)
    adt = jnp.abs(sdt)
    rot_e2 = rot_e @ so3.exp(gyr_last * sdt)
    pos_e2 = pos_e + vel_e * sdt + 0.5 * acc_last * sdt * adt
    vel_e2 = vel_e + acc_last * sdt

    out_state = NavState(rot_e2, pos_e2, vel_e2, s.bg, s.ba, s.grav, cov_e)
    return out_state, pose, acc_last, gyr_last


@jax.jit
def undistort(
    s_end: NavState,
    pose: PoseTable,
    pts: jnp.ndarray,  # (N, 3) lidar-frame points
    t_rel: jnp.ndarray,  # (N,) seconds from segment begin
    pmask: jnp.ndarray,  # (N,) bool
    calib: ImuCalib,
) -> jnp.ndarray:
    """Motion-compensate points to the segment-end lidar frame.

    Vectorized form of the backward pass (IMU_Processing.cpp:774-808):
      P' = (R_li^T R_e^T) (R_i (R_li P + t_li) + T_ei) - R_li^T t_li
    with R_i, T_ei interpolated from the pose row whose offset precedes
    the point's timestamp.
    """
    dtype = pts.dtype
    offs = pose.offs.astype(dtype)
    k = jnp.searchsorted(offs, t_rel, side="left") - 1
    k = jnp.clip(k, 0, offs.shape[0] - 1)
    dt = (t_rel - offs[k])[:, None]  # (N, 1)

    # HEAD-row convention, verified against the reference 2026-08-20:
    # the backward pass extrapolates interval k with the HEAD row's
    # acc/gyr (`acc_imu << VEC_FROM_ARRAY(head->acc)` etc.,
    # IMU_Processing.cpp:779-784) — which row k stores as the PREVIOUS
    # pair's averages. That makes the extrapolated pose at offs[k+1]
    # differ slightly from the stored row k+1 pose; it is the
    # reference's own behavior (FAST-LIO2 later switched to tail->acc),
    # reproduced here deliberately. Do not "fix" to pose.gyr[k+1].
    R_head = pose.rot[k].astype(dtype)  # (N, 3, 3)
    w = pose.gyr[k].astype(dtype)
    R_i = R_head @ so3.exp(w * dt)
    T_ei = (
        pose.pos[k].astype(dtype)
        + pose.vel[k].astype(dtype) * dt
        + 0.5 * pose.acc[k].astype(dtype) * dt * dt
        - s_end.pos.astype(dtype)
    )

    p_imu = pts @ calib.lid_rot.T + calib.lid_off
    p_world_rel = jnp.einsum("nij,nj->ni", R_i, p_imu) + T_ei
    ext = calib.lid_rot.T @ s_end.rot.astype(dtype).T
    p_out = p_world_rel @ ext.T - calib.lid_rot.T @ calib.lid_off
    return jnp.where(pmask[:, None], p_out, pts)


def prepare_pairs(
    imu_t: np.ndarray,
    imu_acc: np.ndarray,
    imu_gyr: np.ndarray,
    beg_time: float,
    end_time: float,
    last_end_time: float,
    max_pairs: int,
):
    """Host-side (float64) preparation of the scan inputs for `propagate`.

    imu_* include the previous group's last sample prepended (the
    reference's v_imu.push_front(last_imu_), IMU_Processing.cpp:618).
    Returns f32 numpy arrays padded to `max_pairs`.
    """
    imu_t = np.asarray(imu_t, dtype=np.float64)
    P = max_pairs
    n = max(len(imu_t) - 1, 0)
    if n > P:
        # A group can only exceed the capacity in anomaly conditions —
        # a lidar stall or dropped scans stretched the segment so it
        # spans more IMU samples than `max_imu_per_group`. The
        # reference (dynamic vectors) just integrates them all; a
        # static-shape pipeline must degrade instead of die: subsample
        # the sample grid (endpoints kept) so integration proceeds at
        # reduced IMU rate across the stall. Midpoint-rule error on the
        # merged windows is second-order and dwarfed by the gap itself;
        # mirrors the max_raw_points stride-decimation fallback.
        import warnings

        k = -(-n // (P - 1))  # ceil; P-1 leaves room for the forced end
        keep = np.arange(0, len(imu_t), k)
        if keep[-1] != len(imu_t) - 1:
            keep = np.append(keep, len(imu_t) - 1)
        warnings.warn(
            f"IMU group of {n} pairs exceeds capacity {P} (sensor "
            f"stall?); merging every {k} intervals to fit. Raise "
            "capacity.max_imu_per_group to integrate at full rate.",
            RuntimeWarning,
        )
        imu_t = imu_t[keep]
        imu_acc = np.asarray(imu_acc)[keep]
        imu_gyr = np.asarray(imu_gyr)[keep]
        n = len(imu_t) - 1
    acc_avg = np.zeros((P, 3), np.float32)
    gyr_avg = np.zeros((P, 3), np.float32)
    dt = np.zeros(P, np.float32)
    offs = np.full(P, BIG_T, np.float32)
    valid = np.zeros(P, bool)
    row0_off = np.float32(last_end_time - beg_time)
    for i in range(n):
        th, tt = imu_t[i], imu_t[i + 1]
        if tt < last_end_time:
            offs[i] = row0_off  # leading skipped pair: aliases pose row 0
            continue
        acc_avg[i] = 0.5 * (imu_acc[i] + imu_acc[i + 1])
        gyr_avg[i] = 0.5 * (imu_gyr[i] + imu_gyr[i + 1])
        dt[i] = (tt - last_end_time) if th < last_end_time else (tt - th)
        offs[i] = tt - beg_time
        valid[i] = True
    imu_end = imu_t[-1] if len(imu_t) else last_end_time
    # signed tail dt (reference :740-747): from the time the propagated
    # state has reached (last usable imu sample, or the segment start if
    # every pair was skipped) to the segment end time
    origin = max(imu_end, last_end_time)
    tail_dt = np.float32(end_time - origin)
    return acc_avg, gyr_avg, dt, offs, valid, tail_dt, row0_off
