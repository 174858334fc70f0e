import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from fastlivo_tpu import imu as imu_mod
from fastlivo_tpu import state as st

rng = np.random.default_rng(7)
G = st.G_M_S2


def _calib(lid_rot=None, lid_off=None):
    return imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0),
        cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.asarray(np.eye(3) if lid_rot is None else lid_rot, jnp.float32),
        lid_off=jnp.asarray(np.zeros(3) if lid_off is None else lid_off, jnp.float32),
    )


def _state():
    return st.identity_state()._replace(grav=jnp.asarray([0.0, 0.0, -G], jnp.float32))


def _run(imu_t, acc, gyr, beg, end, last_end=0.0, state=None, calib=None, P=128):
    state = state or _state()
    calib = calib or _calib()
    acc_avg, gyr_avg, dt, offs, valid, tail_dt, row0_off = imu_mod.prepare_pairs(
        imu_t, acc, gyr, beg, end, last_end, P
    )
    z3 = jnp.zeros(3, jnp.float32)
    return imu_mod.propagate(
        state,
        jnp.asarray(acc_avg),
        jnp.asarray(gyr_avg),
        jnp.asarray(dt),
        jnp.asarray(offs),
        jnp.asarray(valid),
        jnp.asarray(tail_dt),
        z3,
        z3,
        calib,
    )


def test_static_hover():
    """Stationary IMU measuring exactly -gravity: state stays put."""
    t = np.arange(0, 0.105, 0.005)
    acc = np.tile([0, 0, G], (len(t), 1))
    gyr = np.zeros((len(t), 3))
    s2, pose, _, _ = _run(t, acc, gyr, beg=0.0, end=0.1)
    np.testing.assert_allclose(np.asarray(s2.pos), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.vel), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.rot), np.eye(3), atol=1e-6)
    # covariance must grow
    assert float(jnp.trace(s2.cov)) > float(18 * st.INIT_COV)


def test_constant_rotation():
    w = np.array([0.0, 0.0, 1.2])
    t = np.arange(0, 0.205, 0.005)
    R_body = Rotation.from_rotvec(np.outer(t, w)).as_matrix()
    acc = np.einsum("nij->nji", R_body) @ np.array([0, 0, G])  # R^T g
    gyr = np.tile(w, (len(t), 1))
    s2, _, _, _ = _run(t, acc, gyr, beg=0.0, end=0.2)
    R_expect = Rotation.from_rotvec(w * 0.2).as_matrix()
    np.testing.assert_allclose(np.asarray(s2.rot), R_expect, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s2.pos), 0.0, atol=2e-3)


def test_constant_acceleration():
    a = np.array([1.0, -0.5, 0.3])
    t = np.arange(0, 0.505, 0.005)
    acc = np.tile(a + [0, 0, G], (len(t), 1))
    gyr = np.zeros((len(t), 3))
    s2, _, _, _ = _run(t, acc, gyr, beg=0.0, end=0.5)
    np.testing.assert_allclose(np.asarray(s2.vel), a * 0.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2.pos), 0.5 * a * 0.25, atol=1e-3)


def _numpy_reference(s_rot, s_pos, s_vel, bg, ba, grav, cov, acc_avg, gyr_avg, dts,
                     valid, tail_dt, cov_acc, cov_gyr, cov_bg, cov_ba, acc_scale):
    """Independent float64 transcription of the reference recursion
    (IMU_Processing.cpp:663-755) for golden comparison."""

    def expm(v):
        return Rotation.from_rotvec(v).as_matrix()

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    R, p, v, P = s_rot.copy(), s_pos.copy(), s_vel.copy(), cov.copy()
    acc_w = np.zeros(3)
    w_last = np.zeros(3)
    for a_raw, w_raw, dt, ok in zip(acc_avg, gyr_avg, dts, valid):
        if not ok:
            continue
        w = w_raw - bg
        a = a_raw * acc_scale - ba
        F = np.eye(18)
        F[0:3, 0:3] = expm(-w * dt)
        F[0:3, 9:12] = -np.eye(3) * dt
        F[3:6, 6:9] = np.eye(3) * dt
        F[6:9, 0:3] = -R @ skew(a) * dt
        F[6:9, 12:15] = -R * dt
        F[6:9, 15:18] = np.eye(3) * dt
        Q = np.zeros((18, 18))
        Q[0:3, 0:3] = np.diag(cov_gyr) * dt * dt
        Q[6:9, 6:9] = R @ np.diag(cov_acc) @ R.T * dt * dt
        Q[9:12, 9:12] = np.diag(cov_bg) * dt * dt
        Q[12:15, 12:15] = np.diag(cov_ba) * dt * dt
        P = F @ P @ F.T + Q
        R = R @ expm(w * dt)
        acc_w = R @ a + grav
        p = p + v * dt + 0.5 * acc_w * dt * dt
        v = v + acc_w * dt
        w_last = w
    sdt = tail_dt
    R = R @ expm(w_last * sdt)
    p = p + v * sdt + 0.5 * acc_w * sdt * abs(sdt)
    v = v + acc_w * sdt
    return R, p, v, P


def test_matches_independent_reference_model():
    n = 24
    t = np.sort(rng.uniform(0, 0.1, n))
    acc = rng.normal([0, 0, G], 0.5, size=(n, 3))
    gyr = rng.normal(0, 0.4, size=(n, 3))
    s0 = _state()._replace(
        bg=jnp.asarray(rng.normal(0, 0.01, 3), jnp.float32),
        ba=jnp.asarray(rng.normal(0, 0.05, 3), jnp.float32),
        rot=jnp.asarray(Rotation.from_rotvec([0.1, -0.2, 0.3]).as_matrix(), jnp.float32),
        vel=jnp.asarray([0.5, -0.2, 0.1], jnp.float32),
    )
    s2, pose, _, _ = _run(t, acc, gyr, beg=0.0, end=0.12, state=s0)

    acc_avg, gyr_avg, dt, offs, valid, tail_dt, row0_off = imu_mod.prepare_pairs(
        t, acc, gyr, 0.0, 0.12, 0.0, 32
    )
    R, p, v, P = _numpy_reference(
        np.asarray(s0.rot, np.float64), np.asarray(s0.pos, np.float64),
        np.asarray(s0.vel, np.float64), np.asarray(s0.bg, np.float64),
        np.asarray(s0.ba, np.float64), np.asarray(s0.grav, np.float64),
        np.asarray(s0.cov, np.float64), acc_avg, gyr_avg, dt, valid, tail_dt,
        np.full(3, 0.01), np.full(3, 0.001), np.full(3, 1e-5), np.full(3, 1e-5), 1.0,
    )
    np.testing.assert_allclose(np.asarray(s2.rot), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.pos), p, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.vel), v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2.cov), P, atol=1e-5, rtol=1e-3)


def test_undistort_consistency():
    """Points of one world landmark sampled along a moving trajectory all
    undistort to the landmark's position in the scan-end lidar frame."""
    w_vel = np.array([0.1, 0.2, 0.9])
    t = np.arange(0, 0.105, 0.005)
    R_body = Rotation.from_rotvec(np.outer(t, w_vel)).as_matrix()
    acc = np.einsum("nij->nji", R_body) @ np.array([0, 0, G]) + rng.normal(
        0, 0.01, (len(t), 3)
    )
    gyr = np.tile(w_vel, (len(t), 1))
    lid_rot = Rotation.from_rotvec([0.02, -0.01, 0.04]).as_matrix()
    lid_off = np.array([0.04, 0.02, -0.03])
    calib = _calib(lid_rot, lid_off)
    s2, pose, _, _ = _run(t, acc, gyr, beg=0.0, end=0.1, calib=calib)

    # sample the landmark through the *propagated* pose table
    landmark = np.array([3.0, 1.0, 0.5])
    offs = np.asarray(pose.offs)
    rows = [i for i in range(len(offs)) if offs[i] < 1.0]
    pts, times = [], []
    for i in rows:
        R_i = np.asarray(pose.rot[i], np.float64)
        p_i = np.asarray(pose.pos[i], np.float64)
        p_imu = R_i.T @ (landmark - p_i)
        p_lidar = lid_rot.T @ (p_imu - lid_off)
        pts.append(p_lidar)
        times.append(offs[i])
    pts = np.asarray(pts, np.float32)
    times = np.asarray(times, np.float32) + 1e-6  # strictly after each row
    out = imu_mod.undistort(
        s2, pose, jnp.asarray(pts), jnp.asarray(times),
        jnp.ones(len(pts), bool), calib,
    )
    # expected: landmark in scan-end lidar frame
    R_e = np.asarray(s2.rot, np.float64)
    p_e = np.asarray(s2.pos, np.float64)
    expected = lid_rot.T @ (R_e.T @ (landmark - p_e) - lid_off)
    np.testing.assert_allclose(
        np.asarray(out), np.tile(expected, (len(pts), 1)), atol=2e-3
    )


def test_imu_initializer():
    ini = imu_mod.ImuInitializer()
    for _ in range(250):
        ini.push(np.array([0.01, -0.02, -1.0]) + rng.normal(0, 1e-4, 3),
                 np.array([0.001, 0.002, -0.001]) + rng.normal(0, 1e-5, 3))
    assert ini.done
    g = ini.gravity()
    np.testing.assert_allclose(np.linalg.norm(g), G, rtol=1e-6)
    assert g[2] > 0  # accel measured -1g in z -> gravity points +z... no:
    # mean_acc z is -1 -> gravity = -mean/|mean| * G -> +z
    c = ini.calib(100.0, 10000.0, np.eye(3), np.zeros(3))
    assert float(c.acc_scale) > 9.0  # G / ~1.0
    assert np.all(np.asarray(c.cov_acc) > 0)


def test_undistort_point_before_table_start():
    """Points stamped before the first pose row extrapolate backward
    from row 0 (the reference walks IMUpose backward and the earliest
    interval covers everything before it, IMU_Processing.cpp:774-808):
    with constant velocity, a point at t=-dt lands exactly where the
    constant-velocity model puts it."""
    vel = np.array([2.0, 0.0, 0.0], np.float32)
    P = 4
    pose = imu_mod.PoseTable(
        offs=jnp.asarray([0.0, 0.02, 0.04, 0.06], jnp.float32),
        rot=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (P, 1, 1)),
        pos=jnp.asarray(np.outer([0.0, 0.02, 0.04, 0.06], vel), jnp.float32),
        vel=jnp.tile(jnp.asarray(vel), (P, 1)),
        acc=jnp.zeros((P, 3), jnp.float32),
        gyr=jnp.zeros((P, 3), jnp.float32),
    )
    s_end = st.identity_state()._replace(
        pos=jnp.asarray(0.06 * vel, jnp.float64)
    )
    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0),
        cov_acc=jnp.ones(3, jnp.float32), cov_gyr=jnp.ones(3, jnp.float32),
        cov_bias_acc=jnp.ones(3, jnp.float32),
        cov_bias_gyr=jnp.ones(3, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )
    pts = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    # point observed 10 ms BEFORE the segment start
    out = imu_mod.undistort(
        s_end, pose, pts, jnp.asarray([-0.01], jnp.float32),
        jnp.ones(1, bool), calib,
    )
    # world position at t=-0.01 was pos=-0.01*vel; compensated into the
    # scan-end frame the point shifts by (that - end pos)
    want = np.asarray(pts[0]) + (-0.01 - 0.06) * vel
    np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-5)


def test_merge_pose_packs_matches_host_merge():
    """imu.merge_pose_packs (the device-side per-scan table assembly)
    must reproduce the retired host merge exactly: f32 cast, kept rows
    = row0 + valid pairs per segment in order, padding replicates the
    last kept row, padded offs get the BIG_T sentinel."""
    rng = np.random.default_rng(11)
    M_OUT = 64
    segs, packs, keeps = [], [], []
    for B, n_valid in ((9, 5), (9, 9), (9, 0)):
        # a (B+1, 24) pack: B base rows + the state row (dropped here)
        base = rng.normal(size=(B, 24))
        base[:, 0] = np.sort(rng.uniform(0, 0.1, B))  # offs
        pack = np.concatenate([base, rng.normal(size=(1, 24))], axis=0)
        keep = np.zeros(B, bool)
        keep[0] = True  # row0 always kept
        keep[1:1 + n_valid] = True
        packs.append(jnp.asarray(pack))
        keeps.append(np.nonzero(keep)[0].astype(np.int32))
        segs.append((base, keep))

    # device merge via the pipeline's gather plan
    flat, off = [], 0
    for pack, idx in zip(packs, keeps):
        flat.append(idx + off)
        off += pack.shape[0] - 1
    flat = np.concatenate(flat)
    K = len(flat)
    idx_p = np.full(M_OUT, flat[-1], np.int32)
    idx_p[:K] = flat
    valid = np.zeros(M_OUT, bool)
    valid[:K] = True
    got = imu_mod.merge_pose_packs(
        tuple(packs), jnp.asarray(idx_p), jnp.asarray(valid), m_out=M_OUT
    )

    # replica of the retired host merge (pipeline.py pre-2026-08-18)
    rows = np.concatenate([b[k] for b, k in segs]).astype(np.float32)
    offs_p = np.full(M_OUT, imu_mod.BIG_T, np.float32)
    offs_p[:K] = rows[:, 0]

    def pad(a):
        buf = np.zeros((M_OUT,) + a.shape[1:], np.float32)
        buf[:K] = a
        buf[K:] = a[-1]
        return buf

    np.testing.assert_array_equal(np.asarray(got.offs), offs_p)
    np.testing.assert_array_equal(
        np.asarray(got.rot), pad(rows[:, 1:10].reshape(-1, 3, 3)))
    np.testing.assert_array_equal(np.asarray(got.pos), pad(rows[:, 10:13]))
    np.testing.assert_array_equal(np.asarray(got.vel), pad(rows[:, 13:16]))
    np.testing.assert_array_equal(np.asarray(got.acc), pad(rows[:, 16:19]))
    np.testing.assert_array_equal(np.asarray(got.gyr), pad(rows[:, 19:22]))


def test_propagate_wire_matches_unpacked():
    """propagate_wire (one packed upload) == propagate_packed on the
    same prepared pairs, bit for bit."""
    import jax
    from fastlivo_tpu.state import identity_state

    rng = np.random.default_rng(11)
    n = 10
    imu_t = np.sort(rng.uniform(0.0, 0.1, n + 1))
    acc = rng.normal(0, 0.3, (n + 1, 3)) + [0, 0, 9.81]
    gyr = rng.normal(0, 0.1, (n + 1, 3))
    P = 16
    a, g, d, o, v, td, r0 = imu_mod.prepare_pairs(
        imu_t, acc, gyr, beg_time=0.0, end_time=0.105,
        last_end_time=0.005, max_pairs=P,
    )
    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0),
        cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )
    s = identity_state()._replace(grav=jnp.asarray([0.0, 0.0, -9.81]))
    z3 = jnp.zeros(3, jnp.float32)
    ref = imu_mod.propagate_packed(
        s, jnp.asarray(a), jnp.asarray(g), jnp.asarray(d), jnp.asarray(o),
        jnp.asarray(v), jnp.asarray(td), z3, z3, calib,
        row0_off=jnp.asarray(r0),
    )
    wire = imu_mod.pack_pairs_wire(a, g, d, o, v, td, r0)
    got = imu_mod.propagate_wire(s, jnp.asarray(wire), z3, z3, calib)
    for r, w in zip(ref, got):
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(r)[0]),
            np.asarray(jax.tree_util.tree_leaves(w)[0]),
        )
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
