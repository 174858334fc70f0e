"""Differential tests pinning the EKF update-leg algebra against the
reference's EXACT formulas, transcribed in f64 numpy.

Round-2 verdict item #2: the LIO update (laserMapping.cpp:1506-1732) and
VIO update (lidar_selection.cpp:743-902) had never been compared to
reference-produced numbers — real bags don't exist in this container,
but the *algebra* can be pinned by transcribing the exact formulas:

- `esti_plane` (A·n = -1 least squares, common_lib.h:449-493)
  vs ops/plane.fit_plane_ref
- LIO gain/solution/covariance (laserMapping.cpp:1663-1683, :1712 —
  two explicit 18x18 inversions) vs lio.py's factored
  kalman_gain6 + solution + cov contraction
- VIO gain/solution/covariance (lidar_selection.cpp:871-887, :980)
  vs vio.py's factored form (opposite residual sign)
- the FULL iterated LIO loop (search gates, plane gates, rematch
  protocol, laserMapping.cpp:1506-1732) transcribed in numpy f64 with
  the same kNN oracle vs lio.lio_update(plane_fit="ref")
- end-to-end A/B: plane_fit="tls" (default) vs "ref" on a real-config
  synthetic run — trajectories and match counts must agree
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fastlivo_tpu import lio
from fastlivo_tpu.ops import linalg as linalg_ops
from fastlivo_tpu.ops import plane as plane_ops
from fastlivo_tpu.ops import voxel_map as vm
from fastlivo_tpu.state import NavState

DIM = 18


# --------------------------------------------------------------------
# numpy f64 transcriptions of the reference formulas


def np_exp(w):
    """Rodrigues (so3_math.h:11-30), f64."""
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0.0]])
    if th < 1e-12:
        return np.eye(3) + K
    return (
        np.eye(3)
        + np.sin(th) / th * K
        + (1.0 - np.cos(th)) / (th * th) * (K @ K)
    )


def np_log(R):
    """Matrix log (so3_math.h:75-81), f64."""
    tr = np.trace(R)
    c = (tr - 1.0) / 2.0
    c = min(1.0, max(-1.0, c))
    th = np.arccos(c)
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    if th < 1e-9:
        return 0.5 * v
    return th / (2.0 * np.sin(th)) * v


def ref_esti_plane(pts, threshold):
    """esti_plane transcription (common_lib.h:449-493): least-squares
    A·n = -1 (colPivHouseholderQr == lstsq on a full-rank system), then
    pabcd = [n/|n|, 1/|n|]; valid iff every neighbor within threshold."""
    A = np.asarray(pts, np.float64)
    b = -np.ones(A.shape[0])
    n, *_ = np.linalg.lstsq(A, b, rcond=None)
    nn = np.linalg.norm(n)
    pabcd = np.concatenate([n / nn, [1.0 / nn]])
    ok = bool(np.all(np.abs(A @ pabcd[:3] + pabcd[3]) <= threshold))
    return pabcd, ok


def ref_kalman(cov, HTH6, HTz, vec, meas_cov, z_sign):
    """The reference Kalman step with TWO EXPLICIT 18x18 INVERSIONS:

      K_1 = (HᵀH + (cov/meas_cov)⁻¹)⁻¹          (laserMapping.cpp:1663;
                                                  lidar_selection.cpp:871)
      G   = K_1[:, :6] HᵀH₆                      (:1665 / :876)
      sol = z_sign·K_1[:, :6] Hᵀz + vec − G vec[:6]
            (LIO :1666 with z_sign=+1 because meas_vec = −pd2;
             VIO :877 with z_sign=−1 because z = raw residual)
      cov_post = (I − G) cov                     (:1712 / :980)
    """
    HTH = np.zeros((DIM, DIM))
    HTH[:6, :6] = HTH6
    K1 = np.linalg.inv(HTH + np.linalg.inv(cov / meas_cov))
    G6 = K1[:, :6] @ HTH6  # the nonzero columns of G (18, 6)
    sol = z_sign * (K1[:, :6] @ HTz) + vec - G6 @ vec[:6]
    Gfull = np.zeros((DIM, DIM))
    Gfull[:, :6] = G6
    cov_post = (np.eye(DIM) - Gfull) @ cov
    return K1, sol, cov_post


def random_spd_cov(rng, scale=1e-3):
    """Realistic covariance: block-scaled SPD (rot/pos ~1e-4, tail
    larger), symmetric positive definite."""
    A = rng.normal(size=(DIM, DIM))
    S = A @ A.T / DIM
    d = np.concatenate([
        np.full(3, 1e-4), np.full(3, 1e-4), np.full(3, 1e-3),
        np.full(6, 1e-5), np.full(3, 1e-4),
    ])
    S = np.sqrt(d)[:, None] * S * np.sqrt(d)[None, :] * scale / 1e-3
    return S + np.diag(d) * 0.5


# --------------------------------------------------------------------
# 1. esti_plane backend


def test_fit_plane_ref_matches_esti_plane_transcription():
    rng = np.random.default_rng(0)
    sets = []
    for _ in range(200):
        # near-planar set (the common case): plane at distance 0.5-5 m
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        d = rng.uniform(0.5, 5.0)
        basis = np.linalg.svd(n[None])[2][1:]
        uv = rng.uniform(-0.5, 0.5, size=(5, 2))
        pts = -d * n + uv @ basis + rng.normal(scale=0.01, size=(5, 3))
        sets.append(pts)
    for _ in range(100):
        # general-position set (usually fails the threshold gate)
        sets.append(rng.uniform(-3, 3, size=(5, 3)))
    sets = np.asarray(sets, np.float64)

    pabcd_j, ok_j = plane_ops.fit_plane_ref(jnp.asarray(sets), threshold=0.1)
    pabcd_j = np.asarray(pabcd_j)
    ok_j = np.asarray(ok_j)

    for i, pts in enumerate(sets):
        pabcd_r, ok_r = ref_esti_plane(pts, 0.1)
        # sign of n is deterministic (solution of A n = -1), no flip
        np.testing.assert_allclose(
            pabcd_j[i], pabcd_r, rtol=1e-8, atol=1e-10,
            err_msg=f"set {i}",
        )
        assert bool(ok_j[i]) == ok_r, (i, pabcd_r)
    # sanity: both classes are represented
    assert ok_j[:200].mean() > 0.9
    assert ok_j[200:].mean() < 0.5


def test_fit_plane_ref_rejects_degenerate_sets():
    # collinear points: A·n = -1 is rank-deficient; adjugate solve blows
    # up and the threshold/finite gate must reject
    t = np.linspace(0, 1, 5)
    pts = np.stack([t, 2 * t, 3 * t], axis=1) + 1.0
    _, ok = plane_ops.fit_plane_ref(jnp.asarray(pts[None]), threshold=0.1)
    assert not bool(ok[0])


def test_fit_plane_tls_vs_ref_agree_on_clean_planes():
    """The two backends must agree on well-conditioned planar sets (the
    sets that pass the gates and feed the EKF): same validity, normals
    within 0.2 deg, pd2 within 2 mm."""
    rng = np.random.default_rng(1)
    sets = []
    for _ in range(300):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        d = rng.uniform(0.5, 8.0)
        basis = np.linalg.svd(n[None])[2][1:]
        uv = rng.uniform(-0.4, 0.4, size=(5, 2))
        pts = -d * n + uv @ basis + rng.normal(scale=0.005, size=(5, 3))
        sets.append(pts)
    sets = jnp.asarray(np.asarray(sets, np.float64))
    p_tls, ok_tls = plane_ops.fit_plane(sets, threshold=0.1)
    p_ref, ok_ref = plane_ops.fit_plane_ref(sets, threshold=0.1)
    p_tls, ok_tls = np.asarray(p_tls), np.asarray(ok_tls)
    p_ref, ok_ref = np.asarray(p_ref), np.asarray(ok_ref)
    both = ok_tls & ok_ref
    assert both.mean() > 0.95
    assert (ok_tls == ok_ref).mean() > 0.98
    # normals agree up to sign
    dots = np.abs(np.sum(p_tls[both, :3] * p_ref[both, :3], axis=1))
    assert dots.min() > np.cos(np.deg2rad(0.2)), dots.min()
    # signed distance of a probe point agrees (what the EKF consumes)
    probe = np.asarray(sets)[both].mean(axis=1)
    d_tls = np.sum(p_tls[both, :3] * probe, axis=1) + p_tls[both, 3]
    d_ref = np.sum(p_ref[both, :3] * probe, axis=1) + p_ref[both, 3]
    # fix sign convention per-row before comparing
    sgn = np.sign(np.sum(p_tls[both, :3] * p_ref[both, :3], axis=1))
    np.testing.assert_allclose(d_tls * sgn, d_ref, atol=2e-3)


# --------------------------------------------------------------------
# 2. LIO / VIO Kalman-step formulas


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_lio_kalman_step_transcription(seed):
    """lio.py's factored gain/solution/cov vs the reference's explicit
    two-inversion form (laserMapping.cpp:1663-1683, :1712), f64 exact."""
    rng = np.random.default_rng(seed)
    cov = random_spd_cov(rng)
    m = 200
    H = rng.normal(size=(m, 6))
    z = rng.normal(scale=0.05, size=m)
    HTH6 = H.T @ H
    HTz = H.T @ z
    vec = rng.normal(scale=1e-3, size=DIM)
    R = 0.001

    K1, sol_ref, cov_ref = ref_kalman(cov, HTH6, HTz, vec, R, z_sign=+1)

    # lio.py:218-221 and :260-261 — the factored computation
    P = jnp.asarray(cov / R)
    K16 = np.asarray(linalg_ops.kalman_gain6(P, jnp.asarray(HTH6)))
    np.testing.assert_allclose(K16, K1[:, :6], rtol=1e-9, atol=1e-14)
    sol = vec + K16 @ (HTz - HTH6 @ vec[:6])
    np.testing.assert_allclose(sol, sol_ref, rtol=1e-9, atol=1e-14)
    G6 = K16 @ HTH6
    cov_post = cov - G6 @ cov[:6, :]
    np.testing.assert_allclose(cov_post, cov_ref, rtol=1e-9, atol=1e-16)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_vio_kalman_step_transcription(seed):
    """vio.py's factored solution (photometric_update_levels :525-528)
    and covariance contraction (:697-698) vs lidar_selection.cpp:871-887
    (note the MINUS on K_1·Hᵀz: z is the raw residual) and :980."""
    rng = np.random.default_rng(seed)
    cov = random_spd_cov(rng)
    m = 400
    H = rng.normal(size=(m, 6))
    z = rng.normal(scale=3.0, size=m)  # photometric residuals (intensity)
    HTH6 = H.T @ H
    HTz = H.T @ z
    vec = rng.normal(scale=1e-3, size=DIM)
    R = 10.0  # img_point_cov

    K1, sol_ref, cov_ref = ref_kalman(cov, HTH6, HTz, vec, R, z_sign=-1)

    P = jnp.asarray(cov / R)
    K16 = np.asarray(linalg_ops.kalman_gain6(P, jnp.asarray(HTH6)))
    np.testing.assert_allclose(K16, K1[:, :6], rtol=1e-9, atol=1e-14)
    sol = vec - K16 @ (HTz + HTH6 @ vec[:6])
    np.testing.assert_allclose(sol, sol_ref, rtol=1e-9, atol=1e-14)
    # ComputeJ cov contraction (:980): cov -= G·cov
    G6 = K16 @ HTH6
    cov_post = cov - G6 @ cov[:6, :]
    np.testing.assert_allclose(cov_post, cov_ref, rtol=1e-9, atol=1e-16)


# --------------------------------------------------------------------
# 3. Full iterated-LIO-loop differential


def _make_scene(rng, n_scan=600):
    """Bumpy-surface map + a scan of it from a perturbed prior."""
    # map: grid over a smooth surface, 0.3 m spacing
    gx, gy = np.meshgrid(np.arange(-12, 12, 0.3), np.arange(-12, 12, 0.3))
    gz = 0.4 * np.sin(0.4 * gx) + 0.3 * np.cos(0.5 * gy)
    map_pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1)

    # ground-truth pose of the sensor
    R_gt = np_exp(np.array([0.03, -0.02, 0.1]))
    p_gt = np.array([0.4, -0.3, 1.8])
    # scan points: surface samples seen from the sensor
    sx = rng.uniform(-8, 8, n_scan)
    sy = rng.uniform(-8, 8, n_scan)
    sz = 0.4 * np.sin(0.4 * sx) + 0.3 * np.cos(0.5 * sy)
    world = np.stack([sx, sy, sz], 1)
    lid_rot = np_exp(np.array([0.0, 0.01, -0.005]))
    lid_off = np.array([0.04, 0.02, -0.01])
    # world = R_gt (lid_rot p + lid_off) + p_gt  =>  p in lidar frame
    p_imu = (world - p_gt) @ R_gt
    pts_body = (p_imu - lid_off) @ lid_rot
    return map_pts, pts_body, R_gt, p_gt, lid_rot, lid_off


def _np_lio_loop(state0, cov0, pts_body, pmask, lid_rot, lid_off,
                 knn_oracle, laser_point_cov, max_iter):
    """f64 transcription of the reference iterated loop
    (laserMapping.cpp:1506-1732): search gate, esti_plane + s gate with
    monotone deselection, res<=2 compaction, Kalman step, convergence /
    rematch / stop protocol. `knn_oracle(pw32)` returns (neigh, nd2) as
    the SAME search lio_update performs (the map is the shared oracle;
    the algebra downstream of it is what this test pins)."""
    rot, pos, vel, bg, ba, grav = state0
    prior = tuple(np.copy(x) for x in state0)
    cov = cov0.copy()
    N = len(pts_body)
    p_imu = pts_body @ lid_rot.T + lid_off
    body_nsqrt = np.sqrt(np.sqrt(np.sum(pts_body**2, axis=1)))

    selected = np.zeros(N, bool)
    pabcd = np.zeros((N, 4))
    nearest_search_en = True
    rematch_num = 0
    G6_last = np.zeros((DIM, 6))
    n_active = 0

    it = -1
    while True:
        pw = (p_imu @ rot.T + pos)
        if nearest_search_en:
            neigh, nd2 = knn_oracle(pw.astype(np.float32))
            selected = (nd2[:, -1] <= 5.0) & pmask
            # esti_plane runs on the (frozen) neighbor sets; refits
            # between searches are identical, so fit once per search
            pl_ok = np.zeros(N, bool)
            for i in np.nonzero(selected)[0]:
                pabcd[i], pl_ok[i] = ref_esti_plane(neigh[i], 0.1)
            selected &= pl_ok
        # per-iteration: pd2/s-gate at the CURRENT pose; deselection is
        # monotone until the next search (:1567 continue guard)
        pd2 = np.sum(pabcd[:, :3] * pw, axis=1) + pabcd[:, 3]
        s = 1.0 - 0.9 * np.abs(pd2) / body_nsqrt
        selected &= s > 0.9
        active = selected & (np.abs(pd2) <= 2.0)
        n_active = int(active.sum())

        # H rows (:1611-1629): A = skew(p_imu) Rᵀ n ; z = -pd2
        n_vec = pabcd[:, :3]
        Rt_n = n_vec @ rot
        A = np.cross(p_imu, Rt_n)
        H = np.concatenate([A, n_vec], axis=1)
        w = active.astype(np.float64)
        HTH6 = (H * w[:, None]).T @ H
        HTz = (H * w[:, None]).T @ (-pd2)

        vec = np.concatenate([
            np_log(rot.T @ prior[0]), prior[1] - pos, prior[2] - vel,
            prior[3] - bg, prior[4] - ba, prior[5] - grav,
        ])
        K1, sol, _ = ref_kalman(cov, HTH6, HTz, vec, laser_point_cov, +1)
        G6_last = K1[:, :6] @ HTH6

        rot = rot @ np_exp(sol[0:3])
        pos = pos + sol[3:6]
        vel = vel + sol[6:9]
        bg = bg + sol[9:12]
        ba = ba + sol[12:15]
        grav = grav + sol[15:18]

        conv = (np.linalg.norm(sol[0:3]) * 57.3 < 0.01) and (
            np.linalg.norm(sol[3:6]) * 100.0 < 0.015
        )
        nearest_search_en = False
        if conv or (rematch_num == 0 and it == max_iter - 2):
            nearest_search_en = True
            rematch_num += 1
        if rematch_num >= 2 or it == max_iter - 1:
            break
        it += 1

    Gfull = np.zeros((DIM, DIM))
    Gfull[:, :6] = G6_last
    cov = (np.eye(DIM) - Gfull) @ cov
    return (rot, pos, vel, bg, ba, grav), cov, n_active


def test_lio_update_matches_reference_loop_transcription():
    """lio.lio_update(plane_fit='ref') vs the full numpy-f64 reference
    loop with the same kNN oracle: posterior pose, covariance and match
    count must agree (f32 residual accumulation is the only remaining
    difference)."""
    rng = np.random.default_rng(7)
    map_pts, pts_body, R_gt, p_gt, lid_rot, lid_off = _make_scene(rng)
    # quantize the f32 inputs ONCE so both sides start from identical
    # values (the numpy side then promotes them to f64)
    pts_body = pts_body.astype(np.float32).astype(np.float64)
    lid_rot = lid_rot.astype(np.float32).astype(np.float64)
    lid_off = lid_off.astype(np.float32).astype(np.float64)

    m = vm.empty_map(1 << 16, 0.5)
    m = vm.insert(m, jnp.asarray(map_pts, jnp.float32),
                  jnp.ones(len(map_pts), bool))

    # perturbed prior
    rot0 = R_gt @ np_exp(np.array([0.004, -0.003, 0.002]))
    pos0 = p_gt + np.array([0.03, -0.02, 0.015])
    state0 = (rot0, pos0, np.zeros(3), np.zeros(3), np.zeros(3),
              np.array([0.0, 0.0, -9.81]))
    cov0 = random_spd_cov(np.random.default_rng(3))
    prior = NavState(
        rot=jnp.asarray(rot0), pos=jnp.asarray(pos0), vel=jnp.zeros(3),
        bg=jnp.zeros(3), ba=jnp.zeros(3),
        grav=jnp.asarray(state0[5]), cov=jnp.asarray(cov0),
    )
    pmask = np.ones(len(pts_body), bool)

    def knn_oracle(pw32):
        neigh, nd2, _ = vm.knn(m, jnp.asarray(pw32), k=5, radius=2,
                               max_probe=12)
        return np.asarray(neigh, np.float64), np.asarray(nd2, np.float64)

    max_iter = 4
    res = lio.lio_update(
        prior, m, jnp.asarray(pts_body, jnp.float32),
        jnp.asarray(pmask), jnp.asarray(lid_rot, jnp.float32),
        jnp.asarray(lid_off, jnp.float32),
        laser_point_cov=0.001, max_iter=max_iter, knn_radius=2,
        max_probe=12, plane_fit="ref",
    )

    (rot_r, pos_r, *_rest), cov_r, n_act_r = _np_lio_loop(
        state0, cov0, pts_body, pmask, lid_rot, lid_off, knn_oracle,
        laser_point_cov=0.001, max_iter=max_iter,
    )

    assert int(res.n_active) == n_act_r, (int(res.n_active), n_act_r)
    np.testing.assert_allclose(np.asarray(res.state.pos), pos_r, atol=5e-6)
    np.testing.assert_allclose(np.asarray(res.state.rot), rot_r, atol=5e-7)
    np.testing.assert_allclose(
        np.asarray(res.state.cov), cov_r, rtol=2e-4, atol=1e-12
    )
    # and the update actually moved toward ground truth
    assert np.linalg.norm(pos_r - p_gt) < np.linalg.norm(pos0 - p_gt)


# --------------------------------------------------------------------
# 4. End-to-end A/B: tls (default) vs ref plane fit


@pytest.mark.slow
def test_plane_fit_backends_equivalent_end_to_end():
    """The documented TLS-vs-reference plane-fit deviation, measured
    end-to-end: same synthetic LIO run under both backends. The two fits
    are different algorithms on noisy neighbor sets, so poses drift
    apart at the noise scale (measured ~3 mm over 4 s at 4 mm point
    noise) — the equivalence claim is about ESTIMATION QUALITY: both
    backends' ATE vs ground truth must agree (within 20% / 0.5 mm), the
    inter-backend divergence stays at the per-frame noise scale, and
    per-frame match counts agree within 5%."""
    import dataclasses

    from fastlivo_tpu.io.synthetic import SyntheticDataset
    from fastlivo_tpu.pipeline import Pipeline
    from fastlivo_tpu.config import load_config

    def run(plane_fit):
        cfg = load_config("/root/reference/config/avia.yaml")
        cfg.img_enable = False
        cfg.capacity = dataclasses.replace(
            cfg.capacity, plane_fit=plane_fit,
            max_points=4096, max_raw_points=8192,
        )
        ds = SyntheticDataset(duration=4.0, points_per_scan=4096,
                              lidar_noise=0.004, seed=11)
        pipe = Pipeline(cfg)
        for beg, pts, t_rel in ds.lidar_scans_fast():
            pipe.push_lidar(beg, pts, t_rel)
        for t, acc, gyr in ds.imu_stream():
            pipe.push_imu(t, acc, gyr)
        outs = pipe.spin()
        return outs, ds

    def ate(outs, ds):
        errs = []
        for o in outs:
            if o.t < ds.traj.t_static + 0.5:
                continue
            _, pos_gt = ds.traj.pose(o.t)
            errs.append(np.linalg.norm(o.pos - (pos_gt - ds.traj.base_pos)))
        return float(np.sqrt(np.mean(np.square(errs))))

    outs_tls, ds = run("tls")
    outs_ref, _ = run("ref")
    assert len(outs_tls) == len(outs_ref) and len(outs_tls) > 10

    ate_tls, ate_ref = ate(outs_tls, ds), ate(outs_ref, ds)
    assert abs(ate_tls - ate_ref) < max(5e-4, 0.2 * ate_tls), (
        ate_tls, ate_ref)

    p_tls = np.stack([o.pos for o in outs_tls])
    p_ref = np.stack([o.pos for o in outs_ref])
    div = np.linalg.norm(p_tls - p_ref, axis=1)
    assert div.max() < 0.01, div.max()  # stays at the noise scale

    n_tls = np.array([o.n_active for o in outs_tls], float)
    n_ref = np.array([o.n_active for o in outs_ref], float)
    live = n_tls > 0
    assert live.sum() > 5
    rel = np.abs(n_tls[live] - n_ref[live]) / n_tls[live]
    assert rel.max() < 0.05, rel.max()
