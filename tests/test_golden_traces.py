"""Golden-trace validation against the reference's own logged filter states.

The reference snapshot ships real C++ filter logs in /root/reference/Log
(2,369 frames of pre/post-update 18-dim states plus 24,007 logged IMU
propagation pairs — laserMapping.cpp:1449-1453/1810-1815,
IMU_Processing.cpp:681). These tests validate `imu.propagate` — the F_x
transition blocks, the pairwise integration order, the straddle-pair dt
rule, and the signed tail extrapolation — directly against that C++
output: seed the propagation from mat_out[k-1], integrate the imu.txt
pairs belonging to frame k, and require mat_pre[k].

Two properties of the traces, established empirically (see the analysis
values asserted below):

1. The generator SKIPS the end-time extrapolation on image-end frames
   (it integrates whole IMU pairs only, leaving the state at the last
   sample time instead of the image timestamp). That matches the older
   `Process`/`Forward` image branch lineage, not the snapshot's active
   `Process2 -> UndistortPcl` (IMU_Processing.cpp:740-757) which always
   extrapolates. The harness reproduces the generator (tail_dt = 0 on
   image frames) because that is what the golden numbers contain; the
   pipeline itself follows the snapshot semantics.
2. The traces print 6 significant digits, so timestamps carry ~1e-4 s
   quantization by t~100 s; residuals grow proportionally (corr ~0.45
   with the time resolution). Early frames (t < 10 s, resolution
   <= 1e-5 s) therefore get printing-precision tolerances and the whole
   run gets quantization-scaled ones.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastlivo_tpu import imu as imu_mod
from fastlivo_tpu.io import golden
from fastlivo_tpu.state import DIM_STATE, NavState

pytestmark = pytest.mark.skipif(
    not golden.available(), reason="reference Log traces not present"
)

MAXP = 32  # max observed pairs per frame is 24


@pytest.fixture(scope="module")
def traces():
    return golden.load()


def test_trace_alignment(traces):
    """Bias and gravity are untouched by propagation, so pre[k] must carry
    out[k-1]'s bias/gravity columns verbatim. This pins the frame
    alignment (and the column parsing) exactly."""
    np.testing.assert_array_equal(
        traces.pre_state[1:, 6:15], traces.out_state[:-1, 6:15]
    )


def test_euler_roundtrip(traces):
    """euler_to_rot must invert the reference's RotMtoEuler*57.3 exactly."""
    e = traces.pre_rot  # built via euler_to_rot
    back = golden.rot_to_euler(e) * golden.EULER_SCALE
    raw = np.loadtxt(golden.REFERENCE_LOG_DIR / "mat_pre.txt")[:, 1:4]
    np.testing.assert_allclose(back, raw, atol=1e-9)


def test_acc_scale_estimate(traces):
    """The rig's accelerometer reports in g units: |mean_acc| ~ 1."""
    s = golden.estimate_acc_scale(traces)
    assert 9.0 < s < 10.7


def _build_batch(tr):
    """Pack every frame k>=1 into fixed-shape arrays for a vmapped
    propagate call, reproducing the generator's dt rules:
      - straddle pair (head < t_prev): dt = tail - t_prev
        (IMU_Processing.cpp:690-694 via last_lidar_end_time_);
      - interior pair: dt = tail - head;
      - lidar-end frame: signed tail extrapolation to t_k (:740-757);
      - image-end frame: NO tail extrapolation (see module docstring).
    """
    K = len(tr.pre_t)
    F = K - 1
    seed = NavState(
        rot=jnp.asarray(tr.out_rot[:-1]),
        pos=jnp.asarray(tr.out_state[:-1, 0:3]),
        vel=jnp.asarray(tr.out_state[:-1, 3:6]),
        bg=jnp.asarray(tr.out_state[:-1, 6:9]),
        ba=jnp.asarray(tr.out_state[:-1, 9:12]),
        grav=jnp.asarray(tr.out_state[:-1, 12:15]),
        cov=jnp.broadcast_to(
            jnp.eye(DIM_STATE, dtype=jnp.float64) * 1e-3, (F, DIM_STATE, DIM_STATE)
        ),
    )
    acc = np.zeros((F, MAXP, 3))
    gyr = np.zeros((F, MAXP, 3))
    dt = np.zeros((F, MAXP))
    offs = np.full((F, MAXP), imu_mod.BIG_T)
    valid = np.zeros((F, MAXP), bool)
    tail_dt = np.zeros(F)
    is_img = tr.out_npts == 0
    for k in range(1, K):
        t_prev, t_k = tr.out_t[k - 1], tr.pre_t[k]
        heads, tails, g, a = golden.frame_pairs(tr, k)
        n = len(heads)
        assert n <= MAXP
        for i in range(n):
            acc[k - 1, i] = a[i]
            gyr[k - 1, i] = g[i]
            dt[k - 1, i] = (tails[i] - t_prev) if heads[i] < t_prev else (tails[i] - heads[i])
            offs[k - 1, i] = tails[i] - t_prev
            valid[k - 1, i] = True
        if not is_img[k]:
            imu_end = tails[-1] if n else t_prev
            tail_dt[k - 1] = t_k - max(imu_end, t_prev)
    return seed, acc, gyr, dt, offs, valid, tail_dt


def test_propagation_matches_reference_traces(traces):
    tr = traces
    seed, acc, gyr, dt, offs, valid, tail_dt = _build_batch(tr)
    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float64(golden.estimate_acc_scale(tr)),
        cov_acc=jnp.full(3, 0.1, jnp.float64),
        cov_gyr=jnp.full(3, 0.1, jnp.float64),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float64),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float64),
        lid_rot=jnp.eye(3, dtype=jnp.float64),
        lid_off=jnp.zeros(3, jnp.float64),
    )
    zero3 = jnp.zeros(3, jnp.float64)
    out, _, _, _ = jax.vmap(
        imu_mod.propagate,
        in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None, None),
    )(
        seed,
        jnp.asarray(acc),
        jnp.asarray(gyr),
        jnp.asarray(dt),
        jnp.asarray(offs),
        jnp.asarray(valid),
        jnp.asarray(tail_dt),
        zero3,
        zero3,
        calib,
        0.0,
    )
    # residuals vs mat_pre[k]
    dR = np.einsum("kij,klj->kil", np.asarray(out.rot), tr.pre_rot[1:])
    rot_err = np.linalg.norm(golden.rot_to_euler(dR), axis=1)
    pos_err = np.linalg.norm(np.asarray(out.pos) - tr.pre_state[1:, 0:3], axis=1)
    vel_err = np.linalg.norm(np.asarray(out.vel) - tr.pre_state[1:, 3:6], axis=1)

    t = tr.pre_t[1:]
    early = t < 10.0  # trace time resolution <= 1e-5 s here
    assert early.sum() > 100
    # printing-precision agreement on the well-resolved prefix
    # (measured: rot max 6.1e-6, pos max 8.7e-6, vel max 3.7e-5)
    assert rot_err[early].max() < 2e-5
    assert pos_err[early].max() < 5e-5
    assert vel_err[early].max() < 1e-4
    # whole-run agreement, bounded by the 6-sig-digit time quantization
    # (measured: medians 5.5e-8 / 1.1e-6 / 1.6e-5; maxima 7.8e-4 /
    # 8.5e-4 / 2.3e-3, dominated by ~1e-4 s timestamp rounding x rates)
    assert np.median(rot_err) < 1e-6
    assert np.median(pos_err) < 1e-5
    assert np.median(vel_err) < 1e-4
    assert rot_err.max() < 2e-3
    assert pos_err.max() < 2e-3
    assert vel_err.max() < 5e-3


def test_image_frames_without_imu_pairs_are_fixed_points(traces):
    """The generator leaves the state untouched on image frames that
    contain no new IMU sample (it neither integrates nor extrapolates):
    mat_pre[k] must equal mat_out[k-1] at printing precision."""
    tr = traces
    is_img = tr.out_npts == 0
    hit = 0
    for k in range(1, len(tr.pre_t)):
        if not is_img[k]:
            continue
        heads, _, _, _ = golden.frame_pairs(tr, k)
        if len(heads):
            continue
        hit += 1
        assert np.allclose(tr.pre_state[k], tr.out_state[k - 1], atol=2e-5), k
    assert hit > 500


def test_own_traces_roundtrip_through_golden_parser(tmp_path):
    """TraceLogger's mat_pre/mat_out/imu.txt must parse with the same
    golden reader used for the C++ logs, with the euler encoding
    inverting back to the logged rotation — i.e. our Log/ files are
    format-compatible with the reference's plot.py/evaluation stack."""
    import jax.numpy as jnp

    from fastlivo_tpu.logging_util import TraceLogger
    from fastlivo_tpu.ops import so3
    from fastlivo_tpu.state import identity_state

    rng = np.random.default_rng(0)
    lg = TraceLogger(tmp_path)
    states = []
    for k in range(5):
        s = identity_state()._replace(
            rot=so3.exp(jnp.asarray(rng.normal(size=3) * 0.3)),
            pos=jnp.asarray(rng.normal(size=3)),
            vel=jnp.asarray(rng.normal(size=3) * 0.1),
            bg=jnp.asarray(rng.normal(size=3) * 1e-3),
            ba=jnp.asarray(rng.normal(size=3) * 1e-2),
            grav=jnp.asarray([0.1, -0.2, -9.8]),
        )
        states.append(s)
        lg.log_pre(0.1 * (k + 1), s)
        lg.log_post(0.1 * (k + 1), s)
        lg.log_imu(0.1 * k + 0.05, rng.normal(size=3), rng.normal(size=3))
    lg.close()
    # the logger now writes the reference's trailing feats count
    # itself (laserMapping.cpp:1810-1815) — no padding needed
    tr = golden.load(tmp_path)
    assert len(tr.pre_t) == 5
    for k, s in enumerate(states):
        np.testing.assert_allclose(
            tr.pre_rot[k], np.asarray(s.rot), atol=2e-7
        )
        np.testing.assert_allclose(
            tr.pre_state[k, 0:3], np.asarray(s.pos), atol=1e-8
        )
