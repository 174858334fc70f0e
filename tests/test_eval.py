"""eval.py: ATE + NEES consistency metrics (beyond-reference tooling)."""
import numpy as np
import pytest

from fastlivo_tpu import eval as ev
from fastlivo_tpu.config import load_config
from fastlivo_tpu.io.synthetic import SyntheticDataset
from fastlivo_tpu.pipeline import Pipeline

AVIA = "/root/reference/config/avia.yaml"


def test_nees_math_on_calibrated_gaussian():
    """Sanity of the NEES estimator itself: errors drawn from N(0, P)
    must average to the dof (3) — the textbook consistency identity."""
    rng = np.random.default_rng(3)
    N = 4000
    A = rng.normal(size=(3, 3))
    Ppos = A @ A.T + np.eye(3) * 0.1
    P = np.zeros((18, 18))
    P[3:6, 3:6] = Ppos
    L = np.linalg.cholesky(Ppos)
    errs = rng.normal(size=(N, 3)) @ L.T
    times = np.arange(N, dtype=float) + 10.0  # past settle
    gt_pos = rng.normal(size=(N, 3))
    est = gt_pos + errs
    lookup = {t: g for t, g in zip(times, gt_pos)}
    vals, mean = ev.nees_position(
        times, est, [P] * N, lambda t: (None, lookup[t]),
        np.zeros(3),
    )
    assert abs(mean - 3.0) < 0.2, mean


@pytest.mark.slow
def test_synthetic_lio_eval_end_to_end():
    """Full-pipeline eval: mm-class ATE and a finite, positive NEES.
    The reference's fixed noise heuristics make no calibration claim,
    so NEES is asserted only to be a sane magnitude (the metric's value
    is OBSERVING the mis-calibration, not gating it)."""
    cfg = load_config(AVIA)
    cfg.img_enable = False
    pipe = Pipeline(cfg)
    pipe.collect_cov = True
    ds = SyntheticDataset(duration=4.0, points_per_scan=2048,
                          lidar_noise=0.004, lid_rot=cfg.extrinsic_R,
                          lid_off=cfg.extrinsic_T)
    for b, p, t in ds.lidar_scans_fast():
        pipe.push_lidar(b, p, t)
    for t, a, g in ds.imu_stream():
        pipe.push_imu(t, a, g)
    pipe.spin()
    m = ev.evaluate_synthetic(pipe.outputs, pipe.covs, ds)
    assert m["frames_evaluated"] >= 5
    assert m["ate_rmse_m"] < 0.01, m
    assert np.isfinite(m["nees_pos_mean"]) and m["nees_pos_mean"] > 0
    assert m["nees_pos_mean"] < 1e4, m  # catastrophic inconsistency only
