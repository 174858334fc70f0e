"""LOAM feature extraction (give_feature) behavioral tests."""
import numpy as np

from fastlivo_tpu import features as ft
from fastlivo_tpu.config import AVIA, OUST64, PreprocessConfig
from fastlivo_tpu import preprocess as pp


def ring_on_wall(n=200, y0=-2.0, y1=2.0, x=5.0):
    """A lidar ring sweeping across a flat wall at x=const.

    Tiny per-point jitter on every axis: the reference's AVIA feature
    gate SKIPS a point when ANY coordinate is within 1e-8 of its
    predecessor (preprocess.cpp:96-98), so mathematically-exact
    constant-x/z synthetic rings would be discarded wholesale (real
    returns always jitter)."""
    y = np.linspace(y0, y1, n)
    r = np.random.default_rng(42 + n)
    jit = r.uniform(1e-6, 1e-5, (n, 3))
    return np.stack([np.full(n, x), y, np.zeros(n)], 1) + jit


def rng_dista(pl, avia=True):
    rng = pl[:, 0] ** 2 + pl[:, 1] ** 2 if avia else np.sqrt(pl[:, 0] ** 2 + pl[:, 1] ** 2)
    d = np.diff(pl, axis=0)
    dista = np.concatenate([np.sum(d * d, 1), [0.0]])
    return rng, dista


def test_flat_wall_is_all_plane():
    pl = ring_on_wall()
    rng, dista = rng_dista(pl)
    curv = np.arange(len(pl), dtype=float)
    surf, corn = ft.give_feature(pl, curv, rng, dista, blind=4.0,
                                 point_filter_num=2, is_avia=True)
    # a flat wall produces plane features throughout and no corners
    assert len(surf) > len(pl) / 4
    assert len(corn) == 0
    # decimation: roughly every 2nd plane point emitted
    assert len(surf) <= len(pl) // 2 + 2


def test_depth_jump_edge_detected():
    """A foreground->background depth discontinuity along the ring must
    produce an Edge_Jump corner feature at the boundary (the reference's
    reliable corner case; smooth same-depth corners often fail the
    planarity test and yield no feature there either)."""
    n1, n2 = 150, 150
    y1 = np.linspace(-1.5, 0.0, n1)
    near = np.stack([np.full(n1, 5.0), y1, np.zeros(n1)], 1)
    y2 = np.linspace(0.02, 1.5, n2)
    far = np.stack([np.full(n2, 9.0), y2, np.zeros(n2)], 1)
    pl = np.concatenate([near, far])
    rng, dista = rng_dista(pl)
    curv = np.zeros(len(pl))
    surf, corn = ft.give_feature(pl, curv, rng, dista, blind=4.0,
                                 point_filter_num=1, is_avia=True)
    assert len(corn) >= 1
    # the edge feature sits at the discontinuity (last near-wall point)
    d = np.linalg.norm(corn[:, :3] - np.array([5.0, 0.0, 0.0]), axis=1)
    assert d.min() < 0.2


def test_blind_points_skipped():
    pl = ring_on_wall(x=0.5)  # squared radius ~0.25-4.2 < blind=4 mostly
    rng, dista = rng_dista(pl)
    surf, corn = ft.give_feature(pl, np.zeros(len(pl)), rng, dista,
                                 blind=40.0, point_filter_num=1, is_avia=True)
    assert len(surf) == 0 and len(corn) == 0


def test_decode_features_avia_end_to_end():
    cfg = PreprocessConfig(lidar_type=AVIA, n_scans=2, blind=4.0,
                           point_filter_num=2, feature_extract_enable=True)
    n = 300
    pl0 = ring_on_wall(n, x=5.0)
    pl1 = ring_on_wall(n, x=6.0)
    xyz = np.concatenate([pl0, pl1])
    fields = {
        "xyz": xyz,
        "reflectivity": np.zeros(2 * n),
        "tag": np.full(2 * n, 0x10, np.uint8),
        "line": np.concatenate([np.zeros(n), np.ones(n)]).astype(np.uint8),
        "offset_time_ns": np.arange(2 * n) * 1e4,
    }
    pts, t_rel = pp.decode(fields, cfg)
    assert len(pts) > 50  # plane features from both rings
    assert np.all(np.diff(t_rel) >= 0)
    # all feature points lie on one of the two walls
    dx = np.minimum(np.abs(pts[:, 0] - 5.0), np.abs(pts[:, 0] - 6.0))
    assert np.percentile(dx, 95) < 0.05


def test_native_give_feature_matches_python():
    """native/ingest.cpp::give_feature_ring must reproduce the Python
    give_feature bit-for-bit on realistic ring geometry."""
    from fastlivo_tpu import native as native_mod
    from fastlivo_tpu.features import give_feature

    if native_mod.load() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng_ = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng_.integers(40, 400))
        ang = np.linspace(-0.6, 0.6, n)
        r = 6.0 + 2.0 * np.sin(3 * ang) + rng_.normal(0, 0.01, n)
        # occasional depth jumps and blind dropouts
        jump = rng_.random(n) < 0.03
        r = np.where(jump, r * rng_.uniform(1.5, 3.0, n), r)
        r[rng_.random(n) < 0.02] = 0.1
        pl = np.stack([r * np.cos(ang), r * np.sin(ang),
                       0.1 * np.sin(7 * ang)], 1)
        curv = np.linspace(0, 100, n)
        is_avia = trial % 2 == 0
        if is_avia:
            rr = pl[:, 0] ** 2 + pl[:, 1] ** 2
            blind = 1.0
        else:
            rr = np.sqrt(pl[:, 0] ** 2 + pl[:, 1] ** 2)
            blind = 1.0
        d = np.diff(pl, axis=0)
        dista = np.concatenate([np.sum(d * d, axis=1), [0.0]])
        sp, cp = give_feature(pl, curv, rr, dista, blind, 3, is_avia)
        sn, cn = native_mod.give_feature_ring_native(
            pl, curv, rr, dista, blind, 3, is_avia
        )
        np.testing.assert_array_equal(sp.shape, sn.shape)
        np.testing.assert_allclose(sp, sn, atol=1e-12)
        np.testing.assert_array_equal(cp.shape, cn.shape)
        np.testing.assert_allclose(cp, cn, atol=1e-12)
