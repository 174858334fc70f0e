"""Batched offline replay (K frames per dispatch) vs the per-frame
pipeline: same trajectory, same trace surface."""
import numpy as np
import pytest

from fastlivo_tpu.io.synthetic import SyntheticDataset
from fastlivo_tpu.pipeline import Pipeline
from fastlivo_tpu.replay import BlockReplayer

from test_pipeline_lio import small_config


def _feed(pipe, ds):
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)


@pytest.fixture(scope="module")
def both_runs():
    ds = SyntheticDataset(duration=6.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=3)
    ref = Pipeline(small_config())
    _feed(ref, ds)
    outs_ref = ref.spin()

    blk = Pipeline(small_config())
    _feed(blk, ds)
    outs_blk = BlockReplayer(blk, block=8).run()
    return ds, outs_ref, outs_blk


def test_block_replay_matches_per_frame(both_runs):
    ds, outs_ref, outs_blk = both_runs
    assert len(outs_blk) == len(outs_ref)
    # trajectories agree to the block-deferred map-slide tolerance
    pr = np.stack([o.pos for o in outs_ref])
    pb = np.stack([o.pos for o in outs_blk])
    # the block path defers the sliding-map deletion to block boundaries
    # (documented deviation), which perturbs the map contents slightly;
    # measured divergence stays at a few mm over this 6 s run
    err = np.linalg.norm(pr - pb, axis=1)
    assert err.max() < 5e-3, err.max()
    for a, b in zip(outs_ref, outs_blk):
        assert a.t == b.t
        assert abs(a.n_active - b.n_active) <= 0.05 * max(a.n_active, 1) + 10
    # the online health signal rides both paths: same magnitude on the
    # steady frames (bootstrap frames report 0 in both paths)
    ra = np.asarray([o.res_rms for o in outs_ref])
    rb = np.asarray([o.res_rms for o in outs_blk])
    steady = (ra > 0) & (rb > 0)
    assert steady.sum() >= len(ra) // 2, (ra, rb)
    np.testing.assert_allclose(rb[steady], ra[steady], rtol=0.5)


def test_block_replay_tracks_ground_truth(both_runs):
    ds, outs_ref, outs_blk = both_runs
    base = ds.traj.base_pos
    errs = []
    for o in outs_blk:
        if o.t < ds.traj.t_static + 0.5:
            continue
        _, pos_gt = ds.traj.pose(o.t)
        errs.append(np.linalg.norm(o.pos - (pos_gt - base)))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.02, ate


@pytest.mark.slow
def test_block_replay_partial_blocks():
    """A stream whose steady-state frame count is not a multiple of K
    still processes every frame (tail flush)."""
    ds = SyntheticDataset(duration=4.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=5)
    ref = Pipeline(small_config())
    _feed(ref, ds)
    n_ref = len(ref.spin())
    blk = Pipeline(small_config())
    _feed(blk, ds)
    n_blk = len(BlockReplayer(blk, block=7).run())
    assert n_blk == n_ref


def test_pipeline_rebuild_trigger_fires():
    """With a deliberately tiny tiled pool, a moving trajectory must
    cross the load-factor threshold and compact in-pipeline (the
    Criterion_Check role, ikd_Tree.cpp:1018-1035)."""
    import dataclasses

    import fastlivo_tpu.pipeline as pl

    cfg = small_config()
    cfg.capacity = dataclasses.replace(
        cfg.capacity, map_backend="tiled",
        tiled_dir_dims=(32, 32, 16), tiled_pool=48,
    )
    ds = SyntheticDataset(duration=6.0, points_per_scan=4096,
                          lidar_noise=0.004, seed=3)
    pipe = Pipeline(cfg)
    # force frequent load-factor checks for the test
    old = pl.REBUILD_CHECK_EVERY
    pl.REBUILD_CHECK_EVERY = 2
    try:
        _feed(pipe, ds)
        outs = pipe.spin()
    finally:
        pl.REBUILD_CHECK_EVERY = old
    assert len(outs) > 20
    # pool stayed within capacity (compaction kept it alive) and the
    # pipeline kept tracking
    assert int(pipe.map.n_alloc) <= 48


def test_livo_block_replayer_modes_and_restoration():
    """The LIVO block replayer (a) uses block-packed readback
    (BlockReadCollector on both the lidar and camera read paths) when no
    per-frame consumer is configured, (b) falls back to chained
    dispatches with E-deep deferred readback when one is, and (c)
    restores the caller's settings afterwards — a library consumer's
    interactive pipeline must not come back from a block replay with
    silently altered readback behavior."""
    from fastlivo_tpu.replay import BlockReadCollector, LivoBlockReplayer

    class FakeVio:
        async_read = False
        async_depth = 1
        read_collector = None

        def resolve_pending(self):
            pass

    class FakeSync:
        reset_flagged = False

        def drain(self):
            return []

    class FakePipe:
        class cfg:
            img_enable = True
            pcd_save_en = False
            debug = False

        logger = None
        on_frame = None
        materialize_dense = False
        collect_cov = False
        sync = FakeSync()
        vio = FakeVio()
        async_read = False
        async_depth = 1
        read_collector = None
        outputs = ["sentinel"]
        seen = None

        def spin(self):
            FakePipe.seen = ("deferred", self.async_read, self.async_depth,
                             self.vio.async_depth)
            return []

        def finish(self):
            if FakePipe.seen is None:
                FakePipe.seen = ("collector",
                                 type(self.read_collector).__name__,
                                 type(self.vio.read_collector).__name__)
            return []

    # (a) no per-frame consumers -> block-packed collector on both paths
    pipe = FakePipe()
    outs = LivoBlockReplayer(pipe, block=8).run()
    assert outs == ["sentinel"]
    assert FakePipe.seen == ("collector", BlockReadCollector.__name__,
                             BlockReadCollector.__name__)
    assert pipe.read_collector is None          # restored
    assert pipe.vio.read_collector is None

    # (b) a per-frame consumer (logger) -> E-deep deferred readback
    FakePipe.seen = None
    pipe2 = FakePipe()
    pipe2.logger = object()
    LivoBlockReplayer(pipe2, block=8).run()
    assert FakePipe.seen == ("deferred", True, 8, 8)
    assert pipe2.async_read is False            # restored
    assert pipe2.async_depth == 1
    assert pipe2.vio.async_depth == 1


@pytest.mark.slow
def test_livo_block_replay_matches_per_frame():
    """Full-LIVO event blocks (lidar + camera interleaved) vs the
    per-frame pipeline: same frame count, trajectories within the
    block-deferred-map-slide tolerance."""
    from fastlivo_tpu.replay import LivoBlockReplayer
    from test_pipeline_livo import RCL, W, H, F, livo_config

    def make():
        ds = SyntheticDataset(
            duration=5.0, points_per_scan=4096, lidar_noise=0.004, seed=5,
            cam_hz=10.0, cam_size=(W, H), cam_f=F, Rcl=RCL,
        )
        pipe = Pipeline(livo_config())
        for beg, pts, t_rel in ds.lidar_scans_fast():
            pipe.push_lidar(beg, pts, t_rel)
        for t, acc, gyr in ds.imu_stream():
            pipe.push_imu(t, acc, gyr)
        for t, img in ds.images():
            pipe.push_img(t, img)
        return ds, pipe

    ds, ref = make()
    outs_ref = ref.spin()
    _, blk = make()
    outs_blk = LivoBlockReplayer(blk, block=8).run()

    assert len(outs_blk) == len(outs_ref)
    pr = np.stack([o.pos for o in outs_ref])
    pb = np.stack([o.pos for o in outs_blk])
    err = np.linalg.norm(pr - pb, axis=1)
    assert err.max() < 1e-2, err.max()
    # visual map grew comparably
    nf, ns = int(blk.vio.vmap.n_pts), int(ref.vio.vmap.n_pts)
    assert abs(nf - ns) <= max(10, 0.1 * ns), (nf, ns)
    # ATE vs ground truth stays LIVO-grade
    base = ds.traj.base_pos
    errs = []
    for o in outs_blk:
        if o.t < ds.traj.t_static + 0.5:
            continue
        _, pos_gt = ds.traj.pose(o.t)
        errs.append(np.linalg.norm(o.pos - (pos_gt - base)))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.06, ate


def test_watchdog_fires_under_block_replay():
    """The divergence watchdog composes with block replay: outputs
    (and thus the res_rms stream) resolve at block boundaries, the
    restart replaces pipe.map between blocks, and the replayer's next
    block picks up the fresh map (replay.py reads p.map per block)."""
    import warnings
    from fastlivo_tpu.replay import LivoBlockReplayer

    ds = SyntheticDataset(duration=4.0, points_per_scan=2048,
                          lidar_noise=0.004, seed=3)
    cfg = small_config()
    cfg.capacity.auto_reset_rms = 0.001  # every frame counts as "high"
    cfg.capacity.auto_reset_frames = 5
    pipe = Pipeline(cfg)
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        outs = LivoBlockReplayer(pipe, 4).run()
    assert pipe.auto_resets >= 1
    assert any("divergence watchdog" in str(x.message) for x in w)
    assert len(outs) >= 20
    assert pipe.map_built  # post-restart blocks rebuilt the map
    pos = np.asarray([o.pos for o in outs])
    assert np.all(np.isfinite(pos)) and np.all(np.abs(pos) < 50.0)


def test_block_replay_decimates_oversized_scans_like_per_frame():
    """Scans above capacity.max_raw_points: the per-frame path
    stride-decimates (keeping angular coverage); the block path used to
    TRUNCATE the tail instead — a directional coverage bias. Both paths
    must now consume the identical decimated subset, so trajectories
    agree to block-replay tolerance."""
    import dataclasses

    def build(block):
        ds = SyntheticDataset(duration=4.0, points_per_scan=6000,
                              lidar_noise=0.004, seed=17)
        cfg = small_config()
        cfg.capacity = dataclasses.replace(
            cfg.capacity, max_raw_points=4096)  # scans overflow by 1.5x
        pipe = Pipeline(cfg)
        for beg, pts, t_rel in ds.lidar_scans_fast():
            assert len(pts) > cfg.capacity.max_raw_points
            pipe.push_lidar(beg, pts, t_rel)
        for t, acc, gyr in ds.imu_stream():
            pipe.push_imu(t, acc, gyr)
        if block:
            outs = BlockReplayer(pipe, 4).run()
        else:
            outs = pipe.spin() + pipe.finish()
        return np.asarray([[o.t, *o.pos] for o in outs])

    a = build(False)
    b = build(True)
    n = min(len(a), len(b))
    assert n >= 25
    np.testing.assert_allclose(a[:n, 0], b[:n, 0])  # same frame times
    # same decimated subset -> same trajectory up to the documented
    # block-mode slider-lag deviation (decimetre-scale margin effects
    # do not apply on this 4 s run; tolerance covers f32 regrouping)
    np.testing.assert_allclose(a[:n, 1:], b[:n, 1:], atol=2e-3)
