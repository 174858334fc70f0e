"""Product multi-chip path (parallel/product.py + --mesh N): the fused
frame steps SPMD over the 8-virtual-device CPU mesh must reproduce the
single-device pipeline (SURVEY.md §2.3 residual-row data parallelism;
the axis scaled is the reference's OpenMP loop, laserMapping.cpp:1516).

Tiering: the stage-level equality tests are exact (bit-identical by
construction: per-row ops are unchanged, argmin/argmax reductions are
commutative) and fast; the end-to-end trajectory runs are `slow`.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from fastlivo_tpu import vio as vio_mod
from fastlivo_tpu.config import CameraConfig, CapacityConfig, Config
from fastlivo_tpu.io.synthetic import SyntheticDataset
from fastlivo_tpu.ops.voxel_filter import voxel_downsample_device
from fastlivo_tpu.parallel.product import MeshRunner
from fastlivo_tpu.parallel.sharded import make_mesh
from fastlivo_tpu.pipeline import Pipeline
from fastlivo_tpu.run import run_synthetic
from fastlivo_tpu.state import identity_state
from fastlivo_tpu.vio import Vio

W, H, F = 320, 256, 200.0


def make_cfg():
    cfg = Config()
    cfg.camera = CameraConfig(
        width=W, height=H, fx=F, fy=F, cx=(W - 1) / 2.0, cy=(H - 1) / 2.0,
        d=[0.0, 0.0, 0.0, 0.0],
    )
    cfg.grid_size = 32
    cfg.patch_size = 8
    cfg.outlier_threshold = 300.0
    cfg.img_point_cov = 30.0
    cfg.max_iteration = 6
    cfg.capacity = CapacityConfig(
        vmap_points=4096, vmap_table_size=1 << 14, vmap_voxel_cap=8,
        frame_ring=8, max_cands=4096, max_raw_points=8192, max_points=4096,
    )
    return cfg


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(cam_size=(W, H), cam_f=F, cam_hz=10.0)


@pytest.fixture(scope="module")
def tracked_inputs(ds):
    """A bootstrapped visual map + the select_tracked input set for a
    second frame (the same prep vio_frame_step does)."""
    cfg = make_cfg()
    vio = Vio(cfg)
    rng = np.random.default_rng(0)
    cloud = ds.room.sample_surface(6000, rng).astype(np.float32)
    rot, pos = ds.traj.pose(2.0)
    s0 = identity_state()._replace(rot=jnp.asarray(rot), pos=jnp.asarray(pos))
    vio.set_last_cloud(cloud)
    vio.update(s0, s0, ds.render_image(2.0))
    assert int(vio.vmap.n_pts) > 20

    rot1, pos1 = ds.traj.pose(2.1)
    rcw = np.asarray(vio.Rci) @ np.asarray(rot1, np.float32).T
    pcw = -rcw @ np.asarray(pos1, np.float32) + np.asarray(vio.Pci)
    gray = jnp.asarray(vio._to_gray(ds.render_image(2.1)))
    cloud2 = ds.room.sample_surface(6000, np.random.default_rng(1))
    R = cfg.capacity.max_raw_points
    buf = np.zeros((R, 3), np.float32)
    buf[:6000] = cloud2
    cmask = np.zeros(R, bool)
    cmask[:6000] = True
    pg, pg_mask = voxel_downsample_device(
        jnp.asarray(buf), jnp.asarray(cmask), 0.2, cfg.capacity.max_cands
    )
    from fastlivo_tpu import visual_map as vmap_mod
    vox, vox_mask = vmap_mod.voxel_of(pg), pg_mask
    return dict(
        vio=vio, cfg=cfg, rcw=jnp.asarray(rcw), pcw=jnp.asarray(pcw),
        gray=gray, pg=pg, pg_mask=pg_mask, vox=vox, vox_mask=vox_mask,
    )


def test_select_tracked_sharded_bitexact(tracked_inputs):
    """Sharded select_tracked == single-device, bit for bit: phase-2
    argmin/argmax combine over commutative pmin/pmax of unique keys and
    every per-row op is unchanged."""
    t = tracked_inputs
    vio, cfg = t["vio"], t["cfg"]
    statics = dict(
        outlier_threshold=cfg.outlier_threshold, ncc_thre=cfg.ncc_thre,
        grid_size=vio.grid_size, patch_size=vio.patch_size,
        gw=vio.gw, gh=vio.gh, ncc_en=cfg.ncc_en,
    )
    ref = vio_mod.select_tracked(
        vio.vmap, vio.cam, t["rcw"], t["pcw"], t["gray"], t["pg"],
        t["pg_mask"], t["vox"], t["vox_mask"], **statics,
    )
    mesh = make_mesh(8)
    G = vio.gw * vio.gh
    shd = vio_mod.TrackedSet(
        idx=P("dp"), pos=P("dp"), patch=P("dp"), search_level=P("dp"),
        valid=P("dp"), cell_value=P(), errors=P("dp"),
    )
    fn = shard_map(
        functools.partial(vio_mod.select_tracked, axis_name="dp", **statics),
        mesh=mesh, in_specs=(P(),) * 9, out_specs=shd, check_vma=False,
    )
    got = fn(vio.vmap, vio.cam, t["rcw"], t["pcw"], t["gray"], t["pg"],
             t["pg_mask"], t["vox"], t["vox_mask"])
    assert int(jnp.sum(ref.valid)) > 10  # a meaningful tracked set
    for name in ref._fields:
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))[: r.shape[0]]
        np.testing.assert_array_equal(r, g, err_msg=name)


def test_select_tracked_pool_sharded_bitexact(tracked_inputs):
    """`vmap_axis` mode (--sharded-map): vm.imgs AND the obs rings ride
    SHARDED (slot/row slabs; here 1 pool slot and NP/8 obs rows per
    device); warps and obs reads owner-gather + psum. Winners/gates/
    levels stay bit-identical; the patch floats are 1-ULP equal (fma
    contraction of the masked+psum program)."""
    t = tracked_inputs
    vio, cfg = t["vio"], t["cfg"]
    from fastlivo_tpu import visual_map as vmap_mod

    statics = dict(
        outlier_threshold=cfg.outlier_threshold, ncc_thre=cfg.ncc_thre,
        grid_size=vio.grid_size, patch_size=vio.patch_size,
        gw=vio.gw, gh=vio.gh, ncc_en=cfg.ncc_en,
    )
    ref = vio_mod.select_tracked(
        vio.vmap, vio.cam, t["rcw"], t["pcw"], t["gray"], t["pg"],
        t["pg_mask"], t["vox"], t["vox_mask"], **statics,
    )
    assert int(jnp.sum(ref.valid)) > 10
    mesh = make_mesh(8)
    obs = P("dp")
    vm_spec = vmap_mod.VisualMap(
        **{f: P() for f in vmap_mod.VisualMap._fields}
    )._replace(imgs=obs, obs_px=obs, obs_rcw=obs, obs_pcw=obs,
               obs_slot=obs, obs_fid=obs, obs_level=obs)
    shd = vio_mod.TrackedSet(
        idx=P("dp"), pos=P("dp"), patch=P("dp"), search_level=P("dp"),
        valid=P("dp"), cell_value=P(), errors=P("dp"),
    )
    fn = shard_map(
        functools.partial(vio_mod.select_tracked, axis_name="dp",
                          vmap_axis="dp", **statics),
        mesh=mesh, in_specs=(vm_spec,) + (P(),) * 8, out_specs=shd,
        check_vma=False,
    )
    got = fn(vio.vmap, vio.cam, t["rcw"], t["pcw"], t["gray"], t["pg"],
             t["pg_mask"], t["vox"], t["vox_mask"])
    for name in ("idx", "search_level", "valid", "cell_value"):
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))[: r.shape[0]]
        np.testing.assert_array_equal(r, g, err_msg=name)
    for name in ("pos", "patch", "errors"):
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))[: r.shape[0]]
        np.testing.assert_allclose(r, g, rtol=1e-6, atol=1e-4,
                                   err_msg=name)


def test_select_new_points_sharded_bitexact(tracked_inputs):
    t = tracked_inputs
    vio, cfg = t["vio"], t["cfg"]
    cell_value = jnp.zeros(vio.gw * vio.gh, jnp.float32)
    statics = dict(grid_size=vio.grid_size, patch_size=vio.patch_size,
                   gw=vio.gw, gh=vio.gh)
    ref = vio_mod.select_new_points(
        vio.cam, t["rcw"], t["pcw"], t["gray"], t["pg"], t["pg_mask"],
        cell_value, **statics,
    )
    mesh = make_mesh(8)
    fn = shard_map(
        functools.partial(vio_mod.select_new_points, axis_name="dp",
                          **statics),
        mesh=mesh, in_specs=(P(),) * 7, out_specs=(P(),) * 4,
        check_vma=False,
    )
    got = fn(vio.cam, t["rcw"], t["pcw"], t["gray"], t["pg"], t["pg_mask"],
             cell_value)
    assert int(jnp.sum(ref[3])) > 5  # some points actually added
    for r, g, name in zip(ref, got, ("pos", "px", "score", "add")):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=name)


def test_mesh_runner_capacity_check():
    mesh = make_mesh(8)
    runner = MeshRunner(mesh)
    cfg = Config()
    cfg.capacity.max_points = 1001  # not divisible by 8
    with pytest.raises(ValueError, match="not divisible"):
        runner.check_capacity(cfg.capacity)


def _pipeline_cfg(with_cam):
    cfg = Config()
    cfg.img_enable = with_cam
    cfg.dense_map_enable = True
    cfg.capacity.max_raw_points = 8192
    cfg.capacity.max_points = 4096
    # the 0.2 m downsample of the 8192-pt synthetic room yields ~6.5k
    # voxels; an undersized candidate cap keeps a spatially-sorted
    # PREFIX that can miss the camera frustum entirely (VIO inert)
    cfg.capacity.max_cands = 8192
    cfg.capacity.vmap_points = 4096
    cfg.capacity.frame_ring = 16
    if with_cam:
        cfg.camera.width, cfg.camera.height = 320, 256
        cfg.camera.fx = cfg.camera.fy = 200.0
        cfg.camera.cx, cfg.camera.cy = 159.5, 127.5
        # look HORIZONTALLY at the textured walls (the default identity
        # Rcl aims the camera at the untextured ceiling and the VIO
        # never populates — caught in round 5)
        cfg.grid_size = 32
        cfg.outlier_threshold = 300.0
        cfg.img_point_cov = 100.0
        cfg.Rcl = [0.0, -1.0, 0.0, 0.0, 0.0, -1.0, 1.0, 0.0, 0.0]
        cfg.Pcl = [0.0, 0.0, 0.0]
    return cfg


def _run(mesh, with_cam, duration):
    pipe = Pipeline(_pipeline_cfg(with_cam), mesh=mesh)
    run_synthetic(pipe, duration, with_cam)
    return pipe.tum_trajectory()


@pytest.mark.slow
def test_mesh_pipeline_lio_trajectory_matches_single():
    """run.py --synthetic --mesh 8 == single-device to f32-reduction
    epsilon (the ONLY divergence: psum'd HᵀH partials regroup the f32
    row sums)."""
    t1 = _run(None, False, 3.0)
    t8 = _run(make_mesh(8), False, 3.0)
    assert t1.shape == t8.shape and len(t1) >= 10
    np.testing.assert_allclose(t8[:, 1:4], t1[:, 1:4], atol=1e-4)
    np.testing.assert_allclose(t8[:, 4:], t1[:, 4:], atol=1e-5)


@pytest.mark.slow
def test_mesh_pipeline_livo_trajectory_matches_single():
    """Full LIVO (camera frames through the sharded VIO step) under the
    product mesh == single-device, with an ACTIVE visual map."""
    cfgA = _pipeline_cfg(True)
    p1 = Pipeline(cfgA)
    run_synthetic(p1, 4.0, True)
    t1 = p1.tum_trajectory()
    assert int(p1.vio.vmap.n_pts) > 20, "VIO inert — scene regression"
    p8 = Pipeline(_pipeline_cfg(True), mesh=make_mesh(8))
    run_synthetic(p8, 4.0, True)
    t8 = p8.tum_trajectory()
    # counts may differ by a borderline candidate: the psum'd f32
    # HᵀH regrouping shifts the posterior by ~1e-6, which can flip a
    # single add/gate comparison — the contract is trajectory epsilon,
    # not bit-equal bookkeeping vs the SINGLE-device path
    n1, n8 = int(p1.vio.vmap.n_pts), int(p8.vio.vmap.n_pts)
    assert abs(n8 - n1) <= max(3, 0.01 * n1), (n1, n8)
    assert t1.shape == t8.shape and len(t1) >= 10
    # sub-mm tolerance: a single borderline gate flip (see above) adds
    # or drops one visual point, whose photometric rows then perturb
    # every later update — measured <=0.25 mm over this scene. The
    # strict bit-level contract lives in the stage tests and in the
    # sharded-vs-replicated mesh comparison (identical regrouping).
    np.testing.assert_allclose(t8[:, 1:4], t1[:, 1:4], atol=1e-3)
    np.testing.assert_allclose(t8[:, 4:], t1[:, 4:], atol=1e-4)


@pytest.mark.slow
def test_mesh_pipeline_livo_sharded_pool_matches_replicated():
    """`--mesh 8 --sharded-map` full LIVO: the geometric map block-
    shards AND the reference-image pool shards in slot slabs (warps
    owner-gathered + psum'd); trajectories and visual-map population
    must match the replicated mesh path."""
    mesh = make_mesh(8)
    p_rep = Pipeline(_pipeline_cfg(True), mesh=mesh)
    run_synthetic(p_rep, 4.0, True)
    t_rep = p_rep.tum_trajectory()
    assert int(p_rep.vio.vmap.n_pts) > 20, "VIO inert — scene regression"
    p_sh = Pipeline(_pipeline_cfg(True), mesh=mesh, sharded_map=True)
    run_synthetic(p_sh, 4.0, True)
    t_sh = p_sh.tum_trajectory()
    assert int(p_sh.vio.vmap.n_pts) == int(p_rep.vio.vmap.n_pts)
    np.testing.assert_allclose(t_sh[:, 1:4], t_rep[:, 1:4], atol=1e-4)
    np.testing.assert_allclose(t_sh[:, 4:], t_rep[:, 4:], atol=1e-5)
    # the pool is genuinely sharded: one (R/8, H, W) slab per device
    from jax.sharding import NamedSharding
    sh = p_sh.vio.vmap.imgs.sharding
    assert isinstance(sh, NamedSharding) and sh.spec == P("dp")


# ---- block-sharded map product mode (--mesh N --sharded-map) ------------

def test_sharded_backend_ops_match_single_device():
    """ShardedTiledBackend insert/delete_boxes/compact/extract_points
    reproduce the single-device tiled map's CONTENT exactly (ownership
    partitions the tiles; the union must be the replicated map)."""
    from fastlivo_tpu.ops import tiled_map as tm
    from fastlivo_tpu.parallel.sharded_backend import ShardedTiledBackend

    mesh = make_mesh(8)
    be = ShardedTiledBackend(mesh)
    # scene: a 60x60 m ground slab -> ~16x16x1 tiles across 4 ownership
    # slabs; comfortably under BOTH the single pool (2048) and every
    # per-shard pool (2048/8 = 256) so no side drops tiles
    shards = be.empty((16, 16, 8), 2048, 0.5)
    single = tm.empty_tiled_map((16, 16, 8), 2048, 0.5)

    rng = np.random.default_rng(3)
    for it in range(3):
        pts = np.stack([
            rng.uniform(-30, 30, 512),
            rng.uniform(-30, 30, 512),
            rng.uniform(0.0, 2.0, 512),
        ], axis=1).astype(np.float32)
        mask = rng.random(512) < 0.9
        shards = be.insert(shards, jnp.asarray(pts), jnp.asarray(mask))
        single = tm.insert(single, jnp.asarray(pts), jnp.asarray(mask))
    p_sh, n_sh = be.extract_points(shards)
    p_si, n_si = tm.extract_points(single)
    assert n_sh == n_si > 100
    np.testing.assert_array_equal(
        np.sort(p_sh.round(4), axis=0), np.sort(np.asarray(p_si).round(4), axis=0)
    )

    lo = jnp.asarray([[-30.0, -30.0, -30.0]], jnp.float32)
    hi = jnp.asarray([[0.0, 30.0, 30.0]], jnp.float32)
    shards = be.delete_boxes(shards, lo, hi)
    single = tm.delete_boxes(single, lo, hi)
    shards = be.compact(shards)
    single = tm.compact(single)
    p_sh, n_sh = be.extract_points(shards)
    p_si, n_si = tm.extract_points(single)
    assert n_sh == n_si > 0
    np.testing.assert_array_equal(
        np.sort(p_sh.round(4), axis=0), np.sort(np.asarray(p_si).round(4), axis=0)
    )
    # memory axis: per-shard pool is 1/8 of the requested total
    assert be.pool_per_shard(shards) == 256
    assert be.max_occupancy(shards) <= 256


@pytest.mark.slow
def test_mesh_pipeline_sharded_map_trajectory_matches_replicated():
    """`run.py --synthetic --mesh 8 --sharded-map` == the replicated-map
    mesh path: the halo snapshot carries exactly the tiles the EKF's
    kNN can reach, so the per-frame math is identical (measured
    bit-equal on this scene)."""
    cfg_kw = dict(with_cam=False)
    mesh = make_mesh(8)
    p_rep = Pipeline(_pipeline_cfg(False), mesh=mesh)
    run_synthetic(p_rep, 3.0, False)
    t_rep = p_rep.tum_trajectory()
    p_sh = Pipeline(_pipeline_cfg(False), mesh=mesh, sharded_map=True)
    run_synthetic(p_sh, 3.0, False)
    t_sh = p_sh.tum_trajectory()
    assert t_rep.shape == t_sh.shape and len(t_rep) >= 10
    np.testing.assert_allclose(t_sh[:, 1:4], t_rep[:, 1:4], atol=1e-5)
    np.testing.assert_allclose(t_sh[:, 4:], t_rep[:, 4:], atol=1e-6)
    # the memory axis actually scales: every shard pool is 1/8 the total
    assert p_sh.map.slot_key.shape[1] == p_rep.map.slot_key.shape[0] // 8


def test_visual_compact_on_sharded_arrays(tracked_inputs):
    """Pipeline maintenance (`visual_map.compact`) runs OUTSIDE
    shard_map as a plain jit; with the pool/obs leaves device-sharded
    (--sharded-map) XLA auto-SPMD must insert the redistribution and
    produce the same content as the replicated call."""
    from fastlivo_tpu import visual_map as vmap_mod
    from jax.sharding import NamedSharding

    t = tracked_inputs
    vm = t["vio"].vmap
    assert int(vm.n_pts) > 20
    mesh = make_mesh(8)
    shp = NamedSharding(mesh, P("dp"))
    vm_sh = vm._replace(**{
        f: jax.device_put(getattr(vm, f), shp)
        for f in ("imgs", "obs_px", "obs_rcw", "obs_pcw", "obs_slot",
                  "obs_fid", "obs_level")
    })
    center = jnp.asarray(np.zeros(3, np.float32))
    radius = jnp.float32(4.0)
    ref = vmap_mod.compact(vm, center, radius)
    got = vmap_mod.compact(vm_sh, center, radius)
    assert int(ref.n_pts) == int(got.n_pts)
    for f in ("pos", "obs_fid", "obs_slot", "obs_level", "n_obs"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(got, f)), f)


def test_halo_overflow_is_counted():
    """An undersized `halo_tiles` silently losing snapshot tiles was
    invisible (review r5): the psum'd overflow now lands in the shards'
    monotone n_dropped data-loss counter."""
    from fastlivo_tpu.ops import tiled_map as tmod
    from fastlivo_tpu.parallel.sharded_backend import ShardedTiledBackend
    from fastlivo_tpu import imu as imu_mod
    from fastlivo_tpu.state import identity_state

    mesh = make_mesh(8)
    be = ShardedTiledBackend(mesh)
    shards = be.empty((32, 32, 8), 2048, 0.5)
    rng = np.random.default_rng(0)
    world = np.stack([rng.uniform(-30, 30, 8000),
                      rng.uniform(-30, 30, 8000),
                      rng.uniform(0, 2, 8000)], 1).astype(np.float32)
    shards = be.insert(shards, jnp.asarray(world), jnp.ones(8000, bool))
    assert int(np.asarray(shards.n_dropped).sum()) == 0

    runner = MeshRunner(mesh, sharded_map=True, halo_tiles=4,  # starved
                        snap_dims=(32, 32, 8))
    s = identity_state()._replace(pos=jnp.asarray([0.0, 0.0, 1.0]))
    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0), cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )
    Pn = 8
    pose = imu_mod.PoseTable(
        offs=jnp.asarray(np.linspace(0, 0.1, Pn, dtype=np.float32)),
        rot=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (Pn, 1, 1)),
        pos=jnp.zeros((Pn, 3), jnp.float32),
        vel=jnp.zeros((Pn, 3), jnp.float32),
        acc=jnp.zeros((Pn, 3), jnp.float32),
        gyr=jnp.zeros((Pn, 3), jnp.float32),
    )
    scan = (world[rng.choice(8000, 2048, replace=False)]
            - np.array([0.0, 0.0, 1.0])).astype(np.float32)
    out = runner.lidar_frame_step(
        s, shards, pose, calib, jnp.asarray(scan),
        jnp.zeros(2048, jnp.float32), jnp.ones(2048, bool),
        jnp.float32(0.5), laser_point_cov=0.001,
        max_points=2048, max_iter=2, knn_radius=1, max_probe=8,
        dense_out=False)
    shards2 = out[1]
    assert int(np.asarray(shards2.n_dropped).sum()) > 0, (
        "starved halo budget left no trace in n_dropped")


@pytest.mark.slow
def test_shipped_scale_vio_step_on_mesh():
    """One sharded camera-frame step at the SHIPPED capacities (640x512
    image, 65536-point visual map, 20-obs rings, 256-slot u8 pool) on
    the 8-device mesh with the visual map sharded — the camera-side
    half of the shipped-scale viability check (the lidar half runs in
    dryrun_multichip; this one is a slow test to keep the driver's
    dryrun budget small)."""
    cfg = Config()
    cfg.img_enable = True
    cfg.grid_size = 40
    cfg.outlier_threshold = 300.0
    mesh = make_mesh(8)
    from fastlivo_tpu.parallel.product import MeshRunner as MR

    runner = MR(mesh, sharded_map=True,
                halo_tiles=cfg.capacity.halo_tiles,
                snap_dims=cfg.capacity.tiled_dir_dims)
    runner.check_capacity(cfg.capacity)
    vio = Vio(cfg, mesh_runner=runner)
    assert vio.pool_sharded
    rng = np.random.default_rng(0)
    W_, H_ = cfg.camera.width, cfg.camera.height
    assert (W_, H_) == (640, 512)
    img = (120 + 50 * rng.random((H_, W_, 3))).astype(np.uint8)
    cloud = np.stack([
        rng.uniform(-4, 4, 20000), rng.uniform(-3, 3, 20000),
        np.full(20000, 6.0),
    ], axis=1).astype(np.float32)
    vio.set_last_cloud(cloud)
    s0 = identity_state()
    st = vio.update(s0, s0, img)  # full fused step at shipped shapes
    assert np.all(np.isfinite(np.asarray(st.pos)))
    st = vio.update(st, st, img)  # second frame: obs/pool append paths
    assert np.all(np.isfinite(np.asarray(st.pos)))
    assert int(vio.vmap.n_pts) >= 0  # finite, readable
