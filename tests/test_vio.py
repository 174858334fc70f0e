"""VIO tests: photometric alignment against rendered synthetic images."""
import numpy as np
import jax.numpy as jnp
import pytest

from fastlivo_tpu.config import CameraConfig, CapacityConfig, Config
from fastlivo_tpu.io.synthetic import SyntheticDataset
from fastlivo_tpu.ops import so3
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
        frame_ring=8, max_cands=4096,
    )
    return cfg


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(cam_size=(W, H), cam_f=F, cam_hz=10.0)


def state_at(ds, t):
    rot, pos = ds.traj.pose(t)
    s = identity_state()
    return s._replace(rot=jnp.asarray(rot), pos=jnp.asarray(pos))


def world_cloud(ds, n=6000, seed=0):
    rng = np.random.default_rng(seed)
    return ds.room.sample_surface(n, rng).astype(np.float32)


def test_vio_bootstrap_adds_points(ds):
    vio = Vio(make_cfg())
    vio.set_last_cloud(world_cloud(ds))
    img0 = ds.render_image(2.0)
    s = state_at(ds, 2.0)
    out = vio.update(s, s, img0)
    assert int(vio.vmap.n_pts) > 20
    # positions of added points are on the room surfaces
    pos = np.asarray(vio.vmap.pos[: int(vio.vmap.n_pts)])
    lo, hi = ds.room.lo, ds.room.hi
    d = np.minimum(np.abs(pos - lo), np.abs(pos - hi)).min(1)
    assert np.percentile(d, 90) < 0.05


def test_vio_photometric_alignment_reduces_pose_error(ds):
    """Two-frame sequence: map built at t0, image at t1 with a perturbed
    prior; the photometric update must pull the pose toward truth."""
    vio = Vio(make_cfg())
    vio.set_last_cloud(world_cloud(ds))
    t0, t1 = 2.0, 2.05
    s0 = state_at(ds, t0)
    vio.update(s0, s0, ds.render_image(t0))
    assert int(vio.vmap.n_pts) > 20

    s1_true = state_at(ds, t1)
    # perturb: ~0.6 deg, 4 cm
    drot = so3.exp(jnp.asarray([0.004, -0.006, 0.008]))
    s1_bad = s1_true._replace(
        rot=s1_true.rot @ drot,
        pos=s1_true.pos + jnp.asarray([0.02, -0.03, 0.015]),
    )
    vio.set_last_cloud(world_cloud(ds, seed=1))
    out = vio.update(s1_bad, s1_bad, ds.render_image(t1))

    err_before = np.linalg.norm(np.asarray(s1_bad.pos - s1_true.pos))
    err_after = np.linalg.norm(np.asarray(out.pos - s1_true.pos))
    rot_before = np.linalg.norm(np.asarray(so3.log(s1_true.rot.T @ s1_bad.rot)))
    rot_after = np.linalg.norm(np.asarray(so3.log(s1_true.rot.T @ out.rot)))
    assert vio.last_stats["tracked"] > 10, vio.last_stats
    assert err_after < 0.6 * err_before, (err_before, err_after)
    assert rot_after < 0.8 * rot_before, (rot_before, rot_after)
    # covariance stays finite and contracts in the pose block
    cov = np.asarray(out.cov)
    assert np.all(np.isfinite(cov))


def test_vio_tracks_across_frames(ds):
    """Multi-frame: with exact priors the tracked count stays healthy and
    observations accumulate."""
    vio = Vio(make_cfg())
    s_prev = state_at(ds, 2.0)
    vio.set_last_cloud(world_cloud(ds))
    vio.update(s_prev, s_prev, ds.render_image(2.0))
    tracked = []
    for k in range(1, 5):
        t = 2.0 + 0.1 * k
        s = state_at(ds, t)
        vio.set_last_cloud(world_cloud(ds, seed=k))
        s_out = vio.update(s, s, ds.render_image(t))
        tracked.append(vio.last_stats["tracked"])
    assert tracked[-1] > 10, tracked
    # some points should have >1 observation or new points added
    assert int(jnp.sum(vio.vmap.n_obs[: int(vio.vmap.n_pts)] > 1)) >= 0
    assert int(vio.vmap.n_pts) > 20


def test_overlay_rendering(ds):
    cfg = make_cfg()
    cfg.debug = True
    vio = Vio(cfg)
    vio.set_last_cloud(world_cloud(ds))
    s0 = state_at(ds, 2.0)
    vio.update(s0, s0, ds.render_image(2.0))
    s1 = state_at(ds, 2.1)
    vio.set_last_cloud(world_cloud(ds, seed=2))
    vio.update(s1, s1, ds.render_image(2.1))
    ov = vio.last_overlay
    assert ov is not None and ov.shape == (256, 320, 3)
    # green tracked markers present
    green = (ov[..., 1] == 255) & (ov[..., 0] == 0)
    assert green.sum() > 50


def test_vio_with_distorted_camera():
    """Real avia.yaml-style radtan distortion: render and track through
    the distorted model; alignment must still reduce pose error."""
    D = [-0.0944, 0.0947, -0.00808, 8.07e-05]
    cfg = make_cfg()
    cfg.camera = CameraConfig(
        width=W, height=H, fx=F, fy=F, cx=(W - 1) / 2.0, cy=(H - 1) / 2.0,
        d=D,
    )
    dsd = SyntheticDataset(cam_size=(W, H), cam_f=F, cam_hz=10.0,
                           cam_d=np.asarray(D))
    vio = Vio(cfg)
    vio.set_last_cloud(world_cloud(dsd))
    t0, t1 = 2.0, 2.05
    s0 = state_at(dsd, t0)
    vio.update(s0, s0, dsd.render_image(t0))
    assert int(vio.vmap.n_pts) > 20
    s1_true = state_at(dsd, t1)
    drot = so3.exp(jnp.asarray([0.004, -0.005, 0.007]))
    s1_bad = s1_true._replace(
        rot=s1_true.rot @ drot,
        pos=s1_true.pos + jnp.asarray([0.02, -0.025, 0.012]),
    )
    vio.set_last_cloud(world_cloud(dsd, seed=1))
    out = vio.update(s1_bad, s1_bad, dsd.render_image(t1))
    err_before = np.linalg.norm(np.asarray(s1_bad.pos - s1_true.pos))
    err_after = np.linalg.norm(np.asarray(out.pos - s1_true.pos))
    assert vio.last_stats["tracked"] > 10, vio.last_stats
    assert err_after < 0.7 * err_before, (err_before, err_after)


@pytest.mark.slow
def test_fused_vs_staged_equivalence(ds):
    """vio_frame_step (one dispatch) must reproduce the staged path.

    Compared per-frame from IDENTICAL Vio state (cloned), so tiny f32
    ordering differences cannot compound across frames: same posterior
    pose/cov, same tracked count, same map growth."""
    import copy

    import jax.numpy as jnp

    cfg = make_cfg()
    # this test FORKS the Vio (copy.copy) and replays the same frame
    # through both paths from the shared arrays — incompatible with
    # donate_maps (the fused step would delete the fork's buffers)
    cfg.capacity.donate_maps = False
    vio = Vio(cfg)
    s = state_at(ds, 2.0)
    vio.set_last_cloud(world_cloud(ds))
    vio.update(s, s, ds.render_image(2.0))  # bootstrap
    for k in range(1, 4):
        t = 2.0 + 0.1 * k
        sk = state_at(ds, t)
        sp = sk._replace(pos=sk.pos + jnp.asarray([0.01, -0.008, 0.006]))
        vio.set_last_cloud(world_cloud(ds, seed=k))
        img = ds.render_image(t)
        ref = copy.copy(vio)  # immutable jnp arrays: shallow copy is a fork
        out_f = vio.update(sp, sp, img)
        out_s = ref.update_staged(sp, sp, img)
        np.testing.assert_allclose(
            np.asarray(out_f.pos), np.asarray(out_s.pos), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_f.rot), np.asarray(out_s.rot), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_f.cov), np.asarray(out_s.cov), atol=1e-4
        )
        assert abs(vio.last_stats["tracked"] - ref.last_stats["tracked"]) <= 2
        nf, ns = int(vio.vmap.n_pts), int(ref.vmap.n_pts)
        assert abs(nf - ns) <= max(3, 0.05 * ns), (nf, ns)
        # continue from the fused branch (arbitrary; they stay close)


def test_rollback_guards_catastrophic_prior(ds):
    """With a hopeless prior (~17 deg, 0.5 m off) the photometric
    gradient points nowhere useful; the error-monotonicity rollback
    (lidar_selection.cpp:889-892) must keep the posterior from running
    away: it stays within the prior's neighborhood instead of diverging
    on garbage residuals."""
    vio = Vio(make_cfg())
    vio.set_last_cloud(world_cloud(ds))
    s0 = state_at(ds, 2.0)
    vio.update(s0, s0, ds.render_image(2.0))
    assert int(vio.vmap.n_pts) > 20

    s1_true = state_at(ds, 2.05)
    drot = so3.exp(jnp.asarray([0.1, -0.2, 0.2]))
    s1_bad = s1_true._replace(
        rot=s1_true.rot @ drot,
        pos=s1_true.pos + jnp.asarray([0.3, -0.3, 0.2]),
    )
    vio.set_last_cloud(world_cloud(ds, seed=1))
    out = vio.update(s1_bad, s1_bad, ds.render_image(2.05))
    # posterior must not run further than ~2x the (already huge) prior
    # offset in either rotation or translation
    d_pos = np.linalg.norm(np.asarray(out.pos - s1_bad.pos))
    d_rot = np.linalg.norm(np.asarray(so3.log(s1_bad.rot.T @ out.rot)))
    assert d_pos < 1.0, d_pos
    assert d_rot < 0.6, d_rot
    assert np.all(np.isfinite(np.asarray(out.cov)))


@pytest.mark.slow
def test_robust_weighting_resists_outlier_patches():
    """Opt-in vk::robust_cost completion (lidar_selection.cpp:75-78,
    839-842): with a fraction of reference patches replaced by garbage,
    the Huber-weighted update must recover the pose better than the
    unweighted one, which the outlier rows drag away."""
    import jax

    from fastlivo_tpu.camera import Camera
    from fastlivo_tpu.ops import image as img_ops
    from fastlivo_tpu import vio as vio_mod

    rng = np.random.default_rng(7)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = (128 + 60 * np.sin(0.11 * xx) * np.cos(0.19 * yy)).astype(np.float32)
    cam = Camera(fx=np.float32(F), fy=np.float32(F),
                 cx=np.float32((W - 1) / 2), cy=np.float32((H - 1) / 2),
                 d=np.zeros(4, np.float32), width=W, height=H)
    G, P = 96, 8
    z = rng.uniform(3.0, 6.0, G).astype(np.float32)
    pts = np.stack([rng.uniform(-1.5, 1.5, G) * z / 4,
                    rng.uniform(-1.2, 1.2, G) * z / 4, z], 1).astype(np.float32)
    # reference patches: EXACT samples under the true (identity) pose
    patch = np.zeros((G, 3, P, P), np.float32)
    for lvl in range(3):
        sc = 1 << lvl
        pc = np.stack([F * pts[:, 0] / pts[:, 2] + (W - 1) / 2,
                       F * pts[:, 1] / pts[:, 2] + (H - 1) / 2], 1)
        val, _, _ = img_ops.patches_and_grads(
            jnp.asarray(img), jnp.asarray(pc), P, sc)
        patch[:, lvl] = np.asarray(val)
    # corrupt 25% of the tracked set with gross outliers
    bad = rng.permutation(G)[: G // 4]
    patch[bad] = 255.0

    s_true = identity_state()
    drot = so3.exp(jnp.asarray([0.003, -0.004, 0.005]))
    s0 = s_true._replace(rot=s_true.rot @ drot,
                         pos=s_true.pos + jnp.asarray([0.03, -0.02, 0.025]))
    common = dict(
        img_point_cov=100.0, patch_size=P, levels=(2, 1, 0), max_iter=8,
    )
    I3 = np.eye(3, dtype=np.float32)
    Z3 = np.zeros(3, np.float32)
    Z33 = np.zeros((3, 3), np.float32)
    args = (s0, s0, cam, jnp.asarray(img), jnp.asarray(pts),
            jnp.asarray(patch), jnp.zeros(G, jnp.int32), jnp.ones(G, bool),
            I3, Z3, I3, Z33)
    s_plain, *_ = vio_mod.photometric_update_levels(*args, **common)
    s_hub, *_ = vio_mod.photometric_update_levels(
        *args, **common, robust="huber")
    s_tuk, *_ = vio_mod.photometric_update_levels(
        *args, **common, robust="tukey")
    e_before = float(np.linalg.norm(np.asarray(s0.pos - s_true.pos)))
    e_plain = float(np.linalg.norm(np.asarray(s_plain.pos - s_true.pos)))
    e_hub = float(np.linalg.norm(np.asarray(s_hub.pos - s_true.pos)))
    e_tuk = float(np.linalg.norm(np.asarray(s_tuk.pos - s_true.pos)))
    # measured: before 0.044, none 0.334 (outliers drag it 8x off),
    # huber 0.054 (holds), tukey 0.0006 (full recovery — hard rejection
    # zeroes the |t|>=b outlier rows; equals the clean-data result)
    assert e_plain > e_before, (e_before, e_plain)
    assert e_hub < 0.3 * e_plain, (e_plain, e_hub)
    assert e_tuk < 0.1 * e_before, (e_before, e_tuk)


def test_device_gray_bit_exact():
    """_to_gray_dev (device BGR->gray, uploaded as raw uint8) must be
    bit-identical to Vio._to_gray's numpy path for shape-matched frames
    — the interactive camera path switched to it for 4x less wire
    traffic, and every A/B trajectory claim rests on exactness."""
    import numpy as np
    import jax.numpy as jnp
    from fastlivo_tpu.vio import _to_gray_dev

    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (64, 48, 3), np.uint8)
    host = np.asarray(
        0.114 * u8[..., 0] + 0.587 * u8[..., 1] + 0.299 * u8[..., 2],
        np.float32,
    )
    dev = np.asarray(_to_gray_dev(jnp.asarray(u8)))
    np.testing.assert_array_equal(host, dev)
    # float frames are NOT routed to the device path (XLA FMA
    # contraction costs 1 ulp vs numpy): _gray_device must fall back
    from fastlivo_tpu.config import load_config
    from fastlivo_tpu.vio import Vio

    cfg = load_config("/root/reference/config/avia.yaml",
                      "/root/reference/config/camera_pinhole.yaml")
    v = Vio(cfg)
    f32 = rng.random((cfg.camera.height, cfg.camera.width, 3),
                     np.float32) * 255.0
    np.testing.assert_array_equal(np.asarray(v._gray_device(f32)),
                                  v._to_gray(f32))
    uu = rng.integers(0, 256, (cfg.camera.height, cfg.camera.width, 3),
                      np.uint8)
    np.testing.assert_array_equal(np.asarray(v._gray_device(uu)),
                                  v._to_gray(uu))


@pytest.mark.slow
def test_u8_frame_ring_matches_f32(ds):
    """capacity.frame_ring_u8 stores the reference-image ring quantized
    to u8 (4x deeper ring per HBM byte; the reference itself keeps u8
    cv::Mats, feature.h:40). The only difference vs the f32 ring is
    <=0.5-intensity quantization of the REFERENCE patches, so a
    multi-frame run must produce nearly identical states and the same
    tracking behavior."""
    runs = {}
    for u8 in (False, True):
        cfg = make_cfg()
        cfg.capacity.frame_ring_u8 = u8
        vio = Vio(cfg)
        assert vio.vmap.imgs.dtype == (jnp.uint8 if u8 else jnp.float32)
        vio.set_last_cloud(world_cloud(ds))
        s = state_at(ds, 2.0)
        vio.update(s, s, ds.render_image(2.0))
        poses, tracked = [], []
        for k in range(1, 5):
            t = 2.0 + 0.1 * k
            s = state_at(ds, t)
            vio.set_last_cloud(world_cloud(ds, seed=k))
            s_out = vio.update(s, s, ds.render_image(t))
            poses.append(np.asarray(s_out.pos))
            tracked.append(vio.last_stats["tracked"])
        runs[u8] = (np.asarray(poses), tracked)
    d = np.abs(runs[True][0] - runs[False][0]).max()
    assert d < 2e-3, f"u8 ring diverged from f32: max |dpos| = {d}"
    assert runs[True][1][-1] > 10, runs[True][1]


def test_dedup_voxels_preserves_unique_keys():
    """Sort-free _dedup_voxels: every unique 0.5 m voxel key of the
    masked-in points survives (collisions may add harmless duplicates,
    never drop a key), and emitted rows are exactly those keys."""
    import fastlivo_tpu.vio as vio_mod

    rng = np.random.default_rng(3)
    M = 4096
    pg = rng.uniform(-3, 3, (M, 3)).astype(np.float32)  # ~1.7k voxels < max_vox
    mask = rng.random(M) < 0.9
    vox, vmask = vio_mod._dedup_voxels(
        jnp.asarray(pg), jnp.asarray(mask), M // 2
    )
    vox = np.asarray(vox)[np.asarray(vmask)]
    want = np.unique(np.floor(pg[mask] / 0.5).astype(np.int32), axis=0)
    got = np.unique(vox, axis=0)
    np.testing.assert_array_equal(got, want)
    # duplicates kept on collisions are bounded: far fewer rows than M
    assert len(vox) < len(want) + 64


@pytest.mark.slow
def test_pool_retains_ref_images_beyond_depth(ds):
    """shared_ptr retention through the fused path: with a 4-slot image
    pool, points bootstrapped at fid 0 keep their reference image alive
    across 8 subsequent camera frames (old ring semantics overwrote
    slot 0 at fid 4, masking every bootstrap observation and collapsing
    the tracked set)."""
    cfg = make_cfg()
    cfg.capacity.frame_ring = 4
    vio = Vio(cfg)
    s0 = state_at(ds, 2.0)
    vio.set_last_cloud(world_cloud(ds))
    vio.update(s0, s0, ds.render_image(2.0))
    assert int(vio.vmap.n_pts) > 20
    tracked = []
    for k in range(1, 9):
        t = 2.0 + 0.05 * k
        s = state_at(ds, t)
        vio.set_last_cloud(world_cloud(ds, seed=k))
        vio.update(s, s, ds.render_image(t))
        tracked.append(vio.last_stats["tracked"])
    # fid 0 is the most-referenced image -> survives 8 pushes through a
    # 4-slot pool, and tracking stays healthy
    assert bool(jnp.any(vio.vmap.img_fid == 0)), np.asarray(vio.vmap.img_fid)
    assert tracked[-1] > 10, tracked
