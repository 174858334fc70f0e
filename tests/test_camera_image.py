"""Camera model and batched image-op tests (vs direct numpy loops)."""
import numpy as np
import jax.numpy as jnp

from fastlivo_tpu import camera as cam_mod
from fastlivo_tpu.config import CameraConfig
from fastlivo_tpu.ops import image as img_ops


def make_cam(distort=True):
    cfg = CameraConfig(
        width=640, height=512,
        fx=431.795, fy=431.550, cx=310.833, cy=266.986,
        d=[-0.0944, 0.0947, -0.00808, 8.07e-05] if distort else [0, 0, 0, 0],
    )
    return cam_mod.from_config(cfg)


def test_project_unproject_roundtrip():
    cam = make_cam()
    rng = np.random.default_rng(0)
    xyz = np.stack([
        rng.uniform(-1.5, 1.5, 256),
        rng.uniform(-1.2, 1.2, 256),
        rng.uniform(1.0, 10.0, 256),
    ], -1).astype(np.float32)
    px = cam_mod.world2cam(cam, jnp.asarray(xyz))
    f = cam_mod.cam2world(cam, px)
    # bearing must align with the original ray
    dirs = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)
    dots = np.sum(np.asarray(f) * dirs, axis=-1)
    inside = np.asarray(cam_mod.is_in_frame(cam, px, 2))
    assert np.all(dots[inside] > 1.0 - 1e-5)


def test_no_distortion_is_linear():
    cam = make_cam(distort=False)
    xyz = jnp.asarray([[0.5, -0.25, 2.0]], jnp.float32)
    px = np.asarray(cam_mod.world2cam(cam, xyz))[0]
    np.testing.assert_allclose(
        px, [431.795 * 0.25 + 310.833, 431.550 * (-0.125) + 266.986], rtol=1e-5
    )


def test_is_in_frame_border():
    cam = make_cam()
    px = jnp.asarray([[39.9, 100.0], [40.1, 100.0], [600.0, 100.0], [599.0, 100.0]])
    got = np.asarray(cam_mod.is_in_frame(cam, px, 40))
    assert got.tolist() == [False, True, False, True]


# --- image ops -----------------------------------------------------------

def ref_getpatch(img, pc, patch_size, level):
    """Direct numpy transcription of getpatch semantics
    (lidar_selection.cpp:119-140) for testing."""
    scale = 1 << level
    half = patch_size // 2
    u, v = pc
    u_i = int(np.floor(u / scale) * scale)
    v_i = int(np.floor(v / scale) * scale)
    su = (u - u_i) / scale
    sv = (v - v_i) / scale
    w_tl = (1 - su) * (1 - sv)
    w_tr = su * (1 - sv)
    w_bl = (1 - su) * sv
    w_br = su * sv
    out = np.zeros((patch_size, patch_size))
    for x in range(patch_size):
        for y in range(patch_size):
            rr = v_i - half * scale + x * scale
            cc = u_i - half * scale + y * scale
            out[x, y] = (
                w_tl * img[rr, cc] + w_tr * img[rr, cc + scale]
                + w_bl * img[rr + scale, cc] + w_br * img[rr + scale, cc + scale]
            )
    return out


def _texture(H=128, W=160):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    return (
        100 + 50 * np.sin(0.21 * xx) * np.cos(0.17 * yy) + 20 * np.sin(0.05 * xx * yy / 7)
    ).astype(np.float32)


def test_extract_patches_matches_reference_loop():
    img = _texture()
    pcs = np.array([[40.3, 50.7], [80.9, 30.2], [100.4, 90.8]], np.float32)
    for level in (0, 1, 2):
        got = np.asarray(
            img_ops.extract_patches(jnp.asarray(img), jnp.asarray(pcs), 8, 1 << level)
        )
        for i, pc in enumerate(pcs):
            ref = ref_getpatch(img, pc, 8, level)
            np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-3)


def test_patches_and_grads_consistency():
    img = _texture()
    pcs = np.array([[40.3, 50.7], [81.6, 31.2]], np.float32)
    val, du, dv = img_ops.patches_and_grads(jnp.asarray(img), jnp.asarray(pcs), 8, 1)
    # value channel must equal extract_patches
    ref = np.asarray(img_ops.extract_patches(jnp.asarray(img), jnp.asarray(pcs), 8, 1))
    np.testing.assert_allclose(np.asarray(val), ref, rtol=1e-5, atol=1e-3)
    # gradients approximate the analytic image derivative
    x, y = 50.7, 40.3  # note: pc = (u, v) = (col=40.3? no: pc[0]=u)
    # numeric check at center pixel of first patch
    u, v = pcs[0]
    eps = 0.5
    num_du = (ref_getpatch(img, (u + eps, v), 8, 0) - ref_getpatch(img, (u - eps, v), 8, 0)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(du)[0], num_du, atol=0.6)


def test_shi_tomasi_positive_on_texture():
    img = _texture()
    pcs = np.array([[50.0, 60.0], [80.0, 40.0]], np.float32)
    s = np.asarray(img_ops.shi_tomasi(jnp.asarray(img), jnp.asarray(pcs)))
    assert np.all(s > 0)
    flat = np.full_like(img, 100.0)
    s2 = np.asarray(img_ops.shi_tomasi(jnp.asarray(flat), jnp.asarray(pcs)))
    np.testing.assert_allclose(s2, 0.0, atol=1e-6)


def test_affine_warp_identity():
    img = _texture()
    ring = jnp.asarray(img)[None]  # (1, H, W)
    K = 3
    px_ref = jnp.asarray([[50.3, 60.7], [80.1, 40.5], [30.9, 70.2]], jnp.float32)
    A = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (K, 1, 1))
    got = img_ops.affine_warp_patches(
        ring, jnp.zeros(K, jnp.int32), A, px_ref, 8,
        jnp.zeros(K, jnp.int32), 0,
    )
    # identity warp at search level 0, pyramid 0 == plain bilinear patch
    # around px_ref on the unit grid
    for i in range(K):
        u, v = np.asarray(px_ref[i])
        for yy in range(8):
            for xx in range(8):
                uu, vv = u + (xx - 4), v + (yy - 4)
                exp = img_ops.bilinear(jnp.asarray(img), jnp.asarray([uu, vv]))
                np.testing.assert_allclose(
                    np.asarray(got)[i, yy, xx], float(exp), rtol=1e-4, atol=1e-2
                )


def test_pallas_patches_and_grads_interpret():
    """Pallas kernel (interpret mode) == XLA reference implementation."""
    from fastlivo_tpu.ops.pallas_image import patches_and_grads_pallas

    img = _texture()
    rng = np.random.default_rng(0)
    K = 16
    pcs = np.stack([rng.uniform(45, 115, K), rng.uniform(45, 83, K)], 1).astype(np.float32)
    scales = rng.choice([1, 2, 4], K).astype(np.int32)
    val, du, dv = patches_and_grads_pallas(
        jnp.asarray(img), jnp.asarray(pcs), jnp.asarray(scales), 8,
        interpret=True,
    )
    rv, rdu, rdv = img_ops.patches_and_grads(
        jnp.asarray(img), jnp.asarray(pcs), 8, jnp.asarray(scales)
    )
    np.testing.assert_allclose(np.asarray(val), np.asarray(rv), atol=1e-3)
    np.testing.assert_allclose(np.asarray(du), np.asarray(rdu), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=1e-3)
