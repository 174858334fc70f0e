import jax.numpy as jnp
import numpy as np

from fastlivo_tpu.ops import plane

rng = np.random.default_rng(2)


def _plane_points(n_sets, normal, d, noise=0.0):
    """Generate 5-point sets lying on plane n.p + d = 0."""
    normal = np.asarray(normal, dtype=np.float64)
    normal = normal / np.linalg.norm(normal)
    # basis of the plane
    a = np.array([1.0, 0, 0]) if abs(normal[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(normal, a)
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    uv = rng.normal(size=(n_sets, 5, 2))
    pts = uv[..., :1] * u + uv[..., 1:] * v - d * normal
    pts += noise * rng.normal(size=pts.shape) * normal
    return pts.astype(np.float32)


def test_exact_plane_recovered():
    pts = _plane_points(8, [0.3, -0.5, 0.8], d=2.0)
    pabcd, ok = plane.fit_plane(jnp.asarray(pts))
    pabcd = np.asarray(pabcd)
    assert np.all(np.asarray(ok))
    n_true = np.array([0.3, -0.5, 0.8]) / np.linalg.norm([0.3, -0.5, 0.8])
    for row in pabcd:
        n_est = row[:3] * np.sign(row[3] / 2.0)
        np.testing.assert_allclose(np.abs(n_est @ n_true), 1.0, atol=1e-3)
        # distance of origin: |d| should be 2
        np.testing.assert_allclose(abs(row[3]), 2.0, rtol=1e-3)


def test_residuals_zero_on_plane():
    pts = _plane_points(4, [0, 0, 1.0], d=-1.5)
    pabcd, ok = plane.fit_plane(jnp.asarray(pts))
    dist = np.asarray(plane.point_to_plane(pabcd, jnp.asarray(pts[:, 0, :])))
    np.testing.assert_allclose(dist, 0.0, atol=1e-3)


def test_noisy_plane_rejected():
    # DETERMINISTIC violation (the old noise=0.5 draw depended on the
    # shared module RNG's state, i.e. on test order under xdist, and a
    # lucky draw could fit inside the gate — the TLS plane can TILT
    # into small-spread sets): four wide corners on the plane plus the
    # CENTROID point lifted 0.5 m along the normal. Tilting about the
    # centroid cannot reduce the centroid residual, so the best fit
    # leaves >=0.25 m somewhere and the 0.1 gate must reject.
    normal = np.asarray([0.2, 0.9, 0.1])
    normal = normal / np.linalg.norm(normal)
    a = np.array([1.0, 0, 0])
    u = np.cross(normal, a); u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    uv = np.array([[2, 2], [2, -2], [-2, 2], [-2, -2], [0, 0]], float)
    base = uv[:, :1] * u + uv[:, 1:] * v - 1.0 * normal
    base[4] += 0.5 * normal
    pts = np.tile(base[None], (8, 1, 1)).astype(np.float32)
    _, ok = plane.fit_plane(jnp.asarray(pts), threshold=0.1)
    assert not np.any(np.asarray(ok))


def test_threshold_gate_matches_reference_semantics():
    # points within 0.1 of the plane -> valid (esti_plane, common_lib.h:471)
    pts = _plane_points(8, [0, 0, 1.0], d=1.0, noise=0.02)
    _, ok = plane.fit_plane(jnp.asarray(pts), threshold=0.1)
    assert np.all(np.asarray(ok))


def test_masked_rows_ignored():
    pts = _plane_points(4, [0, 1.0, 0], d=0.7)
    # corrupt last row, mask it out
    pts[:, 4, :] = rng.normal(size=(4, 3)) * 10
    valid = np.ones((4, 5), dtype=bool)
    valid[:, 4] = False
    pabcd, ok = plane.fit_plane(jnp.asarray(pts), jnp.asarray(valid))
    assert np.all(np.asarray(ok))
    d = np.asarray(plane.point_to_plane(pabcd, jnp.asarray(pts[:, 0, :])))
    np.testing.assert_allclose(d, 0.0, atol=1e-3)


def test_matches_reference_lsq_geometry():
    """Cross-check against the reference's A n = -1 least squares
    (common_lib.h:449-470): for near-planar sets both fits must agree on
    the plane geometry (normal direction and offset)."""
    pts = _plane_points(16, [0.5, 0.5, 0.7], d=1.3, noise=0.005)
    pabcd, _ = plane.fit_plane(jnp.asarray(pts))
    pabcd = np.asarray(pabcd)
    for i in range(16):
        n, *_ = np.linalg.lstsq(pts[i], -np.ones(5), rcond=None)
        nn = np.linalg.norm(n)
        ref_n, ref_d = n / nn, 1.0 / nn
        assert abs(pabcd[i, :3] @ ref_n) > 1.0 - 1e-4
        np.testing.assert_allclose(abs(pabcd[i, 3]), ref_d, atol=2e-2)


def test_plane_through_origin_ok():
    """The centered fit handles planes through the origin, where the
    reference's A n = -1 parametrization is degenerate (we are strictly
    more capable here; the reference would reject these points)."""
    pts = _plane_points(8, [0.1, 0.2, 0.97], d=0.0)
    pabcd, ok = plane.fit_plane(jnp.asarray(pts))
    assert np.all(np.asarray(ok))
    n_true = np.array([0.1, 0.2, 0.97]) / np.linalg.norm([0.1, 0.2, 0.97])
    for row in np.asarray(pabcd):
        assert abs(row[:3] @ n_true) > 1 - 1e-4
