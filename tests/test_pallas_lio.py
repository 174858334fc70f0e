"""Pallas fused top-5 + plane fit (ops/pallas_lio.py) vs the XLA path.

Interpret mode on the CPU test mesh; the kernel's selection and fit
must match `voxel_map.topk_from_candidates` + `plane.fit_plane`
(valid=None semantics: missing neighbors are zeroed and still count as
points), and the full `lio_update(pallas_knn=True)` must reproduce the
default path's posterior on a real map.
"""
import numpy as np
import jax.numpy as jnp

from fastlivo_tpu.ops import pallas_lio, plane as plane_ops
from fastlivo_tpu.ops import tiled_map as tm
from fastlivo_tpu.ops.voxel_map import topk_from_candidates
from fastlivo_tpu import lio as lio_mod
from fastlivo_tpu.state import identity_state


def _random_block(n=700, m=27, seed=0, drop=0.3):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    cand = (q[:, None, :] + rng.normal(0, 0.8, (n, m, 3))).astype(np.float32)
    # flatten some candidates onto local planes so fits are valid
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    d = -np.sum(nrm * q, axis=1)
    off = np.sum(cand * nrm[:, None, :], axis=-1) + d[:, None]
    cand -= (off * (rng.random((n, m)) < 0.8))[:, :, None] * nrm[:, None, :]
    found = rng.random((n, m)) > drop
    return jnp.asarray(cand), jnp.asarray(found), jnp.asarray(q)


def test_kernel_matches_topk_plus_fit():
    cand, found, q = _random_block()
    pab_p, ok_p, nd2_p = pallas_lio.knn5_plane(cand, found, q,
                                               interpret=True)
    neigh, nd2, _ = topk_from_candidates(cand, found, q, 5)
    pab_x, ok_x = plane_ops.fit_plane(neigh, threshold=0.1)

    np.testing.assert_allclose(np.asarray(nd2_p), np.asarray(nd2[:, -1]),
                               rtol=1e-5, atol=1e-6)
    # the 5-NN distance gate is the behavioral selector — compare where
    # it passes (rows it rejects never reach the fit downstream)
    sel = np.asarray(nd2[:, -1]) <= lio_mod.SQ_DIST_GATE
    ok_p, ok_x = np.asarray(ok_p), np.asarray(ok_x)
    # normals are sign-ambiguous between association orders; compare as
    # lines and the plane evaluated at the query
    pa_p, pa_x = np.asarray(pab_p), np.asarray(pab_x)
    agree = np.sum(pa_p[:, :3] * pa_x[:, :3], axis=1)
    flipped = np.sign(agree)[:, None]
    both = sel & ok_p & ok_x
    assert both.sum() > 200
    np.testing.assert_allclose(pa_p[both], (pa_x * flipped)[both],
                               rtol=5e-3, atol=5e-4)
    # gate agreement: identical except f32-margin fits
    mism = sel & (ok_p != ok_x)
    assert mism.mean() < 0.01, f"{mism.sum()} gate mismatches"


def test_lio_update_pallas_matches_default():
    rng = np.random.default_rng(2)
    world = np.stack([
        rng.uniform(-10, 10, 6000),
        rng.uniform(-10, 10, 6000),
        np.abs(np.sin(0.3 * rng.uniform(-10, 10, 6000))) * 0.05,
    ], axis=1).astype(np.float32)  # gently rippled ground plane
    m = tm.build_host(world, (32, 32, 8), 1024, 0.5)
    idx = rng.choice(len(world), 2048, replace=False)
    scan = world[idx] + rng.normal(0, 0.005, (2048, 3)).astype(np.float32)
    s = identity_state()._replace(
        pos=jnp.asarray([0.02, -0.015, 0.01]),
        cov=jnp.eye(18, dtype=jnp.float64) * 0.01,
    )
    args = (s, m, jnp.asarray(scan), jnp.ones(2048, bool),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    kw = dict(laser_point_cov=0.001, max_iter=4, knn_radius=1)
    r0 = lio_mod.lio_update(*args, **kw)
    r1 = lio_mod.lio_update(*args, pallas_knn=True, **kw)
    np.testing.assert_allclose(np.asarray(r1.state.pos),
                               np.asarray(r0.state.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1.state.rot),
                               np.asarray(r0.state.rot), atol=1e-6)
    a0, a1 = int(r0.n_active), int(r1.n_active)
    assert abs(a1 - a0) <= 0.01 * max(a0, 1), (a0, a1)
