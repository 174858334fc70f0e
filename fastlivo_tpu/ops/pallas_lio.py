"""Pallas TPU kernel: fused 5-NN selection + plane fit for the LIO loop.

SURVEY §7 step 9 asks for a Pallas attempt at the LIO hot path (the
fused kNN-gather + plane-fit + J-row assembly). The candidate GATHER
(two dependent HBM gathers through the tile directory) is exactly what
XLA's gather machinery does well, and random gathers are not a strength
of hand-written TPU kernels — so the kernel starts where the gather
ends: given the (N, 27, 3) candidate block, it fuses

    squared distances -> 5-round min-select (top-5, no sort) ->
    centered-TLS plane fit (closed-form symmetric-3x3 smallest
    eigenvector) -> validity gates

in ONE pass through VMEM, replacing the XLA chain `lax.top_k` (a sort)
+ `take_along_axis` + `plane.fit_plane` that otherwise round-trips the
(N, 27)/(N, 5, 3) intermediates through HBM between kernels.

Layout: the QUERY axis rides the 128-wide lanes (one lane per query),
the 27 candidates ride sublanes, and every scalar of the plane algebra
is a (1, BN) row — pure VPU math, no transposes inside the kernel.

Numerical contract vs the XLA path (`voxel_map.topk_from_candidates` +
`plane.fit_plane` with valid=None): identical selection for distinct
distances (ties broken by candidate row in both), identical zeroing of
missing neighbors, same TLS formulas; association order of the 5-term
sums differs (tree vs sequential), an f32-epsilon effect. Equality is
pinned by tests/test_pallas_lio.py (interpret mode on CPU, compiled on
TPU).

Opt-in via `capacity.pallas_knn: true` (lio.lio_update(pallas_knn=...));
the default stays on the XLA path — see docs/PERF_ANALYSIS.md "Round 5:
Pallas attempt #2" for the measured A/B.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e37
BN = 512  # queries per block (lanes-multiple)


def _acos(x):
    """Mosaic has no acos lowering; Abramowitz-Stegun 4.4.45
    (|err| <= 6.7e-5 rad), extended to [-1, 1] by reflection — sqrt and
    polynomial only. The eigenvalue phi this feeds tolerates the error:
    it shifts lambda_min by O(p * 1e-4), far inside the fit's f32
    noise (equality vs the XLA fit pinned at rtol 5e-3)."""
    f = x.dtype
    def c(v):
        return jnp.asarray(v, f)

    ax = jnp.abs(x)
    p = c(1.5707288) + ax * (c(-0.2121144) + ax * (c(0.0742610)
                                                   + ax * c(-0.0187293)))
    r = jnp.sqrt(jnp.maximum(c(1.0) - ax, c(0.0))) * p
    return jnp.where(x >= c(0.0), r, c(3.14159265) - r)


def _kernel(cx, cy, cz, fm, qx, qy, qz, out, *, threshold):
    X, Y, Z = cx[:], cy[:], cz[:]  # (27, BN)
    F = fm[:]
    dx = X - qx[:]
    dy = Y - qy[:]
    dz = Z - qz[:]
    d2 = dx * dx + dy * dy + dz * dz
    # every float literal below is explicitly f32: the package enables
    # jax x64, so a bare python literal materializes as an f64 vector
    # constant whose f32 trunc Mosaic cannot legalize (tpu.truncf)
    fdt = X.dtype
    def c(v):
        return jnp.asarray(v, fdt)

    bigc = c(BIG)
    d2 = jnp.where(F > c(0.5), d2, bigc)
    M = X.shape[0]
    # one-hots via f32 where-selects on INT comparisons: bool->f32 casts
    # and weak-int promotions hit a Mosaic lowering recursion on this
    # jax build, and tpu.iota only produces integers — so the row ids
    # stay i32 (explicitly typed constants) and everything else f32
    one = jnp.ones((), X.dtype)
    zero = jnp.zeros((), X.dtype)
    rowid = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    m_i32 = jnp.asarray(M, jnp.int32)

    nx, ny, nz, nv = [], [], [], []
    nd2_last = None
    for _ in range(5):
        dmin = jnp.min(d2, axis=0, keepdims=True)  # (1, BN)
        pick = jnp.min(jnp.where(d2 == dmin, rowid, m_i32), axis=0,
                       keepdims=True)
        oh = jnp.where(rowid == pick, one, zero)  # one-hot (27, BN)
        v = jnp.where(dmin < c(BIG * 0.5), one, zero)
        # missing neighbors contribute zeros, exactly like
        # topk_from_candidates' masked gather
        nx.append(jnp.sum(X * oh, axis=0, keepdims=True) * v)
        ny.append(jnp.sum(Y * oh, axis=0, keepdims=True) * v)
        nz.append(jnp.sum(Z * oh, axis=0, keepdims=True) * v)
        nv.append(v)
        d2 = jnp.where(oh > c(0.5), bigc, d2)
        nd2_last = dmin

    # --- centered TLS plane fit (plane.fit_plane with valid=None: all
    # 5 selections count as points, including the zeroed missing ones) --
    inv5 = c(0.2)
    cxm = (nx[0] + nx[1] + nx[2] + nx[3] + nx[4]) * inv5
    cym = (ny[0] + ny[1] + ny[2] + ny[3] + ny[4]) * inv5
    czm = (nz[0] + nz[1] + nz[2] + nz[3] + nz[4]) * inv5
    s00 = s01 = s02 = s11 = s12 = s22 = c(0.0)
    for k in range(5):
        ex = nx[k] - cxm
        ey = ny[k] - cym
        ez = nz[k] - czm
        s00 = s00 + ex * ex
        s01 = s01 + ex * ey
        s02 = s02 + ex * ez
        s11 = s11 + ey * ey
        s12 = s12 + ey * ez
        s22 = s22 + ez * ez

    # smallest eigenvector of the symmetric 3x3 scatter, componentwise
    # transcription of plane.sym3x3_min_eigvec
    q = (s00 + s11 + s22) * c(1.0 / 3.0)
    b00, b11, b22 = s00 - q, s11 - q, s22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + c(2.0) * (s01 * s01 + s02 * s02 + s12 * s12))
    p = jnp.sqrt(jnp.maximum(p2 * c(1.0 / 6.0), c(1e-30)))
    detB = (
        b00 * (b11 * b22 - s12 * s12)
        - s01 * (s01 * b22 - s12 * s02)
        + s02 * (s01 * s12 - b11 * s02)
    ) / (p * p * p)
    r = jnp.clip(detB * c(0.5), c(-1.0), c(1.0))
    phi = _acos(r) * c(1.0 / 3.0)
    lam = q + c(2.0) * p * jnp.cos(phi + c(2.0943951))  # 2*pi/3

    r0x, r0y, r0z = s00 - lam, s01, s02
    r1x, r1y, r1z = s01, s11 - lam, s12
    r2x, r2y, r2z = s02, s12, s22 - lam

    def cross(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    c01 = cross(r0x, r0y, r0z, r1x, r1y, r1z)
    c02 = cross(r0x, r0y, r0z, r2x, r2y, r2z)
    c12 = cross(r1x, r1y, r1z, r2x, r2y, r2z)
    n01 = c01[0] * c01[0] + c01[1] * c01[1] + c01[2] * c01[2]
    n02 = c02[0] * c02[0] + c02[1] * c02[1] + c02[2] * c02[2]
    n12 = c12[0] * c12[0] + c12[1] * c12[1] + c12[2] * c12[2]
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = (~use01) & (n02 >= n12)
    bx = jnp.where(use01, c01[0], jnp.where(use02, c02[0], c12[0]))
    by = jnp.where(use01, c01[1], jnp.where(use02, c02[1], c12[1]))
    bz = jnp.where(use01, c01[2], jnp.where(use02, c02[2], c12[2]))
    bn = jnp.sqrt(bx * bx + by * by + bz * bz)
    okn = bn > c(1e-20)
    inv = c(1.0) / jnp.where(okn, bn, c(1.0))
    nxv = jnp.where(okn, bx * inv, c(0.0))
    nyv = jnp.where(okn, by * inv, c(0.0))
    nzv = jnp.where(okn, bz * inv, c(1.0))  # degenerate fallback +z
    d = -(nxv * cxm + nyv * cym + nzv * czm)

    # validity: every one of the 5 selections within `threshold`
    ok = okn
    for k in range(5):
        dist = jnp.abs(nx[k] * nxv + ny[k] * nyv + nz[k] * nzv + d)
        ok = ok & (dist <= c(threshold))

    out[0:1, :] = nxv
    out[1:2, :] = nyv
    out[2:3, :] = nzv
    out[3:4, :] = d
    out[4:5, :] = jnp.where(ok, one, zero)
    out[5:6, :] = nd2_last
    out[6:7, :] = jnp.zeros_like(d)
    out[7:8, :] = jnp.zeros_like(d)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def knn5_plane(cand, found, queries, threshold: float = 0.1,
               interpret: bool = False):
    """Fused top-5 + plane fit. cand (N, M, 3) f32, found (N, M) bool,
    queries (N, 3) -> (pabcd (N, 4), plane_ok (N,), nd2_5th (N,)).

    Drop-in for `topk_from_candidates(...)[0,1]` + `plane.fit_plane`:
    nd2_5th is the 5th-nearest squared distance (the :1549 gate input),
    pabcd/plane_ok match fit_plane's outputs.
    """
    N, M = found.shape
    Np = -(-N // BN) * BN
    padN = Np - N

    def padq(a):
        return jnp.pad(a, ((0, padN),) + ((0, 0),) * (a.ndim - 1))

    candp = padq(cand)
    foundp = padq(found)
    qp = padq(queries)
    cx = candp[:, :, 0].T  # (M, Np)
    cy = candp[:, :, 1].T
    cz = candp[:, :, 2].T
    fm = foundp.T.astype(cand.dtype)
    qx = qp[:, 0][None, :]
    qy = qp[:, 1][None, :]
    qz = qp[:, 2][None, :]

    grid = (Np // BN,)
    # index-map constants MUST be explicit int32: the package enables
    # x64, under which a plain-int return traces to i64 and Mosaic fails
    # to legalize the index map's func.return (see ops/pallas_image.py)
    spec_m = pl.BlockSpec((M, BN), lambda i: (jnp.int32(0), i),
                          memory_space=pltpu.VMEM)
    spec_1 = pl.BlockSpec((1, BN), lambda i: (jnp.int32(0), i),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, threshold=threshold),
        out_shape=jax.ShapeDtypeStruct((8, Np), cand.dtype),
        grid=grid,
        in_specs=[spec_m, spec_m, spec_m, spec_m, spec_1, spec_1, spec_1],
        out_specs=pl.BlockSpec((8, BN), lambda i: (jnp.int32(0), i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cx, cy, cz, fm, qx, qy, qz)
    pabcd = out[0:4, :N].T
    ok = out[4, :N] > 0.5
    nd2_5 = out[5, :N]
    return pabcd, ok, nd2_5
