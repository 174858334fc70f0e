"""Batched image sampling: patches, gradients, Shi-Tomasi scores.

TPU-native equivalents of the reference's per-pixel loops:
  - `extract_patches`  = LidarSelector::getpatch (lidar_selection.cpp:
    119-140): scale-strided bilinear patch extraction; the integer
    anchor is floor(px/scale)*scale and the bilinear weights come from
    the scale-normalized subpixel remainder.
  - `patches_and_grads` = the sampling + centered-difference gradients
    of UpdateState's inner loop (lidar_selection.cpp:805-832).
  - `shi_tomasi` = vk::shiTomasiScore (rpg_vikit): min-eigenvalue of
    the 8x8-box structure tensor at integer pixel positions.

All functions are batched over the leading point axis and gather with
clamped indices (callers gate with in-frame borders first, matching the
reference's isInFrame margins).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    yi = jnp.clip(yi, 0, H - 1)
    xi = jnp.clip(xi, 0, W - 1)
    return img[yi, xi]


def bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at float pixel coords uv (..., 2) [u=col, v=row]."""
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    au = u - u0
    av = v - v0
    tl = _gather(img, v0, u0)
    tr = _gather(img, v0, u0 + 1)
    bl = _gather(img, v0 + 1, u0)
    br = _gather(img, v0 + 1, u0 + 1)
    return (
        (1 - au) * (1 - av) * tl
        + au * (1 - av) * tr
        + (1 - au) * av * bl
        + au * av * br
    )


def _anchor_weights(pc: jnp.ndarray, scale: jnp.ndarray):
    """getpatch's anchor/weight scheme: integer anchor at
    floor(px/scale)*scale, weights from the scale-normalized remainder."""
    u, v = pc[..., 0], pc[..., 1]
    u_i = jnp.floor(u / scale).astype(jnp.int32) * scale
    v_i = jnp.floor(v / scale).astype(jnp.int32) * scale
    su = (u - u_i) / scale
    sv = (v - v_i) / scale
    w_tl = (1.0 - su) * (1.0 - sv)
    w_tr = su * (1.0 - sv)
    w_bl = (1.0 - su) * sv
    w_br = su * sv
    return u_i, v_i, (w_tl, w_tr, w_bl, w_br)


def extract_patches(
    img: jnp.ndarray, pc: jnp.ndarray, patch_size: int, scale
) -> jnp.ndarray:
    """getpatch for a batch: (K, 2) centers -> (K, P, P) patches.

    `scale` is 1<<level (int array or scalar). Output[x, y] follows the
    reference layout: x runs over rows (v), y over columns (u)."""
    scale = jnp.asarray(scale, jnp.int32)
    if scale.ndim == 0:
        scale = jnp.broadcast_to(scale, pc.shape[:-1])
    u_i, v_i, (w_tl, w_tr, w_bl, w_br) = _anchor_weights(pc, scale)
    P = patch_size
    half = P // 2
    # one (P+1)x(P+1) strided gather; the 4 bilinear corners are static
    # slices of it (index-identical to 4 separate gathers, incl. clamp)
    ext = jnp.arange(P + 1) - half
    s = scale[:, None, None]
    rows = v_i[:, None, None] + ext[None, :, None] * s
    cols = u_i[:, None, None] + ext[None, None, :] * s
    K = u_i.shape[0]
    R = _gather(
        img,
        jnp.broadcast_to(rows, (K, P + 1, P + 1)),
        jnp.broadcast_to(cols, (K, P + 1, P + 1)),
    )
    w = lambda a: a[:, None, None]
    return (
        w(w_tl) * R[:, :P, :P]
        + w(w_tr) * R[:, :P, 1:]
        + w(w_bl) * R[:, 1:, :P]
        + w(w_br) * R[:, 1:, 1:]
    )


def patches_and_grads(
    img: jnp.ndarray, pc: jnp.ndarray, patch_size: int, scale
):
    """UpdateState's fused sample+gradient pass (lidar_selection.cpp:
    805-832): returns (val, du, dv), each (K, P, P).

    du/dv are the 0.5*(I(+scale)-I(-scale)) centered differences of the
    *bilinear-weighted strided* samples, then divided by scale
    (Jimg *= 1/scale, :826)."""
    scale = jnp.asarray(scale, jnp.int32)
    if scale.ndim == 0:
        scale = jnp.broadcast_to(scale, pc.shape[:-1])
    u_i, v_i, (w_tl, w_tr, w_bl, w_br) = _anchor_weights(pc, scale)
    P = patch_size
    half = P // 2
    # Every sample this function needs (patch, +/-1-stride neighbors for
    # the centered differences, and their bilinear corners) lies on ONE
    # (P+3)x(P+3) scale-strided grid around the anchor — gather it once
    # and take static slices, instead of 20 separate (K,P,P) gathers
    # (5 sample positions x 4 bilinear corners). Indices are formed
    # identically and clamped identically, so this is exact-equal.
    ext = jnp.arange(P + 3) - (half + 1)  # (P+3,)
    s = scale[:, None, None]
    rows = v_i[:, None, None] + ext[None, :, None] * s  # (K, P+3, 1)
    cols = u_i[:, None, None] + ext[None, None, :] * s  # (K, 1, P+3)
    K = u_i.shape[0]
    R = _gather(
        img,
        jnp.broadcast_to(rows, (K, P + 3, P + 3)),
        jnp.broadcast_to(cols, (K, P + 3, P + 3)),
    )
    w = lambda a: a[:, None, None]

    def sample(a, b):
        # offsets in stride units: a,b in {-1,0,1}; grid origin at idx 1
        r0, c0 = 1 + a, 1 + b
        return (
            w(w_tl) * R[:, r0 : r0 + P, c0 : c0 + P]
            + w(w_tr) * R[:, r0 : r0 + P, c0 + 1 : c0 + P + 1]
            + w(w_bl) * R[:, r0 + 1 : r0 + P + 1, c0 : c0 + P]
            + w(w_br) * R[:, r0 + 1 : r0 + P + 1, c0 + 1 : c0 + P + 1]
        )

    val = sample(0, 0)
    sf = s.astype(img.dtype)
    du = 0.5 * (sample(0, 1) - sample(0, -1)) / sf
    dv = 0.5 * (sample(1, 0) - sample(-1, 0)) / sf
    return val, du, dv


def shi_tomasi(img: jnp.ndarray, pc: jnp.ndarray) -> jnp.ndarray:
    """vk::shiTomasiScore at integer positions floor(pc): (K, 2) -> (K,).

    8x8 box of centered-difference gradients; score is the smaller
    eigenvalue of the averaged structure tensor.

    Computed from dense gradient-product maps + one 8x8 box filter over
    the image, then 3 gathers per candidate — the per-candidate window
    formulation streamed 256 random image lookups per row (2M per
    camera frame at 8k candidates) and dominated select_new_points'
    measured cost. Identical to the window version away from the image
    border (candidates are border-guarded by every caller); the box-sum
    association order differs (reduce_window tree vs sequential), a
    ~1 ulp effect."""
    half = 4
    box = 2 * half
    # vk::shiTomasiScore uses RAW differences dx = I[x+1]-I[x-1] and
    # normalizes the structure-tensor sums by 2*box_area; with the
    # 0.5-scaled gradients below that equals dividing by area/2. (A
    # previous area divisor made every score exactly HALF of vikit's —
    # harmless in-repo, where all uses are relative comparisons, but
    # wrong for any threshold copied from the reference.)
    area = box * box / 2.0
    H, W = img.shape
    # dense centered-difference gradients with index-clamp edge
    # semantics (pad-edge == clamped +-1 sample)
    ip = jnp.pad(img, 1, mode="edge")
    gx = 0.5 * (ip[1:-1, 2:] - ip[1:-1, :-2])
    gy = 0.5 * (ip[2:, 1:-1] - ip[:-2, 1:-1])

    def box8(x):
        # window rooted at (v-half, u-half), clamped like the gathers
        xp = jnp.pad(x, ((half, half - 1), (half, half - 1)), mode="edge")
        return jax.lax.reduce_window(
            xp, jnp.asarray(0, x.dtype), jax.lax.add,
            (box, box), (1, 1), "VALID",
        )

    dXX = box8(gx * gx) / area
    dYY = box8(gy * gy) / area
    dXY = box8(gx * gy) / area
    u = jnp.clip(jnp.floor(pc[..., 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.floor(pc[..., 1]).astype(jnp.int32), 0, H - 1)
    xx = dXX[v, u]
    yy = dYY[v, u]
    xy = dXY[v, u]
    tr = xx + yy
    det = xx * yy - xy * xy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    return 0.5 * (tr - disc)


def affine_warp_patches(
    ref_imgs: jnp.ndarray,  # (R, H, W) reference image ring
    slots: jnp.ndarray,  # (K,) int32 ring slot per point
    A_ref_cur: jnp.ndarray,  # (K, 2, 2) inverse warp (cur->ref pixels)
    px_ref: jnp.ndarray,  # (K, 2) reference pixel
    patch_size: int,
    search_level: jnp.ndarray,  # (K,) int32
    pyramid_level: int,
) -> jnp.ndarray:
    """LidarSelector::warpAffine batched over points (lidar_selection.
    cpp:258-296): for patch offset d (in units of the current patch
    grid), sample ref image at px_ref + A_ref_cur @ (d * 2^(search+pyr)).
    Out-of-image samples produce 0 (reference sets 0). -> (K, P, P)."""
    K = px_ref.shape[0]
    half = patch_size // 2
    # compute dtype comes from the pixel coords, NOT the ring: the ring
    # may be stored quantized (u8, capacity.frame_ring_u8) and integer
    # arithmetic would corrupt the bilinear weights
    cdt = px_ref.dtype
    offs = (jnp.arange(patch_size) - half).astype(cdt)
    sc = (1 << pyramid_level) * (2 ** search_level.astype(jnp.int32)).astype(
        cdt
    )  # (K,)
    # patch coords: x runs over cols (u), y over rows (v); layout [y, x]
    dx = offs[None, None, :] * sc[:, None, None]  # (K, 1, P) u-offset
    dy = offs[None, :, None] * sc[:, None, None]  # (K, P, 1) v-offset
    du = A_ref_cur[:, 0, 0][:, None, None] * dx + A_ref_cur[:, 0, 1][:, None, None] * dy
    dv = A_ref_cur[:, 1, 0][:, None, None] * dx + A_ref_cur[:, 1, 1][:, None, None] * dy
    u = px_ref[:, 0][:, None, None] + du  # (K, P, P)
    v = px_ref[:, 1][:, None, None] + dv
    H, W = ref_imgs.shape[1:]
    inb = (u >= 0) & (v >= 0) & (u < W - 1) & (v < H - 1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    au = u - u0
    av = v - v0
    sl = slots[:, None, None]

    def g(rr, cc):
        rr = jnp.clip(rr, 0, H - 1)
        cc = jnp.clip(cc, 0, W - 1)
        return ref_imgs[sl, rr, cc].astype(cdt)

    val = (
        (1 - au) * (1 - av) * g(v0, u0)
        + au * (1 - av) * g(v0, u0 + 1)
        + (1 - au) * av * g(v0 + 1, u0)
        + au * av * g(v0 + 1, u0 + 1)
    )
    return jnp.where(inb, val, 0.0)
