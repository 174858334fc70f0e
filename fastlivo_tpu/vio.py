"""VIO: sparse-direct photometric iterated-EKF update (the visual half).

TPU-native re-design of the reference `LidarSelector`
(reference: src/lidar_selection.cpp). Per camera frame (`detect`,
:1027-1075), four phases, each a batched jitted kernel over the SoA
visual map (visual_map.py):

  1. `select_tracked` = addFromSparseMap (:346-587): project the last
     LiDAR frame's world cloud to a sparse depth image, gather visual-map
     points from the scan's 0.5 m voxels, keep the closest point per
     40-px grid cell, gate by depth continuity (Δ>1.5 m) and best-view
     reference observation (cos>0.5), affine-warp the reference patch at
     3 pyramid levels, photometric outlier gate.
  2. `select_new_points` = addSparseMap (:142-202): per grid cell, the
     Shi-Tomasi-max scan point that beats the cell's best map-point
     score becomes a new map point.
  3. `photometric_update` = ComputeJ/UpdateState (:743-983):
     coarse-to-fine (level 2->0) iterated EKF on patch residuals with
     the reference's chain rule (Jimg·Jdpi·[pf]x -> JdR|Jdt), the
     error-monotonicity rollback, and P <- (I-G)P at the end.
  4. `prep_observations` + visual_map.add_observations = addObservation
     (:913-965) with the posterior pose.

Documented deviations from the reference:
  - new-point candidates come from the 0.2 m-downsampled cloud (the
    reference scans the full cloud; per-cell Shi-Tomasi maxima are
    nearly identical and the candidate batch stays bounded);
  - reference images live in a refcounted pool with shared_ptr
    retention semantics (visual_map.py).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import camera as cam_mod
from . import visual_map as vmap_mod
from .config import Config
from .ops import image as img_ops
from .ops import linalg as linalg_ops
from .ops import so3
from .ops.voxel_filter import voxel_downsample, voxel_downsample_device
from .state import DIM_STATE, NavState

CONV_ROT_DEG = 0.001  # lidar_selection.cpp:885
CONV_POS_CM = 0.001
DEPTH_CONT_GATE = 1.5  # :504
MIN_COS = 0.5  # point.cpp:171


class TrackedSet(NamedTuple):
    """The SubSparseMap equivalent (common_lib.h:263-293): one slot per
    image grid cell."""

    idx: jnp.ndarray  # (G,) visual-map point index
    pos: jnp.ndarray  # (G, 3) world position
    patch: jnp.ndarray  # (G, 3, P, P) warped ref patch pyramid
    search_level: jnp.ndarray  # (G,) int32
    valid: jnp.ndarray  # (G,) bool
    cell_value: jnp.ndarray  # (G,) f32 best map-point score per cell
    errors: jnp.ndarray  # (G,) f32 photometric error (updated by EKF)


def _pack_min(value_bits: jnp.ndarray, row: jnp.ndarray,
              cap: int | None = None) -> jnp.ndarray:
    """Pack (positive-f32-bits, row) into int64 for scatter-min argmin.

    The row index gets the low 20 bits; larger batches would silently
    corrupt the packed value ordering, so the capacity is enforced at
    trace time (shapes are static under jit). `cap` overrides the
    capacity check when `row` carries GLOBAL ids of a sharded batch
    (its local shape understates the id range)."""
    assert (cap if cap is not None else row.shape[-1]) < (1 << 20), (
        f"_pack_min row capacity exceeded: {cap or row.shape[-1]} >= 2^20"
    )
    return (value_bits.astype(jnp.int64) << 20) | row.astype(jnp.int64)


@jax.jit
def _to_gray_dev(img: jnp.ndarray) -> jnp.ndarray:
    """BGR->gray on device, mirroring Vio._to_gray's numpy semantics
    bit-for-bit: integer frames promote to f64 (numpy's int*pyfloat
    rule), float frames stay in their own dtype (pyfloat scalars don't
    promote them), same association order, then the f32 cast
    (detect :1037)."""
    wt = jnp.float64 if jnp.issubdtype(img.dtype, jnp.integer) else img.dtype
    b = img[..., 0].astype(wt)
    g = img[..., 1].astype(wt)
    r = img[..., 2].astype(wt)
    return (0.114 * b + 0.587 * g + 0.299 * r).astype(jnp.float32)


@jax.jit
def _cast_gray_dev(img: jnp.ndarray) -> jnp.ndarray:
    return img.astype(jnp.float32)


def _bilinear_resize(img: np.ndarray, H: int, W: int) -> np.ndarray:
    """Host-side bilinear resample to (H, W) with half-pixel-centered
    sampling (cv::resize INTER_LINEAR convention), for image sizes that
    are not the exact 2x the camera model expects."""
    h, w = img.shape
    ys = np.clip((np.arange(H) + 0.5) * h / H - 0.5, 0, h - 1)
    xs = np.clip((np.arange(W) + 0.5) * w / W - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None].astype(np.float32)
    fx = (xs - x0)[None, :].astype(np.float32)
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def _f32_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving int bits of non-negative f32."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("grid_size", "patch_size", "gw", "gh", "ncc_en",
                     "axis_name", "vmap_axis"),
)
def select_tracked(
    vm: vmap_mod.VisualMap,
    cam: cam_mod.Camera,
    rcw: jnp.ndarray,  # (3,3) world->cam (f32)
    pcw: jnp.ndarray,  # (3,)
    img: jnp.ndarray,  # (H, W) f32 current grayscale
    pg: jnp.ndarray,  # (M, 3) downsampled world cloud (0.2 m)
    pg_mask: jnp.ndarray,  # (M,)
    vox: jnp.ndarray,  # (Nv, 3) int32 unique scan voxels
    vox_mask: jnp.ndarray,  # (Nv,)
    outlier_threshold: float,
    ncc_thre: float,
    grid_size: int,
    patch_size: int,
    gw: int,
    gh: int,
    ncc_en: bool = False,
    axis_name: str | None = None,
    vmap_axis: str | None = None,
) -> TrackedSet:
    """addFromSparseMap (lidar_selection.cpp:346-587) — see module doc.

    Multi-chip: with `axis_name` set (called inside shard_map, ALL
    inputs replicated), the two row-heavy stages are partitioned by
    `lax.axis_index` over the mesh axis: each device scores NC/n
    candidate points (phase 2; the per-cell argmin/argmax combine with
    pmin/pmax — bit-identical to the single-device scatter-min because
    min is commutative and the packed keys are unique), then warps and
    gates its OWN slice of G/n grid cells (phases 3-5). The returned
    TrackedSet rows (idx/pos/patch/search_level/valid/errors) are that
    padded cell slice — feed them straight to
    `photometric_update_levels(axis_name=...)` and `all_gather` what
    the map-maintenance scatters need; `cell_value` stays full-(G,)
    replicated. With axis_name=None the output is unchanged.

    `vmap_axis` (requires axis_name; the --sharded-map product mode):
    `vm.imgs` is this device's CONTIGUOUS SLAB of the reference-image
    pool (global slot s lives on device s // (R/n)); the warp phase
    gathers owner-locally, masks, and psum-combines the patch pyramids
    (~150 KB over ICI), so the 84 MB pool no longer replicates.
    Phases 3-5 then run at full G on every device (G is tiny) and the
    returned tracked set is cell-sliced at the END — identical output
    contract."""
    if vmap_axis is not None and axis_name is None:
        raise ValueError("vmap_axis (sharded visual map) requires "
                         "axis_name — it only runs inside shard_map")
    H, W = img.shape
    G = gw * gh
    P = patch_size
    half = P // 2
    border = (half + 1) * 8  # isInFrame margin (:399, :446)
    campos = -pcw @ rcw

    # --- phase 1: sparse depth image (:378-411, plain pinhole) ----------
    pt_c = pg @ rcw.T + pcw
    z = pt_c[:, 2]
    u = cam.fx * pt_c[:, 0] / z + cam.cx
    v = cam.fy * pt_c[:, 1] / z + cam.cy
    ok_d = pg_mask & (z > 0) & (u >= border) & (u < W - border) & (v >= border) & (v < H - border)
    rows = jnp.where(ok_d, v.astype(jnp.int32), H)
    cols = jnp.where(ok_d, u.astype(jnp.int32), W)
    depth = jnp.zeros((H, W), img.dtype).at[rows, cols].set(
        jnp.where(ok_d, z, 0.0), mode="drop"
    )

    # --- phase 2: candidate gather + per-cell closest winner (:423-467) --
    cidx, cmask = vmap_mod.gather_voxel_points(vm, vox, vox_mask)
    cidx = cidx.reshape(-1)
    cmask = cmask.reshape(-1)
    NC = cidx.shape[0]
    if axis_name is None:
        cidx_l, cmask_l = cidx, cmask
        rows_l = jnp.arange(NC)
        NCp = NC
    else:
        # row-partition the candidate batch: this device scores rows
        # [i*L, (i+1)*L) of the zero-padded global batch; keys carry
        # GLOBAL row ids so the pmin-combined winner indexes `cidx`
        nd = jax.lax.psum(1, axis_name)  # static axis size
        i_dev = jax.lax.axis_index(axis_name)
        L = -(-NC // nd)
        NCp = L * nd
        cidx_l = jax.lax.dynamic_slice_in_dim(
            jnp.pad(cidx, (0, NCp - NC)), i_dev * L, L)
        cmask_l = jax.lax.dynamic_slice_in_dim(
            jnp.pad(cmask, (0, NCp - NC)), i_dev * L, L)
        rows_l = jax.lax.dynamic_slice_in_dim(jnp.arange(NCp), i_dev * L, L)
    safe = jnp.clip(cidx_l, 0, vm.pos.shape[0] - 1)
    cpos = vm.pos[safe]
    cvalue = vm.value[safe]
    c_cam = cpos @ rcw.T + pcw
    front = c_cam[:, 2] > 0
    pc = cam_mod.world2cam(cam, c_cam)
    inf = cam_mod.is_in_frame(cam, pc, border)
    ok = cmask_l & front & inf
    cell = (pc[:, 0] / grid_size).astype(jnp.int32) * gh + (
        pc[:, 1] / grid_size
    ).astype(jnp.int32)
    cell = jnp.clip(cell, 0, G - 1)
    dist = jnp.linalg.norm(campos[None, :] - cpos, axis=-1)
    key = _pack_min(_f32_bits(dist), rows_l, cap=NCp)
    key = jnp.where(ok, key, jnp.int64(0x7FFFFFFFFFFFFFFF))
    cell_min = (
        jnp.full(G, 0x7FFFFFFFFFFFFFFF, jnp.int64)
        .at[jnp.where(ok, cell, G)]
        .min(key, mode="drop")
    )
    # best map-point value per cell (map_value, :460-463)
    cell_value = (
        jnp.zeros(G, img.dtype)
        .at[jnp.where(ok, cell, G)]
        .max(jnp.where(ok, cvalue, 0.0), mode="drop")
    )
    if axis_name is not None:
        cell_min = jax.lax.pmin(cell_min, axis_name)
        cell_value = jax.lax.pmax(cell_value, axis_name)
    has_map = cell_min < 0x7FFFFFFFFFFFFFFF
    win_row = (cell_min & jnp.int64(0xFFFFF)).astype(jnp.int32)  # (G,)

    wsafe = jnp.clip(win_row, 0, NC - 1)
    widx = cidx[wsafe]
    if axis_name is None:
        wpos = cpos[wsafe]
        wcam = c_cam[wsafe]
        wpc = pc[wsafe]
    else:
        # the winner row is global but this device computed only its
        # candidate slice: re-derive the G winners' geometry from the
        # replicated map (identical per-row ops to phase 2, so values
        # match the single-device gather bit-for-bit)
        wpos = vm.pos[jnp.clip(widx, 0, vm.pos.shape[0] - 1)]
        wcam = wpos @ rcw.T + pcw
        wpc = cam_mod.world2cam(cam, wcam)
        # phases 3-5 are per-cell: this device takes its G/n cell slab
        Gl = -(-G // nd)
        padg = Gl * nd - G

        def _cells(a):
            pw = [(0, padg)] + [(0, 0)] * (a.ndim - 1)
            return jax.lax.dynamic_slice_in_dim(jnp.pad(a, pw),
                                                i_dev * Gl, Gl)

        if vmap_axis is None:
            has_map = _cells(has_map)
            widx = _cells(widx)
            wpos = _cells(wpos)
            wcam = _cells(wcam)
            wpc = _cells(wpc)
        # with vmap_axis, phases 3-5 stay at FULL G on every device
        # (the warp must be owner-masked over the sharded pool and
        # psum-combined); the tracked set is sliced at the end instead

    # --- phase 3: depth-continuity gate (:489-510) ------------------------
    offs = jnp.arange(-half, half + 1)
    r0 = wpc[:, 1].astype(jnp.int32)
    c0 = wpc[:, 0].astype(jnp.int32)
    rr = jnp.clip(r0[:, None, None] + offs[None, :, None], 0, H - 1)
    cc = jnp.clip(c0[:, None, None] + offs[None, None, :], 0, W - 1)
    dwin = depth[rr, cc]  # (G, 2h+1, 2h+1)
    center = jnp.zeros((2 * half + 1, 2 * half + 1), bool).at[half, half].set(True)
    broke = (dwin != 0.0) & (~center[None]) & (
        jnp.abs(wcam[:, 2:3, None] - dwin) > DEPTH_CONT_GATE
    )
    depth_ok = ~jnp.any(broke, axis=(1, 2))

    # --- phase 4: reference observation + warp (:518-555) ----------------
    ref = vmap_mod.close_view_obs(vm, widx, campos, obs_axis=vmap_axis)
    t_ok = has_map & depth_ok & ref["ok"]

    depth_ref = jnp.linalg.norm(ref["campos"] - wpos, axis=-1)
    # bearing derived from the stored pixel (Feature::f = cam2world(px),
    # the exact function the stored f was computed with)
    f_ref = cam_mod.cam2world(cam, ref["px"])
    xyz_ref = f_ref * depth_ref[:, None]
    # pixel offsets on the ref image (level_ref = 0, pyramid_level = 0)
    du_px = ref["px"] + jnp.asarray([half, 0.0], img.dtype)
    dv_px = ref["px"] + jnp.asarray([0.0, half], img.dtype)
    f_du = cam_mod.cam2world(cam, du_px)
    f_dv = cam_mod.cam2world(cam, dv_px)
    xyz_du = f_du * (xyz_ref[:, 2] / f_du[:, 2])[:, None]
    xyz_dv = f_dv * (xyz_ref[:, 2] / f_dv[:, 2])[:, None]
    # T_cur_ref
    R_cr = jnp.einsum("ij,kmj->kim", rcw, ref["rcw"])  # rcw @ ref_rcw^T
    t_cr = pcw[None, :] - jnp.einsum("kim,km->ki", R_cr, ref["pcw"])

    def proj(x):
        xc = jnp.einsum("kim,km->ki", R_cr, x) + t_cr
        return cam_mod.world2cam(cam, xc)

    px_cur = proj(xyz_ref)
    px_du = proj(xyz_du)
    px_dv = proj(xyz_dv)
    A = jnp.stack(
        [(px_du - px_cur) / half, (px_dv - px_cur) / half], axis=-1
    )  # (G, 2, 2) columns
    detA = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    search_level = (detA > 3.0).astype(jnp.int32) + (detA > 12.0).astype(jnp.int32)
    # A_ref_cur = inv(A)
    inv_det = 1.0 / jnp.where(jnp.abs(detA) < 1e-12, 1e-12, detA)
    A_inv = (
        jnp.stack(
            [
                jnp.stack([A[:, 1, 1], -A[:, 0, 1]], -1),
                jnp.stack([-A[:, 1, 0], A[:, 0, 0]], -1),
            ],
            axis=-2,
        )
        * inv_det[:, None, None]
    )

    if vmap_axis is None:
        patches = jnp.stack(
            [
                img_ops.affine_warp_patches(
                    vm.imgs, ref["slot"], A_inv, ref["px"], P,
                    search_level, lvl
                )
                for lvl in range(3)
            ],
            axis=1,
        )  # (G, 3, P, P)
    else:
        # sharded pool: gather from the LOCAL slab, zero non-owned
        # rows, combine across owners (slabs are disjoint, so the psum
        # is an exact merge; ~G*3*P*P*4 B ~ 150 KB over ICI)
        Rl = vm.imgs.shape[0]
        ls = ref["slot"] - jax.lax.axis_index(vmap_axis) * Rl
        mine = (ls >= 0) & (ls < Rl)
        ls_safe = jnp.clip(ls, 0, Rl - 1)
        patches = jnp.stack(
            [
                img_ops.affine_warp_patches(
                    vm.imgs, ls_safe, A_inv, ref["px"], P,
                    search_level, lvl
                )
                for lvl in range(3)
            ],
            axis=1,
        )
        patches = jnp.where(mine[:, None, None, None], patches, 0.0)
        patches = jax.lax.psum(patches, vmap_axis)

    # --- phase 5: photometric outlier gate (:557-570) ---------------------
    cur_patch = img_ops.extract_patches(img, wpc, P, 1)
    err0 = jnp.sum((patches[:, 0] - cur_patch) ** 2, axis=(-2, -1))
    t_ok = t_ok & (err0 <= outlier_threshold * P * P)
    if ncc_en:
        a = patches[:, 0].reshape(patches.shape[0], -1)
        b = cur_patch.reshape(cur_patch.shape[0], -1)
        am = a - a.mean(-1, keepdims=True)
        bm = b - b.mean(-1, keepdims=True)
        ncc = jnp.sum(am * bm, -1) / jnp.sqrt(
            jnp.sum(am * am, -1) * jnp.sum(bm * bm, -1) + 1e-10
        )
        t_ok = t_ok & (ncc >= ncc_thre)

    if axis_name is not None and vmap_axis is not None:
        widx = _cells(widx)
        wpos = _cells(wpos)
        patches = _cells(patches)
        search_level = _cells(search_level)
        t_ok = _cells(t_ok)
        err0 = _cells(err0)
    return TrackedSet(
        idx=widx,
        pos=wpos,
        patch=patches,
        search_level=search_level,
        valid=t_ok,
        cell_value=cell_value,
        errors=err0,
    )


@functools.partial(
    jax.jit, static_argnames=("grid_size", "patch_size", "gw", "gh",
                              "axis_name")
)
def select_new_points(
    cam: cam_mod.Camera,
    rcw: jnp.ndarray,
    pcw: jnp.ndarray,
    img: jnp.ndarray,
    pg: jnp.ndarray,  # (M, 3) world cloud
    pg_mask: jnp.ndarray,
    cell_value: jnp.ndarray,  # (G,) best map-point score per cell
    grid_size: int,
    patch_size: int,
    gw: int,
    gh: int,
    axis_name: str | None = None,
):
    """addSparseMap winner selection (:150-167 + :173-195): per cell, the
    max-Shi-Tomasi scan point; added iff it beats the cell's map score.

    Returns (pos (G,3), px (G,2), f (G,3), score (G,), add_mask (G,)).

    Multi-chip: with `axis_name` set (inside shard_map, inputs
    replicated) each device Shi-Tomasi-scores M/n candidate rows and the
    per-cell argmax combines with pmin over packed keys; the G winner
    rows are re-scored from the replicated image (identical per-row
    math), so ALL outputs stay full-(G,) replicated — bit-identical to
    the single-device path."""
    H, W = img.shape
    G = gw * gh
    half = patch_size // 2
    border = (half + 1) * 8
    M = pg.shape[0]
    if axis_name is None:
        pg_l, mask_l = pg, pg_mask
        rows_l = jnp.arange(M)
        Mp = M
    else:
        nd = jax.lax.psum(1, axis_name)  # static axis size
        i_dev = jax.lax.axis_index(axis_name)
        L = -(-M // nd)
        Mp = L * nd
        pg_l = jax.lax.dynamic_slice_in_dim(
            jnp.pad(pg, ((0, Mp - M), (0, 0))), i_dev * L, L)
        mask_l = jax.lax.dynamic_slice_in_dim(
            jnp.pad(pg_mask, (0, Mp - M)), i_dev * L, L)
        rows_l = jax.lax.dynamic_slice_in_dim(jnp.arange(Mp), i_dev * L, L)
    p_cam = pg_l @ rcw.T + pcw
    z = p_cam[:, 2]
    pc = cam_mod.world2cam(cam, p_cam)
    ok = mask_l & (z > 0) & cam_mod.is_in_frame(cam, pc, border)
    score = img_ops.shi_tomasi(img, pc)
    cell = (pc[:, 0] / grid_size).astype(jnp.int32) * gh + (
        pc[:, 1] / grid_size
    ).astype(jnp.int32)
    cell = jnp.clip(cell, 0, G - 1)
    # argmax by packed scatter-min of (inverted score bits, row)
    inv_bits = jnp.int32(0x7FFFFFFF) - _f32_bits(jnp.maximum(score, 0.0))
    key = _pack_min(inv_bits, rows_l, cap=Mp)
    key = jnp.where(ok, key, jnp.int64(0x7FFFFFFFFFFFFFFF))
    cell_min = (
        jnp.full(G, 0x7FFFFFFFFFFFFFFF, jnp.int64)
        .at[jnp.where(ok, cell, G)]
        .min(key, mode="drop")
    )
    if axis_name is not None:
        cell_min = jax.lax.pmin(cell_min, axis_name)
    found = cell_min < 0x7FFFFFFFFFFFFFFF
    row = jnp.clip((cell_min & jnp.int64(0xFFFFF)).astype(jnp.int32), 0, M - 1)
    if axis_name is None:
        wscore = score[row]
        wpc = pc[row]
    else:
        # winner rows are global: re-derive their projection + score
        # from the replicated inputs (same per-row ops as above)
        w_cam = pg[row] @ rcw.T + pcw
        wpc = cam_mod.world2cam(cam, w_cam)
        wscore = img_ops.shi_tomasi(img, wpc)
    add = found & (wscore > cell_value)  # beats the map (:160)
    return pg[row], wpc, wscore, add


@functools.partial(
    jax.jit,
    static_argnames=("patch_size", "level", "max_iter", "axis_name",
                     "mixed_gain", "robust", "robust_scale"),
)
def photometric_update(
    state: NavState,
    prior: NavState,
    cam: cam_mod.Camera,
    img: jnp.ndarray,
    tr_pos: jnp.ndarray,  # (G, 3)
    tr_patch: jnp.ndarray,  # (G, 3, P, P)
    tr_slevel: jnp.ndarray,  # (G,)
    tr_valid: jnp.ndarray,  # (G,)
    Rci: jnp.ndarray,  # (3,3) f32
    Pci: jnp.ndarray,  # (3,)
    Jdphi_dR: jnp.ndarray,  # (3,3)
    Jdp_dR: jnp.ndarray,  # (3,3)
    img_point_cov: float,
    patch_size: int,
    level: int,
    max_iter: int,
    axis_name: str | None = None,
    mixed_gain: bool = False,
    robust: str = "none",
    robust_scale: float = 10.0,
):
    """UpdateState for one pyramid level (lidar_selection.cpp:743-902).

    Iterates the photometric EKF with the reference's error-monotonicity
    protocol: an iteration whose mean patch error increases rolls the
    state back and stops. Returns (state, G (18,6) f64, per-point errors,
    mean_error).

    Multi-chip: with the tracked set row-partitioned over `axis_name`
    (image + map replicated), the HtH/Htz partials and the error
    normalization are psum-all-reduced, mirroring lio.lio_update."""
    return photometric_update_levels(
        state, prior, cam, img, tr_pos, tr_patch, tr_slevel, tr_valid,
        Rci, Pci, Jdphi_dR, Jdp_dR, img_point_cov, patch_size,
        levels=(level,), max_iter=max_iter, axis_name=axis_name,
        mixed_gain=mixed_gain, robust=robust, robust_scale=robust_scale,
    )


def photometric_update_levels(
    state: NavState,
    prior: NavState,
    cam: cam_mod.Camera,
    img: jnp.ndarray,
    tr_pos: jnp.ndarray,  # (G, 3)
    tr_patch: jnp.ndarray,  # (G, 3, P, P)
    tr_slevel: jnp.ndarray,  # (G,)
    tr_valid: jnp.ndarray,  # (G,)
    Rci: jnp.ndarray,  # (3,3) f32
    Pci: jnp.ndarray,  # (3,)
    Jdphi_dR: jnp.ndarray,  # (3,3)
    Jdp_dR: jnp.ndarray,  # (3,3)
    img_point_cov: float,
    patch_size: int,
    levels: tuple = (2, 1, 0),
    max_iter: int = 10,
    axis_name: str | None = None,
    mixed_gain: bool = False,
    robust: str = "none",
    robust_scale: float = 10.0,
):
    """The coarse-to-fine UpdateState cascade in ONE while_loop.

    `robust`: optional IRLS weighting of the photometric rows —
    "huber" (k=1.345) or "tukey" (b=4.6851), residuals pre-scaled by
    `robust_scale` (`weight_scale_=10`, lidar_selection.cpp:74). The
    reference instantiates exactly these vk::robust_cost functions but
    leaves the weighting commented out (lidar_selection.cpp:75-78,
    839-842); "none" (default) reproduces the shipped behavior, the
    others complete the scaffolding as an opt-in. Weights scale the
    HᵀWH/HᵀWz rows only; the rollback error metric stays unweighted
    (patch_error is unweighted in the reference loop :843).

    The reference runs UpdateState once per pyramid level (level 2 -> 0,
    lidar_selection.cpp:1052-1066); a naive transcription is one
    while_loop per level. Here the level index is part of the loop carry:
    when a level converges / rolls back / exhausts max_iter, the carry
    advances to the next level and resets the per-level protocol state
    (last_err, rollback anchor, HtH) exactly as a fresh UpdateState call
    would — same iteration sequence, one loop. Returns
    (state, G (18,6) f64, per-point errors, mean_error, iters_total)
    where the G/errors are the LAST level's (what `detect` consumes)."""
    G_, P = tr_pos.shape[0], patch_size
    dtype = img.dtype
    f64 = jnp.float64
    lv_arr = jnp.asarray(levels, jnp.int32)
    n_lv = len(levels)
    if max_iter <= 0:
        return (state, jnp.zeros((DIM_STATE, 6), f64),
                jnp.full(G_, 1e10, dtype), jnp.asarray(1e10, f64),
                jnp.int32(0))

    def compute_err_H(rot, pos, level):
        scale = (jnp.int32(1) << level) * (2 ** tr_slevel)  # (G,) int
        rot32 = rot.astype(dtype)
        pos32 = pos.astype(dtype)
        rcw = Rci @ rot32.T
        pcw = -rcw @ pos32 + Pci
        Jdp_dt = rcw  # Rci * Rwi^T (:783)
        pf = tr_pos @ rcw.T + pcw  # (G, 3)
        front = pf[:, 2] > 1e-6
        pc = cam_mod.world2cam(cam, pf)
        val, du, dv = img_ops.patches_and_grads(img, pc, P, scale)
        res = val - tr_patch[:, level]  # (G, P, P)
        # Jdpi (G,2,3) (:92-103)
        zi = 1.0 / jnp.where(front, pf[:, 2], 1.0)
        zi2 = zi * zi
        fx, fy = cam.fx, cam.fy
        Jdpi = jnp.stack(
            [
                jnp.stack([fx * zi, jnp.zeros_like(zi), -fx * pf[:, 0] * zi2], -1),
                jnp.stack([jnp.zeros_like(zi), fy * zi, -fy * pf[:, 1] * zi2], -1),
            ],
            axis=-2,
        )
        # chain rule (:826-832), factored so only ONE einsum touches a
        # (G,P,P,*) tensor: h = Jimg·Jdpi·[p_hat·Jdphi_dR − Jdp_dR | −Jdp_dt]
        # (the original JIp/Jdphi/JdR/Jdt formulation is 4 big einsums;
        # composite-executable per-op cost makes op count the latency)
        p_hat = so3.skew(pf)  # (G,3,3)
        Mg = jnp.concatenate(
            [
                jnp.einsum("gde,ef->gdf", p_hat, Jdphi_dR) - Jdp_dR,
                jnp.broadcast_to(-Jdp_dt, p_hat.shape),
            ],
            axis=-1,
        )  # (G,3,6)
        N = jnp.einsum("gcd,gdf->gcf", Jdpi, Mg)  # (G,2,6)
        Jimg = jnp.stack([du, dv], axis=-1)  # (G,P,P,2)
        h = jnp.einsum("gxyc,gcf->gxyf", Jimg, N)  # (G,P,P,6)
        w = (tr_valid & front).astype(dtype)[:, None, None]
        res_w = res * w
        n_meas = jnp.maximum(jnp.sum(w) * P * P, 1.0)
        perr = jnp.sum(res_w * res_w, axis=(1, 2))  # (G,)
        err = jnp.sum(perr) / n_meas
        if robust == "none":
            wr = w[..., None]
        else:
            # IRLS row weight on |res|/weight_scale (vk::robust_cost
            # defaults; the mask w is 0/1 so multiplying composes)
            t = jnp.abs(res) / jnp.asarray(robust_scale, dtype)
            if robust == "huber":
                k = jnp.asarray(1.345, dtype)
                wh = jnp.minimum(1.0, k / jnp.maximum(t, 1e-12))
            elif robust == "tukey":
                b = jnp.asarray(4.6851, dtype)
                u = jnp.clip(1.0 - (t / b) ** 2, 0.0, 1.0)
                wh = u * u
            else:
                raise ValueError(f"robust={robust!r}")
            wr = (w * wh)[..., None]
        hw = (h * wr).reshape(-1, 6)
        # [HᵀH₆ | Hᵀz] in one (6,7) matmul (and one psum)
        rhs = jnp.concatenate(
            [h.reshape(-1, 6), res.reshape(-1, 1)], axis=1
        )
        HT = hw.T @ rhs  # (6,7)
        if axis_name is not None:
            HT = jax.lax.psum(HT, axis_name)
            err_num = jax.lax.psum(jnp.sum(perr), axis_name)
            n_all = jax.lax.psum(n_meas, axis_name)
            err = err_num / jnp.maximum(n_all, 1.0)
        return err, HT[:, 0:6], HT[:, 6], perr

    # loop-invariant f64 prior terms, hoisted out of the body (the relay
    # charges per executed op in composite executables)
    P_ = prior.cov.astype(f64) / jnp.asarray(img_point_cov, f64)
    prior_x = jnp.concatenate(
        [prior.pos, prior.vel, prior.bg, prior.ba, prior.grav]
    )  # (15,) f64
    gain = (linalg_ops.kalman_gain6_mixed if mixed_gain
            else linalg_ops.kalman_gain6)

    def body(carry):
        (it_l, its, li, rot, x, o_rot, o_x, last_err, HTH6b, perr_out,
         done) = carry
        err, HTH6, HTz, perr = compute_err_H(rot, x[0:3], lv_arr[li])
        improved = err <= last_err

        HTH6 = HTH6.astype(f64)
        K16 = gain(P_, HTH6)
        vec = jnp.concatenate([so3.log(rot.T @ prior.rot), prior_x - x])
        # == -K16·HTz + vec - (K16·HTH6)·vec[:6], with K16 factored out
        sol = vec - K16 @ (HTz.astype(f64) + HTH6 @ vec[0:6])

        n_rot = rot @ so3.exp(sol[0:3])
        n_x = x + sol[3:18]
        conv = (jnp.linalg.norm(sol[0:3]) * 57.3 < CONV_ROT_DEG) & (
            jnp.linalg.norm(sol[3:6]) * 100.0 < CONV_POS_CM
        )

        # improved: save current as rollback point, apply solution
        # not improved: roll back to old state and stop (:889-892)
        sel = lambda a, b: jnp.where(improved, a, b)
        rot2, x2 = sel(n_rot, o_rot), sel(n_x, o_x)
        o_rot2, o_x2 = sel(rot, o_rot), sel(x, o_x)
        last_err2 = jnp.where(improved, err, last_err)
        HTH6b2 = jnp.where(improved, HTH6, HTH6b)
        perr2 = jnp.where(improved, perr, perr_out)

        # level transition: this level stops on rollback / convergence /
        # iteration budget; the next level starts from a fresh
        # UpdateState protocol state (:1052-1066 call boundary)
        level_done = (~improved) | conv | (it_l + 1 >= max_iter)
        done2 = done | (level_done & (li == n_lv - 1))
        advance = level_done & ~done2
        return (
            jnp.where(level_done, 0, it_l + 1),
            its + 1,
            jnp.where(advance, li + 1, li),
            rot2, x2,
            jnp.where(advance, rot2, o_rot2),
            jnp.where(advance, x2, o_x2),
            jnp.where(advance, jnp.asarray(1e10, f64), last_err2),
            jnp.where(advance, jnp.zeros((6, 6), f64), HTH6b2),
            jnp.where(advance, jnp.full(G_, 1e10, dtype), perr2),
            done2,
        )

    x0 = jnp.concatenate(
        [state.pos, state.vel, state.bg, state.ba, state.grav]
    )
    init = (
        jnp.int32(0), jnp.int32(0), jnp.int32(0),
        state.rot, x0, state.rot, x0,
        jnp.asarray(1e10, f64),
        jnp.zeros((6, 6), f64),
        jnp.full(G_, 1e10, dtype),
        jnp.bool_(False),
    )
    out = jax.lax.while_loop(lambda c: ~c[-1], body, init)
    (_it_l, it, _li, rot, x, _o_rot, _o_x, last_err, HTH6b, perr,
     _done) = out
    # G = K·HᵀH of the last accepted iteration, reconstructed ONCE here
    # instead of materializing an (18,6) product every iteration; zero
    # when nothing was tracked (HTH6b = 0 ⇒ K·0 = 0)
    Gmat = gain(P_, HTH6b) @ HTH6b
    new_state = NavState(rot, x[0:3], x[3:6], x[6:9], x[9:12], x[12:15],
                         state.cov)
    return new_state, Gmat, perr, last_err, it


def _dedup_voxels(pg: jnp.ndarray, pg_mask: jnp.ndarray, max_vox: int):
    """Sort-free dedup + compaction of the scan cloud's 0.5 m voxel
    keys — the sub_feat_map key set (addFromSparseMap :361-380).

    Linear-probed spatial hash: each round, unresolved rows scatter-min
    their row id at slot (h+round); a row whose slot winner carries the
    SAME key is resolved (the winner represents the key), winners are
    kept, and rows whose winner holds a DIFFERENT key (slot collision
    between distinct keys) re-compete at the next probe offset. After
    four rounds the still-unresolved leftovers are kept verbatim —
    possibly duplicates, at ~p^4 collision probability — so every
    unique key always survives. A cumsum compacts survivors into the
    (max_vox,) output. O(M) scatter/gather ops vs the O(M log M) s64
    sort np.unique semantics required; downstream consumers are
    duplicate-idempotent (select_tracked's per-cell scatter-argmin), so
    surviving duplicates are exact."""
    keys = vmap_mod.voxel_of(pg)  # (M, 3) int32
    M = keys.shape[0]
    TB = 1 << int(M).bit_length()  # 2M hash slots (static)
    h = (
        (keys[:, 0] * jnp.int32(73856093))
        ^ (keys[:, 1] * jnp.int32(19349663))
        ^ (keys[:, 2] * jnp.int32(83492791))
    ) & jnp.int32(TB - 1)
    rid = jnp.arange(M, dtype=jnp.int32)
    rid_m = jnp.where(pg_mask, rid, M)
    resolved = ~pg_mask
    is_winner = jnp.zeros(M, bool)
    for p in range(4):
        slot_p = (h + p) & jnp.int32(TB - 1)
        contend = jnp.where(resolved, M, rid_m)
        win = jnp.full(TB, M, jnp.int32).at[slot_p].min(
            contend, mode="drop"
        )
        w = win[slot_p]
        same_key = jnp.all(keys == keys[jnp.clip(w, 0, M - 1)], axis=-1)
        is_winner = is_winner | (~resolved & (w == rid))
        resolved = resolved | (~resolved & (w < M) & same_key)
    keep = pg_mask & (is_winner | ~resolved)
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    out_idx = jnp.where(keep & (rank < max_vox), rank, max_vox)
    vox = jnp.zeros((max_vox, 3), jnp.int32).at[out_idx].set(
        keys, mode="drop"
    )
    vmask = jnp.zeros(max_vox, bool).at[out_idx].set(True, mode="drop")
    return vox, vmask


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_size", "patch_size", "gw", "gh", "ncc_en", "max_iter",
        "max_pg", "robust", "axis_name", "push_inline", "vmap_axis",
    ),
)
def vio_frame_step(
    vm: vmap_mod.VisualMap,
    cam: cam_mod.Camera,
    state: NavState,
    prior: NavState,
    gray: jnp.ndarray,  # (H, W) f32
    meta: jnp.ndarray,  # (2,) int32 [n_cloud_points, frame_id] — one
    # packed upload instead of a (R,) mask transfer + a scalar (each
    # relay device_put costs ~2 ms of service regardless of size)
    cloud: jnp.ndarray,  # (R, 3) world cloud of the current scan
    Rci: jnp.ndarray,
    Pci: jnp.ndarray,
    Jdphi_dR: jnp.ndarray,
    Jdp_dR: jnp.ndarray,
    outlier_threshold,
    ncc_thre,
    img_point_cov,
    *,
    grid_size: int,
    patch_size: int,
    gw: int,
    gh: int,
    ncc_en: bool,
    max_iter: int,
    max_pg: int,
    robust: str = "none",
    axis_name: str | None = None,
    push_inline: bool = True,
    vmap_axis: str | None = None,
):
    """The ENTIRE image frame in one dispatch — `detect`
    (lidar_selection.cpp:1027-1075) fused: image pool push, device voxel
    filter of the scan cloud, visible-voxel set, tracked-point selection
    + patch warp, new-point selection, 3-level coarse-to-fine iterated
    photometric EKF, covariance contraction, observation maintenance and
    new-point insertion. One host->device round trip per camera frame
    (the lidar path's frame_step.lidar_frame_step equivalent).

    With zero tracked points the photometric stages are exact no-ops by
    construction (all-masked rows give HtH = Htz = 0, so the gain pulls
    the state to the prior — which it equals at entry — and Gmat = 0
    leaves the covariance untouched), matching the staged path's skip.

    Returns (state', vmap', tracked_idx, tracked_valid, obs_px,
    per-point errors, mean_err, n_tracked, n_added, iters, stats).

    `stats` packs [n_tracked, n_added, mean_err, iters, rcw'(9),
    pcw'(3), 0-pad, n_pts] (f64, (29,), zero-padded to the lidar stats row's
    width for the block-read collector) — every host-needed scalar plus
    the posterior world->camera pose in ONE device->host transfer;
    reading the pieces separately cost ~5 blocking relay round trips
    (~30-65 ms each) per interactive camera frame."""
    if vmap_axis is not None and axis_name is None:
        raise ValueError("vmap_axis (sharded visual map) requires "
                         "axis_name — it only runs inside shard_map")
    f32 = gray.dtype
    fid = meta[1]
    cloud_mask = jnp.arange(cloud.shape[0]) < meta[0]
    # `push_inline=False` (FASTLIVO_VIO_SPLIT_PUSH): the caller already
    # pushed the frame into the pool as its own chained dispatch — a
    # relay-pricing accommodation (docs/PERF_ANALYSIS round 5). With
    # `vmap_axis` (--sharded-map), the slot choice runs replicated from
    # the replicated metadata and only the OWNER writes its local pool
    # slab (img_fid updates replicated — it is the pool's directory).
    if not push_inline:
        vm2 = vm
    elif vmap_axis is None:
        vm2 = vmap_mod.push_image(vm, gray, fid)
    else:
        slot = vmap_mod.push_slot(vm, fid, obs_axis=vmap_axis)
        Rl = vm.imgs.shape[0]
        ls = slot - jax.lax.axis_index(vmap_axis) * Rl
        img_w = gray
        if jnp.issubdtype(vm.imgs.dtype, jnp.integer):
            img_w = jnp.round(jnp.clip(gray, 0.0, 255.0))
        w_slot = jnp.where((ls >= 0) & (ls < Rl), ls, Rl)
        vm2 = vm._replace(
            imgs=vm.imgs.at[w_slot].set(
                img_w.astype(vm.imgs.dtype), mode="drop"),
            img_fid=vm.img_fid.at[slot].set(fid),
        )
    pg, pg_mask = voxel_downsample_device(cloud, cloud_mask, 0.2, max_pg)
    # sub_feat_map voxel set (addFromSparseMap :361-380), deduplicated
    # sort-free (see _dedup_voxels; the lexicographic sorted-unique this
    # replaced was a ~30 ms 8k-row s64 device sort per camera frame).
    # Deduplication here is a SHAPE optimization, not a correctness
    # requirement — duplicate voxel queries yield duplicate candidate
    # rows pointing at the same map points and the per-cell
    # scatter-argmin in select_tracked picks the identical winner — so
    # the residual duplicates the hash pass keeps on slot collisions
    # are harmless, while the candidate batch shrinks to half of max_pg
    # (the degraded relay prices executables by array shape).
    vox, vox_mask = _dedup_voxels(pg, pg_mask, max_pg // 2)

    rot32 = state.rot.astype(f32)
    pos32 = state.pos.astype(f32)
    rcw = Rci @ rot32.T
    pcw = -rcw @ pos32 + Pci

    tracked = select_tracked(
        vm2, cam, rcw, pcw, gray, pg, pg_mask, vox, vox_mask,
        outlier_threshold=outlier_threshold, ncc_thre=ncc_thre,
        grid_size=grid_size, patch_size=patch_size, gw=gw, gh=gh,
        ncc_en=ncc_en, axis_name=axis_name, vmap_axis=vmap_axis,
    )
    npos, npx, nscore, nadd = select_new_points(
        cam, rcw, pcw, gray, pg, pg_mask, tracked.cell_value,
        grid_size=grid_size, patch_size=patch_size, gw=gw, gh=gh,
        axis_name=axis_name,
    )

    st, Gmat, perr, err, its = photometric_update_levels(
        state, prior, cam, gray,
        tracked.pos, tracked.patch, tracked.search_level, tracked.valid,
        Rci, Pci, Jdphi_dR, Jdp_dR,
        img_point_cov=img_point_cov, patch_size=patch_size,
        levels=(2, 1, 0), max_iter=max_iter, robust=robust,
        axis_name=axis_name,
    )
    # cov <- cov - G cov (:980); Gmat = 0 when nothing was tracked
    st = st._replace(cov=st.cov - Gmat @ st.cov[0:6, :])

    Gtot = gw * gh
    if axis_name is None:
        t_idx, t_valid = tracked.idx, tracked.valid
        t_slevel = tracked.search_level
    else:
        # sharded mode: tracked rows are this device's padded cell
        # slab — reassemble the full (G,) set for the replicated map
        # scatters (identical scatter on every device keeps the visual
        # map replicated); tiled all_gather restores cell order
        ag = lambda a: jax.lax.all_gather(a, axis_name, tiled=True)[:Gtot]
        t_idx = ag(tracked.idx)
        t_valid = ag(tracked.valid)
        t_slevel = ag(tracked.search_level)
        perr = ag(perr)

    rcw2 = Rci @ st.rot.astype(f32).T
    pcw2 = -rcw2 @ st.pos.astype(f32) + Pci
    opc, oscore, oadd = prep_observations(
        vm2, cam, rcw2, pcw2, gray, t_idx, t_valid, obs_axis=vmap_axis
    )
    vm2 = vmap_mod.add_observations(
        vm2, t_idx, opc, rcw2, pcw2, oscore, fid,
        t_slevel, oadd, obs_axis=vmap_axis,
    )
    vm2 = vmap_mod.add_points(vm2, npos, npx, rcw, pcw, nscore, fid, nadd,
                              obs_axis=vmap_axis)
    n_tracked = jnp.sum(t_valid, dtype=jnp.int32)
    n_added = jnp.sum(nadd, dtype=jnp.int32)
    f64 = jnp.float64
    # padded to the lidar stats row's width (29, frame_step.py) so the
    # block-read collector stacks a single row shape — one executable
    # for every block flush instead of a retrace per event pattern
    stats = jnp.concatenate([
        jnp.stack([n_tracked.astype(f64), n_added.astype(f64),
                   err.astype(f64), its.astype(f64)]),
        rcw2.reshape(9).astype(f64), pcw2.astype(f64),
        jnp.zeros(12, f64),
        vm2.n_pts.astype(f64)[None],  # pool occupancy (see frame_step)
    ])
    return (st, vm2, t_idx, t_valid, opc, perr, err,
            n_tracked, n_added, its, stats)


# Donating variant of the fused camera step (capacity.donate_maps):
# the VisualMap argument is donated, so the obs-ring/pool scatters
# update in place instead of copying ~170 MB of visual-map arrays per
# camera frame at the shipped capacities. ATTACHED HARDWARE ONLY (see
# frame_step.lidar_frame_step_donated); Vio.update replaces self.vmap
# with the output immediately, so the donated value is never reused.
vio_frame_step_donated = functools.partial(
    jax.jit,
    static_argnames=(
        "grid_size", "patch_size", "gw", "gh", "ncc_en", "max_iter",
        "max_pg", "robust", "axis_name", "push_inline", "vmap_axis",
    ),
    donate_argnums=(0,),
)(vio_frame_step.__wrapped__)


@functools.partial(jax.jit, static_argnames=("obs_axis",))
def prep_observations(
    vm: vmap_mod.VisualMap,
    cam: cam_mod.Camera,
    rcw: jnp.ndarray,
    pcw: jnp.ndarray,
    img: jnp.ndarray,
    idx: jnp.ndarray,  # (G,) tracked point indices
    valid: jnp.ndarray,  # (G,)
    obs_axis: str | None = None,
):
    """addObservation conditions vs the most recent observation
    (lidar_selection.cpp:928-950): add when Δp > 0.5 m, Δθ > 10 (rad —
    the reference compares radians against 10, kept as-is), or pixel
    distance > 40. Returns (px, f, score, add_mask). `obs_axis`:
    row-sharded rings — fields owner-gathered (visual_map._gather_obs)."""
    NP = vm.pos.shape[0]
    safe = jnp.clip(idx, 0, NP - 1)
    pos = vm.pos[safe]
    pf = pos @ rcw.T + pcw
    pc = cam_mod.world2cam(cam, pf)
    o_px, o_rcw, o_pcw, _, o_fid, _ = vmap_mod._gather_obs(
        vm, safe, obs_axis)
    fid = o_fid  # (G, KO)
    last = jnp.argmax(fid, axis=-1)  # most recent obs
    take = lambda a: jnp.take_along_axis(
        a, last.reshape(-1, *([1] * (a.ndim - 1))), axis=1
    )[:, 0]
    ref_rcw = take(o_rcw)
    ref_pcw = take(o_pcw)
    ref_px = take(o_px)
    # delta_pose = T_ref_w * T_w_cur
    Rd = jnp.einsum("kij,mj->kim", ref_rcw, rcw.T)  # ref_rcw @ rcw^T
    td = ref_pcw - jnp.einsum("kim,m->ki", Rd, pcw)
    delta_p = jnp.linalg.norm(td, axis=-1)
    tr = Rd[:, 0, 0] + Rd[:, 1, 1] + Rd[:, 2, 2]
    delta_theta = jnp.where(
        tr > 3.0 - 1e-6, 0.0, jnp.arccos(jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0))
    )
    pix_dist = jnp.linalg.norm(pc - ref_px, axis=-1)
    add = valid & (
        (delta_p > 0.5) | (delta_theta > 10.0) | (pix_dist > 40.0)
    )
    score = img_ops.shi_tomasi(img, pc)
    return pc, score, add


def render_overlay(gray: np.ndarray, px: np.ndarray, errors: np.ndarray,
                   valid: np.ndarray, radius: int = 6) -> np.ndarray:
    """display_keypatch parity (lidar_selection.cpp:985-1005): RGB image
    with filled circles at tracked points — green where the photometric
    error < 8000, blue otherwise."""
    H, W = gray.shape
    rgb = np.stack([gray] * 3, -1).astype(np.uint8)
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    disk = (yy * yy + xx * xx) <= radius * radius
    for (u, v), e, ok in zip(px, errors, valid):
        if not ok:
            continue
        r0, c0 = int(v) - radius, int(u) - radius
        r1, c1 = r0 + disk.shape[0], c0 + disk.shape[1]
        rr0, cc0 = max(r0, 0), max(c0, 0)
        rr1, cc1 = min(r1, H), min(c1, W)
        if rr1 <= rr0 or cc1 <= cc0:
            continue
        sub = disk[rr0 - r0:rr1 - r0, cc0 - c0:cc1 - c0]
        color = (0, 255, 0) if e < 8000 else (0, 0, 255)
        for ch in range(3):
            rgb[rr0:rr1, cc0:cc1, ch][sub] = color[ch]
    return rgb


class Vio:
    """Host-side orchestration of the per-image VIO step (the
    LidarSelector object, lidar_selection.h:37-171)."""

    def __init__(self, cfg: Config, mesh_runner=None):
        """`mesh_runner`: optional `parallel.product.MeshRunner` — the
        fused camera frame step then runs SPMD over its mesh (set up by
        `Pipeline(cfg, mesh=...)`; same outputs, replicated)."""
        cap = cfg.capacity
        self.cfg = cfg
        self.mesh_runner = mesh_runner
        # FASTLIVO_VIO_SPLIT_PUSH=1: dispatch the image-pool push
        # separately from the fused camera step (relay-pricing
        # accommodation; identical outputs — see vio_frame_step)
        import os as _os

        self.split_push = bool(int(
            _os.environ.get("FASTLIVO_VIO_SPLIT_PUSH", "0")))
        self.cam = cam_mod.from_config(cfg.camera)
        self.grid_size = cfg.grid_size
        self.patch_size = cfg.patch_size
        self.gw = cfg.camera.width // cfg.grid_size
        self.gh = cfg.camera.height // cfg.grid_size
        # extrinsics (lidar_selection.cpp:35-52): Rli/Pli are IMU->lidar
        R_li = cfg.extrinsic_R  # lidar -> IMU
        t_li = cfg.extrinsic_T
        Rli = R_li.T
        Pli = -R_li.T @ t_li
        Rcl, Pcl = cfg.Rcl_mat, cfg.Pcl_vec
        Rci = Rcl @ Rli
        Pci = Rcl @ Pli + Pcl
        Pic = -Rci.T @ Pci
        self.Rci = jnp.asarray(Rci, jnp.float32)
        self.Pci = jnp.asarray(Pci, jnp.float32)
        self.Jdphi_dR = jnp.asarray(Rci, jnp.float32)
        skew_pic = np.array(
            [[0, -Pic[2], Pic[1]], [Pic[2], 0, -Pic[0]], [-Pic[1], Pic[0], 0]]
        )
        self.Jdp_dR = jnp.asarray(-Rci @ skew_pic, jnp.float32)

        self.pool_sharded = bool(
            mesh_runner is not None
            and getattr(mesh_runner, "sharded_map", False)
        )
        self.vmap = self._fresh_vmap()
        self.fid = 0
        self.last_cloud: Optional[np.ndarray] = None
        self._last_cloud_dev = None  # (device (cloud_cap,3), host n)
        self.max_pg = cap.max_cands
        self.cloud_cap = cap.max_raw_points  # fused-step input capacity
        self.last_stats = {}
        # per-frame jit scalar args cached as committed device arrays
        # (a Python float re-uploads a scalar every call, ~2 ms of relay
        # service each). Dtypes preserve the traced semantics exactly:
        # the thresholds only ever combine with f32 values (select_
        # tracked), img_point_cov is consumed via asarray(·, f64).
        self._out_thre_dev = jnp.float32(cfg.outlier_threshold)
        self._ncc_thre_dev = jnp.float32(cfg.ncc_thre)
        self._ipc_dev = jnp.asarray(float(cfg.img_point_cov), jnp.float64)
        # host copy of the point-pool occupancy (stats[28]) — keeps the
        # pipeline's visual-map load-factor check read-free; None until
        # the first frame's stats resolve or after a compact
        self._n_pts_host: Optional[int] = None
        self.last_overlay = None  # /rgb_img equivalent when cfg.debug
        # img_rgb (detect :1035) — resolved lazily from the raw frame:
        # the resize/cast costs host milliseconds every image frame but
        # is consumed only by colorize (pcd_save) and visualization
        self._last_bgr_cache: Optional[np.ndarray] = None
        self._last_bgr_src: Optional[np.ndarray] = None
        self.last_rcw: Optional[np.ndarray] = None  # frame T_f_w_ rotation
        self.last_pcw: Optional[np.ndarray] = None
        # DEFERRED READBACK (set via Pipeline.async_read): the camera
        # frame's single blocking stats read rides a reader thread and
        # resolves `async_depth` camera frames later (pipeline.py has
        # the full story; block replay sets depth = block size). Ignored
        # when cfg.debug (the overlay needs sync reads).
        self.async_read = False
        self.async_depth = 1
        self._reader = None
        self._pending: List = []
        # BLOCK-PACKED READBACK (replay.BlockReadCollector): the camera
        # frame's stats row joins the block's device-side stack instead
        # of being read at all; _apply_stats runs at the block boundary
        self.read_collector = None

    def _fresh_vmap(self) -> vmap_mod.VisualMap:
        """A new empty visual map at the configured capacities (used at
        init and by the pipeline's divergence-watchdog restart). With
        pool_sharded (--sharded-map), the pool + obs rings shard over
        the mesh (slot/row slabs; reads owner-gather + psum, writes
        owner-local — see visual_map._gather_obs and select_tracked's
        vmap_axis) — per-device visual-map HBM drops from ~170 MB to
        ~25 MB at n=8, shipped capacities."""
        cap, cfg = self.cfg.capacity, self.cfg
        vm = vmap_mod.empty_visual_map(
            n_points=cap.vmap_points,
            n_obs=cap.vmap_obs,
            table_size=cap.vmap_table_size,
            voxel_cap=cap.vmap_voxel_cap,
            ring=cap.frame_ring,
            height=cfg.camera.height,
            width=cfg.camera.width,
            img_dtype=jnp.uint8 if cap.frame_ring_u8 else None,
        )
        if self.pool_sharded:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            shp = NamedSharding(self.mesh_runner.mesh,
                                _P(self.mesh_runner.axis))
            vm = vm._replace(
                imgs=jax.device_put(vm.imgs, shp),
                obs_px=jax.device_put(vm.obs_px, shp),
                obs_rcw=jax.device_put(vm.obs_rcw, shp),
                obs_pcw=jax.device_put(vm.obs_pcw, shp),
                obs_slot=jax.device_put(vm.obs_slot, shp),
                obs_fid=jax.device_put(vm.obs_fid, shp),
                obs_level=jax.device_put(vm.obs_level, shp),
            )
        return vm

    def reset_map(self):
        """Discard the visual map (pipeline divergence-watchdog
        restart): points added at drifted poses would keep feeding
        wrong photometric residuals. Pose/extrinsics/pool config and
        the frame-id counter are kept (fids stay monotone, so stale
        pool bookkeeping cannot alias a future frame)."""
        self.vmap = self._fresh_vmap()
        self._n_pts_host = None
        self.last_stats = {}

    @property
    def last_bgr(self) -> Optional[np.ndarray]:
        if self._last_bgr_cache is None and self._last_bgr_src is not None:
            self._last_bgr_cache = self._resize_color(self._last_bgr_src)
        return self._last_bgr_cache

    @last_bgr.setter
    def last_bgr(self, v: Optional[np.ndarray]):
        self._last_bgr_cache = v
        self._last_bgr_src = None

    def set_last_cloud(self, pts_world: Optional[np.ndarray]):
        if pts_world is not None:
            self.last_cloud = pts_world
            self._last_cloud_dev = None

    def set_last_cloud_device(self, dense_dev, n: int):
        """DEVICE-side variant of set_last_cloud: the lidar frame's full
        dense world cloud stays on device and only the valid-row count
        crosses to the host — in interactive mode the host handoff cost
        a blocking device read on the lidar frame AND a re-upload on the
        image frame (2 relay round trips per pair). The row capacity is
        whatever bucket the lidar frame ran at (pipeline._stage_scan),
        bounded by cloud_cap; the fused VIO step masks rows >= n on
        device, so zero rows within n ride through the voxel filter as
        in the host path."""
        assert dense_dev.shape[0] <= self.cloud_cap, (
            dense_dev.shape, self.cloud_cap)
        self._last_cloud_dev = (dense_dev, int(n))
        self.last_cloud = None

    # -----------------------------------------------------------------
    def _to_gray(self, img: np.ndarray) -> np.ndarray:
        if img.ndim == 3:  # BGR -> gray (detect :1037)
            img = 0.114 * img[..., 0] + 0.587 * img[..., 1] + 0.299 * img[..., 2]
        img = np.asarray(img, np.float32)
        H, W = self.cam.height, self.cam.width
        if img.shape != (H, W):  # resize path (detect :1029-1034)
            if img.shape == (2 * H, 2 * W):
                # exact-half: cv::resize INTER_LINEAR at scale 0.5 samples
                # at (2x+0.5, 2y+0.5), i.e. the 2x2 block average — a box
                # filter, not strided subsampling (aliasing parity)
                img = img.reshape(H, 2, W, 2).mean(axis=(1, 3))
            else:
                img = _bilinear_resize(img, H, W)
        return img

    def _gray_device(self, img: np.ndarray) -> jnp.ndarray:
        """Device-resident grayscale frame. For the common case (a BGR
        frame already at camera-model resolution) the raw uint8 image is
        uploaded and converted ON DEVICE — 4x less wire traffic and
        ~6 ms less host work per interactive camera frame — with the
        numpy path's exact operation order (f64 weights, then f32 cast)
        so results stay bit-identical. Resize cases fall back to the
        host implementation (rare: only rigs whose bags carry images at
        a different size than the camera YAML)."""
        H, W = self.cam.height, self.cam.width
        if (img.ndim == 3 and img.shape[:2] == (H, W)
                and np.issubdtype(img.dtype, np.integer)):
            # integer frames (every ROS image encoding) are exact on
            # device; float frames (synthetic/tests) fall back to the
            # host path — XLA's FMA contraction makes the f32 weighted
            # sum differ from numpy by 1 ulp, and bit-parity wins
            return _to_gray_dev(jnp.asarray(img))
        if (img.ndim == 2 and img.shape == (H, W)
                and np.issubdtype(img.dtype, np.integer)
                and img.dtype.itemsize <= 2):
            # already-grayscale integer frames (mono8/mono16 bags, the
            # synthetic camera): upload the integer bytes and cast on
            # device — u8/u16 -> f32 is exact, and the wire shrinks 4x
            # (a 640x512 f32 frame is ~17 ms of relay upload; u8 ~5 ms)
            return _cast_gray_dev(jnp.asarray(img))
        return jnp.asarray(self._to_gray(img))

    def _resize_color(self, img: np.ndarray) -> np.ndarray:
        """img_rgb equivalent: the color frame at camera-model resolution
        (the reference resizes before cloning to img_rgb, detect
        :1029-1035). Kept for RGB cloud painting."""
        img = np.asarray(img, np.float32)
        H, W = self.cam.height, self.cam.width
        if img.shape[:2] == (H, W):
            return img
        if img.shape[:2] == (2 * H, 2 * W):
            if img.ndim == 3:
                return img.reshape(H, 2, W, 2, -1).mean(axis=(1, 3))
            return img.reshape(H, 2, W, 2).mean(axis=(1, 3))
        if img.ndim == 3:
            return np.stack(
                [_bilinear_resize(img[..., c], H, W) for c in range(img.shape[2])],
                axis=-1,
            )
        return _bilinear_resize(img, H, W)

    def update(self, state: NavState, prior: NavState, img: np.ndarray) -> NavState:
        """The `detect` entry (lidar_selection.cpp:1027-1075), fused:
        one device dispatch per camera frame (vio_frame_step)."""
        cfg = self.cfg
        # snapshot: callers may reuse/mutate their frame buffer between
        # this image frame and the later colorize/viz read that resolves
        # the lazy resize; a frame copy is ~0.3 ms vs the ~6 ms resize
        # being deferred
        self._last_bgr_src = np.array(img, copy=True)
        self._last_bgr_cache = None
        gray = self._gray_device(img)
        R = self.cloud_cap
        if self._last_cloud_dev is not None:
            cloud_dev, n = self._last_cloud_dev
            n = min(n, R)
        else:
            cloud_dev = None
            n = 0 if self.last_cloud is None else min(len(self.last_cloud), R)
        if n < 10:
            self.vmap = vmap_mod.push_image(self.vmap, gray,
                                            jnp.int32(self.fid))
            self.fid += 1
            return state

        if cloud_dev is not None:
            # lidar frame's dense cloud, never left the device (the
            # live-row mask is rebuilt inside the fused step from meta)
            cloud_j = cloud_dev
        else:
            cloud = np.zeros((R, 3), np.float32)
            cloud[:n] = self.last_cloud[:n, :3]
            cloud_j = jnp.asarray(cloud)

        meta = jnp.asarray(np.array([n, self.fid], np.int32))
        if self.mesh_runner is not None:
            step_fn = self.mesh_runner.vio_frame_step
        elif cfg.capacity.donate_maps:
            step_fn = vio_frame_step_donated  # in-place visual map
        else:
            step_fn = vio_frame_step
        extra = {}
        if self.split_push and self.mesh_runner is None:
            # relay accommodation (FASTLIVO_VIO_SPLIT_PUSH): the pool
            # scatter rides its own chained dispatch so the big
            # composite never writes the (R,H,W) pool — see
            # vio_frame_step's push_inline note
            self.vmap = vmap_mod.push_image(self.vmap, gray,
                                            jnp.int32(self.fid))
            extra["push_inline"] = False
        (st, vm2, tidx, tvalid, opc, perr, err, n_tracked, n_added,
         _its, stats_j) = step_fn(
            self.vmap, self.cam, state, prior, gray, meta, cloud_j,
            self.Rci, self.Pci, self.Jdphi_dR, self.Jdp_dR,
            self._out_thre_dev, self._ncc_thre_dev, self._ipc_dev,
            grid_size=self.grid_size, patch_size=self.patch_size,
            gw=self.gw, gh=self.gh, ncc_en=cfg.ncc_en,
            max_iter=cfg.max_iteration,
            max_pg=self.max_pg, robust=cfg.capacity.vio_robust,
            **extra,
        )
        self.vmap = vm2
        self.fid += 1
        if self.read_collector is not None and not self.cfg.debug:
            self.read_collector.add_cam(stats_j)
            return st
        if self.async_read and not self.cfg.debug:
            # deferred readback: submit this frame's read, then resolve
            # anything older than `async_depth` camera frames (each has
            # had that many frames of head start on the reader thread)
            self._pending.append(
                self._ensure_reader().submit(np.asarray, stats_j)
            )
            while len(self._pending) > self.async_depth:
                self._apply_stats(self._pending.pop(0).result())
            return st
        # counters + posterior camera pose in ONE packed transfer (the
        # separate int()/float()/np.asarray reads each cost a blocking
        # relay round trip — ~5 per interactive camera frame)
        stats = np.asarray(stats_j)
        self._apply_stats(stats)
        if self.cfg.debug and stats[0] > 0:
            self.last_overlay = render_overlay(
                np.asarray(gray), np.asarray(opc), np.asarray(perr),
                np.asarray(tvalid),
            )
        return st

    def _apply_stats(self, stats: np.ndarray):
        self.last_stats = {
            "tracked": int(stats[0]),
            "added": int(stats[1]),
            "err": float(stats[2]),
        }
        self.last_rcw = stats[4:13].reshape(3, 3).astype(np.float32)
        self.last_pcw = stats[13:16].astype(np.float32)
        if len(stats) > 28:
            self._n_pts_host = int(stats[28])

    def _ensure_reader(self):
        if self._reader is None:
            from concurrent.futures import ThreadPoolExecutor

            self._reader = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fastlivo-vio-read"
            )
        return self._reader

    def resolve_pending(self):
        """Materialize all deferred camera-frame stats (async mode)."""
        while self._pending:
            self._apply_stats(self._pending.pop(0).result())

    def update_staged(self, state: NavState, prior: NavState, img: np.ndarray) -> NavState:
        """Unfused reference path (one dispatch per stage) — kept for the
        fused-vs-staged equivalence test and for debugging."""
        cfg = self.cfg
        # snapshot: callers may reuse/mutate their frame buffer between
        # this image frame and the later colorize/viz read that resolves
        # the lazy resize; a frame copy is ~0.3 ms vs the ~6 ms resize
        # being deferred
        self._last_bgr_src = np.array(img, copy=True)
        self._last_bgr_cache = None
        gray = jnp.asarray(self._to_gray(img))
        fid = jnp.int32(self.fid)
        self.vmap = vmap_mod.push_image(self.vmap, gray, fid)

        rot32 = np.asarray(state.rot, np.float32)
        pos32 = np.asarray(state.pos, np.float32)
        rcw = np.asarray(self.Rci) @ rot32.T
        pcw = -rcw @ pos32 + np.asarray(self.Pci)
        rcw_j = jnp.asarray(rcw)
        pcw_j = jnp.asarray(pcw)

        if self.last_cloud is None or len(self.last_cloud) < 10:
            self.fid += 1
            return state

        # same device filter + voxel-set ops as the fused step, so the
        # two paths see identical candidate clouds (fused-vs-staged
        # equivalence is then exact up to XLA fusion reassociation)
        R = self.cloud_cap
        n = min(len(self.last_cloud), R)
        cloud = np.zeros((R, 3), np.float32)
        cloud[:n] = self.last_cloud[:n, :3]
        cmask = np.zeros(R, bool)
        cmask[:n] = True
        pg_down, pg_mask = voxel_downsample_device(
            jnp.asarray(cloud), jnp.asarray(cmask), 0.2, self.max_pg
        )
        vox, vox_mask = _dedup_voxels(pg_down, pg_mask, self.max_pg // 2)

        n_pts = int(self.vmap.n_pts)
        stats = {"tracked": 0, "added": 0, "err": 0.0}
        tracked = None
        if n_pts > 0:
            tracked = select_tracked(
                self.vmap, self.cam, rcw_j, pcw_j, gray,
                jnp.asarray(pg_down), jnp.asarray(pg_mask),
                jnp.asarray(vox), jnp.asarray(vox_mask),
                outlier_threshold=cfg.outlier_threshold,
                ncc_thre=cfg.ncc_thre,
                grid_size=self.grid_size, patch_size=self.patch_size,
                gw=self.gw, gh=self.gh, ncc_en=cfg.ncc_en,
            )
            stats["tracked"] = int(jnp.sum(tracked.valid))
            cell_value = tracked.cell_value
        else:
            cell_value = jnp.zeros(self.gw * self.gh, jnp.float32)

        # --- addSparseMap with the PRIOR pose (:1054 runs before ComputeJ)
        npos, npx, nscore, nadd = select_new_points(
            self.cam, rcw_j, pcw_j, gray,
            jnp.asarray(pg_down), jnp.asarray(pg_mask), cell_value,
            grid_size=self.grid_size, patch_size=self.patch_size,
            gw=self.gw, gh=self.gh,
        )

        # --- iterated photometric EKF, coarse to fine (:967-983) ---------
        if tracked is not None and stats["tracked"] > 0:
            Gmat = None
            for level in (2, 1, 0):
                state, Gmat, perr, err, _its = photometric_update(
                    state, prior, self.cam, gray,
                    tracked.pos, tracked.patch, tracked.search_level,
                    tracked.valid,
                    self.Rci, self.Pci, self.Jdphi_dR, self.Jdp_dR,
                    img_point_cov=cfg.img_point_cov,
                    patch_size=self.patch_size, level=level,
                    max_iter=cfg.max_iteration,
                )
            stats["err"] = float(err)
            # cov <- cov - G cov (:980)
            cov = state.cov - Gmat @ state.cov[0:6, :]
            state = state._replace(cov=cov)

            # --- addObservation with the POSTERIOR pose (:1064) ----------
            rcw2 = np.asarray(self.Rci) @ np.asarray(state.rot, np.float32).T
            pcw2 = -rcw2 @ np.asarray(state.pos, np.float32) + np.asarray(self.Pci)
            opc, oscore, oadd = prep_observations(
                self.vmap, self.cam, jnp.asarray(rcw2), jnp.asarray(pcw2),
                gray, tracked.idx, tracked.valid,
            )
            self.vmap = vmap_mod.add_observations(
                self.vmap, tracked.idx, opc, jnp.asarray(rcw2),
                jnp.asarray(pcw2), oscore, fid, tracked.search_level, oadd,
            )
            if self.cfg.debug:
                self.last_overlay = render_overlay(
                    np.asarray(gray), np.asarray(opc), np.asarray(perr),
                    np.asarray(tracked.valid),
                )

        # new map points carry the prior-pose first observation (:178-190)
        self.vmap = vmap_mod.add_points(
            self.vmap, npos, npx, rcw_j, pcw_j, nscore, fid, nadd
        )
        stats["added"] = int(jnp.sum(nadd))
        self.last_stats = stats
        # the posterior camera pose (updateFrameState after the update,
        # lidar_selection.cpp:982) — consumed by camera_pose.txt export
        # and RGB cloud painting
        rot_f = np.asarray(state.rot, np.float32)
        self.last_rcw = np.asarray(self.Rci) @ rot_f.T
        self.last_pcw = (
            -self.last_rcw @ np.asarray(state.pos, np.float32)
            + np.asarray(self.Pci)
        )
        self.fid += 1
        return state

    def colorize(self, pts_world: np.ndarray):
        """Paint world points from the most recent camera image
        (publish_frame_world RGB path, laserMapping.cpp:726-746: project
        with the stored frame pose, bilinear-sample the color image).
        Returns (mask, rgb) with rgb rows in [0,255] r,g,b order."""
        if self.last_bgr is None or self.last_rcw is None:
            return np.zeros(len(pts_world), bool), np.zeros((len(pts_world), 3))
        from . import camera as cam_mod

        pc_cam = pts_world.astype(np.float32) @ self.last_rcw.T + self.last_pcw
        mask = pc_cam[:, 2] > 0
        px = np.asarray(
            cam_mod.world2cam(self.cam, jnp.asarray(pc_cam)), np.float64
        )
        H, W = self.last_bgr.shape[:2]
        mask &= (px[:, 0] >= 0) & (px[:, 0] < W - 1)
        mask &= (px[:, 1] >= 0) & (px[:, 1] < H - 1)
        x = np.clip(px[:, 0], 0, W - 2)
        y = np.clip(px[:, 1], 0, H - 2)
        x0, y0 = x.astype(np.int64), y.astype(np.int64)
        fx, fy = (x - x0)[:, None], (y - y0)[:, None]
        img = self.last_bgr.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None].repeat(3, axis=2)
        bgr = (
            img[y0, x0] * (1 - fx) * (1 - fy)
            + img[y0, x0 + 1] * fx * (1 - fy)
            + img[y0 + 1, x0] * (1 - fx) * fy
            + img[y0 + 1, x0 + 1] * fx * fy
        )
        return mask, bgr[:, ::-1]  # BGR -> RGB (getpixel rows, :741-743)
