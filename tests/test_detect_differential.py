"""End-to-end differential test of the VIO `detect` chain vs an
independent numpy-f64 transcription of the reference.

test_reference_algebra.py pins the LIO update legs by transcription;
this does the same for the FULL camera-frame chain (the round-4 gap:
"algebra pinned, gating chain asserted"). One randomized-but-controlled
scene goes through BOTH:

  impl:  vio.select_tracked -> vio.select_new_points ->
         vio.photometric_update_levels     (jax, f32 rows / f64 gain)
  model: NumpyDetect below — a from-scratch f64 transcription of
         lidar_selection.cpp:
           depth-map build + per-cell closest winner    (:346-467)
           depth-continuity gate                        (:489-510)
           getCloseViewObs                              (point.cpp:141-178)
           getWarpMatrixAffine + getBestSearchLevel +
           warpAffine                                   (:232-331)
           getpatch + photometric outlier / NCC gates   (:119-140, :557-570, :298-315)
           addSparseMap Shi-Tomasi winners              (:142-202)
           UpdateState coarse-to-fine with the error-
           monotonicity rollback + convergence protocol (:743-902, :1052-1066)

and every intermediate observable is compared: the sparse depth image,
per-cell winner identity, all gate masks, search levels, warped ref
patches, photometric errors, new-point winners, and the final iterated
state (+ iteration count, incl. a scenario pinned to trigger the
rollback branch).

Scene: a textured world plane at z=Z0 rendered consistently for every
camera pose, so reference patches warp onto the current image with
small true residuals; map points sit in distinct 0.5 m voxels and
project >8 px apart (no f32-tie ambiguity in the argmin winners).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastlivo_tpu import vio as vio_mod
from fastlivo_tpu import visual_map as vmap_mod
from fastlivo_tpu.camera import Camera
from fastlivo_tpu.state import identity_state

W, H, F = 320, 256, 200.0
CX, CY = 159.5, 127.5
Z0 = 6.0  # world wall plane
PS = 8  # patch_size
HALF = PS // 2
GRID = 40
GW, GH = W // GRID, H // GRID  # 8 x 6
G = GW * GH
BORDER = (HALF + 1) * 8
OUTLIER = 300.0
NCC_EN = True
NCC_THRE = 0.5
IMG_COV = 100.0
VOX = 0.5


# ---------------------------------------------------------------------------
# scene construction (shared by impl and model)
# ---------------------------------------------------------------------------

def texture(X, Y):
    """Smooth world-plane intensity field (well-defined gradients)."""
    return (
        120.0
        + 40.0 * np.sin(0.9 * X) * np.cos(0.7 * Y)
        + 18.0 * np.sin(1.7 * X + 1.1 * Y)
        + 6.0 * np.cos(2.3 * Y)
    )


def render(rcw, pcw):
    """Render the wall plane for world->cam (rcw, pcw), f64 (H, W)."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    xn = (u - CX) / F
    yn = (v - CY) / F
    d_cam = np.stack([xn, yn, np.ones_like(xn)], axis=-1)
    d_w = d_cam @ rcw  # rcw^T applied to rows
    origin = -rcw.T @ pcw
    t = (Z0 - origin[2]) / d_w[..., 2]
    Xw = origin[None, None, :] + t[..., None] * d_w
    return texture(Xw[..., 0], Xw[..., 1])


def pose_cam(x, y, yaw_deg, pitch_deg=0.0):
    """Camera pose (position [x, y, 0], small rotation) -> (rcw, pcw)."""
    cy_, sy = np.cos(np.radians(yaw_deg)), np.sin(np.radians(yaw_deg))
    cp, sp = np.cos(np.radians(pitch_deg)), np.sin(np.radians(pitch_deg))
    Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    rwc = Ry @ Rx  # cam->world rotation
    campos = np.array([x, y, 0.0])
    rcw = rwc.T
    pcw = -rcw @ campos
    return rcw, pcw


def build_scene():
    rng = np.random.default_rng(11)
    # map points: one per 0.55 m cell on the wall (distinct 0.5 m voxels)
    gx = np.arange(-2.2, 2.3, 0.55)
    gy = np.arange(-1.65, 1.7, 0.55)
    XX, YY = np.meshgrid(gx, gy)
    pts = np.stack([
        XX.ravel() + rng.uniform(-0.08, 0.08, XX.size),
        YY.ravel() + rng.uniform(-0.08, 0.08, XX.size),
        np.full(XX.size, Z0),
    ], axis=1)
    # leave a vertical band map-free: its grid cells have cell_value 0,
    # so addSparseMap's Shi-Tomasi winners there must come out add=True
    pts = pts[(pts[:, 0] < 0.2) | (pts[:, 0] > 2.1)]
    scores = rng.uniform(40.0, 90.0, len(pts))
    # extra scan points for the depth map + new-point candidates
    extra = np.stack([
        rng.uniform(-2.4, 2.4, 160),
        rng.uniform(-1.8, 1.8, 160),
        np.full(160, Z0),
    ], axis=1)
    return pts, scores, extra


POSE0 = pose_cam(0.0, 0.0, 0.0)
POSE1 = pose_cam(0.15, -0.05, 2.0)
POSE2 = pose_cam(0.25, 0.04, 3.0, pitch_deg=-1.0)  # true current pose
IMG0 = render(*POSE0)
IMG1 = render(*POSE1)
IMG2 = render(*POSE2)


def np_world2cam(rcw, pcw, pts):
    c = pts @ rcw.T + pcw
    return np.stack([F * c[:, 0] / c[:, 2] + CX,
                     F * c[:, 1] / c[:, 2] + CY], axis=1), c


def build_visual_map(pts, scores):
    """Drive the real visual_map through two observation frames, and
    return (vm, model_obs) where model_obs is the INDEPENDENT
    bookkeeping the numpy model uses (px, rcw, pcw, img per obs)."""
    vm = vmap_mod.empty_visual_map(
        n_points=1 << 10, n_obs=4, table_size=1 << 12, voxel_cap=4,
        ring=4, height=H, width=W, img_dtype=jnp.float32,
    )
    model_obs = [[] for _ in range(len(pts))]

    rcw0, pcw0 = POSE0
    px0, _ = np_world2cam(rcw0, pcw0, pts)
    vm = vmap_mod.push_image(vm, jnp.asarray(IMG0, jnp.float32),
                             jnp.int32(0))
    vm = vmap_mod.add_points(
        vm, jnp.asarray(pts, jnp.float32), jnp.asarray(px0, jnp.float32),
        jnp.asarray(rcw0, jnp.float32), jnp.asarray(pcw0, jnp.float32),
        jnp.asarray(scores, jnp.float32), jnp.int32(0),
        jnp.ones(len(pts), bool),
    )
    for i in range(len(pts)):
        model_obs[i].append(dict(px=px0[i], rcw=rcw0, pcw=pcw0, img=IMG0))

    rcw1, pcw1 = POSE1
    px1, _ = np_world2cam(rcw1, pcw1, pts)
    sel = np.arange(0, len(pts), 2)  # every other point gets a 2nd obs
    vm = vmap_mod.push_image(vm, jnp.asarray(IMG1, jnp.float32),
                             jnp.int32(1))
    vm = vmap_mod.add_observations(
        vm, jnp.asarray(sel, jnp.int32), jnp.asarray(px1[sel], jnp.float32),
        jnp.asarray(rcw1, jnp.float32), jnp.asarray(pcw1, jnp.float32),
        jnp.asarray(scores[sel], jnp.float32), jnp.int32(1),
        jnp.zeros(len(sel), jnp.int32), jnp.ones(len(sel), bool),
    )
    for i in sel:
        model_obs[i].append(dict(px=px1[i], rcw=rcw1, pcw=pcw1, img=IMG1))
    return vm, model_obs


# ---------------------------------------------------------------------------
# the numpy-f64 model (reference transcription — NOT the jax code)
# ---------------------------------------------------------------------------

def bilinear_np(img, u, v):
    u0, v0 = int(np.floor(u)), int(np.floor(v))
    u0c, v0c = np.clip(u0, 0, W - 1), np.clip(v0, 0, H - 1)
    u1c, v1c = np.clip(u0 + 1, 0, W - 1), np.clip(v0 + 1, 0, H - 1)
    au, av = u - u0, v - v0
    return ((1 - au) * (1 - av) * img[v0c, u0c]
            + au * (1 - av) * img[v0c, u1c]
            + (1 - au) * av * img[v1c, u0c]
            + au * av * img[v1c, u1c])


def getpatch_np(img, pc, scale):
    """getpatch (lidar_selection.cpp:119-140): anchor floor(px/scale)*
    scale, bilinear weights from the scale-normalized remainder,
    scale-strided sampling."""
    u, v = pc
    u_i = int(np.floor(u / scale)) * scale
    v_i = int(np.floor(v / scale)) * scale
    su, sv = (u - u_i) / scale, (v - v_i) / scale
    w_tl = (1 - su) * (1 - sv)
    w_tr = su * (1 - sv)
    w_bl = (1 - su) * sv
    w_br = su * sv
    out = np.zeros((PS, PS))
    for x in range(PS):  # rows (v)
        for y in range(PS):  # cols (u)
            rr = v_i + (x - HALF) * scale
            cc = u_i + (y - HALF) * scale
            g = lambda r, c: img[np.clip(r, 0, H - 1), np.clip(c, 0, W - 1)]
            out[x, y] = (w_tl * g(rr, cc) + w_tr * g(rr, cc + scale)
                         + w_bl * g(rr + scale, cc)
                         + w_br * g(rr + scale, cc + scale))
    return out


class NumpyDetect:
    """f64 transcription of the detect chain (citations in module doc)."""

    def __init__(self, pts, scores, model_obs):
        self.pts = pts
        self.scores = scores
        self.obs = model_obs

    # -- addFromSparseMap ------------------------------------------------
    def depth_image(self, rcw, pcw, pg):
        depth = np.zeros((H, W))
        for p in pg:
            c = rcw @ p + pcw
            if c[2] <= 0:
                continue
            u = F * c[0] / c[2] + CX
            v = F * c[1] / c[2] + CY
            if not (BORDER <= u < W - BORDER and BORDER <= v < H - BORDER):
                continue
            depth[int(v), int(u)] = c[2]
        return depth

    def candidates(self, vox):
        """feat_map lookup: per scan voxel, map-point indices in
        insertion order; flat row id = voxel_rank * VC + slot (VC=4)."""
        keymap = {}
        for i, p in enumerate(self.pts):
            k = tuple(np.floor(p / VOX).astype(int))
            keymap.setdefault(k, []).append(i)
        rows = {}
        for vi, k in enumerate(map(tuple, vox)):
            for slot, pi in enumerate(keymap.get(k, [])[:4]):
                rows[vi * 4 + slot] = pi
        return rows

    def cell_winners(self, rcw, pcw, vox):
        campos = -rcw.T @ pcw
        rows = self.candidates(vox)
        best = {}  # cell -> (dist, row, point)
        cell_value = np.zeros(G)
        for row, pi in sorted(rows.items()):
            c = rcw @ self.pts[pi] + pcw
            if c[2] <= 0:
                continue
            u = F * c[0] / c[2] + CX
            v = F * c[1] / c[2] + CY
            if not (BORDER <= int(u) < W - BORDER
                    and BORDER <= int(v) < H - BORDER):
                continue
            cell = int(u / GRID) * GH + int(v / GRID)
            cell = min(max(cell, 0), G - 1)
            d = np.linalg.norm(campos - self.pts[pi])
            if cell not in best or d < best[cell][0]:
                best[cell] = (d, row, pi)
            cell_value[cell] = max(cell_value[cell], self.scores[pi])
        return best, cell_value

    def depth_continuous(self, depth, c_z, u, v):
        """:489-510 — any non-center window pixel with |z - depth| > 1.5
        breaks continuity."""
        for dv in range(-HALF, HALF + 1):
            for du in range(-HALF, HALF + 1):
                if du == 0 and dv == 0:
                    continue
                r = np.clip(int(v) + dv, 0, H - 1)
                c = np.clip(int(u) + du, 0, W - 1)
                d = depth[r, c]
                if d != 0.0 and abs(c_z - d) > 1.5:
                    return False
        return True

    def close_view_obs(self, pi, campos):
        """point.cpp:141-178: max-cos observation, cos > 0.5."""
        p = self.pts[pi]
        d0 = campos - p
        d0 = d0 / np.linalg.norm(d0)
        best, bcos = None, -2.0
        for ob in self.obs[pi]:
            oc = -ob["rcw"].T @ ob["pcw"]
            d = oc - p
            d = d / np.linalg.norm(d)
            cosang = d0 @ d
            if cosang > bcos:
                bcos, best = cosang, ob
        if best is None or bcos <= 0.5:
            return None
        return best

    def warp(self, rcw, pcw, pi, ref):
        """getWarpMatrixAffine (:232-256) + getBestSearchLevel (:317-331)
        + warpAffine (:258-296) at 3 pyramid levels."""
        p = self.pts[pi]
        ref_campos = -ref["rcw"].T @ ref["pcw"]
        depth_ref = np.linalg.norm(ref_campos - p)
        xn = np.array([(ref["px"][0] - CX) / F, (ref["px"][1] - CY) / F, 1.0])
        f_ref = xn / np.linalg.norm(xn)
        xyz_ref = f_ref * depth_ref

        def cam2world_px(px):
            b = np.array([(px[0] - CX) / F, (px[1] - CY) / F, 1.0])
            return b / np.linalg.norm(b)

        f_du = cam2world_px(ref["px"] + np.array([HALF, 0.0]))
        f_dv = cam2world_px(ref["px"] + np.array([0.0, HALF]))
        xyz_du = f_du * (xyz_ref[2] / f_du[2])
        xyz_dv = f_dv * (xyz_ref[2] / f_dv[2])
        R_cr = rcw @ ref["rcw"].T
        t_cr = pcw - R_cr @ ref["pcw"]

        def proj(xyz):
            c = R_cr @ xyz + t_cr
            return np.array([F * c[0] / c[2] + CX, F * c[1] / c[2] + CY])

        px_cur = proj(xyz_ref)
        A = np.stack([(proj(xyz_du) - px_cur) / HALF,
                      (proj(xyz_dv) - px_cur) / HALF], axis=1)
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        search = 0
        D = det
        while D > 3.0 and search < 2:
            search += 1
            D *= 0.25
        A_inv = np.linalg.inv(A)
        patches = np.zeros((3, PS, PS))
        for lvl in range(3):
            sc = (1 << lvl) * (1 << search)
            for x in range(PS):  # rows (v)
                for y in range(PS):  # cols (u)
                    d = np.array([(y - HALF) * sc, (x - HALF) * sc])
                    px = A_inv @ d + ref["px"]
                    if (px[0] < 0 or px[1] < 0 or px[0] >= W - 1
                            or px[1] >= H - 1):
                        patches[lvl, x, y] = 0.0
                    else:
                        patches[lvl, x, y] = bilinear_np(
                            ref["img"], px[0], px[1])
        return patches, search, px_cur

    def select_tracked(self, rcw, pcw, img, pg, vox):
        depth = self.depth_image(rcw, pcw, pg)
        best, cell_value = self.cell_winners(rcw, pcw, vox)
        campos = -rcw.T @ pcw
        out = {}
        for cell, (_, row, pi) in best.items():
            c = rcw @ self.pts[pi] + pcw
            u = F * c[0] / c[2] + CX
            v = F * c[1] / c[2] + CY
            rec = dict(pi=pi, ok=False, search=0,
                       patches=np.zeros((3, PS, PS)), err0=0.0)
            out[cell] = rec
            if not self.depth_continuous(depth, c[2], u, v):
                continue
            ref = self.close_view_obs(pi, campos)
            if ref is None:
                continue
            patches, search, _ = self.warp(rcw, pcw, pi, ref)
            rec["patches"] = patches
            rec["search"] = search
            cur = getpatch_np(img, (u, v), 1)
            err0 = np.sum((patches[0] - cur) ** 2)
            rec["err0"] = err0
            if err0 > OUTLIER * PS * PS:
                continue
            if NCC_EN:
                a = patches[0].ravel() - patches[0].mean()
                b = cur.ravel() - cur.mean()
                ncc = np.sum(a * b) / np.sqrt(
                    np.sum(a * a) * np.sum(b * b) + 1e-10)
                if ncc < NCC_THRE:
                    continue
            rec["ok"] = True
        return out, cell_value, depth

    # -- addSparseMap ----------------------------------------------------
    def shi_tomasi(self, img, u, v):
        """vk::shiTomasiScore: 8x8 window rooted at (v-4, u-4) of
        centered-difference gradients; min eigenvalue of the averaged
        structure tensor."""
        ui, vi = int(np.floor(u)), int(np.floor(v))
        dxx = dyy = dxy = 0.0
        for y in range(vi - 4, vi + 4):
            for x in range(ui - 4, ui + 4):
                dx = 0.5 * (img[y, x + 1] - img[y, x - 1])
                dy = 0.5 * (img[y + 1, x] - img[y - 1, x])
                dxx += dx * dx
                dyy += dy * dy
                dxy += dx * dy
        n = 32.0  # 2*box_area normalization of the raw-difference form
        dxx, dyy, dxy = dxx / n, dyy / n, dxy / n
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        return 0.5 * (tr - np.sqrt(max(tr * tr - 4 * det, 0.0)))

    def select_new(self, rcw, pcw, img, pg, cell_value):
        best = {}
        for m, p in enumerate(pg):
            c = rcw @ p + pcw
            if c[2] <= 0:
                continue
            u = F * c[0] / c[2] + CX
            v = F * c[1] / c[2] + CY
            if not (BORDER <= int(u) < W - BORDER
                    and BORDER <= int(v) < H - BORDER):
                continue
            s = self.shi_tomasi(img, u, v)
            cell = int(u / GRID) * GH + int(v / GRID)
            cell = min(max(cell, 0), G - 1)
            if cell not in best or s > best[cell][0]:
                best[cell] = (s, m)
        return {cell: (s, m, s > cell_value[cell])
                for cell, (s, m) in best.items()}

    # -- UpdateState cascade (:743-902, :1052-1066) ----------------------
    def update_state(self, rot0, pos0, prior_rot, prior_x, cov, img,
                     tracked, max_iter, proj=None):
        """tracked: list of (pos, patches(3,P,P), search) for valid rows.
        Returns (rot, x15, iters, err, rollback_happened).

        `proj`: optional camera-frame -> pixel map replacing the pinhole
        projection for the PATCH CENTER only — the Jacobian Jdpi stays
        pinhole either way, matching the reference (lidar_selection.cpp
        uses cam->world2cam, i.e. the distorted vikit model, for pc but
        the pinhole dpi() for the chain rule)."""
        def expm(w):
            th = np.linalg.norm(w)
            if th < 1e-12:
                return np.eye(3)
            k = w / th
            Km = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                           [-k[1], k[0], 0]])
            return np.eye(3) + np.sin(th) * Km + (1 - np.cos(th)) * Km @ Km

        def logm(Rm):
            tr = np.trace(Rm)
            th = np.arccos(np.clip((tr - 1) / 2, -1, 1))
            if th < 1e-12:
                return np.zeros(3)
            w = (np.array([Rm[2, 1] - Rm[1, 2], Rm[0, 2] - Rm[2, 0],
                           Rm[1, 0] - Rm[0, 1]]) / (2 * np.sin(th)))
            return w * th

        rot, x = rot0.copy(), np.concatenate([pos0, prior_x[3:]])
        P_ = cov / IMG_COV
        P_inv = np.linalg.inv(P_)
        iters = 0
        rolled = False
        last_err_final = 1e10
        for level in (2, 1, 0):
            old_rot, old_x = rot.copy(), x.copy()
            last_error = 1e10
            for _ in range(max_iter):
                iters += 1
                rcw = rot.T  # Rci = I, Pci = 0
                pcw = -rcw @ x[0:3]
                Jdp_dt = rcw
                Hrows, zrows = [], []
                err_sum, n_meas = 0.0, 0
                for (pw, patches, search) in tracked:
                    pf = rcw @ pw + pcw
                    scale = (1 << level) * (1 << search)
                    if proj is None:
                        u = F * pf[0] / pf[2] + CX
                        v = F * pf[1] / pf[2] + CY
                    else:
                        u, v = proj(pf)
                    zi = 1.0 / pf[2]
                    Jdpi = np.array([[F * zi, 0, -F * pf[0] * zi * zi],
                                     [0, F * zi, -F * pf[1] * zi * zi]])
                    p_hat = np.array([[0, -pf[2], pf[1]],
                                      [pf[2], 0, -pf[0]],
                                      [-pf[1], pf[0], 0]])
                    u_i = int(np.floor(u / scale)) * scale
                    v_i = int(np.floor(v / scale)) * scale
                    su, sv = (u - u_i) / scale, (v - v_i) / scale
                    wtl = (1 - su) * (1 - sv)
                    wtr = su * (1 - sv)
                    wbl = (1 - su) * sv
                    wbr = su * sv

                    def S(r, c):
                        return img[np.clip(r, 0, H - 1), np.clip(c, 0, W - 1)]

                    for xx_ in range(PS):
                        for yy_ in range(PS):
                            rr = v_i + (xx_ - HALF) * scale
                            cc = u_i + (yy_ - HALF) * scale

                            def samp(dr, dc):
                                r0, c0 = rr + dr * scale, cc + dc * scale
                                return (wtl * S(r0, c0)
                                        + wtr * S(r0, c0 + scale)
                                        + wbl * S(r0 + scale, c0)
                                        + wbr * S(r0 + scale, c0 + scale))

                            val = samp(0, 0)
                            du = 0.5 * (samp(0, 1) - samp(0, -1)) / scale
                            dv = 0.5 * (samp(1, 0) - samp(-1, 0)) / scale
                            Jimg = np.array([du, dv])
                            Jdphi = Jimg @ Jdpi @ p_hat
                            Jdp = -Jimg @ Jdpi
                            JdR = Jdphi  # Jdphi_dR = I, Jdp_dR = 0
                            Jdt = Jdp @ Jdp_dt
                            res = val - patches[level, xx_, yy_]
                            Hrows.append(np.concatenate([JdR, Jdt]))
                            zrows.append(res)
                            err_sum += res * res
                            n_meas += 1
                if n_meas == 0:
                    break
                error = err_sum / n_meas
                if error <= last_error:
                    old_rot, old_x = rot.copy(), x.copy()
                    last_error = error
                    Hs = np.asarray(Hrows)
                    z = np.asarray(zrows)
                    HTH = np.zeros((18, 18))
                    HTH[0:6, 0:6] = Hs.T @ Hs
                    K1 = np.linalg.inv(HTH + P_inv)
                    HTz = Hs.T @ z
                    vec = np.concatenate(
                        [logm(rot.T @ prior_rot), prior_x - x])
                    Gm = K1[:, 0:6] @ HTH[0:6, 0:6]
                    sol = (-K1[:, 0:6] @ HTz + vec - Gm @ vec[0:6])
                    rot = rot @ expm(sol[0:3])
                    x = x + sol[3:18]
                    if (np.linalg.norm(sol[0:3]) * 57.3 < 0.001
                            and np.linalg.norm(sol[3:6]) * 100.0 < 0.001):
                        break
                else:
                    rot, x = old_rot, old_x
                    rolled = True
                    break
            last_err_final = last_error
        return rot, x, iters, last_err_final, rolled


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def scene():
    pts, scores, extra = build_scene()
    vm, model_obs = build_visual_map(pts, scores)
    pg = np.concatenate([pts, extra], axis=0)
    vox = np.unique(np.floor(pg / VOX).astype(np.int32), axis=0)
    return dict(pts=pts, scores=scores, vm=vm, model_obs=model_obs,
                pg=pg, vox=vox)


def _impl_tracked(scene, rcw, pcw, img):
    vm = scene["vm"]
    pg, vox = scene["pg"], scene["vox"]
    ts = vio_mod.select_tracked(
        vm, _cam(), jnp.asarray(rcw, jnp.float32),
        jnp.asarray(pcw, jnp.float32), jnp.asarray(img, jnp.float32),
        jnp.asarray(pg, jnp.float32), jnp.ones(len(pg), bool),
        jnp.asarray(vox, jnp.int32), jnp.ones(len(vox), bool),
        OUTLIER, NCC_THRE, GRID, PS, GW, GH, ncc_en=NCC_EN,
    )
    return ts


def _cam():
    return Camera(
        fx=np.float32(F), fy=np.float32(F), cx=np.float32(CX),
        cy=np.float32(CY), d=np.zeros(4, np.float32), width=W, height=H,
    )


def test_select_tracked_chain_matches_model(scene):
    rcw, pcw = POSE2
    ts = _impl_tracked(scene, rcw, pcw, IMG2)
    model = NumpyDetect(scene["pts"], scene["scores"], scene["model_obs"])
    mout, mcell_value, mdepth = model.select_tracked(
        rcw, pcw, IMG2, scene["pg"], scene["vox"])

    idx = np.asarray(ts.idx)
    valid = np.asarray(ts.valid)
    search = np.asarray(ts.search_level)
    patches = np.asarray(ts.patch)
    err0 = np.asarray(ts.errors)
    cell_value = np.asarray(ts.cell_value)

    np.testing.assert_allclose(cell_value, mcell_value, rtol=1e-5,
                               atol=1e-4)
    n_checked = 0
    for cell, rec in mout.items():
        assert idx[cell] == rec["pi"], f"cell {cell} winner"
        assert bool(valid[cell]) == rec["ok"], f"cell {cell} gate"
        if rec["ok"]:
            assert search[cell] == rec["search"], f"cell {cell} level"
            np.testing.assert_allclose(
                patches[cell], rec["patches"], rtol=1e-4, atol=5e-3,
                err_msg=f"cell {cell} warped patches")
            np.testing.assert_allclose(
                err0[cell], rec["err0"], rtol=1e-3, atol=1e-2,
                err_msg=f"cell {cell} err0")
            n_checked += 1
    # cells the model never won must be invalid in the impl too
    for cell in range(G):
        if cell not in mout:
            assert not valid[cell], f"cell {cell} impl-only winner"
    assert n_checked >= 10, f"scene too weak: only {n_checked} tracked"


def test_select_new_points_matches_model(scene):
    rcw, pcw = POSE2
    ts = _impl_tracked(scene, rcw, pcw, IMG2)
    pg = scene["pg"]
    pos, wpc, wscore, add = vio_mod.select_new_points(
        _cam(), jnp.asarray(rcw, jnp.float32), jnp.asarray(pcw, jnp.float32),
        jnp.asarray(IMG2, jnp.float32), jnp.asarray(pg, jnp.float32),
        jnp.ones(len(pg), bool), ts.cell_value, GRID, PS, GW, GH,
    )
    model = NumpyDetect(scene["pts"], scene["scores"], scene["model_obs"])
    mnew = model.select_new(rcw, pcw, IMG2, pg,
                            np.asarray(ts.cell_value))
    add = np.asarray(add)
    pos = np.asarray(pos)
    wscore = np.asarray(wscore)
    n_add = 0
    for cell, (s, m, madd) in mnew.items():
        np.testing.assert_allclose(wscore[cell], s, rtol=1e-3, atol=1e-3,
                                   err_msg=f"cell {cell} score")
        assert bool(add[cell]) == madd, f"cell {cell} add flag"
        if madd:
            np.testing.assert_allclose(pos[cell], pg[m], rtol=1e-6,
                                       err_msg=f"cell {cell} winner point")
            n_add += 1
    assert n_add >= 3, f"scene too weak: only {n_add} new points"


def _run_update(scene, rot0_np, pos0_np, max_iter):
    """Run impl + model photometric cascade from the same start."""
    rcw0 = rot0_np.T
    pcw0 = -rcw0 @ pos0_np
    ts = _impl_tracked(scene, rcw0, pcw0, IMG2)

    # identity_state ships a tight 1e-3 prior cov (bootstrap value);
    # a camera update needs a realistic propagated cov for the gain to
    # move the state — inflate to 0.05 (both sides use the same cov)
    s0 = identity_state()._replace(
        rot=jnp.asarray(rot0_np), pos=jnp.asarray(pos0_np),
        cov=jnp.eye(18, dtype=jnp.float64) * 0.05,
    )
    eye = np.eye(3, dtype=np.float32)
    zero3 = np.zeros((3, 3), np.float32)
    st, Gm, perr, err, its = vio_mod.photometric_update_levels(
        s0, s0, _cam(), jnp.asarray(IMG2, jnp.float32),
        ts.pos, ts.patch, ts.search_level, ts.valid,
        eye, np.zeros(3, np.float32), eye, zero3,
        IMG_COV, PS, levels=(2, 1, 0), max_iter=max_iter,
    )

    model = NumpyDetect(scene["pts"], scene["scores"], scene["model_obs"])
    idx = np.asarray(ts.idx)
    valid = np.asarray(ts.valid)
    patches = np.asarray(ts.patch, np.float64)
    search = np.asarray(ts.search_level)
    pos_ts = np.asarray(ts.pos, np.float64)
    tracked = [(pos_ts[c], patches[c], int(search[c]))
               for c in range(G) if valid[c]]
    cov = np.asarray(s0.cov, np.float64)
    prior_x = np.concatenate([pos0_np, np.zeros(12)])
    mrot, mx, miters, merr, mrolled = model.update_state(
        rot0_np.copy(), pos0_np.copy(), rot0_np, prior_x, cov, IMG2,
        tracked, max_iter)
    return (np.asarray(st.rot, np.float64), np.asarray(st.pos, np.float64),
            int(its), float(err), mrot, mx, miters, merr, mrolled,
            len(tracked))


def test_photometric_cascade_matches_model(scene):
    """Converging scenario: small prior offset from the true pose."""
    rwc_true = POSE2[0].T  # cam->world = state rot (Rci = I)
    campos_true = np.array([0.25, 0.04, 0.0])
    dr = np.radians(0.4)
    Rz = np.array([[np.cos(dr), -np.sin(dr), 0],
                   [np.sin(dr), np.cos(dr), 0], [0, 0, 1.0]])
    rot0 = rwc_true @ Rz
    pos0 = campos_true + np.array([0.02, -0.015, 0.01])
    (irot, ipos, iit, ierr, mrot, mx, mit, merr, mrolled,
     ntr) = _run_update(scene, rot0, pos0, max_iter=6)
    assert ntr >= 10
    # both must pull the pose toward truth and agree with each other
    np.testing.assert_allclose(ipos, mx[0:3], atol=5e-4)
    np.testing.assert_allclose(irot, mrot, atol=5e-5)
    np.testing.assert_allclose(ierr, merr, rtol=2e-2)
    assert abs(iit - mit) <= 1, (iit, mit)
    assert (np.linalg.norm(ipos - campos_true)
            < 0.7 * np.linalg.norm(pos0 - campos_true))


def test_photometric_rollback_matches_model(scene):
    """Large offset: the cascade overshoots at some level and the
    error-monotonicity rollback (:889-892) must fire in the model; the
    impl must land on the same state and iteration count."""
    rwc_true = POSE2[0].T
    campos_true = np.array([0.25, 0.04, 0.0])
    dr = np.radians(4.0)
    Rz = np.array([[np.cos(dr), -np.sin(dr), 0],
                   [np.sin(dr), np.cos(dr), 0], [0, 0, 1.0]])
    rot0 = rwc_true @ Rz
    pos0 = campos_true + np.array([0.12, -0.10, 0.06])
    (irot, ipos, iit, ierr, mrot, mx, mit, merr, mrolled,
     ntr) = _run_update(scene, rot0, pos0, max_iter=6)
    assert ntr >= 5
    assert mrolled, "scene did not trigger the rollback branch — retune"
    np.testing.assert_allclose(ipos, mx[0:3], atol=2e-3)
    np.testing.assert_allclose(irot, mrot, atol=2e-4)
    assert abs(iit - mit) <= 1, (iit, mit)


def test_outlier_and_ncc_gates_reject_corrupted_cells(scene):
    """Gate-REJECTION coverage: corrupt a rectangular band of the
    current image (bright blob) so tracked cells over it fail the
    photometric outlier / NCC gates (:557-570, :298-315) in BOTH the
    impl and the model — the converging-scene test only exercises the
    accept branch."""
    rcw, pcw = POSE2
    img_bad = IMG2.copy()
    img_bad[100:180, 120:240] = 250.0  # saturate a 120x80 px region
    ts = _impl_tracked(scene, rcw, pcw, img_bad)
    model = NumpyDetect(scene["pts"], scene["scores"], scene["model_obs"])
    mout, _, _ = model.select_tracked(rcw, pcw, img_bad, scene["pg"],
                                      scene["vox"])
    valid = np.asarray(ts.valid)
    n_rej = 0
    for cell, rec in mout.items():
        assert bool(valid[cell]) == rec["ok"], f"cell {cell} gate"
        if not rec["ok"] and rec["err0"] > OUTLIER * PS * PS:
            n_rej += 1
    # the corruption must actually have tripped the gates somewhere
    assert n_rej >= 2, f"corruption rejected only {n_rej} cells — retune"
    # and clean cells far from the blob must still track
    assert valid.sum() >= 5


# ---------------------------------------------------------------------------
# distorted-camera scenario: the same chain through the radtan model
# (the real camera_pinhole rig has nonzero distortion; everything above
# ran d = 0)
# ---------------------------------------------------------------------------

D_COEF = np.array([-0.09, 0.06, 0.0005, -0.0004])


def np_distort(xn):
    x, y = xn[..., 0], xn[..., 1]
    k1, k2, p1, p2 = D_COEF
    r2 = x * x + y * y
    rad = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd, yd], -1)


def np_undistort(xd, iters=8):
    xn = xd.copy()
    for _ in range(iters):
        xn = xd - (np_distort(xn) - xn)
    return xn


def render_dist(rcw, pcw):
    """Distorted render: each pixel's ray comes from the UNDISTORTED
    normalized coords (matching io/synthetic's convention)."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    xd = np.stack([(u - CX) / F, (v - CY) / F], -1)
    xn = np_undistort(xd)
    d_cam = np.concatenate([xn, np.ones_like(xn[..., :1])], -1)
    d_w = d_cam @ rcw
    origin = -rcw.T @ pcw
    t = (Z0 - origin[2]) / d_w[..., 2]
    Xw = origin[None, None, :] + t[..., None] * d_w
    return texture(Xw[..., 0], Xw[..., 1])


def w2c_dist(c):
    """(…,3) camera-frame -> distorted pixel."""
    xn = c[..., :2] / c[..., 2:3]
    xd = np_distort(xn)
    return np.stack([F * xd[..., 0] + CX, F * xd[..., 1] + CY], -1)


def c2w_dist(px):
    xd = np.stack([(px[..., 0] - CX) / F, (px[..., 1] - CY) / F], -1)
    xn = np_undistort(np.atleast_2d(xd))[0] if xd.ndim == 1 else np_undistort(xd)
    b = np.concatenate([np.atleast_1d(xn).reshape(-1, 2),
                        np.ones((np.atleast_2d(xn).shape[0], 1))], -1)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return b[0] if px.ndim == 1 else b


@pytest.fixture(scope="module")
def dscene():
    """Shared distorted-camera scene: visual map seeded with ONE
    distorted-projection observation per point from POSE0."""
    from fastlivo_tpu import visual_map as vmap_mod

    cam = Camera(
        fx=np.float32(F), fy=np.float32(F), cx=np.float32(CX),
        cy=np.float32(CY), d=D_COEF.astype(np.float32), width=W, height=H,
    )
    pts, scores, extra = build_scene()
    img0 = render_dist(*POSE0)
    img2 = render_dist(*POSE2)
    vm = vmap_mod.empty_visual_map(
        n_points=1 << 10, n_obs=4, table_size=1 << 12, voxel_cap=4,
        ring=4, height=H, width=W, img_dtype=jnp.float32,
    )
    rcw0, pcw0 = POSE0
    c0 = pts @ rcw0.T + pcw0
    px0 = w2c_dist(c0)
    vm = vmap_mod.push_image(vm, jnp.asarray(img0, jnp.float32),
                             jnp.int32(0))
    vm = vmap_mod.add_points(
        vm, jnp.asarray(pts, jnp.float32), jnp.asarray(px0, jnp.float32),
        jnp.asarray(rcw0, jnp.float32), jnp.asarray(pcw0, jnp.float32),
        jnp.asarray(scores, jnp.float32), jnp.int32(0),
        jnp.ones(len(pts), bool),
    )
    pg = np.concatenate([pts, extra], axis=0)
    vox = np.unique(np.floor(pg / VOX).astype(np.int32), axis=0)
    model_obs = [[dict(px=px0[i], rcw=rcw0, pcw=pcw0, img=img0)]
                 for i in range(len(pts))]
    return dict(cam=cam, pts=pts, scores=scores, img0=img0, img2=img2,
                vm=vm, pg=pg, vox=vox, model_obs=model_obs)


def _impl_tracked_dist(dscene, rcw, pcw):
    return vio_mod.select_tracked(
        dscene["vm"], dscene["cam"], jnp.asarray(rcw, jnp.float32),
        jnp.asarray(pcw, jnp.float32),
        jnp.asarray(dscene["img2"], jnp.float32),
        jnp.asarray(dscene["pg"], jnp.float32),
        jnp.ones(len(dscene["pg"]), bool),
        jnp.asarray(dscene["vox"], jnp.int32),
        jnp.ones(len(dscene["vox"]), bool),
        OUTLIER, NCC_THRE, GRID, PS, GW, GH, ncc_en=False,
    )


def test_select_tracked_distorted_camera_matches_model(dscene):
    """select_tracked through the radtan camera: winners, gates, search
    levels and warped patches must match a numpy transcription that
    projects with the distorted model (depth map, per-cell winner,
    close-view obs, warp matrix from distorted projections)."""
    pts, scores = dscene["pts"], dscene["scores"]
    pg, vox = dscene["pg"], dscene["vox"]
    img2 = dscene["img2"]
    model_obs = dscene["model_obs"]
    rcw2, pcw2 = POSE2
    ts = _impl_tracked_dist(dscene, rcw2, pcw2)
    model = NumpyDetect(pts, scores, model_obs)

    # transcribe the distorted variants of the projection-dependent
    # phases (depth map, winners, warp) — the pinhole model methods
    # can't be reused verbatim
    depth = np.zeros((H, W))
    for p in pg:
        c = rcw2 @ p + pcw2
        if c[2] <= 0:
            continue
        u, v = w2c_dist(c)
        if BORDER <= u < W - BORDER and BORDER <= v < H - BORDER:
            depth[int(v), int(u)] = c[2]

    campos = -rcw2.T @ pcw2
    rows = model.candidates(vox)
    best = {}
    for row, pi in sorted(rows.items()):
        c = rcw2 @ pts[pi] + pcw2
        if c[2] <= 0:
            continue
        u, v = w2c_dist(c)
        if not (BORDER <= int(u) < W - BORDER
                and BORDER <= int(v) < H - BORDER):
            continue
        cell = min(max(int(u / GRID) * GH + int(v / GRID), 0), G - 1)
        d = np.linalg.norm(campos - pts[pi])
        if cell not in best or d < best[cell][0]:
            best[cell] = (d, row, pi)

    idx = np.asarray(ts.idx)
    valid = np.asarray(ts.valid)
    search = np.asarray(ts.search_level)
    patches = np.asarray(ts.patch)
    n_checked = 0
    for cell, (_, row, pi) in best.items():
        assert idx[cell] == pi, f"cell {cell} winner"
        c = rcw2 @ pts[pi] + pcw2
        u, v = w2c_dist(c)
        ok_depth = model.depth_continuous(depth, c[2], u, v)
        ref = model_obs[pi][0]
        # warp with distorted projections (getWarpMatrixAffine)
        ref_campos = -ref["rcw"].T @ ref["pcw"]
        depth_ref = np.linalg.norm(ref_campos - pts[pi])
        f_ref = c2w_dist(ref["px"])
        xyz_ref = f_ref * depth_ref
        f_du = c2w_dist(ref["px"] + np.array([HALF, 0.0]))
        f_dv = c2w_dist(ref["px"] + np.array([0.0, HALF]))
        xyz_du = f_du * (xyz_ref[2] / f_du[2])
        xyz_dv = f_dv * (xyz_ref[2] / f_dv[2])
        R_cr = rcw2 @ ref["rcw"].T
        t_cr = pcw2 - R_cr @ ref["pcw"]

        def proj(xyz):
            return w2c_dist(R_cr @ xyz + t_cr)

        px_cur = proj(xyz_ref)
        A = np.stack([(proj(xyz_du) - px_cur) / HALF,
                      (proj(xyz_dv) - px_cur) / HALF], axis=1)
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        lvl = 0
        Dd = det
        while Dd > 3.0 and lvl < 2:
            lvl += 1
            Dd *= 0.25
        if not (ok_depth and valid[cell]):
            # gates must agree at least on clear non-tracking
            continue
        assert search[cell] == lvl, f"cell {cell} search level"
        A_inv = np.linalg.inv(A)
        sc = (1 << lvl)
        p_np = np.zeros((PS, PS))
        for x in range(PS):
            for y in range(PS):
                dpx = A_inv @ np.array([(y - HALF) * sc, (x - HALF) * sc])
                q = dpx + ref["px"]
                if 0 <= q[0] < W - 1 and 0 <= q[1] < H - 1:
                    p_np[x, y] = bilinear_np(ref["img"], q[0], q[1])
        np.testing.assert_allclose(patches[cell][0], p_np,
                                   rtol=1e-4, atol=5e-3,
                                   err_msg=f"cell {cell} patch")
        n_checked += 1
    assert n_checked >= 8, f"distorted scene too weak: {n_checked}"


def test_photometric_cascade_distorted_matches_model(dscene):
    """Photometric cascade under the radtan camera. Pins the reference's
    asymmetric combination: the patch center projects through the FULL
    distorted model while the chain-rule Jacobian Jdpi stays pinhole
    (lidar_selection.cpp pc = cam->world2cam vs dpi()); both sides must
    converge to the same pose from the same offset prior."""
    rwc_true = POSE2[0].T
    campos_true = -POSE2[0].T @ POSE2[1]
    dr = np.radians(0.4)
    Rz = np.array([[np.cos(dr), -np.sin(dr), 0],
                   [np.sin(dr), np.cos(dr), 0], [0, 0, 1.0]])
    rot0 = rwc_true @ Rz
    pos0 = campos_true + np.array([0.02, -0.015, 0.01])
    rcw0p = rot0.T
    pcw0p = -rcw0p @ pos0
    ts = _impl_tracked_dist(dscene, rcw0p, pcw0p)

    s0 = identity_state()._replace(
        rot=jnp.asarray(rot0), pos=jnp.asarray(pos0),
        cov=jnp.eye(18, dtype=jnp.float64) * 0.05,
    )
    eye = np.eye(3, dtype=np.float32)
    zero3 = np.zeros((3, 3), np.float32)
    st, Gm, perr, err, its = vio_mod.photometric_update_levels(
        s0, s0, dscene["cam"], jnp.asarray(dscene["img2"], jnp.float32),
        ts.pos, ts.patch, ts.search_level, ts.valid,
        eye, np.zeros(3, np.float32), eye, zero3,
        IMG_COV, PS, levels=(2, 1, 0), max_iter=6,
    )

    model = NumpyDetect(dscene["pts"], dscene["scores"],
                        dscene["model_obs"])
    valid = np.asarray(ts.valid)
    patches = np.asarray(ts.patch, np.float64)
    search = np.asarray(ts.search_level)
    pos_ts = np.asarray(ts.pos, np.float64)
    tracked = [(pos_ts[c], patches[c], int(search[c]))
               for c in range(G) if valid[c]]
    assert len(tracked) >= 8, f"distorted scene too weak: {len(tracked)}"
    cov = np.asarray(s0.cov, np.float64)
    prior_x = np.concatenate([pos0, np.zeros(12)])
    mrot, mx, miters, merr, _ = model.update_state(
        rot0.copy(), pos0.copy(), rot0, prior_x, cov, dscene["img2"],
        tracked, 6, proj=lambda pf: tuple(w2c_dist(pf)))

    ipos = np.asarray(st.pos, np.float64)
    irot = np.asarray(st.rot, np.float64)
    np.testing.assert_allclose(ipos, mx[0:3], atol=5e-4)
    np.testing.assert_allclose(irot, mrot, atol=5e-5)
    np.testing.assert_allclose(float(err), merr, rtol=2e-2)
    assert abs(int(its) - miters) <= 1, (int(its), miters)
    assert (np.linalg.norm(ipos - campos_true)
            < 0.7 * np.linalg.norm(pos0 - campos_true))
