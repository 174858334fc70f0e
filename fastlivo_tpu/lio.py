"""LIO iterated error-state Kalman update — the LiDAR half of the product.

TPU-native re-design of the reference's inline iterated-EKF loop
(reference: src/laserMapping.cpp:1506-1732). The per-point OpenMP loop
(kNN search -> plane fit -> gating -> H row) becomes fully batched masked
tensor math over a padded point set; the sequential iteration structure
(including the exact rematch/convergence protocol) is kept as a
`lax.while_loop` whose carried flags mirror the reference's
`nearest_search_en` / `rematch_num` / `EKF_stop_flg` state machine:

  - iterations run for iterCount = -1 .. max_iter-1 (:1506);
  - kNN against the map runs only when `nearest_search_en` (:1536),
    i.e. on the first iteration and on up to two "rematch" iterations
    triggered by convergence or the antepenultimate iteration (:1700-1705);
  - per-point selection monotonically shrinks between searches: a point
    deselected by the plane-validity or s-score gate is skipped until the
    next re-search resets selection from the 5-NN distance gate
    (:1569-1585 with the `continue` at :1567);
  - the Kalman step uses the prior-anchored form
    solution = K_1[:, :6] Hᵀz + vec - G vec[:6] with
    K_1 = (HᵀH + (P/R)⁻¹)⁻¹ and vec = prior ⊟ current (:1663-1683);
  - on stop, P <- (I - G) P (:1712).

Numerics: the reference runs the whole solve in f64. Here the residual
batch is f32; the 18x18 gain uses the factored form
K_1 = P' (HᵀH P' + I)⁻¹ with P' = P/R — one well-conditioned solve
instead of two explicit inversions — evaluated in f64 (tiny, emulated on
TPU but negligible next to the point batch).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ops import dense_map as dm
from .ops import linalg as linalg_ops
from .ops import plane as plane_ops
from .ops import so3
from .ops import tiled_map as tm
from .ops import voxel_map as vm


from .state import DIM_STATE, NavState


def map_module(m):
    """Backend module for a map value (dispatch by pytree type)."""
    if isinstance(m, dm.DenseMap):
        return dm
    if isinstance(m, tm.TiledMap):
        return tm
    return vm

SQ_DIST_GATE = 5.0  # 5th-NN squared-distance gate (laserMapping.cpp:1549)
RES_GATE = 2.0  # |residual| gate at compaction (:1600)
S_GATE = 0.9  # plane-quality score gate (:1576-1578)
PLANE_THRESH = 0.1  # esti_plane threshold (:1571)
CONV_ROT_DEG = 0.01  # convergence: |dR|*57.3 < 0.01 deg (:1688)
CONV_POS_CM = 0.015  # convergence: |dt|*100 < 0.015 cm (:1688)


class LioResult(NamedTuple):
    state: NavState  # posterior state (cov updated)
    pts_world: jnp.ndarray  # (N, 3) scan in world frame at the posterior
    active: jnp.ndarray  # (N,) bool: points that fed the final update
    res: jnp.ndarray  # (N,) |point-to-plane| residual at the posterior
    n_active: jnp.ndarray  # () int32
    iters: jnp.ndarray  # () int32 iterations executed


@functools.partial(
    jax.jit,
    static_argnames=("max_iter", "knn_radius", "max_probe", "axis_name",
                     "cache_knn", "mixed_gain", "plane_fit", "pallas_knn"),
)
def lio_update(
    state: NavState,  # propagated prior (its cov is the prior covariance)
    m: vm.VoxelMap,
    pts_body: jnp.ndarray,  # (N, 3) downsampled, undistorted scan (lidar frame)
    pmask: jnp.ndarray,  # (N,) bool validity
    lid_rot: jnp.ndarray,  # (3, 3) lidar -> IMU rotation
    lid_off: jnp.ndarray,  # (3,) lidar origin in IMU frame
    laser_point_cov: float,
    max_iter: int = 4,
    knn_radius: int = 2,
    max_probe: int = 12,
    axis_name: str | None = None,
    cache_knn: bool = False,
    mixed_gain: bool = False,
    plane_fit: str = "tls",
    pallas_knn: bool = False,
) -> LioResult:
    """One scan's iterated point-to-plane EKF update (laserMapping.cpp:1506-1732).

    Multi-chip: when called inside `shard_map` with the point batch
    row-partitioned over mesh axis `axis_name` (map + state replicated),
    the HᵀH / Hᵀz partial sums are all-reduced with `lax.psum` and every
    device runs the identical 18x18 solve — the SPMD scheme from
    SURVEY.md §2.3 (residual-row data parallelism, collectives over ICI).
    """
    N = pts_body.shape[0]
    dtype = pts_body.dtype
    prior = state

    p_imu = pts_body @ lid_rot.T + lid_off  # (N,3) in IMU frame
    body_norm_sqrt = jnp.sqrt(
        jnp.sqrt(jnp.sum(pts_body * pts_body, axis=-1))
    )  # |p|^(1/2) for the s score (:1575)

    def world_pts(rot, pos):
        # point batch stays f32; the f64 pose casts down at the boundary
        return p_imu @ rot.astype(dtype).T + pos.astype(dtype)

    map_mod = map_module(m)

    if cache_knn:
        # OPT-IN (~17% faster fused frame, measured): gather the
        # neighborhood candidate block ONCE at the prior pose; rematch
        # re-searches re-rank the cached block against the moved queries
        # instead of re-gathering from the map. Deviation from the
        # reference's full re-search (laserMapping.cpp:1543): queries
        # whose base voxel shifts by the first correction see a clipped
        # neighborhood (measured: ~1 mm pose delta, ~5% match-count
        # delta at a 5 cm prior error; END-TO-END ATE-neutral — 5.71 vs
        # 5.76 mm on a 10 s real-config LIVO run) — kept OFF by default
        # for strict reference parity; see tests/test_lio.py.
        cand0, found0 = map_mod.knn_candidates(
            m, world_pts(prior.rot, prior.pos), radius=knn_radius,
            max_probe=max_probe,
        )

    # plane-fit backend: "tls" (default, centered orthogonal regression)
    # or "ref" (the exact esti_plane A·n=-1 parametrization) — measured
    # end-to-end equivalent, see tests/test_reference_algebra.py
    if plane_fit not in ("tls", "ref"):
        raise ValueError(f"plane_fit={plane_fit!r}")
    fit = plane_ops.fit_plane_ref if plane_fit == "ref" else plane_ops.fit_plane
    if pallas_knn and plane_fit == "ref":
        raise ValueError("pallas_knn implements the tls plane fit only")

    def do_search(rot, pos):
        pw = world_pts(rot, pos)
        if pallas_knn:
            # opt-in fused top-5 + plane fit (ops/pallas_lio.py): one
            # VMEM pass instead of sort + gather + fit kernels; the
            # candidate gather stays on XLA (its strength). Interpret
            # mode off-TPU so the CPU test mesh can execute it.
            from .ops import pallas_lio

            if cache_knn:
                cand, fnd = cand0, found0
            else:
                cand, fnd = map_mod.knn_candidates(
                    m, pw, radius=knn_radius, max_probe=max_probe
                )
            pabcd, plane_ok, nd2_5 = pallas_lio.knn5_plane(
                cand, fnd, pw, PLANE_THRESH,
                interpret=jax.default_backend() != "tpu",
            )
            sel = (nd2_5 <= SQ_DIST_GATE) & pmask
            return sel, pabcd, plane_ok
        if cache_knn:
            neigh, nd2, _ = vm.topk_from_candidates(cand0, found0, pw, 5)
        else:
            neigh, nd2, _ = map_mod.knn(
                m, pw, k=5, radius=knn_radius, max_probe=max_probe
            )
        sel = (nd2[:, -1] <= SQ_DIST_GATE) & pmask
        pabcd, plane_ok = fit(neigh, threshold=PLANE_THRESH)
        return sel, pabcd, plane_ok

    def keep_search(sel, pabcd, plane_ok):
        return sel, pabcd, plane_ok

    # loop-invariant f64 prior terms, hoisted out of the body (the relay
    # charges per executed op in composite executables)
    f64 = jnp.float64
    P = prior.cov.astype(f64) / jnp.asarray(laser_point_cov, f64)
    prior_x = jnp.concatenate(
        [prior.pos, prior.vel, prior.bg, prior.ba, prior.grav]
    )  # (15,) f64
    gain = (linalg_ops.kalman_gain6_mixed if mixed_gain
            else linalg_ops.kalman_gain6)

    def body(carry):
        (it, rot, x, sel, pabcd, plane_ok,
         search_en, rematch, stop, HTH6b, _conv) = carry
        pos = x[0:3]

        sel, pabcd, plane_ok = jax.lax.cond(
            search_en,
            lambda _: do_search(rot, pos),
            lambda args: keep_search(*args),
            (sel, pabcd, plane_ok),
        )

        pw = world_pts(rot, pos)
        pd2 = plane_ops.point_to_plane(pabcd, pw)  # (N,)
        s = 1.0 - 0.9 * jnp.abs(pd2) / body_norm_sqrt
        sel = sel & plane_ok & (s > S_GATE)
        active = sel & (jnp.abs(pd2) <= RES_GATE)

        # H rows: [ (skew(p_imu) Rᵀ n), n ], z = -pd2  (:1607-1629)
        n_vec = pabcd[:, :3]
        Rt_n = n_vec @ rot.astype(dtype)  # (N,3) = (Rᵀ n)ᵀ rows
        A = jnp.cross(p_imu, Rt_n)  # skew(p)·v = p × v
        h = jnp.concatenate([A, n_vec], axis=-1)  # (N,6)
        w = active.astype(dtype)[:, None]
        hw = h * w
        # [HᵀH₆ | Hᵀz] in one (6,7) matmul (and one psum)
        HT = hw.T @ jnp.concatenate([h, -pd2[:, None]], axis=-1)
        if axis_name is not None:
            HT = jax.lax.psum(HT, axis_name)
        HTH6 = HT[:, 0:6].astype(f64)
        HTz = HT[:, 6].astype(f64)

        # gain in f64 (tiny; keeps parity with the reference's
        # double-precision solve) via the exact 6x6 reduction
        K16 = gain(P, HTH6)  # (18,6)
        vec = jnp.concatenate([so3.log(rot.T @ prior.rot), prior_x - x])
        # == K16·HTz + vec - (K16·HTH6)·vec[:6], with K16 factored out
        sol = vec + K16 @ (HTz - HTH6 @ vec[0:6])

        rot = rot @ so3.exp(sol[0:3])
        x = x + sol[3:18]

        conv = (jnp.linalg.norm(sol[0:3]) * 57.3 < CONV_ROT_DEG) & (
            jnp.linalg.norm(sol[3:6]) * 100.0 < CONV_POS_CM
        )
        do_rematch = conv | ((rematch == 0) & (it == max_iter - 2))
        rematch = rematch + do_rematch.astype(jnp.int32)
        stop = (rematch >= 2) | (it == max_iter - 1)

        return (it + 1, rot, x, sel, pabcd, plane_ok,
                do_rematch, rematch, stop, HTH6, conv)

    x0 = jnp.concatenate(
        [state.pos, state.vel, state.bg, state.ba, state.grav]
    )
    init = (
        jnp.int32(-1),
        state.rot, x0,
        jnp.zeros(N, bool),
        jnp.zeros((N, 4), dtype),
        jnp.zeros(N, bool),
        jnp.bool_(True),  # nearest_search_en starts true (:1473)
        jnp.int32(0),
        jnp.bool_(False),
        jnp.zeros((6, 6), jnp.float64),
        jnp.bool_(False),
    )
    (it, rot, x, sel, pabcd, plane_ok,
     _se, _rm, _stop, HTH6b, _conv) = jax.lax.while_loop(
        lambda c: ~c[8], body, init
    )
    pos, vel, bg, ba, grav = (x[0:3], x[3:6], x[6:9], x[9:12], x[12:15])

    # covariance update at stop: P <- (I - [G|0]) P  (:1712), with
    # G = K·HᵀH of the final iteration reconstructed ONCE here instead
    # of materializing an (18,6) product every iteration
    G = gain(P, HTH6b) @ HTH6b
    cov = prior.cov - G @ prior.cov[0:6, :]
    post = NavState(rot, pos, vel, bg, ba, grav, cov)

    pw = world_pts(rot, pos)
    pd2 = plane_ops.point_to_plane(pabcd, pw)
    s = 1.0 - 0.9 * jnp.abs(pd2) / body_norm_sqrt
    sel_f = sel & plane_ok & (s > S_GATE)
    active = sel_f & (jnp.abs(pd2) <= RES_GATE)
    n_act = jnp.sum(active, dtype=jnp.int32)
    if axis_name is not None:
        n_act = jax.lax.psum(n_act, axis_name)
    return LioResult(
        state=post,
        pts_world=pw,
        active=active,
        res=jnp.abs(pd2),
        n_active=n_act,
        iters=it + 1,
    )


class LocalMapTracker:
    """Host-side sliding local-map bookkeeping (lasermap_fov_segment,
    laserMapping.cpp:363-421). Tracks the axis-aligned local cube and
    emits world-frame delete boxes when the sensor nears an edge; the
    actual deletion is the device-side `voxel_map.delete_boxes`.

    Faithfully reproduced reference quirk: with cube_side_length far
    below 2*MOV_THRESHOLD*DET_RANGE = 900 m (e.g. avia.yaml's 20 m),
    need_move fires every frame, the window slides mov_dist=150 m per
    frame in every near-edge axis and runs away from the trajectory
    within a few frames — after which the emitted delete boxes contain
    no points and the map effectively never slides. Configs meant to
    actually bound the map need cube_side_length > 900 m."""

    DET_RANGE = 300.0  # laserMapping.cpp:83
    MOV_THRESHOLD = 1.5  # :90

    def __init__(self, cube_len: float, mode: str = "ref"):
        """`mode`: "ref" reproduces lasermap_fov_segment verbatim
        (including the runaway-slide quirk above); "clamped" (opt-in via
        `capacity.slider: clamped`) re-centers the window on the sensor
        whenever it nears an edge, emitting the vacated slabs as delete
        boxes — the window then tracks the trajectory for ANY cube size
        and the map stays bounded by construction."""
        self.cube_len = float(cube_len)
        self.mode = mode
        self.initialized = False
        self.vmin = [0.0, 0.0, 0.0]
        self.vmax = [0.0, 0.0, 0.0]

    def update(self, pos):
        """pos: length-3 sensor position. Returns list of (lo, hi) boxes
        to delete (possibly empty)."""
        pos = [float(p) for p in pos]
        if not self.initialized:
            half = self.cube_len / 2.0
            self.vmin = [p - half for p in pos]
            self.vmax = [p + half for p in pos]
            self.initialized = True
            return []
        if self.mode == "clamped":
            return self._update_clamped(pos)
        thr = self.MOV_THRESHOLD * self.DET_RANGE
        d_lo = [abs(pos[i] - self.vmin[i]) for i in range(3)]
        d_hi = [abs(pos[i] - self.vmax[i]) for i in range(3)]
        if not any(d_lo[i] <= thr or d_hi[i] <= thr for i in range(3)):
            return []
        mov = max((self.cube_len - 2.0 * thr) * 0.5 * 0.9,
                  self.DET_RANGE * (self.MOV_THRESHOLD - 1.0))
        boxes = []
        nmin, nmax = list(self.vmin), list(self.vmax)
        for i in range(3):
            if d_lo[i] <= thr:
                nmin[i] -= mov
                nmax[i] -= mov
                lo, hi = list(self.vmin), list(self.vmax)
                lo[i] = self.vmax[i] - mov
                boxes.append((lo, hi))
            elif d_hi[i] <= thr:
                nmin[i] += mov
                nmax[i] += mov
                lo, hi = list(self.vmin), list(self.vmax)
                hi[i] = self.vmin[i] + mov
                boxes.append((lo, hi))
        self.vmin, self.vmax = nmin, nmax
        return boxes

    def _update_clamped(self, pos):
        """Re-centering slider: when the sensor is within a quarter cube
        of an edge, shift the window so the sensor is centered again and
        emit the vacated slab per moved axis. The per-frame shift equals
        the sensor's drift from center, so the window follows the
        trajectory exactly and never runs away."""
        thr = 0.25 * self.cube_len
        boxes = []
        nmin, nmax = list(self.vmin), list(self.vmax)
        for i in range(3):
            center = 0.5 * (self.vmin[i] + self.vmax[i])
            shift = pos[i] - center
            near_edge = (pos[i] - self.vmin[i] <= thr
                         or self.vmax[i] - pos[i] <= thr)
            if not near_edge or shift == 0.0:
                continue
            nmin[i] += shift
            nmax[i] += shift
            lo, hi = list(self.vmin), list(self.vmax)
            if shift > 0:
                hi[i] = self.vmin[i] + shift  # vacated low slab
            else:
                lo[i] = self.vmax[i] + shift  # vacated high slab
            boxes.append((lo, hi))
        self.vmin, self.vmax = nmin, nmax
        return boxes
