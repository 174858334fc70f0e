"""SoA visual sparse map: points, observation rings, voxel index, image pool.

TPU-native redesign of the reference's pointer-based visual map
(reference: `feat_map` voxel hash of `VOXEL_POINTS*` lidar_selection.h:118
+ common_lib.h:80-146; `Point` with a list of `Feature*` observations
point.h:30-107, feature.h:27-63). The OO pointer graph becomes
fixed-capacity arrays with int32 indices (SURVEY.md §7):

  - points: positions + Shi-Tomasi value + per-point observation ring
    of up to KO=20 entries (cap semantics of lidar_selection.cpp:944-951);
  - observations store everything a `Feature` carries: pixel, bearing,
    world->camera pose at capture, camera center, pyramid level, plus an
    int32 slot into the reference-image pool;
  - the reference keeps an observing image alive exactly as long as
    some Feature references it (shared_ptr, feature.h:40). Here images
    live in a fixed pool of R slots managed with the SAME semantics:
    `push_image` only reuses slots no live observation references
    (refcounts recomputed from the obs rings on device), so a reference
    image survives arbitrarily long loiter/revisit gaps while its
    observation is alive. Only when ALL R slots are live-referenced does
    the pool fall back to evicting the LEAST-REFERENCED image, oldest
    on ties (bounded-memory deviation, reachable only at saturation);
    an observation whose slot was reclaimed is masked out of
    `close_view_obs`;
  - `feat_map` becomes an open-addressing voxel hash whose slots hold up
    to VC point indices (0.5 m voxels, AddPoint lidar_selection.cpp:
    204-230); a full voxel drops further inserts (the reference grows
    the per-voxel vector unboundedly).

All mutation ops are batched masked scatters with static shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

VOXEL_SIZE = 0.5  # lidar_selection.cpp:210
# numpy scalar, not jnp: host-side reads of a device scalar would be a
# D2H transfer, which taints the relay session (voxel_map._mix64_np)
EMPTY = np.int32(-2147483648)


class VisualMap(NamedTuple):
    # points
    pos: jnp.ndarray  # (NP, 3) f32 world position
    value: jnp.ndarray  # (NP,) f32 Shi-Tomasi score
    n_obs: jnp.ndarray  # (NP,) i32
    n_pts: jnp.ndarray  # () i32 allocation cursor
    # observation rings
    # NOTE round 4: the bearing f (= cam2world(px), point.cpp Feature::f)
    # and the camera center campos (= -rcw^T pcw) are NOT stored — both
    # are exact functions of stored fields, and every camera frame pays
    # a full copy of each obs array it scatters into (the obs rings are
    # the VIO step's dominant HBM traffic), so 6 derived floats per obs
    # were ~31 MB of pure copy per frame at the default capacities.
    obs_px: jnp.ndarray  # (NP, KO, 2) f32
    obs_rcw: jnp.ndarray  # (NP, KO, 3, 3) f32 world->cam rotation
    obs_pcw: jnp.ndarray  # (NP, KO, 3) f32 world->cam translation
    obs_slot: jnp.ndarray  # (NP, KO) i32 image pool slot
    obs_fid: jnp.ndarray  # (NP, KO) i32 frame id (-1 empty)
    obs_level: jnp.ndarray  # (NP, KO) i32 feature level
    # voxel hash (slot/check scheme, see ops/voxel_map.py)
    vox_keys: jnp.ndarray  # (T,) i32 31-bit verify hash; EMPTY = free
    vox_count: jnp.ndarray  # (T,) i32
    vox_idx: jnp.ndarray  # (T, VC) i32 point indices
    # reference image pool (refcounted allocation, see push_image)
    imgs: jnp.ndarray  # (R, H, W) f32 or u8
    img_fid: jnp.ndarray  # (R,) i32 frame id stored in slot (-1 empty)


def empty_visual_map(
    n_points: int = 1 << 16,
    n_obs: int = 20,
    table_size: int = 1 << 18,
    voxel_cap: int = 16,
    ring: int = 64,
    height: int = 512,
    width: int = 640,
    dtype=jnp.float32,
    img_dtype=None,
) -> VisualMap:
    """`img_dtype=jnp.uint8` (the shipped default via
    `capacity.frame_ring_u8`) stores the reference-image pool quantized
    to u8 — 4x deeper pool per byte of HBM, and actually CLOSER to the
    reference, which keeps its frames as u8 cv::Mats (frame.h via
    feature.h:40); an f32 pool preserves the fractional BGR->gray
    weights the reference rounds away. Patch warps convert to f32 after
    the gather, so downstream math is unchanged up to the <=0.5-level
    quantization of the stored ref image."""
    assert table_size & (table_size - 1) == 0
    NP, KO, T, VC, R = n_points, n_obs, table_size, voxel_cap, ring
    img_dtype = dtype if img_dtype is None else img_dtype
    return VisualMap(
        pos=jnp.zeros((NP, 3), dtype),
        value=jnp.zeros(NP, dtype),
        n_obs=jnp.zeros(NP, jnp.int32),
        n_pts=jnp.int32(0),
        obs_px=jnp.zeros((NP, KO, 2), dtype),
        obs_rcw=jnp.zeros((NP, KO, 3, 3), dtype),
        obs_pcw=jnp.zeros((NP, KO, 3), dtype),
        obs_slot=jnp.zeros((NP, KO), jnp.int32),
        obs_fid=jnp.full((NP, KO), -1, jnp.int32),
        obs_level=jnp.zeros((NP, KO), jnp.int32),
        vox_keys=jnp.full(T, EMPTY, jnp.int32),
        vox_count=jnp.zeros(T, jnp.int32),
        vox_idx=jnp.zeros((T, VC), jnp.int32),
        imgs=jnp.zeros((R, height, width), img_dtype),
        img_fid=jnp.full(R, -1, jnp.int32),
    )


def voxel_of(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.floor(p / VOXEL_SIZE).astype(jnp.int32)


def _slot_check(keys: jnp.ndarray, mask: int):
    from .ops.voxel_map import _slot_check as sc

    return sc(keys, mask)


def _live_slot_refs(m: VisualMap, obs_axis: str | None = None) -> jnp.ndarray:
    """(R,) count of live observations referencing each image slot.

    An observation holds its image alive iff its point is allocated,
    the obs exists (fid >= 0), and the slot still stores that fid —
    the batched equivalent of the reference's shared_ptr refcount on
    Feature::img (feature.h:40).

    `obs_axis` (--sharded-map inside shard_map): the obs rings are this
    device's ROW SLAB of the global (NP, KO) rings; counts are computed
    over the local rows (alive gate on GLOBAL row ids) and
    psum-combined — exact (disjoint rows, integer sum)."""
    NPl, KO = m.obs_fid.shape
    # R from img_fid, NOT imgs: with a device-sharded pool (parallel
    # product --sharded-map) imgs inside shard_map is the LOCAL block
    # while slots stay global; img_fid is always the full (R,) array
    R = m.img_fid.shape[0]
    row0 = (0 if obs_axis is None
            else jax.lax.axis_index(obs_axis) * NPl)
    alive = (row0 + jnp.arange(NPl, dtype=jnp.int32) < m.n_pts)[:, None]
    slot = jnp.clip(m.obs_slot, 0, R - 1)
    ok = alive & (m.obs_fid >= 0) & (m.img_fid[slot] == m.obs_fid)
    refs = (
        jnp.zeros(R, jnp.int32)
        .at[jnp.where(ok, slot, R)]
        .add(1, mode="drop")
    )
    if obs_axis is not None:
        refs = jax.lax.psum(refs, obs_axis)
    return refs


def _gather_obs(m: VisualMap, safe: jnp.ndarray,
                obs_axis: str | None = None):
    """Replicated (K, KO, ...) obs fields for GLOBAL point rows `safe`.

    Plain gathers when the rings are replicated; with `obs_axis` each
    device gathers its OWNED rows from its local slab, zeroes the rest,
    and the psum reconstructs every row exactly (disjoint ownership:
    one owner's value plus zeros). Returns (px, rcw, pcw, slot, fid,
    level)."""
    if obs_axis is None:
        return (m.obs_px[safe], m.obs_rcw[safe], m.obs_pcw[safe],
                m.obs_slot[safe], m.obs_fid[safe], m.obs_level[safe])
    NPl = m.obs_fid.shape[0]
    ls = safe - jax.lax.axis_index(obs_axis) * NPl
    mine = (ls >= 0) & (ls < NPl)
    lsafe = jnp.clip(ls, 0, NPl - 1)

    def g(a):
        v = a[lsafe]
        mm = mine.reshape((mine.shape[0],) + (1,) * (v.ndim - 1))
        return jax.lax.psum(jnp.where(mm, v, 0), obs_axis)

    return (g(m.obs_px), g(m.obs_rcw), g(m.obs_pcw),
            g(m.obs_slot), g(m.obs_fid), g(m.obs_level))


def _slot_of_fid(m: VisualMap, fid: jnp.ndarray) -> jnp.ndarray:
    """Pool slot holding frame `fid` (0 if absent — an absent fid makes
    the stored obs fail `close_view_obs`'s img_fid check, same as the
    pre-pool ring behavior)."""
    return jnp.argmax(m.img_fid == fid).astype(jnp.int32)


def push_slot(m: VisualMap, fid: jnp.ndarray,
              obs_axis: str | None = None) -> jnp.ndarray:
    """The pool slot `push_image` would write `fid` into (the argmin of
    the documented eviction key) — exposed so the sharded-pool writer
    (vio.vio_frame_step with vmap_axis) can compute the slot from the
    replicated metadata and apply the image write owner-locally."""
    refs = _live_slot_refs(m, obs_axis)
    R = m.img_fid.shape[0]
    # age RANK of each slot's fid within the pool (ties — the -1
    # empties — broken by slot index, matching argmin's lowest-index
    # pick); ranking replaces raw fids in the key so the scheme is
    # independent of fid magnitude
    sl = jnp.arange(R, dtype=jnp.int32)
    older = (m.img_fid[None, :] < m.img_fid[:, None]) | (
        (m.img_fid[None, :] == m.img_fid[:, None])
        & (sl[None, :] < sl[:, None])
    )
    rank = jnp.sum(older, axis=1, dtype=jnp.int32)  # unique 0..R-1
    live_key = (jnp.minimum(refs, 200) + 1) * R + rank
    key = jnp.where(refs > 0, live_key, rank)
    key = jnp.where(m.img_fid == fid, jnp.int32(-2), key)
    return jnp.argmin(key).astype(jnp.int32)


@jax.jit
def push_image(m: VisualMap, img: jnp.ndarray, fid: jnp.ndarray) -> VisualMap:
    """Store the frame's grayscale image in the pool.

    Slot policy (reference-parity shared_ptr semantics, feature.h:40):
    prefer empty slots, then the oldest DEAD slot (stored image no live
    observation references); only when every slot is live-referenced
    evict the LEAST-REFERENCED image, oldest first on ties — the only
    point the bounded pool can diverge from the reference's unbounded
    retention, and least-refs maximizes the observations that survive
    it (a heavily-referenced loiter keyframe outlives recent
    one-observation frames). Re-pushing a fid already in the pool
    reuses its slot (idempotent).

    The key scheme (in push_slot): re-push (-2) < empty/dead (age rank:
    empties rank lowest, then dead oldest-first) < live
    ((1+min(refs,200))*R + rank: fewest refs, then oldest). Ranks are
    computed WITHIN the pool, so the key never depends on fid magnitude
    (no overflow at any uptime; ADVICE r4) and maxes at 202*R."""
    slot = push_slot(m, fid)
    if jnp.issubdtype(m.imgs.dtype, jnp.integer):
        img = jnp.round(jnp.clip(img, 0.0, 255.0))
    return m._replace(
        imgs=m.imgs.at[slot].set(img.astype(m.imgs.dtype)),
        img_fid=m.img_fid.at[slot].set(fid),
    )


@functools.partial(jax.jit, static_argnames=("max_probe", "obs_axis"))
def add_points(
    m: VisualMap,
    pts: jnp.ndarray,  # (B, 3) world positions
    px: jnp.ndarray,  # (B, 2) pixel of first observation
    rcw: jnp.ndarray,  # (3, 3) current world->cam rotation
    pcw: jnp.ndarray,  # (3,) current world->cam translation
    value: jnp.ndarray,  # (B,) Shi-Tomasi scores
    fid: jnp.ndarray,  # () frame id
    mask: jnp.ndarray,  # (B,) bool
    max_probe: int = 12,
    obs_axis: str | None = None,
) -> VisualMap:
    """Batched AddPoint (lidar_selection.cpp:204-230) + addFrameRef with
    the creation Feature (addSparseMap :178-190, level=0).

    `obs_axis`: row-sharded obs rings — the pos/value/index/counter
    updates stay replicated (identical on every device) while each obs
    scatter lands only on the row's owner (local index, out-of-slab
    rows dropped)."""
    # cast to the map dtype here so f64 callers don't rely on implicit
    # scatter downcasting (a hard error in future JAX releases)
    dt = m.pos.dtype
    pts, px, value = (x.astype(dt) for x in (pts, px, value))
    rcw, pcw = rcw.astype(dt), pcw.astype(dt)
    NP = m.pos.shape[0]

    # --- allocate point indices -----------------------------------------
    mask = mask & (m.n_pts + jnp.cumsum(mask.astype(jnp.int32)) <= NP)
    order_idx = jnp.cumsum(mask.astype(jnp.int32)) - 1
    idx = jnp.where(mask, m.n_pts + order_idx, NP)  # NP = dropped
    n_new = jnp.sum(mask, dtype=jnp.int32)

    if obs_axis is None:
        oidx = idx
    else:
        # owner-local obs row: out-of-slab rows map past the local
        # capacity and drop (NP here is the GLOBAL capacity; the local
        # slab is m.obs_fid.shape[0] rows)
        NPl = m.obs_fid.shape[0]
        ol = idx - jax.lax.axis_index(obs_axis) * NPl
        oidx = jnp.where((ol >= 0) & (ol < NPl) & (idx < NP), ol, NPl)
    mm = m._replace(
        pos=m.pos.at[idx].set(pts, mode="drop"),
        value=m.value.at[idx].set(value, mode="drop"),
        n_obs=m.n_obs.at[idx].set(1, mode="drop"),
        n_pts=m.n_pts + n_new,
        obs_px=m.obs_px.at[oidx, 0].set(px, mode="drop"),
        obs_rcw=m.obs_rcw.at[oidx, 0].set(rcw, mode="drop"),
        obs_pcw=m.obs_pcw.at[oidx, 0].set(pcw, mode="drop"),
        obs_slot=m.obs_slot.at[oidx, 0].set(_slot_of_fid(m, fid), mode="drop"),
        obs_fid=m.obs_fid.at[oidx, 0].set(fid, mode="drop"),
        obs_level=m.obs_level.at[oidx, 0].set(0, mode="drop"),
    )

    vk, vc, vi = _voxel_index_insert(
        mm.vox_keys, mm.vox_count, mm.vox_idx, pts, idx, mask, max_probe
    )
    return mm._replace(vox_keys=vk, vox_count=vc, vox_idx=vi)


def _voxel_index_insert(vk, vc, vi, pts, idx, mask, max_probe):
    """Insert point indices into the feat_map voxel hash (AddPoint
    :204-230 batched): group the batch by voxel, claim/find the voxel's
    slot, append up to the per-voxel capacity. Shared by add_points and
    compact's index rebuild."""
    B = pts.shape[0]
    T = vk.shape[0]
    VC = vi.shape[1]
    tmask = T - 1
    keys = voxel_of(pts)
    # invalid rows get a shared sentinel key so they can't sit inside (and
    # block) a real voxel's sorted group
    keys = jnp.where(mask[:, None], keys, EMPTY + 1)
    slot0, checks = _slot_check(keys, tmask)
    # rank of each point within its voxel (stable in-batch ordering)
    ord_ = jnp.lexsort((jnp.arange(B), keys[:, 0], keys[:, 1], keys[:, 2]))
    ks = keys[ord_]
    checks_s = checks[ord_]
    same = jnp.all(ks == jnp.roll(ks, 1, axis=0), axis=-1)
    same = same.at[0].set(False)
    # rank via segmented cumsum
    seg_start = ~same
    grp = jnp.cumsum(seg_start) - 1
    pos_in_batch = jnp.arange(B)
    first_of_grp = (
        jnp.full(B, B, jnp.int32).at[grp].min(pos_in_batch.astype(jnp.int32))
    )
    rank = pos_in_batch.astype(jnp.int32) - first_of_grp[grp]
    is_leader = seg_start & mask[ord_]

    slot = slot0[ord_]
    done = ~mask[ord_]
    resolved = jnp.full(B, T, jnp.int32)
    for _ in range(max_probe):
        cur = vk[slot]
        is_empty = cur == EMPTY
        is_mine = (cur == checks_s) & ~done
        claim = is_empty & is_leader & ~done
        claim_idx = jnp.where(claim, slot, T)
        vk = vk.at[claim_idx].set(checks_s, mode="drop")
        won = claim & (vk[slot] == checks_s)
        hit = is_mine | won
        resolved = jnp.where(hit & (resolved == T), slot, resolved)
        done = done | hit
        slot = (slot + 1) & tmask
    # followers share the leader's resolved slot
    lead_res = jnp.full(B, T, jnp.int32).at[grp].min(resolved)
    res_all = lead_res[grp]
    write_pos = vc[jnp.minimum(res_all, T - 1)] + rank
    ok = (res_all < T) & mask[ord_] & (write_pos < VC)
    w_slot = jnp.where(ok, res_all, T)
    vi = vi.at[w_slot, jnp.minimum(write_pos, VC - 1)].set(
        idx[ord_], mode="drop"
    )
    # per-voxel count increment: number of accepted rows per group,
    # applied once at each group's leader row
    inc = jnp.zeros(B, jnp.int32).at[grp].add(ok.astype(jnp.int32))
    vc = vc.at[jnp.where(is_leader, res_all, T)].add(inc[grp], mode="drop")
    return vk, vc, vi


@jax.jit
def compact(m: VisualMap, center: jnp.ndarray, radius) -> VisualMap:
    """Reclaim visual-map capacity: keep only points within `radius`
    (inf-norm) of `center`, compacted to the front in original order,
    and rebuild the voxel index from scratch.

    The reference's feat_map grows without bound (AddPoint only ever
    appends); this is the visual analogue of its sliding LOCAL MAP
    (lasermap_fov_segment, laserMapping.cpp:363-421) so unbounded
    trajectories cannot exhaust the fixed point pool. Triggered by the
    pipeline on a load-factor threshold, like the lidar-map rebuild."""
    NP = m.pos.shape[0]
    alive = jnp.arange(NP, dtype=jnp.int32) < m.n_pts
    keep = alive & (
        jnp.max(jnp.abs(m.pos - center[None, :]), axis=-1) <= radius
    )
    perm = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    n2 = jnp.sum(keep, dtype=jnp.int32)

    def g(a):
        return a[perm]

    # blank dropped rows' observations: a row reused later by add_points
    # only writes obs slot 0, and with pool retention the stale entries'
    # reference images can STILL be alive — a stale obs would otherwise
    # be a selectable close_view_obs candidate for the NEW point
    # (tests/test_visual_map.py::test_compact_blanks_dropped_obs)
    new_alive = jnp.arange(NP, dtype=jnp.int32) < n2
    m2 = m._replace(
        pos=g(m.pos), value=g(m.value), n_obs=g(m.n_obs), n_pts=n2,
        obs_px=g(m.obs_px), obs_rcw=g(m.obs_rcw),
        obs_pcw=g(m.obs_pcw),
        obs_slot=g(m.obs_slot),
        obs_fid=jnp.where(new_alive[:, None], g(m.obs_fid), -1),
        obs_level=g(m.obs_level),
        vox_keys=jnp.full_like(m.vox_keys, EMPTY),
        vox_count=jnp.zeros_like(m.vox_count),
        vox_idx=jnp.zeros_like(m.vox_idx),
    )
    vk, vc, vi = _voxel_index_insert(
        m2.vox_keys, m2.vox_count, m2.vox_idx, m2.pos,
        jnp.arange(NP, dtype=jnp.int32), new_alive, 12,
    )
    return m2._replace(vox_keys=vk, vox_count=vc, vox_idx=vi)


@functools.partial(jax.jit, static_argnames=("max_probe",))
def gather_voxel_points(
    m: VisualMap, vox: jnp.ndarray, vmask: jnp.ndarray, max_probe: int = 12
):
    """feat_map lookup for a batch of voxel keys (addFromSparseMap
    :423-447): (Nv, 3) int voxel coords -> (Nv, VC) point indices +
    validity."""
    T = m.vox_keys.shape[0]
    VC = m.vox_idx.shape[1]
    tmask = T - 1
    slot, qcheck = _slot_check(vox, tmask)
    qcheck = jnp.where(vmask, qcheck, EMPTY + 1)
    # the probe chain is `max_probe` CONSECUTIVE slots — gather them in
    # ONE (Nv, P) lookup and take the first key hit, instead of P
    # sequential gather/compare rounds (the degraded relay prices the
    # executable per op; this was ~4x the op count of the whole lookup)
    probes = (slot[:, None]
              + jnp.arange(max_probe, dtype=jnp.int32)[None, :]) & tmask
    hit = m.vox_keys[probes] == qcheck[:, None]  # (Nv, P)
    found = jnp.any(hit, axis=1)
    first = jnp.argmax(hit, axis=1)
    resolved = jnp.take_along_axis(probes, first[:, None], axis=1)[:, 0]
    safe = jnp.where(found, resolved, 0)
    idx = m.vox_idx[safe]  # (Nv, VC)
    cnt = jnp.where(found, m.vox_count[safe], 0)
    valid = jnp.arange(VC)[None, :] < cnt[:, None]
    return idx, valid


@functools.partial(jax.jit, static_argnames=("obs_axis",))
def close_view_obs(m: VisualMap, idx: jnp.ndarray, campos: jnp.ndarray,
                   obs_axis: str | None = None):
    """Point::getCloseViewObs (point.cpp:141-178) batched over point
    indices (K,): pick the observation whose viewing ray has max cosine
    to the current one; reject below cos 60 deg.

    Returns dict of ref-obs fields + ok (K,) (False also when the obs
    image slot was recycled). `obs_axis`: row-sharded obs rings — the
    K rows' fields are owner-gathered (psum of disjoint contributions,
    see _gather_obs) and the selection math runs replicated."""
    K = idx.shape[0]
    R = m.img_fid.shape[0]  # see _live_slot_refs: imgs may be a shard
    safe = jnp.clip(idx, 0, m.pos.shape[0] - 1)
    o_px, o_rcw, o_pcw, o_slot, o_fid, o_level = _gather_obs(
        m, safe, obs_axis)
    pos = m.pos[safe]  # (K, 3)
    obs_dir = campos[None, :] - pos
    obs_dir = obs_dir / (jnp.linalg.norm(obs_dir, axis=-1, keepdims=True) + 1e-12)
    # camera centers derived from the stored pose (campos = -pcw @ rcw,
    # the exact expression add_* evaluated when it was stored)
    camposes = -jnp.einsum("koj,koji->koi", o_pcw, o_rcw)  # (K, KO, 3)
    dirs = camposes - pos[:, None, :]  # (K, KO, 3)
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    cos = jnp.einsum("kj,koj->ko", obs_dir, dirs)
    fid = o_fid  # (K, KO)
    valid = fid >= 0
    # image still in ring?
    img_ok = m.img_fid[jnp.clip(o_slot, 0, R - 1)] == fid
    usable = valid & img_ok
    cos = jnp.where(usable, cos, -2.0)
    best = jnp.argmax(cos, axis=-1)  # (K,)
    best_cos = jnp.take_along_axis(cos, best[:, None], axis=1)[:, 0]
    ok = best_cos > 0.5

    def take(a):
        return jnp.take_along_axis(
            a, best.reshape(K, *([1] * (a.ndim - 1))), axis=1
        )[:, 0]

    return {
        "px": take(o_px),
        "rcw": take(o_rcw),
        "pcw": take(o_pcw),
        "campos": take(camposes),
        "slot": take(o_slot),
        "fid": take(fid),
        "level": take(o_level),
        "cos": best_cos,
        "ok": ok,
    }


@functools.partial(jax.jit, static_argnames=("obs_axis",))
def add_observations(
    m: VisualMap,
    idx: jnp.ndarray,  # (K,) point indices (unique)
    px: jnp.ndarray,  # (K, 2)
    rcw: jnp.ndarray,  # (3, 3)
    pcw: jnp.ndarray,  # (3,)
    value: jnp.ndarray,  # (K,) new Shi-Tomasi values
    fid: jnp.ndarray,  # ()
    level: jnp.ndarray,  # (K,) search levels
    mask: jnp.ndarray,  # (K,) bool add_flag
    obs_axis: str | None = None,
) -> VisualMap:
    """Batched addObservation append (lidar_selection.cpp:913-965): when
    the ring is full, overwrite the furthest-view observation
    (getFurthestViewObs eviction, point.cpp:219-247).

    `obs_axis`: row-sharded rings — eviction targets are computed from
    OWNER-GATHERED fields (replicated result) and the scatters land
    owner-locally, so every device derives the identical write plan."""
    dt = m.pos.dtype
    px, value = px.astype(dt), value.astype(dt)
    rcw, pcw = rcw.astype(dt), pcw.astype(dt)
    KO = m.obs_px.shape[1]
    NP = m.pos.shape[0]
    safe = jnp.clip(idx, 0, NP - 1)
    campos = -pcw @ rcw
    n = m.n_obs[safe]
    full = n >= KO
    _, o_rcw, o_pcw, _, o_fid, _ = _gather_obs(m, safe, obs_axis)
    camposes = -jnp.einsum("koj,koji->koi", o_pcw, o_rcw)
    dist = jnp.linalg.norm(
        camposes - campos[None, None, :], axis=-1
    )  # (K, KO)
    dist = jnp.where(o_fid >= 0, dist, -1.0)
    evict = jnp.argmax(dist, axis=-1)
    w = jnp.where(full, evict, jnp.minimum(n, KO - 1))  # (K,)
    widx = jnp.where(mask, safe, NP)
    if obs_axis is None:
        owidx = widx
    else:
        NPl = m.obs_fid.shape[0]
        ol = widx - jax.lax.axis_index(obs_axis) * NPl
        owidx = jnp.where((ol >= 0) & (ol < NPl) & (widx < NP), ol, NPl)
    slot = _slot_of_fid(m, fid)
    return m._replace(
        value=m.value.at[widx].set(value, mode="drop"),
        n_obs=m.n_obs.at[widx].set(jnp.minimum(n + 1, KO), mode="drop"),
        obs_px=m.obs_px.at[owidx, w].set(px, mode="drop"),
        obs_rcw=m.obs_rcw.at[owidx, w].set(rcw, mode="drop"),
        obs_pcw=m.obs_pcw.at[owidx, w].set(pcw, mode="drop"),
        obs_slot=m.obs_slot.at[owidx, w].set(slot, mode="drop"),
        obs_fid=m.obs_fid.at[owidx, w].set(fid, mode="drop"),
        obs_level=m.obs_level.at[owidx, w].set(level, mode="drop"),
    )
