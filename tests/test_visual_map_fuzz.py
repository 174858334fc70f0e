"""Property/fuzz test: visual_map's stateful machinery vs a pure-numpy
model.

The observation rings + refcounted image pool are the trickiest
mutable state in the framework (batched masked scatters, furthest-obs
eviction, pool allocation keyed on live refcounts, compact blanking).
This drives random op sequences through `visual_map` and an
independent step-by-step numpy model, asserting exact equality of the
observable state after every op:

  - n_pts, the full (NP, KO) obs_fid / obs_slot / obs_level matrices,
  - the image pool's img_fid array (slot-exact: the model derives the
    slot from the documented policy — re-push, then empty, then oldest
    dead, then fewest-refs/oldest live, slot index on ties — so the
    implementation's argmin key is checked against the spec, not
    against itself),
  - _live_slot_refs vs a brute-force recount.

Reference semantics being pinned: addObservation cap-20 +
furthest-view eviction (lidar_selection.cpp:913-965, point.cpp:219),
shared_ptr image retention (feature.h:40), AddPoint creation feature
(lidar_selection.cpp:178-190).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastlivo_tpu import visual_map as vmap

NP_, KO, R = 32, 4, 4
H, W = 8, 10


class Model:
    def __init__(self):
        self.n_pts = 0
        self.obs_fid = np.full((NP_, KO), -1, np.int64)
        self.obs_slot = np.zeros((NP_, KO), np.int64)
        self.obs_level = np.zeros((NP_, KO), np.int64)
        self.obs_rcw = np.zeros((NP_, KO, 3, 3), np.float32)
        self.obs_pcw = np.zeros((NP_, KO, 3), np.float32)
        self.n_obs = np.zeros(NP_, np.int64)
        self.pos = np.zeros((NP_, 3), np.float32)
        self.img_fid = np.full(R, -1, np.int64)

    def refs(self):
        out = np.zeros(R, np.int64)
        for i in range(self.n_pts):
            for k in range(KO):
                f = self.obs_fid[i, k]
                s = self.obs_slot[i, k]
                if f >= 0 and 0 <= s < R and self.img_fid[s] == f:
                    out[s] += 1
        return out

    def slot_of(self, fid):
        hits = np.flatnonzero(self.img_fid == fid)
        return int(hits[0]) if len(hits) else 0

    def push_image(self, fid):
        # Slot choice derived from the DOCUMENTED policy, not the
        # implementation's key formula (ADVICE r4): re-push reuses the
        # slot; else prefer empty, then oldest dead, then
        # fewest-refs/oldest live; slot index breaks ties.
        hits = np.flatnonzero(self.img_fid == fid)
        if len(hits):
            self.img_fid[int(hits[0])] = fid
            return
        refs = self.refs()
        cand = []
        for s in range(R):
            f = int(self.img_fid[s])
            if f == -1:
                cand.append((0, 0, 0, s))  # empty
            elif refs[s] == 0:
                cand.append((1, f, 0, s))  # dead: oldest first
            else:
                cand.append((2, int(refs[s]), f, s))  # live: refs, age
        slot = min(cand)[3]
        self.img_fid[slot] = fid

    def add_points(self, pts, rcw, pcw, fid, mask):
        acc = mask & (self.n_pts + np.cumsum(mask.astype(int)) <= NP_)
        slot = self.slot_of(fid)
        for b in range(len(pts)):
            if not acc[b]:
                continue
            i = self.n_pts
            self.pos[i] = pts[b]
            self.n_obs[i] = 1
            self.obs_fid[i, 0] = fid
            self.obs_slot[i, 0] = slot
            self.obs_level[i, 0] = 0
            self.obs_rcw[i, 0] = rcw
            self.obs_pcw[i, 0] = pcw
            self.n_pts += 1

    def add_observations(self, idx, rcw, pcw, fid, level, mask):
        campos = -pcw @ rcw
        slot = self.slot_of(fid)
        for j, i in enumerate(idx):
            if not mask[j]:
                continue
            i = min(max(i, 0), NP_ - 1)
            n = self.n_obs[i]
            camposes = -np.einsum(
                "oj,oji->oi", self.obs_pcw[i], self.obs_rcw[i]
            )
            dist = np.linalg.norm(camposes - campos[None, :], axis=-1)
            dist = np.where(self.obs_fid[i] >= 0, dist, -1.0)
            w = int(np.argmax(dist)) if n >= KO else int(min(n, KO - 1))
            self.obs_fid[i, w] = fid
            self.obs_slot[i, w] = slot
            self.obs_level[i, w] = level[j]
            self.obs_rcw[i, w] = rcw
            self.obs_pcw[i, w] = pcw
            self.n_obs[i] = min(n + 1, KO)

    def compact(self, center, radius):
        keep = [
            i for i in range(self.n_pts)
            if np.max(np.abs(self.pos[i] - center)) <= radius
        ]
        for arr in (self.pos, self.n_obs, self.obs_fid, self.obs_slot,
                    self.obs_level, self.obs_rcw, self.obs_pcw):
            kept = arr[keep].copy()
            arr[: len(keep)] = kept
        self.n_pts = len(keep)
        self.obs_fid[self.n_pts:] = -1


def check(m, md, tag):
    assert int(m.n_pts) == md.n_pts, tag
    np.testing.assert_array_equal(np.asarray(m.img_fid), md.img_fid, tag)
    np.testing.assert_array_equal(np.asarray(m.obs_fid), md.obs_fid, tag)
    n = md.n_pts
    # slot/level only meaningful where an obs exists
    live = md.obs_fid >= 0
    np.testing.assert_array_equal(
        np.asarray(m.obs_slot)[live], md.obs_slot[live], tag
    )
    np.testing.assert_array_equal(
        np.asarray(m.obs_level)[live], md.obs_level[live], tag
    )
    np.testing.assert_array_equal(
        np.asarray(vmap._live_slot_refs(m)), md.refs(), tag
    )
    np.testing.assert_array_equal(
        np.asarray(m.n_obs)[:n], md.n_obs[:n], tag
    )


def test_fuzz_pool_and_obs_rings_vs_model():
    rng = np.random.default_rng(7)
    m = vmap.empty_visual_map(
        n_points=NP_, n_obs=KO, table_size=1 << 8, voxel_cap=4, ring=R,
        height=H, width=W,
    )
    md = Model()
    fid = 0
    rcw = np.eye(3, dtype=np.float32)
    # 80 steps keeps the fast tier inside its 180 s budget while still
    # cycling the 4-slot pool ~20x through every op mix; the op
    # distribution is unchanged from the original 120-step run
    for step in range(80):
        op = rng.choice(["push_add", "obs", "compact"],
                        p=[0.45, 0.45, 0.10])
        if op == "push_add":
            m = vmap.push_image(m, jnp.zeros((H, W)), jnp.int32(fid))
            md.push_image(fid)
            B = int(rng.integers(1, 5))
            pts = rng.uniform(-20, 20, (B, 3)).astype(np.float32)
            mask = rng.random(B) < 0.8
            pcw = rng.uniform(-5, 5, 3).astype(np.float32)
            m = vmap.add_points(
                m, jnp.asarray(pts), jnp.zeros((B, 2), jnp.float32),
                jnp.asarray(rcw), jnp.asarray(pcw),
                jnp.zeros(B, jnp.float32), jnp.int32(fid),
                jnp.asarray(mask),
            )
            md.add_points(pts, rcw, pcw, fid, mask)
            fid += 1
        elif op == "obs" and md.n_pts > 0:
            m = vmap.push_image(m, jnp.zeros((H, W)), jnp.int32(fid))
            md.push_image(fid)
            K = int(rng.integers(1, min(4, md.n_pts) + 1))
            idx = rng.choice(md.n_pts, size=K, replace=False)
            mask = rng.random(K) < 0.85
            level = rng.integers(0, 3, K)
            pcw = rng.uniform(-5, 5, 3).astype(np.float32)
            m = vmap.add_observations(
                m, jnp.asarray(idx, jnp.int32),
                jnp.zeros((K, 2), jnp.float32), jnp.asarray(rcw),
                jnp.asarray(pcw), jnp.zeros(K, jnp.float32),
                jnp.int32(fid), jnp.asarray(level, jnp.int32),
                jnp.asarray(mask),
            )
            md.add_observations(idx, rcw, pcw, fid, level, mask)
            fid += 1
        elif op == "compact":
            center = np.zeros(3, np.float32)
            radius = np.float32(rng.uniform(5, 25))
            m = vmap.compact(m, jnp.asarray(center), jnp.asarray(radius))
            md.compact(center, radius)
        check(m, md, f"step {step} op {op}")


@pytest.mark.slow
def test_fuzz_soak_400_ops_with_huge_fids():
    """Slow-tier soak: 400 ops with frame ids offset past 2^30 (the old
    packed key's failure regime) and a different seed — ~100 pool
    cycles through every op mix, exact equality throughout."""
    rng = np.random.default_rng(23)
    m = vmap.empty_visual_map(
        n_points=NP_, n_obs=KO, table_size=1 << 8, voxel_cap=4, ring=R,
        height=H, width=W,
    )
    md = Model()
    fid = 1 << 30
    rcw = np.eye(3, dtype=np.float32)
    for step in range(400):
        op = rng.choice(["push_add", "obs", "compact"],
                        p=[0.45, 0.45, 0.10])
        if op == "push_add":
            m = vmap.push_image(m, jnp.zeros((H, W)), jnp.int32(fid))
            md.push_image(fid)
            B = int(rng.integers(1, 5))
            pts = rng.uniform(-20, 20, (B, 3)).astype(np.float32)
            mask = rng.random(B) < 0.8
            pcw = rng.uniform(-5, 5, 3).astype(np.float32)
            m = vmap.add_points(
                m, jnp.asarray(pts), jnp.zeros((B, 2), jnp.float32),
                jnp.asarray(rcw), jnp.asarray(pcw),
                jnp.zeros(B, jnp.float32), jnp.int32(fid),
                jnp.asarray(mask),
            )
            md.add_points(pts, rcw, pcw, fid, mask)
            fid += 1
        elif op == "obs" and md.n_pts > 0:
            m = vmap.push_image(m, jnp.zeros((H, W)), jnp.int32(fid))
            md.push_image(fid)
            K = int(rng.integers(1, min(4, md.n_pts) + 1))
            idx = rng.choice(md.n_pts, size=K, replace=False)
            mask = rng.random(K) < 0.85
            level = rng.integers(0, 3, K)
            pcw = rng.uniform(-5, 5, 3).astype(np.float32)
            m = vmap.add_observations(
                m, jnp.asarray(idx, jnp.int32),
                jnp.zeros((K, 2), jnp.float32), jnp.asarray(rcw),
                jnp.asarray(pcw), jnp.zeros(K, jnp.float32),
                jnp.int32(fid), jnp.asarray(level, jnp.int32),
                jnp.asarray(mask),
            )
            md.add_observations(idx, rcw, pcw, fid, level, mask)
            fid += 1
        elif op == "compact":
            center = np.zeros(3, np.float32)
            radius = np.float32(rng.uniform(5, 25))
            m = vmap.compact(m, jnp.asarray(center), jnp.asarray(radius))
            md.compact(center, radius)
        if step % 10 == 9:  # check every 10th op (device sync cost)
            check(m, md, f"soak step {step}")
    check(m, md, "soak final")
