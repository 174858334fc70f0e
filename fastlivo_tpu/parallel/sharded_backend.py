"""Product map backend for the block-sharded tiled map (--sharded-map).

`parallel/sharded_map.py` holds the library-level sharded-map kernels
(ownership striping, halo extraction, snapshot assembly); this module
packages them behind the same duck-typed surface the `Pipeline` uses
for its single-device map modules (`insert` / `delete_boxes` /
`compact` / `extract_points`), so `Pipeline(cfg, mesh=...,
sharded_map=True)` swaps the backend without touching the frame logic.

The map state is a `tiled_map.TiledMap` pytree with a LEADING DEVICE
AXIS (one shard per device, placed with `NamedSharding(mesh, P(axis))`
on every leaf). Each device's pool holds only the tiles it OWNS
(slab-striped along x, sharded_map.owner_of), so per-device map HBM is
~1/N of the replicated-map product path — the memory axis SURVEY §2.3
and VERDICT r4 called for. Total capacity = n_dev * pool_per_shard.

Ops (each runs per-shard inside shard_map, compiled once per shape):
  insert       — ownership-masked insert of a replicated world batch
                 (ikd_Tree.cpp:382-457 semantics preserved per shard:
                 the owned tiles see exactly the inserts the replicated
                 map would apply to them)
  delete_boxes — applied to every shard (box deletion is cell-local)
  compact      — per-shard pool compaction (sharded_map.sharded_compact)
  extract_points — host-side merge of all shards' live points (PCD)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import tiled_map as tm
from . import sharded_map as sm


class ShardedTiledBackend:
    """Duck-typed `_map_mod` replacement operating on sharded TiledMaps."""

    is_sharded = True

    def __init__(self, mesh: Mesh, axis: str = "dp",
                 slab: int = sm.SLAB_TILES):
        self.mesh = mesh
        self.axis = axis
        self.slab = slab
        self.n = mesh.shape[axis]
        self._insert_fn = None
        self._delete_cache = {}
        self._compact_fn = None

    # -- construction ----------------------------------------------------
    def empty(self, dims, pool_tiles_total: int, voxel_size: float):
        """Empty shards; per-shard pool = total/n (floor, min 256) so the
        TOTAL capacity matches the single-device `tiled_pool` while
        per-device HBM scales down with the mesh."""
        per = max(pool_tiles_total // self.n, 256)
        shards = sm.make_shards(self.n, dims, per, voxel_size)
        sharding = NamedSharding(self.mesh, P(self.axis))
        return jax.tree.map(lambda x: jax.device_put(x, sharding), shards)

    # -- specs -----------------------------------------------------------
    def _specs(self, shards):
        shd = jax.tree.map(lambda _: P(self.axis), shards)
        return shd

    # -- ops -------------------------------------------------------------
    def insert(self, shards, world: jnp.ndarray, mask: jnp.ndarray,
               max_probe: int = 0):
        if self._insert_fn is None:
            n, axis, slab = self.n, self.axis, self.slab

            def local(shard, world, mask):
                l = jax.tree.map(lambda x: x[0], shard)
                my = jax.lax.axis_index(axis)
                l2 = sm.shard_insert(l, world, mask, my, n, slab)
                return jax.tree.map(lambda x: x[None], l2)

            def build(shard, world, mask):
                shd = jax.tree.map(lambda _: P(axis), shard)
                return shard_map(
                    local, mesh=self.mesh,
                    in_specs=(shd, P(), P()), out_specs=shd,
                    check_vma=False,
                )(shard, world, mask)

            self._insert_fn = jax.jit(build)
        return self._insert_fn(shards, world, mask)

    def delete_boxes(self, shards, boxes_lo: jnp.ndarray,
                     boxes_hi: jnp.ndarray):
        key = boxes_lo.shape[0]
        fn = self._delete_cache.get(key)
        if fn is None:
            axis = self.axis

            def local(shard, lo, hi):
                l = jax.tree.map(lambda x: x[0], shard)
                l2 = tm.delete_boxes(l, lo, hi)
                return jax.tree.map(lambda x: x[None], l2)

            def build(shard, lo, hi):
                shd = jax.tree.map(lambda _: P(axis), shard)
                return shard_map(
                    local, mesh=self.mesh,
                    in_specs=(shd, P(), P()), out_specs=shd,
                    check_vma=False,
                )(shard, lo, hi)

            fn = jax.jit(build)
            self._delete_cache[key] = fn
        return fn(shards, boxes_lo, boxes_hi)

    def compact(self, shards):
        if self._compact_fn is None:
            self._compact_fn = jax.jit(
                lambda s: sm.sharded_compact(self.mesh, s, self.axis)
            )
        return self._compact_fn(shards)

    # -- host-side helpers ----------------------------------------------
    def pool_per_shard(self, shards) -> int:
        return shards.slot_key.shape[1]

    def max_occupancy(self, shards) -> float:
        """Max allocated slots over shards — the load-factor input (the
        fullest shard is the binding pool constraint)."""
        return float(np.max(np.asarray(shards.n_alloc)))

    def extract_points(self, shards):
        """All live points across shards (host). Owned tiles are
        globally disjoint, so a plain concat is exact.

        Materializes each leaf ONCE and applies tiled_map's liveness
        rule (cell_check == mix64(slot_key), slot < n_alloc) in numpy —
        the old per-device loop pulled the whole stacked map N times
        and re-uploaded every shard to run the device extract (N x
        map-size transfers; minutes through the relay for a --map-pcd
        or sharded --save-ckpt at shipped capacities)."""
        from ..ops.voxel_map import _mix64_np

        slot_key = np.asarray(shards.slot_key)      # (n, T, 3)
        cell_check = np.asarray(shards.cell_check)  # (n, T*TC)
        pts = np.asarray(shards.pts)                # (n, T*TC, 3)
        n_alloc = np.asarray(shards.n_alloc)        # (n,)
        T = slot_key.shape[1]
        parts = []
        for d in range(self.n):
            chk = (_mix64_np(slot_key[d]) & np.uint32(0x7FFFFFFF)).astype(
                np.int32)
            cc = cell_check[d].reshape(T, tm.TC)
            alloc = np.arange(T) < int(n_alloc[d])
            live = (cc == chk[:, None]) & alloc[:, None]
            p = pts[d].reshape(T, tm.TC, 3)[live]
            if len(p):
                parts.append(p)
        if not parts:
            return np.zeros((0, 3), np.float32), 0
        allp = np.concatenate(parts, axis=0)
        return allp, len(allp)
