"""Map/state checkpointing (beyond-reference capability).

The reference persists nothing but an exit-time PCD
(laserMapping.cpp:1839-1855); serving deployments need warm restarts,
so this module snapshots the full estimation state — NavState, the
LiDAR voxel map, and the visual map — to one .npz and restores it.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ops import voxel_map as vm
from ..state import NavState
from .. import visual_map as vmap_mod


def save(path: str | Path, state: NavState, m: vm.VoxelMap,
         visual: vmap_mod.VisualMap | None = None) -> None:
    out = {}
    for name, val in state._asdict().items():
        out[f"state/{name}"] = np.asarray(val)
    for name, val in m._asdict().items():
        out[f"map/{name}"] = np.asarray(val)
    if visual is not None:
        for name, val in visual._asdict().items():
            out[f"vmap/{name}"] = np.asarray(val)
    np.savez_compressed(path, **out)


def load(path: str | Path):
    """Returns (NavState, VoxelMap, VisualMap | None)."""
    z = np.load(path)
    state = NavState(**{
        k.split("/", 1)[1]: jnp.asarray(z[k])
        for k in z.files if k.startswith("state/")
    })
    m = vm.VoxelMap(**{
        k.split("/", 1)[1]: jnp.asarray(z[k])
        for k in z.files if k.startswith("map/")
    })
    vkeys = [k for k in z.files if k.startswith("vmap/")]
    visual = None
    if vkeys:
        visual = vmap_mod.VisualMap(**{
            k.split("/", 1)[1]: jnp.asarray(z[k]) for k in vkeys
        })
    return state, m, visual
