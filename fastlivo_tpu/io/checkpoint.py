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

from ..ops import dense_map as dm
from ..ops import tiled_map as tm
from ..ops import voxel_map as vm
from ..state import NavState
from .. import visual_map as vmap_mod

_MAP_TYPES = {"voxel": vm.VoxelMap, "dense": dm.DenseMap, "tiled": tm.TiledMap}


def _map_type_name(m) -> str:
    if isinstance(m, dm.DenseMap):
        return "dense"
    if isinstance(m, tm.TiledMap):
        return "tiled"
    return "voxel"


def save(path: str | Path, state: NavState, m,
         visual: vmap_mod.VisualMap | None = None, calib=None) -> None:
    """`calib`: optional imu.ImuCalib — with it, a restored process
    resumes WITHOUT the 200-sample static IMU re-initialization (the
    calibration is rig state, not trajectory state)."""
    out = {"map_type": np.array(_map_type_name(m))}
    for name, val in state._asdict().items():
        out[f"state/{name}"] = np.asarray(val)
    for name, val in m._asdict().items():
        out[f"map/{name}"] = np.asarray(val)
    if visual is not None:
        for name, val in visual._asdict().items():
            out[f"vmap/{name}"] = np.asarray(val)
    if calib is not None:
        for name, val in calib._asdict().items():
            out[f"calib/{name}"] = np.asarray(val)
    np.savez_compressed(path, **out)


def load(path: str | Path):
    """Returns (NavState, map (any backend), VisualMap | None,
    ImuCalib | None). Older 3-part snapshots load with calib None."""
    path = Path(path)
    if not path.exists() and path.suffix != ".npz":
        # np.savez appends .npz when missing; accept the same path the
        # save() caller passed (review r5: save('warm') wrote warm.npz
        # but load('warm') raised FileNotFoundError)
        path = path.with_suffix(path.suffix + ".npz")
    z = np.load(path)
    state = NavState(**{
        k.split("/", 1)[1]: jnp.asarray(z[k])
        for k in z.files if k.startswith("state/")
    })
    cls = _MAP_TYPES[str(z["map_type"])] if "map_type" in z.files else vm.VoxelMap
    m = cls(**{
        k.split("/", 1)[1]: jnp.asarray(z[k])
        for k in z.files if k.startswith("map/")
    })
    vkeys = [k for k in z.files if k.startswith("vmap/")]
    visual = None
    if vkeys:
        # ignore fields older snapshots carried that the current
        # VisualMap no longer stores (obs_f/obs_campos are derived
        # since round 4)
        fields = set(vmap_mod.VisualMap._fields)
        visual = vmap_mod.VisualMap(**{
            k.split("/", 1)[1]: jnp.asarray(z[k]) for k in vkeys
            if k.split("/", 1)[1] in fields
        })
    ckeys = [k for k in z.files if k.startswith("calib/")]
    calib = None
    if ckeys:
        from .. import imu as imu_mod

        calib = imu_mod.ImuCalib(**{
            k.split("/", 1)[1]: jnp.asarray(z[k]) for k in ckeys
        })
    return state, m, visual, calib
