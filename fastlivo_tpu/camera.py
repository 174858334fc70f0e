"""Pinhole camera model with radial-tangential distortion (batched JAX).

Replaces the reference's `vk::PinholeCamera` (rpg_vikit; used via
`vk::AbstractCamera` in lidar_selection.h:5 and frame.h:89-104, loaded
from camera_*.yaml by laserMapping.cpp:1199). All maps are batched over
leading dims and f32.

Conventions (matching vikit):
  - `world2cam(xyz)`: camera-frame point -> distorted pixel (u, v).
  - `cam2world(px)`: pixel -> unit-norm bearing in the camera frame
    (undistorts iteratively; vikit uses the same fixed-point scheme).
  - `is_in_frame(px, border)`: inside the image with a margin.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .config import CameraConfig


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    d: jnp.ndarray  # (4,) [k1, k2, p1, p2]
    width: int
    height: int

    @property
    def has_distortion(self) -> bool:
        return bool(np.any(np.abs(np.asarray(self.d)) > 1e-12))


def from_config(cfg: CameraConfig, dtype=jnp.float32) -> Camera:
    return Camera(
        fx=jnp.asarray(cfg.fx, dtype),
        fy=jnp.asarray(cfg.fy, dtype),
        cx=jnp.asarray(cfg.cx, dtype),
        cy=jnp.asarray(cfg.cy, dtype),
        d=jnp.asarray(cfg.d[:4], dtype),
        width=cfg.width,
        height=cfg.height,
    )


def distort(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    """Normalized coords (..., 2) -> distorted normalized coords."""
    x, y = xn[..., 0], xn[..., 1]
    k1, k2, p1, p2 = cam.d[0], cam.d[1], cam.d[2], cam.d[3]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort(cam: Camera, xd: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Inverse of `distort` by fixed-point iteration (vikit-style)."""
    xn = xd
    for _ in range(iters):
        d = distort(cam, xn) - xn
        xn = xd - d
    return xn


def world2cam(cam: Camera, xyz: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixel (..., 2). No z>0 check."""
    z = xyz[..., 2:3]
    xn = xyz[..., 0:2] / z
    xd = distort(cam, xn)
    u = cam.fx * xd[..., 0] + cam.cx
    v = cam.fy * xd[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def cam2world(cam: Camera, px: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) -> unit bearing vectors (..., 3).

    KNOWN LIMITATION: the 8-iteration fixed-point undistortion runs
    even for d = 0 cameras (vikit skips it) — Camera's leaves are
    traced under jit, so `has_distortion` cannot gate here without a
    static field; the cost is ~16 fused elementwise ops per point,
    negligible against the gathers that dominate the camera frame."""
    xd = jnp.stack(
        [(px[..., 0] - cam.cx) / cam.fx, (px[..., 1] - cam.cy) / cam.fy],
        axis=-1,
    )
    xn = undistort(cam, xd)
    f = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def is_in_frame(cam: Camera, px: jnp.ndarray, border: int = 0) -> jnp.ndarray:
    """(..., 2) -> (...,) bool, int-truncation semantics like
    vk::AbstractCamera::isInFrame(px.cast<int>(), border)."""
    u = px[..., 0].astype(jnp.int32)
    v = px[..., 1].astype(jnp.int32)
    return (
        (u >= border)
        & (u < cam.width - border)
        & (v >= border)
        & (v < cam.height - border)
    )


def load_camera_yaml(path) -> CameraConfig:
    """Load a vikit-style camera YAML (config/camera_pinhole.yaml)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    return CameraConfig(
        width=int(raw["cam_width"]),
        height=int(raw["cam_height"]),
        fx=float(raw["cam_fx"]),
        fy=float(raw["cam_fy"]),
        cx=float(raw["cam_cx"]),
        cy=float(raw["cam_cy"]),
        d=[float(raw.get(f"cam_d{i}", 0.0)) for i in range(4)],
    )
