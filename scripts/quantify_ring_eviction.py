"""Quantify the image-ring eviction deviation (VERDICT r2 missing #3).

The reference keeps every observing image alive via shared_ptr
(feature.h:40, lidar_selection.h:118); fastlivo_tpu bounds reference
images to a ring of `capacity.frame_ring` slots, and an observation
whose slot was recycled is masked out of close_view_obs.

Scenario: the default synthetic trajectory yaw-sweeps at 0.25 rad/s, so
with a ~90deg-HFOV camera a feature leaves view for ~19 s (~190 camera
frames at 10 Hz) per revolution -- far beyond a 64-slot ring. A long
run therefore exercises revisit-after-eviction continuously. We A/B the
ring depth on the identical stream and compare tracked counts and ATE.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")

from fastlivo_tpu.config import Config
from fastlivo_tpu.eval import evaluate_synthetic
from fastlivo_tpu.pipeline import Pipeline
from fastlivo_tpu.run import run_synthetic

DURATION = 25.0


def run(ring: int, u8: bool = False):
    cfg = Config()
    cfg.img_enable = True
    cfg.capacity.max_raw_points = 2048
    cfg.capacity.max_points = 1024
    cfg.capacity.vmap_points = 8192
    cfg.capacity.frame_ring = ring
    cfg.capacity.frame_ring_u8 = u8
    cfg.camera.width, cfg.camera.height = 320, 256
    cfg.camera.fx = cfg.camera.fy = 160.0
    cfg.camera.cx, cfg.camera.cy = 159.5, 127.5
    pipe = Pipeline(cfg)
    tracked = []
    orig_update = pipe.vio.update

    def spy(*a, **k):
        out = orig_update(*a, **k)
        tracked.append(pipe.vio.last_stats["tracked"])
        return out

    pipe.vio.update = spy
    t0 = time.time()
    n, ds = run_synthetic(pipe, DURATION, with_cam=True)
    metrics = evaluate_synthetic(pipe.outputs, [], ds)
    tr = np.asarray(tracked, float)
    late = tr[len(tr) // 3:]  # post-warmup: eviction can only bite late
    return {
        "ring": ring, "frames": n, "cam_frames": len(tr),
        "tracked_mean": float(tr.mean()), "tracked_late_mean": float(late.mean()),
        "tracked_late_min": float(late.min()),
        "ate_rmse_mm": 1e3 * metrics["ate_rmse_m"],
        "wall_s": round(time.time() - t0, 1),
    }


if __name__ == "__main__":
    # args like "64", "256u8"; default compares the shipped default
    # (256-slot u8 pool) against a deeper f32 control
    for a in sys.argv[1:] or ["256u8", "320"]:
        u8 = a.endswith("u8")
        print(run(int(a[:-2] if u8 else a), u8), flush=True)
