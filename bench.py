"""Benchmark: LIO frame throughput on the default JAX device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: points/second through the FULL fused lidar frame step
(frame_step.lidar_frame_step): motion undistortion + device voxel filter
+ iterated point-to-plane EKF (6 iterations incl. 3 kNN re-searches)
+ map insertion, on 16k-point scans against a 1M-slot map — the
reference's entire per-scan hot path (laserMapping.cpp:1395-1760).

vs_baseline: ratio against the single-core C++ baseline measured on this
host (native/baseline_bench.cpp: kd-tree 5-NN + plane fit + Jacobian +
18x18 solve; it omits undistortion and map insertion, which favors the
baseline). Falls back to a 50k points/s constant if the toolchain is
missing.

NOTE: through the axon TPU relay every dispatch carries a multi-ms
session overhead once map-update executables have run (documented in
ops/voxel_map.py); the fused single-dispatch-per-frame design bounds
that cost at one per frame.
"""
import json
import time

import numpy as np

import fastlivo_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from fastlivo_tpu import lio as lio_mod
from fastlivo_tpu.ops import voxel_map as vm
from fastlivo_tpu.state import identity_state

BASELINE_CPP_POINTS_PER_SEC = 50_000.0  # fallback when native bench unavailable


def measured_cpp_baseline(n_scan: int) -> float:
    """Build + run the single-core C++ baseline (native/baseline_bench.cpp)
    on this host and return its points/sec; falls back to the documented
    constant if the toolchain is unavailable."""
    import subprocess
    from pathlib import Path

    d = Path(__file__).resolve().parent / "native"
    exe = d / "baseline_bench"
    try:
        if not exe.exists():
            subprocess.run(["make", "-C", str(d), "baseline_bench"],
                           capture_output=True, timeout=180, check=True)
        out = subprocess.run([str(exe), str(n_scan)], capture_output=True,
                             timeout=300, check=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("points_per_sec"):
                return float(line.split()[1])
    except Exception:
        pass
    return BASELINE_CPP_POINTS_PER_SEC

N_SCAN = 16384
MAP_TABLE = 1 << 20
MAX_ITER = 6
REPS = 30


def build_world(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=(n, 2))
    face = rng.integers(0, 6, n)
    lo = np.array([-20.0, -20.0, 0.0])
    hi = np.array([20.0, 20.0, 8.0])
    pts = np.empty((n, 3))
    for a in range(3):
        o = [i for i in range(3) if i != a]
        for m, val in ((face == 2 * a, lo[a]), (face == 2 * a + 1, hi[a])):
            pts[m, a] = val
            pts[m, o[0]] = lo[o[0]] + u[m, 0] * (hi[o[0]] - lo[o[0]])
            pts[m, o[1]] = lo[o[1]] + u[m, 1] * (hi[o[1]] - lo[o[1]])
    return pts.astype(np.float32)


def main():
    world = build_world(400_000)
    # dense rolling-grid backend: the faster map for bounded-extent rigs
    # (covers the 40x40x8 m bench world with margin)
    from fastlivo_tpu.ops import dense_map as dmod

    m = dmod.empty_dense_map((256, 256, 64), 0.5)
    B = 65536
    for i in range(0, len(world), B):
        chunk = np.zeros((B, 3), np.float32)
        k = min(B, len(world) - i)
        chunk[:k] = world[i : i + k]
        mask = np.zeros(B, bool)
        mask[:k] = True
        m = dmod.insert(m, jnp.asarray(chunk), jnp.asarray(mask))

    rng = np.random.default_rng(1)
    idx = rng.choice(len(world), N_SCAN, replace=False)
    pos0 = np.array([0.0, 0.0, 2.0])
    scan = (world[idx] - pos0).astype(np.float32)
    scan += rng.normal(0, 0.004, scan.shape).astype(np.float32)
    s = identity_state()._replace(
        pos=jnp.asarray(pos0 + [0.03, -0.02, 0.01])
    )
    from fastlivo_tpu import imu as imu_mod
    from fastlivo_tpu.frame_step import lidar_frame_step

    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0),
        cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )
    P = 32  # imu-rate pose rows across the scan
    pose = imu_mod.PoseTable(
        offs=jnp.asarray(np.linspace(0, 0.1, P, dtype=np.float32)),
        rot=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (P, 1, 1)),
        pos=jnp.zeros((P, 3), jnp.float32),
        vel=jnp.tile(jnp.asarray([1.0, 0.5, 0.0], jnp.float32), (P, 1)),
        acc=jnp.zeros((P, 3), jnp.float32),
        gyr=jnp.zeros((P, 3), jnp.float32),
    )
    t_rel = jnp.asarray(rng.uniform(0, 0.1, N_SCAN).astype(np.float32))
    rmask = jnp.ones(N_SCAN, bool)

    def run():
        return lidar_frame_step(
            s, m, pose, calib, jnp.asarray(scan), t_rel, rmask,
            jnp.float32(0.5), laser_point_cov=0.001,
            max_points=N_SCAN, max_iter=MAX_ITER,
            knn_radius=1, max_probe=8, dense_out=False,
        )

    res = run()
    jax.block_until_ready(res)  # compile + warmup
    n_act = int(res[4])

    t0 = time.perf_counter()
    for _ in range(REPS):
        res = run()
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / REPS

    pts_per_sec = N_SCAN / dt
    baseline = measured_cpp_baseline(N_SCAN)
    print(
        json.dumps(
            {
                "metric": "lidar_frame_step_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
