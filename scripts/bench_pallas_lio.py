"""Same-session A/B: XLA top_k+fit vs the Pallas fused kernel on the
LIO search leg (ops/pallas_lio.py), through the FULL fused lidar frame
step at the bench protocol shapes (16k scan, 400k-point map).

Prints one JSON line: streamed ms/frame for both variants + the ratio.
Readback-free until both timed sections finish (relay taint rule).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (the repo-root bench: world/calib builders)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastlivo_tpu import imu as imu_mod  # noqa: E402
from fastlivo_tpu.frame_step import lidar_frame_step  # noqa: E402
from fastlivo_tpu.ops import tiled_map as tmod  # noqa: E402
from fastlivo_tpu.state import identity_state  # noqa: E402

N = bench.N_SCAN


def main():
    world = bench.build_world(400_000)
    m = tmod.build_host(world, (64, 64, 32), 512, 0.5)
    rng = np.random.default_rng(1)
    idx = rng.choice(len(world), N, replace=False)
    pos0 = np.array([0.0, 0.0, 2.0])
    scan = (world[idx] - pos0 + rng.normal(0, 0.004, (N, 3))).astype(
        np.float32)
    s = identity_state()._replace(pos=jnp.asarray(pos0 + [0.03, -0.02, 0.01]))
    calib = imu_mod.ImuCalib(
        acc_scale=jnp.float32(1.0),
        cov_acc=jnp.full(3, 0.01, jnp.float32),
        cov_gyr=jnp.full(3, 0.001, jnp.float32),
        cov_bias_acc=jnp.full(3, 1e-5, jnp.float32),
        cov_bias_gyr=jnp.full(3, 1e-5, jnp.float32),
        lid_rot=jnp.eye(3, dtype=jnp.float32),
        lid_off=jnp.zeros(3, jnp.float32),
    )
    P = 32
    pose = imu_mod.PoseTable(
        offs=jnp.asarray(np.linspace(0, 0.1, P, dtype=np.float32)),
        rot=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (P, 1, 1)),
        pos=jnp.zeros((P, 3), jnp.float32),
        vel=jnp.tile(jnp.asarray([1.0, 0.5, 0.0], jnp.float32), (P, 1)),
        acc=jnp.zeros((P, 3), jnp.float32),
        gyr=jnp.zeros((P, 3), jnp.float32),
    )
    t_rel = jnp.asarray(rng.uniform(0, 0.1, N).astype(np.float32))
    rmask = jnp.ones(N, bool)
    scan_dev = jax.block_until_ready(jnp.asarray(scan))

    def step(ss, mm, pallas):
        return lidar_frame_step(
            ss, mm, pose, calib, scan_dev, t_rel, rmask,
            jnp.float32(0.5), laser_point_cov=0.001,
            max_points=N, max_iter=6, knn_radius=1, max_probe=8,
            dense_out=False, pallas_knn=pallas,
        )

    def one_chain(pallas, K=8):
        ss, mm, last = s, m, None
        t0 = time.perf_counter()
        for _ in range(K):
            o = step(ss, mm, pallas)
            ss, mm, last = o[0], o[1], o[8]
        jax.block_until_ready(last)
        return (time.perf_counter() - t0) / K

    # warm both executables, then INTERLEAVE the reps so relay-session
    # drift (measured ~20% between back-to-back blocks) hits both
    # variants equally
    for pallas in (False, True):
        jax.block_until_ready(step(s, m, pallas)[0])
        one_chain(pallas)
    xla_ts, pal_ts = [], []
    for _ in range(8):
        xla_ts.append(one_chain(False))
        pal_ts.append(one_chain(True))
    xla_ms = float(np.median(xla_ts)) * 1e3
    pal_ms = float(np.median(pal_ts)) * 1e3
    print(json.dumps({
        "xla_streamed_ms": round(xla_ms, 3),
        "pallas_streamed_ms": round(pal_ms, 3),
        "xla_min_ms": round(min(xla_ts) * 1e3, 3),
        "pallas_min_ms": round(min(pal_ts) * 1e3, 3),
        "pallas_over_xla": round(pal_ms / xla_ms, 3),
    }))


if __name__ == "__main__":
    main()
