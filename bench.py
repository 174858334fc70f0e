"""Benchmark: LIO frame throughput on the default JAX device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: points/second through the full LIO iterated-EKF scan
update (6 iterations incl. 3 kNN re-searches, 16k-point scans, 1M-slot
map) — the reference's hottest path (laserMapping.cpp:1506-1732, OpenMP
loop :1516).

vs_baseline: ratio to the single-core C++ reference estimate
(BASELINE.md): the reference processes ~1.5-2k downsampled points per
~20 ms LIO stage on 4 OpenMP threads => ~25k points/s/core. Until a
measured in-container C++ microbenchmark replaces it, the baseline
constant is 50_000 points/s (deliberately generous to the reference).
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
    m = vm.empty_map(MAP_TABLE, 0.5)
    B = 65536
    for i in range(0, len(world), B):
        chunk = np.zeros((B, 3), np.float32)
        k = min(B, len(world) - i)
        chunk[:k] = world[i : i + k]
        mask = np.zeros(B, bool)
        mask[:k] = True
        m = vm.insert(m, jnp.asarray(chunk), jnp.asarray(mask))

    rng = np.random.default_rng(1)
    idx = rng.choice(len(world), N_SCAN, replace=False)
    pos0 = np.array([0.0, 0.0, 2.0])
    scan = (world[idx] - pos0).astype(np.float32)
    scan += rng.normal(0, 0.004, scan.shape).astype(np.float32)
    s = identity_state()._replace(
        pos=jnp.asarray(pos0 + [0.03, -0.02, 0.01])
    )
    args = (
        jnp.asarray(scan), jnp.ones(N_SCAN, bool),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
    )

    def run():
        return lio_mod.lio_update(
            s, m, *args, laser_point_cov=0.001, max_iter=MAX_ITER,
            knn_radius=1, max_probe=8,
        )

    res = run()
    jax.block_until_ready(res)  # compile + warmup
    n_act = int(res.n_active)

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
                "metric": "lio_scan_update_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
