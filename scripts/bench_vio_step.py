"""Attribute the full-LIVO pair cost: time the two fused frame-step
dispatches (vio_frame_step, lidar steady step) in clean AND tainted
relay sessions, at product shapes with pipeline-populated state.

Protocol (relay-fair, see docs/PERF_ANALYSIS.md): run a short synthetic
LIVO warmup through the Pipeline to populate the visual map / geometric
map / state with realistic content and compile the steady executables;
snapshot device inputs; chain K dispatches feeding state through with
ONE sync at the end; report ms/dispatch. "Tainted" repeats the chain
after deliberately forcing a small device->host read (the relay's
permanent slow mode that every real pipeline run is in after its first
frame readback).

Usage: python scripts/bench_vio_step.py [K]
Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.config import load_config
    from fastlivo_tpu.io.synthetic import SyntheticDataset
    from fastlivo_tpu.pipeline import Pipeline
    from fastlivo_tpu import vio as vio_mod

    ref = os.environ.get("REFERENCE_DIR", "/root/reference")
    cfg = load_config(os.path.join(ref, "config", "avia.yaml"),
                      os.path.join(ref, "config", "camera_pinhole.yaml"))
    pipe = Pipeline(cfg)
    cam = cfg.camera
    ds = SyntheticDataset(
        duration=3.0, points_per_scan=8192, lidar_noise=0.004,
        cam_hz=10.0, cam_size=(cam.width, cam.height), cam_f=cam.fx,
        cam_d=np.asarray(cam.d[:4]), Rcl=cfg.Rcl_mat, Pcl=cfg.Pcl_vec,
        lid_rot=cfg.extrinsic_R, lid_off=cfg.extrinsic_T,
    )
    scans = list(ds.lidar_scans_fast())
    imu = list(ds.imu_stream())
    imgs = list(ds.images())
    for beg, pts, t_rel in scans:
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in imu:
        pipe.push_imu(t, acc, gyr)
    for t, img in imgs:
        pipe.push_img(t, img)
    pipe.spin()
    v = pipe.vio
    assert v is not None and v._last_cloud_dev is not None

    # ---- stage device inputs once (no reads yet: session stays clean)
    vm0 = v.vmap
    st0 = pipe.state
    gray = v._gray_device(imgs[-1][1])
    cloud_dev, n = v._last_cloud_dev
    R = v.cloud_cap
    meta = jnp.asarray(np.array([min(n, R), v.fid], np.int32))
    f32 = jnp.float32
    args_tail = (v.Rci, v.Pci, v.Jdphi_dR, v.Jdp_dR,
                 f32(cfg.outlier_threshold), f32(cfg.ncc_thre),
                 f32(cfg.img_point_cov))
    statics = dict(grid_size=v.grid_size, patch_size=v.patch_size,
                   gw=v.gw, gh=v.gh, ncc_en=cfg.ncc_en,
                   max_iter=int(os.environ.get('VIO_MAX_ITER',
                                               cfg.max_iteration)),
                   max_pg=v.max_pg, robust=cfg.capacity.vio_robust)

    def chain(k):
        st, vm = st0, vm0
        t0 = time.perf_counter()
        for _ in range(k):
            out = vio_mod.vio_frame_step(
                vm, v.cam, st, st, gray, meta, cloud_dev,
                *args_tail, **statics)
            st, vm = out[0], out[1]
        jax.block_until_ready(out[10])
        return (time.perf_counter() - t0) / k, out[10]

    chain(2)  # warm the chained-shape path (already compiled by spin)
    clean = [chain(K)[0] for _ in range(4)]
    _, stats_j = chain(1)
    stats = np.asarray(stats_j)  # <-- the taint: first blocking read
    tainted = [chain(K)[0] for _ in range(4)]
    out = {
        "vio_ms_clean": round(float(np.median(clean)) * 1e3, 3),
        "vio_ms_tainted": round(float(np.median(tainted)) * 1e3, 3),
        "n_tracked": float(stats[0]),
        "iters": float(stats[3]),
        "K": K,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
