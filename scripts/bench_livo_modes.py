"""A/B the offline LIVO replay modes on the real chip.

Usage: python scripts/bench_livo_modes.py {frame|block} [duration] [block_E]

Protocol (relay-fair): one mode per process; ALL synthetic messages are
generated/rendered before any timing; the first WARM_FRAC of the stream
is processed untimed (compiles every steady-state executable for the
mode); the remainder is processed under one wall-clock window including
the end-of-stream finish() barrier. Prints one JSON line:
  {"mode": ..., "ms_per_pair": ..., "n_outputs": ..., ...}
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARM_FRAC = 0.6


def main():
    mode = sys.argv[1]
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
    block_e = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from fastlivo_tpu.config import load_config
    from fastlivo_tpu.io.synthetic import SyntheticDataset
    from fastlivo_tpu.pipeline import Pipeline

    ref = os.environ.get("REFERENCE_DIR", "/root/reference")
    cfg = load_config(
        os.path.join(ref, "config", "avia.yaml"),
        os.path.join(ref, "config", "camera_pinhole.yaml"),
    )
    if mode.startswith("lio"):
        cfg.img_enable = False
    # A/B hooks for the reference-image pool (perf attribution)
    if os.environ.get("FASTLIVO_FRAME_RING"):
        cfg.capacity.frame_ring = int(os.environ["FASTLIVO_FRAME_RING"])
    if os.environ.get("FASTLIVO_FRAME_RING_U8"):
        cfg.capacity.frame_ring_u8 = bool(
            int(os.environ["FASTLIVO_FRAME_RING_U8"])
        )
    if os.environ.get("FASTLIVO_DONATE_MAPS"):
        cfg.capacity.donate_maps = bool(
            int(os.environ["FASTLIVO_DONATE_MAPS"])
        )
    pipe = Pipeline(cfg)
    cam = cfg.camera
    ds = SyntheticDataset(
        duration=duration,
        points_per_scan=8192,
        lidar_noise=0.004,
        cam_hz=0.0 if mode.startswith("lio") else 10.0,
        cam_size=(cam.width, cam.height),
        cam_f=cam.fx,
        cam_fy=cam.fy,
        cam_c=(cam.cx, cam.cy),
        cam_d=np.asarray(cam.d[:4]),
        Rcl=cfg.Rcl_mat,
        Pcl=cfg.Pcl_vec,
        lid_rot=cfg.extrinsic_R,
        lid_off=cfg.extrinsic_T,
    )
    # stage EVERYTHING first: image rendering is host-side numpy and
    # must not pollute the device-path timing
    scans = list(ds.lidar_scans_fast())
    imu = list(ds.imu_stream())
    imgs = list(ds.images())
    t_split = duration * WARM_FRAC

    def push(phase):
        for beg, pts, t_rel in scans:
            if (beg < t_split) == (phase == 0):
                pipe.push_lidar(beg, pts, t_rel)
        for t, acc, gyr in imu:
            if (t < t_split) == (phase == 0):
                pipe.push_imu(t, acc, gyr)
        for t, img in imgs:
            if (t < t_split) == (phase == 0):
                pipe.push_img(t, img)

    rep = None
    if mode == "block":
        from fastlivo_tpu.replay import LivoBlockReplayer

        rep = LivoBlockReplayer(pipe, block_e)
    elif mode == "lio-block":
        from fastlivo_tpu.replay import BlockReplayer

        rep = BlockReplayer(pipe, block_e)
    elif mode == "lio-chain-block":
        from fastlivo_tpu.replay import LivoBlockReplayer

        rep = LivoBlockReplayer(pipe, block_e)
    elif mode in ("frame-async", "lio-async"):
        pipe.async_read = True

    def process():
        if rep is not None:
            rep.run()
        else:
            pipe.spin()

    push(0)
    process()  # warmup: compiles the mode's steady-state executables
    n_warm = len(pipe.outputs)

    push(1)
    t0 = time.perf_counter()
    process()
    pipe.finish()  # end-of-stream barrier (async/deferred reads)
    wall = time.perf_counter() - t0

    # outputs are lidar-end frames only (image groups return None from
    # _process_group), and the synthetic streams run lidar and camera
    # both at 10 Hz — so one output == one lidar+camera PAIR
    n = len(pipe.outputs) - n_warm
    print(json.dumps({
        "mode": mode,
        "duration_s": duration,
        "block_E": block_e if mode.endswith("block") else 0,
        "n_pairs_timed": n,
        "ms_per_pair": round(wall / max(n, 1) * 1e3, 2),
        "wall_s": round(wall, 3),
        "n_warm_pairs": n_warm,
    }))


if __name__ == "__main__":
    main()
