"""CLI runner: replay a rosbag (or a synthetic dataset) through the pipeline.

The process entry replacing the reference's ROS node + launch files
(reference: src/laserMapping.cpp:1139-1862, launch/mapping_*.launch):

    python -m fastlivo_tpu.run --config /path/avia.yaml \\
        --camera /path/camera_pinhole.yaml --bag run.bag --out traj.txt

    python -m fastlivo_tpu.run --config /path/avia.yaml --synthetic \\
        --duration 8 --out traj.txt

Outputs a TUM trajectory (t x y z qx qy qz qw, laserMapping.cpp:
1738-1748), optional `Log/` state traces (--log-dir), an optional
accumulated world-cloud PCD (--pcd-out, gated like pcd_save_en),
and per-stage timing statistics.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .config import AVIA, OUST64, VELO16, XT32, load_config
from .logging_util import write_tum
from .pipeline import Pipeline
from . import preprocess as pp


def _lidar_fields(msg_type: str, msg: dict, lidar_type: int) -> dict:
    if msg_type == "livox_ros_driver/CustomMsg":
        p = msg["points"]
        return {
            "xyz": np.stack([p["x"], p["y"], p["z"]], 1),
            "reflectivity": p["reflectivity"].astype(np.float32),
            "tag": p["tag"],
            "line": p["line"],
            "offset_time_ns": p["offset_time"].astype(np.float64),
        }
    p = msg["points"]
    names = p.dtype.names
    xyz = np.stack([p["x"], p["y"], p["z"]], 1)
    if lidar_type == VELO16:
        return {
            "xyz": xyz,
            "intensity": p["intensity"] if "intensity" in names else np.zeros(len(p)),
            "time_s": p["time"] if "time" in names else np.zeros(len(p)),
            "ring": p["ring"] if "ring" in names else np.zeros(len(p), np.int32),
        }
    if lidar_type == OUST64:
        return {
            "xyz": xyz,
            "intensity": p["intensity"] if "intensity" in names else np.zeros(len(p)),
            "t_ns": p["t"] if "t" in names else np.zeros(len(p)),
            "ring": p["ring"] if "ring" in names else np.zeros(len(p), np.int32),
        }
    if lidar_type == XT32:
        return {
            "xyz": xyz,
            "intensity": p["intensity"] if "intensity" in names else np.zeros(len(p)),
            "timestamp_s": p["timestamp"] if "timestamp" in names else np.zeros(len(p)),
        }
    raise ValueError(f"unsupported lidar_type {lidar_type} for {msg_type}")


def _make_replayer(pipe: Pipeline, block: int, block_scan: bool = False):
    """Default block replay = chained per-frame dispatches with
    block-packed readback (LivoBlockReplayer; works LIO-only too) — it
    never carries the geometric map through a lax.scan, which the
    degraded relay mode prices per iteration (measured 46.7 vs 38.5
    ms/frame LIO at E=8). `block_scan` opts into the scan-fused
    lidar_block_step (LIO-only), which additionally amortizes the
    ~0.2-0.5 ms per-dispatch cost and wins on attached hardware /
    clean relay sessions."""
    from .replay import BlockReplayer, LivoBlockReplayer

    if block_scan and not pipe.cfg.img_enable:
        return BlockReplayer(pipe, block)
    return LivoBlockReplayer(pipe, block)


def run_bag(pipe: Pipeline, bag_path: str, max_frames: int | None,
            block: int = 0, rate: float = 0.0, block_scan: bool = False):
    """Replay a bag. `rate` > 0 paces messages at that multiple of
    wall-clock time by their receive stamps — the `rosbag play -r`
    role, for validating real-time behavior; 0 replays as fast as
    possible."""
    from .io.rosbag import bgr_normalize, read_bag

    cfg = pipe.cfg
    topics = {cfg.lid_topic, cfg.imu_topic}
    img_topics = ()
    img_topic_locked = None  # first image stream seen wins
    if cfg.img_enable:
        # real FAST-LIVO bags usually store the COMPRESSED stream (the
        # reference launch runs an image_transport republish node to
        # re-inflate it, launch/mapping_avia.launch); the bag reader
        # decodes CompressedImage directly, so accept both topic names.
        # Bags recorded with image_transport can carry BOTH streams of
        # the same camera — lock onto whichever appears first so each
        # frame is pushed exactly once.
        img_topics = (cfg.img_topic, cfg.img_topic + "/compressed")
        topics.update(img_topics)
    replayer = None
    if block:
        replayer = _make_replayer(pipe, block, block_scan)
    n_frames = 0
    n_scans = 0  # block mode: cap INGESTION (spin never runs there)
    t_wall0 = time.perf_counter()
    t_bag0 = None
    for topic, mtype, stamp, msg in read_bag(bag_path, topics):
        if rate > 0:
            if t_bag0 is None:
                t_bag0 = stamp
            target = (stamp - t_bag0) / rate
            lag = target - (time.perf_counter() - t_wall0)
            if lag > 0:
                time.sleep(lag)
        if topic == cfg.imu_topic:
            pipe.push_imu(msg["stamp"], msg["acc"], msg["gyr"])
        elif topic == cfg.lid_topic:
            fields = _lidar_fields(mtype, msg, cfg.preprocess.lidar_type)
            pts, t_rel = pp.decode(fields, cfg.preprocess)
            if len(pts) > 1:
                pipe.push_lidar(msg["stamp"], pts, t_rel)
                n_scans += 1
        elif topic in img_topics:
            if img_topic_locked is None:
                img_topic_locked = topic
            if topic == img_topic_locked:
                # compressed frames decode straight to BGR (rosbag.py)
                img = bgr_normalize(msg["image"],
                                    msg.get("encoding", "bgr8"))
                pipe.push_img(msg["stamp"] + cfg.delta_time, img)
        if replayer is None:
            n_frames += len(pipe.spin())
        if max_frames and (n_frames >= max_frames
                           or (replayer is not None
                               and n_scans >= max_frames)):
            # block mode produces outputs only at replayer.run(), so the
            # cap applies to ingested scans there (review r5: the old
            # check could never fire with --block)
            break
    if replayer is not None:
        before = len(pipe.outputs)
        replayer.run()
        n_frames = len(pipe.outputs) - before + n_frames
    n_frames += len(pipe.finish())  # deferred frame (async_read mode)
    return n_frames


def run_synthetic(pipe: Pipeline, duration: float, with_cam: bool,
                  block: int = 0, block_scan: bool = False):
    from .io.synthetic import SyntheticDataset

    cam = pipe.cfg.camera
    ds = SyntheticDataset(
        duration=duration,
        points_per_scan=8192,
        lidar_noise=0.004,
        cam_hz=10.0 if with_cam else 0.0,
        cam_size=(cam.width, cam.height),
        cam_f=cam.fx,
        cam_fy=cam.fy,
        cam_c=(cam.cx, cam.cy),
        cam_d=np.asarray(cam.d[:4]),
        Rcl=pipe.cfg.Rcl_mat,
        Pcl=pipe.cfg.Pcl_vec,
        lid_rot=pipe.cfg.extrinsic_R,
        lid_off=pipe.cfg.extrinsic_T,
    )
    for beg, pts, t_rel in ds.lidar_scans_fast():
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    for t, img in ds.images():
        pipe.push_img(t, img)
    if block:
        rep = _make_replayer(pipe, block, block_scan)
        outs = rep.run()
    else:
        outs = pipe.spin() + pipe.finish()
    return len(outs), ds


def save_pcd(path: str, pts: np.ndarray, rgb: np.ndarray | None = None,
             intensity: np.ndarray | None = None):
    """Minimal ASCII PCD writer (pcd_save_en path, laserMapping.cpp:
    1839-1855). With `rgb` (N, 3) in [0,255], writes the packed rgb
    field of pcl::PointXYZRGB (the reference's LIVO RGB map cloud);
    with `intensity` (N,), writes PointXYZI (the reference's LIO-mode
    intensity-colored cloud, README 4.1)."""
    with open(path, "w") as f:
        if rgb is None and intensity is not None:
            f.write(
                "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
                "FIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
                "COUNT 1 1 1 1\n"
                f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {len(pts)}\nDATA ascii\n"
            )
            np.savetxt(f, np.concatenate(
                [pts[:, :3], np.asarray(intensity, np.float32)[:, None]], 1
            ), fmt="%.4f")
            return
        if rgb is not None:
            packed = (
                (np.asarray(rgb[:, 0], np.uint32) << 16)
                | (np.asarray(rgb[:, 1], np.uint32) << 8)
                | np.asarray(rgb[:, 2], np.uint32)
            ).view(np.int32)
            f.write(
                "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
                "FIELDS x y z rgb\nSIZE 4 4 4 4\nTYPE F F F U\nCOUNT 1 1 1 1\n"
                f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {len(pts)}\nDATA ascii\n"
            )
            for p, c in zip(pts[:, :3], packed):
                f.write("%.4f %.4f %.4f %d\n" % (p[0], p[1], p[2], c))
            return
        f.write(
            "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
            "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {len(pts)}\nDATA ascii\n"
        )
        np.savetxt(f, pts[:, :3], fmt="%.4f")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--camera", default=None, help="camera intrinsics YAML")
    ap.add_argument(
        "--launch", default=None,
        help="reference launch file (launch/mapping_*.launch): resolves "
        "--config/--camera from its <rosparam> entries, so the exact "
        "file a FAST-LIVO user already runs drives this CLI",
    )
    ap.add_argument("--bag", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--out", default="trajectory.txt")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--pcd-out", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--no-img", action="store_true", help="force LIO-only")
    ap.add_argument(
        "--eval", action="store_true",
        help="with --synthetic: print ATE RMSE vs the known trajectory "
        "and position-NEES filter consistency (eval.py)",
    )
    ap.add_argument(
        "--rate", type=float, default=0.0,
        help="with --bag: pace messages at this multiple of wall-clock "
        "(the rosbag play -r role; 0 = as fast as possible)",
    )
    ap.add_argument(
        "--block", type=int, default=0,
        help="offline replay in N-event blocks: chained per-frame "
        "dispatches with ONE packed device read per block",
    )
    ap.add_argument(
        "--block-scan", action="store_true",
        help="with --block in LIO mode: use the scan-fused "
        "lidar_block_step (one device dispatch per N frames) instead "
        "of chained dispatches — amortizes per-dispatch cost, best on "
        "attached hardware",
    )
    ap.add_argument(
        "--sync-read", action="store_true",
        help="resolve each frame's device readback before the next frame "
        "(off by default: offline replay defers readbacks one frame so "
        "the device-to-host round trip overlaps the next frame's "
        "dispatch; outputs are identical either way)",
    )
    ap.add_argument(
        "--map-pcd", default=None,
        help="export the live map's points to a PCD at exit",
    )
    ap.add_argument(
        "--save-ckpt", default=None,
        help="write state+map(+visual map) npz at exit for warm restart",
    )
    ap.add_argument(
        "--load-ckpt", default=None,
        help="restore state+map(+visual map) before replay",
    )
    ap.add_argument(
        "--viz-dir", default=None,
        help="live visualization: render the world cloud + path to PNG "
        "frames in this directory (latest.png always tracks the newest "
        "frame; the rviz surface, laserMapping.cpp:1377-1389)",
    )
    ap.add_argument("--viz-every", type=int, default=5,
                    help="render every N-th frame (with --viz-dir)")
    ap.add_argument(
        "--profile-every", type=int, default=0,
        help="every N frames, also dispatch the LIO stages separately to "
        "record a per-stage timing breakdown (laserMapping.cpp:1805)",
    )
    ap.add_argument(
        "--mesh", type=int, default=0,
        help="run the fused per-frame steps SPMD over the first N devices "
        "(jax.sharding.Mesh, parallel/product.py; 0 = single-device). "
        "Residual rows are partitioned across the mesh and HᵀH/Hᵀz "
        "reduce over ICI; trajectories match single-device to "
        "f32-reduction epsilon",
    )
    ap.add_argument(
        "--sharded-map", action="store_true",
        help="with --mesh N: BLOCK-SHARD the geometric map across the "
        "mesh (ownership-striped tile slabs; per-device map HBM ~1/N). "
        "kNN runs against a per-scan halo snapshot all-gathered from "
        "the owners (parallel/sharded_map.py); trajectories match the "
        "replicated-map mesh path",
    )
    args = ap.parse_args(argv)

    if args.launch:
        from .config import parse_launch

        cfg_yaml, cam_yaml = parse_launch(args.launch)
        args.config = args.config or str(cfg_yaml)
        if args.camera is None and cam_yaml is not None:
            args.camera = str(cam_yaml)
    if args.config is None:
        ap.error("--config (or --launch) is required")
    cfg = load_config(args.config, args.camera)
    if args.no_img or (cfg.img_enable and args.camera is None and not args.synthetic):
        cfg.img_enable = False
    if args.pcd_out:
        cfg.pcd_save_en = True
    mesh = None
    if args.mesh:
        if args.block:
            # block replay carries whole scans through lax.scan on one
            # device; the SPMD product mode is per-frame
            ap.error("--mesh and --block are mutually exclusive")
        from .parallel.sharded import make_mesh

        mesh = make_mesh(args.mesh)
    elif args.sharded_map:
        ap.error("--sharded-map requires --mesh N")
    if args.sharded_map and args.load_ckpt:
        ap.error("--sharded-map cannot restore a single-device map "
                 "checkpoint (re-run without --sharded-map, or rebuild "
                 "the map from the stream)")
    pipe = Pipeline(cfg, log_dir=args.log_dir, mesh=mesh,
                    sharded_map=args.sharded_map)
    pipe.profile_every = args.profile_every
    if not args.sync_read and not args.block and not cfg.debug:
        # offline default: deferred readback (the round trip of frame
        # N's single blocking read overlaps frame N+1's host prep and
        # dispatches; outputs are bit-identical, resolved one frame
        # late — run_bag/run_synthetic call finish() at end of stream).
        # --block manages its own readback depth; debug keeps sync
        # reads for the overlay.
        pipe.async_read = True
    if args.viz_dir:
        from .viz import LiveViewer

        pipe.on_frame = LiveViewer(args.viz_dir, every=args.viz_every).update
    if args.load_ckpt:
        from .io import checkpoint as ckpt_mod

        # with a calib in the snapshot (any --save-ckpt from this
        # version), the static IMU re-initialization is skipped and the
        # EKF engages on the first restored frame (pipeline.warm_start)
        pipe.warm_start(*ckpt_mod.load(args.load_ckpt))

    t0 = time.perf_counter()
    ds = None
    if args.bag:
        n = run_bag(pipe, args.bag, args.max_frames, args.block,
                    rate=args.rate, block_scan=args.block_scan)
    elif args.synthetic:
        if args.eval and args.block:
            # block replay does not collect per-frame covariances
            # (they live only in the final scan carry) — refuse rather
            # than silently reporting NaN NEES
            ap.error("--eval needs per-frame covariances; "
                     "run without --block")
        pipe.collect_cov = args.eval  # per-frame covariance for NEES
        n, ds = run_synthetic(pipe, args.duration, cfg.img_enable,
                              args.block, block_scan=args.block_scan)
    else:
        ap.error("need --bag or --synthetic")
    wall = time.perf_counter() - t0

    traj = pipe.tum_trajectory()
    if len(traj):
        write_tum(args.out, traj)
    if args.pcd_out and pipe.outputs:
        if pipe.rgb_cloud:
            # RGB world map (pcl_wait_save, laserMapping.cpp:778, 1841)
            acc = np.concatenate(pipe.rgb_cloud)
            save_pcd(args.pcd_out, acc[:, :3], acc[:, 3:6])
        else:
            keep = [o for o in pipe.outputs if o.pts_world is not None]
            if keep:
                pts = np.concatenate([o.pts_world for o in keep])
                inten = None
                if all(o.intensity is not None
                       and len(o.intensity) == len(o.pts_world) for o in keep):
                    # LIO mode: intensity-colored cloud (README 4.1)
                    inten = np.concatenate([o.intensity for o in keep])
                save_pcd(args.pcd_out, pts, intensity=inten)
    tm = {}
    if pipe.outputs:
        tm = {
            k: float(np.mean([o.timing[k] for o in pipe.outputs])) * 1e3
            for k in pipe.outputs[0].timing
        }
    print(
        f"frames={n} wall={wall:.1f}s "
        + " ".join(f"{k}={v:.1f}ms" for k, v in tm.items())
    )
    if pipe.auto_resets:
        print(f"divergence watchdog fired {pipe.auto_resets}x "
              "(mapping restarted; see capacity.auto_reset_rms)")
    print(f"trajectory: {args.out} ({len(traj)} poses)")
    if args.eval and ds is not None:
        # ATE vs the known synthetic trajectory + filter-consistency
        # (position NEES; mean ~dof=3 would be a calibrated filter —
        # the reference's fixed noise heuristics make no such promise,
        # so this is an observability metric, see eval.py)
        from .eval import evaluate_synthetic

        m = evaluate_synthetic(pipe.outputs, pipe.covs, ds)
        print("eval: " + " ".join(
            f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in m.items()))
    if args.map_pcd:
        pts_live, n_live = pipe._map_mod.extract_points(pipe.map)
        save_pcd(args.map_pcd, pts_live)
        print(f"map pcd: {args.map_pcd} ({n_live} points)")
    if args.save_ckpt:
        from .io import checkpoint as ckpt_mod

        ckpt_map = pipe.checkpointable_map()
        ckpt_mod.save(
            args.save_ckpt, pipe.state, ckpt_map,
            pipe.vio.vmap if pipe.vio is not None else None,
            calib=pipe.calib,  # lets the restored process skip IMU init
        )
        print(f"checkpoint: {args.save_ckpt}")
    if pipe.last_stage_profile:
        print(
            "stage profile (ms): "
            + " ".join(f"{k}={v:.1f}" for k, v in pipe.last_stage_profile.items())
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
