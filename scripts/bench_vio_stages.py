"""Per-stage timing of the fused VIO composite's pieces on the real
chip: each stage dispatched as its own executable, chained K deep with
ONE sync (clean session; inputs staged from a pipeline-populated run).
Identifies which fixed stage carries the ~46 ms fixed cost of
vio_frame_step (see bench_vio_step.py).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import functools
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu.config import load_config
    from fastlivo_tpu.io.synthetic import SyntheticDataset
    from fastlivo_tpu.pipeline import Pipeline
    from fastlivo_tpu import vio as vio_mod
    from fastlivo_tpu import visual_map as vmap_mod
    from fastlivo_tpu.ops.voxel_filter import voxel_downsample_device

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
    for beg, pts, t_rel in scans:
        pipe.push_lidar(beg, pts, t_rel)
    for t, acc, gyr in ds.imu_stream():
        pipe.push_imu(t, acc, gyr)
    imgs = list(ds.images())
    for t, img in imgs:
        pipe.push_img(t, img)
    pipe.spin()
    v = pipe.vio
    st0 = pipe.state
    vm0 = v.vmap
    gray = v._gray_device(imgs[-1][1])
    cloud_dev, n = v._last_cloud_dev
    R = cloud_dev.shape[0]  # scan-bucket shape (<= v.cloud_cap)
    cmask = jnp.asarray(np.arange(R) < min(n, R))
    fid = jnp.int32(v.fid)
    f32 = jnp.float32
    out_thre = f32(cfg.outlier_threshold)
    ncc_thre = f32(cfg.ncc_thre)
    ipc = f32(cfg.img_point_cov)

    rot32 = st0.rot.astype(f32)
    pos32 = st0.pos.astype(f32)
    rcw = v.Rci @ rot32.T
    pcw = -rcw @ pos32 + v.Pci

    def timed(name, fn, *args, res=None, reps=4):
        # chain-free: stages don't feed themselves; dispatch K, sync once
        def run():
            o = None
            t0 = time.perf_counter()
            for _ in range(K):
                o = fn(*args)
            leaf = o
            while isinstance(leaf, (tuple, list)):
                leaf = leaf[0]
            if hasattr(leaf, "pos"):
                leaf = leaf.pos
            jax.block_until_ready(leaf)
            return (time.perf_counter() - t0) / K, o
        _, o = run()  # compile/warm
        ts = [run()[0] for _ in range(reps)]
        results[name] = round(float(np.median(ts)) * 1e3, 3)
        return o

    results = {}
    vm1 = timed("push_image", vmap_mod.push_image, vm0, gray, fid)
    pg_out = timed("voxel_downsample_0.2", voxel_downsample_device,
                   cloud_dev, cmask, 0.2, v.max_pg)
    pg, pg_mask = pg_out
    vox_out = timed("voxel_of", vmap_mod.voxel_of, pg)
    vox, vox_mask = vox_out, pg_mask
    sel = functools.partial(
        vio_mod.select_tracked, outlier_threshold=out_thre,
        ncc_thre=ncc_thre, grid_size=v.grid_size,
        patch_size=v.patch_size, gw=v.gw, gh=v.gh, ncc_en=cfg.ncc_en)
    tracked = timed("select_tracked", sel, vm1, v.cam, rcw, pcw, gray,
                    pg, pg_mask, vox, vox_mask)
    newp = functools.partial(
        vio_mod.select_new_points, grid_size=v.grid_size,
        patch_size=v.patch_size, gw=v.gw, gh=v.gh)
    timed("select_new_points", newp, v.cam, rcw, pcw, gray, pg, pg_mask,
          tracked.cell_value)
    pho = functools.partial(
        vio_mod.photometric_update_levels, img_point_cov=ipc,
        patch_size=v.patch_size, levels=(2, 1, 0),
        max_iter=cfg.max_iteration, robust=cfg.capacity.vio_robust)
    timed("photometric_3lvl", pho, st0, st0, v.cam, gray, tracked.pos,
          tracked.patch, tracked.search_level, tracked.valid,
          v.Rci, v.Pci, v.Jdphi_dR, v.Jdp_dR)
    timed("prep_observations", vio_mod.prep_observations, vm1, v.cam,
          rcw, pcw, gray, tracked.idx, tracked.valid)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
