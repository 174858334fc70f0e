"""Diagnose the ~10 ms LIVO-pair step past 64 image-pool slots
(ROUND4_NOTES): time the pool-touching ops in ISOLATION at 64 vs 256
u8 slots, chained K-deep with one sync, interleaved against session
drift. If none shows the step, the re-pricing lives in the fused
camera-step executable (shape-set pricing), not in a single op — then
phase 2 (FASTLIVO_VIO_SPLIT_PUSH through bench_livo_modes) attributes
it. Prints one JSON line of ms-per-op at each depth.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastlivo_tpu import visual_map as vmap_mod  # noqa: E402
from fastlivo_tpu.ops import image as img_ops  # noqa: E402

H, W = 512, 640
K = 8
RINGS = (64, 256)


def timed(fn, warm_args, args_list):
    jax.block_until_ready(fn(*warm_args))
    t0 = time.perf_counter()
    last = None
    for a in args_list:
        last = fn(*a)
    jax.block_until_ready(last)
    return (time.perf_counter() - t0) / len(args_list) * 1e3


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    out = {}
    cases = {}
    for R in RINGS:
        m = vmap_mod.empty_visual_map(
            n_points=65536, n_obs=20, table_size=1 << 18, voxel_cap=8,
            ring=R, height=H, width=W, img_dtype=jnp.uint8,
        )
        # seed some live images + obs so the refcount pass is realistic
        for k in range(8):
            m = vmap_mod.push_image(m, img, jnp.int32(k))
        m = jax.block_until_ready(m)

        push = jax.jit(lambda mm, im, f: vmap_mod.push_image(mm, im, f))

        scat = jax.jit(
            lambda imgs, im, s: imgs.at[s].set(
                jnp.round(jnp.clip(im, 0.0, 255.0)).astype(imgs.dtype))
        )

        refs = jax.jit(vmap_mod._live_slot_refs)

        KP = 512
        slots = jnp.asarray(rng.integers(0, 8, KP), jnp.int32)
        A = jnp.tile(jnp.eye(2, dtype=jnp.float32)[None], (KP, 1, 1))
        px = jnp.asarray(
            np.stack([rng.uniform(40, W - 40, KP),
                      rng.uniform(40, H - 40, KP)], 1).astype(np.float32))
        slv = jnp.zeros(KP, jnp.int32)
        warp = jax.jit(
            lambda imgs: img_ops.affine_warp_patches(
                imgs, slots, A, px, 8, slv, 0))

        cases[R] = dict(m=m, push=push, scat=scat, refs=refs, warp=warp)

    # interleave R variants per op
    for name in ("push", "scat", "refs", "warp"):
        for R in RINGS:
            c = cases[R]
            m = c["m"]
            if name == "push":
                fn = c["push"]
                args = [(m, img, jnp.int32(100 + i)) for i in range(K)]
                warm = (m, img, jnp.int32(99))
            elif name == "scat":
                fn = c["scat"]
                args = [(m.imgs, img, jnp.int32(i % R)) for i in range(K)]
                warm = (m.imgs, img, jnp.int32(0))
            elif name == "refs":
                fn = c["refs"]
                args = [(m,)] * K
                warm = (m,)
            else:
                fn = c["warp"]
                args = [(m.imgs,)] * K
                warm = (m.imgs,)
            out[f"{name}_R{R}_ms"] = round(timed(fn, warm, args), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
