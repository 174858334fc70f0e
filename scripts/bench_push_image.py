"""Microbench: price of visual_map.push_image variants on the relay.

Compares the round-3 ring (64 f32 slots) against the round-4 pool
(256 u8 slots + live-refcount allocator) at product shapes, chained
K-deep with one sync. Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    from fastlivo_tpu import visual_map as vmap_mod

    out = {}
    img_f32 = jnp.zeros((512, 640), jnp.float32)
    for name, ring, dt in (("ring64_f32", 64, jnp.float32),
                           ("pool256_u8", 256, jnp.uint8)):
        m = vmap_mod.empty_visual_map(
            n_points=65536, n_obs=20, table_size=1 << 18, voxel_cap=8,
            ring=ring, height=512, width=640, img_dtype=dt,
        )
        m = jax.block_until_ready(m)
        m = vmap_mod.push_image(m, img_f32, jnp.int32(0))
        jax.block_until_ready(m.img_fid)  # compile + warm
        t0 = time.perf_counter()
        for k in range(1, K + 1):
            m = vmap_mod.push_image(m, img_f32, jnp.int32(k))
        jax.block_until_ready(m.img_fid)
        out[name] = round((time.perf_counter() - t0) * 1e3 / K, 2)
    print(json.dumps({"push_image_ms": out, "K": K}), flush=True)


if __name__ == "__main__":
    main()
