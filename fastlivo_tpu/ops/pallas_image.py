"""Pallas TPU kernel: fused patch + gradient sampling from a VMEM image.

The VIO hot loop samples, per tracked point and EKF iteration, an 8x8
patch and its centered-difference gradients at a scale-strided grid
(`ops/image.patches_and_grads`, = lidar_selection.cpp:805-832). The XLA
version issues 12 gathers of (K, P, P) indices into the HBM-resident
image; this kernel instead keeps the whole grayscale image in VMEM
(640x512 f32 = 1.3 MB << 16 MB) and walks the tracked points on the
grid, each step doing one dynamic-sliced window load plus vectorized
strided taps — no HBM traffic after the initial image load.

Supported scales: 1, 2, 4, 8, 16 (= 1 << (pyramid_level + search_level)
with pyramid <= 2, search <= 2). Each scale is a static `lax.switch`
branch so every slice has static shape.

`patches_and_grads_pallas` matches `ops.image.patches_and_grads`
bit-for-bit on in-bounds anchors (verified in tests, interpret mode on
CPU); out-of-range anchors are clamped to keep slices in-bounds, like
the XLA version's clamped gathers.

STATUS: interpret-mode verified; NOT compilable in this container — the
axon relay's remote-compile helper rejects Mosaic kernels (HTTP 500 on
even a minimal valid kernel; jnp.clip on prefetch scalars and
lax.switch additionally recurse in the local Mosaic lowering of this
jax version). Wire it into vio.photometric_update once running against
a directly-attached TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCALES = (1, 2, 4, 8, 16)


def _kernel(ui_ref, vi_ref, sidx_ref, wtl_ref, wtr_ref, wbl_ref, wbr_ref,
            img_ref, val_ref, du_ref, dv_ref,
            *, patch_size: int, scales: tuple):
    P = patch_size
    half = P // 2
    i = pl.program_id(0)
    u0 = ui_ref[i]
    v0 = vi_ref[i]
    sidx = sidx_ref[i]
    H, W = img_ref.shape

    # float scalar reads from SMEM recurse in the Mosaic lowering on this
    # jax version; weights travel as int32 bit patterns instead
    def fbits(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    w_tl = fbits(wtl_ref[i])
    w_tr = fbits(wtr_ref[i])
    w_bl = fbits(wbl_ref[i])
    w_br = fbits(wbr_ref[i])

    def branch(s):
        # window spans taps at rows v0 + (x-half)*s .. +s and the +/-s
        # gradient taps: origin v0-(half+1)*s, size (P+3)*s
        size = (P + 3) * s

        def body():
            r0 = jax.lax.clamp(jnp.int32(0), v0 - (half + 1) * s,
                               jnp.int32(H - size))
            c0 = jax.lax.clamp(jnp.int32(0), u0 - (half + 1) * s,
                               jnp.int32(W - size))
            win = img_ref[pl.ds(r0, size), pl.ds(c0, size)]  # (size, size)

            def tap(dr, dc):
                # anchor of patch(0,0) inside the window is (x+1)*s rows
                return jax.lax.slice(
                    win,
                    (s + dr, s + dc),
                    (s + dr + P * s, s + dc + P * s),
                    (s, s),
                )  # (P, P)

            def sample(dr, dc):
                return (
                    w_tl * tap(dr, dc)
                    + w_tr * tap(dr, dc + s)
                    + w_bl * tap(dr + s, dc)
                    + w_br * tap(dr + s, dc + s)
                )

            val = sample(0, 0)
            sf = jnp.float32(s)
            du = 0.5 * (sample(0, s) - sample(0, -s)) / sf
            dv = 0.5 * (sample(s, 0) - sample(-s, 0)) / sf
            return val, du, dv

        return body

    val, du, dv = jax.lax.switch(
        jnp.clip(sidx, 0, len(scales) - 1),
        [branch(s) for s in scales],
    )
    val_ref[0] = val
    du_ref[0] = du
    dv_ref[0] = dv


@functools.partial(jax.jit, static_argnames=("patch_size", "interpret"))
def patches_and_grads_pallas(
    img: jnp.ndarray,  # (H, W) f32
    pc: jnp.ndarray,  # (K, 2) f32 centers
    scale: jnp.ndarray,  # (K,) int32, each in SCALES
    patch_size: int = 8,
    interpret: bool = False,
):
    """Fused (val, du, dv) sampling; same contract as
    ops.image.patches_and_grads but `scale` must be one of SCALES."""
    K = pc.shape[0]
    P = patch_size
    scale = scale.astype(jnp.int32)
    u, v = pc[:, 0], pc[:, 1]
    sf = scale.astype(img.dtype)
    u_i = jnp.floor(u / sf).astype(jnp.int32) * scale
    v_i = jnp.floor(v / sf).astype(jnp.int32) * scale
    su = (u - u_i) / sf
    sv = (v - v_i) / sf
    bits = lambda x: jax.lax.bitcast_convert_type(
        x.astype(jnp.float32), jnp.int32
    )
    w_tl = bits((1 - su) * (1 - sv))
    w_tr = bits(su * (1 - sv))
    w_bl = bits((1 - su) * sv)
    w_br = bits(su * sv)
    # branches must have in-bounds static window shapes: only scales whose
    # (P+3)*s window fits the image get a branch (a prefix of SCALES)
    H, W = img.shape
    allowed = tuple(s for s in SCALES if (P + 3) * s <= min(H, W))
    sidx = jnp.round(jnp.log2(sf)).astype(jnp.int32)
    sidx = jnp.minimum(sidx, len(allowed) - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,  # u_i, v_i, sidx + 4 weight bit patterns
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # image (whole, resident)
        ],
        out_specs=[
            pl.BlockSpec((1, P, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, P, P), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, P, P), lambda i, *_: (i, 0, 0)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((K, P, P), img.dtype)] * 3
    val, du, dv = pl.pallas_call(
        functools.partial(_kernel, patch_size=P, scales=allowed),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(u_i, v_i, sidx, w_tl, w_tr, w_bl, w_br, img)
    return val, du, dv
