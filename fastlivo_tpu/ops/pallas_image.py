"""Pallas TPU kernel: fused patch + gradient sampling, MXU formulation.

The VIO hot loop samples, per tracked point and EKF iteration, an 8x8
patch plus centered-difference gradients on a scale-strided grid
(`ops/image.patches_and_grads`, = lidar_selection.cpp:805-832). The XLA
version issues strided gathers of (K, P+3, P+3) indices into the
HBM-resident image. This kernel instead keeps the whole grayscale image
resident in VMEM (640x512 f32 = 1.3 MB << 16 MB) and extracts each
point's (P+3)x(P+3) strided tap grid with TWO one-hot matmuls on the
MXU — TPUs have no efficient in-kernel gather, but a selection matmul
against iota-comparison one-hot matrices IS the hardware's gather:

    G = R @ window @ C        R: (16, ROWS) one-hot rows (strided taps)
                              C: (W, 128)  one-hot cols (strided taps)

with `Precision.HIGHEST` both matmuls move exactly one f32 image value
per output element, so G is an EXACT gather. The bilinear weighting and
centered differences then use the same arithmetic as the XLA version
(static (P,P) slices of G), giving bit-identical results.

Mosaic lowering constraints discovered on this toolchain (jax 0.9.0,
axon remote-compile), which shaped the design:
  - dynamic slices must be *provably* sublane-aligned: `x_ref[pl.dslice(
    (v // 8) * 8, ROWS), :]` compiles, an unproven start HTTP-500s;
  - the lane (last) dim cannot be dynamically sliced at all — hence the
    one-hot matmul column selection;
  - strided loads, gather/scatter (`.at[].set`), reshape-with-stride all
    fail to lower; `lax.switch`, `fori_loop`, f32 scalar prefetch, and
    static value slices all work.

Out-of-range anchors are clamped tap-by-tap to the image border exactly
like the XLA `_gather` clamp, so results match everywhere including the
borders (callers gate with isInFrame margins first, matching the
reference lidar_selection.cpp:749-758).

STATUS: compiles and runs on the TPU (v5e through the axon relay);
verified BIT-EXACT vs ops.image.patches_and_grads at K=400 over all
scales including border clamps. Measured A/B (2026-08-17, serial
in-dispatch repetition to exclude dispatch overhead): XLA gather path
35 us/call vs this kernel 541 us/call at K=400 — the per-point
(16,ROWS)x(ROWS,W) selection matmuls at Precision.HIGHEST underutilize
the 128x128 MXU ~8x, while XLA lowers the strided gathers efficiently.
The XLA path therefore remains the production default; this kernel is
the validated in-kernel-gather recipe for ops where XLA's lowering is
NOT efficient (and the record of this toolchain's lowering limits).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastlivo_tpu.ops.image import _anchor_weights

MAX_SCALE = 16  # 1 << (pyramid_level + search_level), both <= 2


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(u_ref, v_ref, s_ref, su_ref, sv_ref, img_ref,
            val_ref, du_ref, dv_ref,
            *, patch_size: int, rows: int, h_real: int, w_real: int,
            h_pad: int, grows: int):
    P = patch_size
    half = P // 2
    i = pl.program_id(0)
    u0 = u_ref[i]
    v0 = v_ref[i]
    s = s_ref[i]
    su = su_ref[i]
    sv = sv_ref[i]
    W = img_ref.shape[1]

    # Aligned VMEM window covering every row tap v0 + (e-(half+1))*s,
    # e in [0, P+3), after border clamping. Alignment must be provable
    # (see module docstring), hence the explicit //8*8. All scalar math
    # stays in lax + explicit int32: with x64 enabled, jnp's binop
    # promotion recurses when tracing pallas SMEM scalars.
    i32 = lambda c: jnp.int32(c)
    start = jax.lax.max(
        jax.lax.min(
            jax.lax.sub(v0, jax.lax.mul(s, i32(half + 1))),
            i32(h_pad - rows)),
        i32(0))
    v0a = jax.lax.mul(jax.lax.div(start, i32(8)), i32(8))
    win = img_ref[pl.dslice(v0a, rows), :]  # (rows, W)

    # Row-tap one-hot: R[e, r] = [r == clamp(v0+(e-half-1)s) - v0a]
    ei = jax.lax.broadcasted_iota(jnp.int32, (grows, rows), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (grows, rows), 1)
    trow = jax.lax.clamp(
        i32(0), (ei - i32(half + 1)) * s + v0, i32(h_real - 1)) - v0a
    R = ((ri == trow) & (ei < i32(P + 3))).astype(jnp.float32)
    M = jax.lax.dot_general(R, win, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)

    # Col-tap one-hot: C[c, f] = [c == clamp(u0+(f-half-1)s)]
    ci = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 0)
    fi = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    tcol = jax.lax.clamp(
        i32(0), (fi - i32(half + 1)) * s + u0, i32(w_real - 1))
    C = ((ci == tcol) & (fi < i32(P + 3))).astype(jnp.float32)
    G = jax.lax.dot_general(M, C, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    # G[e, f] == img[clamp(v0+(e-half-1)s), clamp(u0+(f-half-1)s)], exact

    w_tl = (1.0 - su) * (1.0 - sv)
    w_tr = su * (1.0 - sv)
    w_bl = (1.0 - su) * sv
    w_br = su * sv

    def sample(a, b):
        # identical association to ops.image.patches_and_grads.sample
        r0, c0 = 1 + a, 1 + b
        return (
            w_tl * G[r0:r0 + P, c0:c0 + P]
            + w_tr * G[r0:r0 + P, c0 + 1:c0 + P + 1]
            + w_bl * G[r0 + 1:r0 + P + 1, c0:c0 + P]
            + w_br * G[r0 + 1:r0 + P + 1, c0 + 1:c0 + P + 1]
        )

    sfl = jax.lax.convert_element_type(s, jnp.float32)
    val_ref[:, :P] = sample(0, 0)
    du_ref[:, :P] = 0.5 * (sample(0, 1) - sample(0, -1)) / sfl
    dv_ref[:, :P] = 0.5 * (sample(1, 0) - sample(-1, 0)) / sfl


@functools.partial(jax.jit, static_argnames=("patch_size", "interpret"))
def patches_and_grads_pallas(
    img: jnp.ndarray,  # (H, W) f32
    pc: jnp.ndarray,  # (K, 2) f32 centers
    scale: jnp.ndarray,  # (K,) int32, 1..MAX_SCALE
    patch_size: int = 8,
    interpret: bool = False,
):
    """Fused (val, du, dv) sampling; same contract and bit-identical
    output vs ops.image.patches_and_grads for scales in [1, MAX_SCALE]."""
    K = pc.shape[0]
    P = patch_size
    H, W = img.shape
    scale = jnp.clip(jnp.asarray(scale, jnp.int32), 1, MAX_SCALE)
    if scale.ndim == 0:
        scale = jnp.broadcast_to(scale, (K,))
    u_i, v_i, (w_tl, w_tr, _, _) = _anchor_weights(pc, scale)
    # recover su/sv from the weights' factors: w_tl=(1-su)(1-sv), but the
    # direct form is cheaper and identical to _anchor_weights' internals
    sf = scale.astype(img.dtype)
    su = (pc[:, 0] - u_i) / sf
    sv = (pc[:, 1] - v_i) / sf

    rows = min(_round_up((P + 2) * MAX_SCALE + 8, 8), _round_up(H, 8))
    grows = _round_up(P + 3, 8)
    h_pad = max(_round_up(H, 8), rows)
    w_pad = _round_up(W, 128)
    if (h_pad, w_pad) != (H, W):
        img = jnp.pad(img, ((0, h_pad - H), (0, w_pad - W)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # u_i, v_i, scale, su, sv (1-D each:
        # 2-D SMEM prefetch arrays fail to legalize in the index maps)
        grid=(K,),
        # Whole image resident in VMEM across the grid (constant index
        # map). Index-map constants MUST be explicit int32: the package
        # enables x64, under which plain-int returns trace to i64 and
        # Mosaic fails to legalize the transform function.
        in_specs=[pl.BlockSpec(
            (h_pad, w_pad), lambda i, *_: (jnp.int32(0), jnp.int32(0)))],
        out_specs=[
            pl.BlockSpec((P, 128), lambda i, *_: (i, jnp.int32(0))),
            pl.BlockSpec((P, 128), lambda i, *_: (i, jnp.int32(0))),
            pl.BlockSpec((P, 128), lambda i, *_: (i, jnp.int32(0))),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((K * P, 128), jnp.float32)] * 3
    val, du, dv = pl.pallas_call(
        functools.partial(
            _kernel, patch_size=P, rows=rows, h_real=H, w_real=W,
            h_pad=h_pad, grows=grows),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(u_i.astype(jnp.int32), v_i.astype(jnp.int32), scale,
      su.astype(jnp.float32), sv.astype(jnp.float32),
      img.astype(jnp.float32))
    shape = (K, P, 128)
    return (val.reshape(shape)[:, :, :P], du.reshape(shape)[:, :, :P],
            dv.reshape(shape)[:, :, :P])
