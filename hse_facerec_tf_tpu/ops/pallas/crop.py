"""Fused crop+resize Pallas kernel — the detector's stage-2/3 crop pass.

Replaces the two-einsum form of ``ops/resize.py::crop_resize_bilinear`` for
the MTCNN R-Net/O-Net crop batches (reference semantics:
``facial_analysis.py:545-547,577`` — zero-padded crop buffers resized with
INTER_AREA). The einsum form must materialize the row-pass intermediate
``(K, out, W, C)`` in HBM — at 640×480 batch-8 that is 189 MB/cascade
moving at ~341 GB/s, 24% of detect device-busy (r5 profile:
fusion.1426/1427/1442/1443), and a column-first reorder measured SLOWER
(see ops/resize.py). This kernel keeps the whole chain in VMEM: the image
plane is resident across crop chunks, per-crop hat weights regenerate from
the box scalars (the same move as ops/pallas/warp.py regenerating affine
weights), and only the (K, C, out, out) crops ever return to HBM.

Weight math is ``_hat_weights(clamp=False)`` + the supersample fold,
bit-identical in f32: w[i, h] = max(0, 1 - |h - y(i)|) with
y(i) = y1 + (i+0.5)/s·(y2-y1) - 0.5, averaged over the s sub-samples —
out-of-range rows are all-zero (the reference's black buffers). Dots run
in f32 (Mosaic lowers f32 matmul through multi-pass bf16; numerics match
the HIGH-precision einsum path ~1e-5).

Measured (r5, v5e, batch-8 640x480, stage-2 128 crops @24 + stage-3
64 @48, supersample 2, CHAIN=40): 1.125 ms/pass vs 2.521 for the einsum
form (2.24x), value drift 4.2e-5 relative. Wired as the detector's
default TPU crop path (``pipelines/detector.py::_use_pallas_crop``).

Measured losers at the same design point, do not retry: chunk 16 TIES 8
(1.11 ms both — grid-step overhead is not the cost) and chunk 32 fails
Mosaic compile; replacing the per-crop second-pass dots with ONE
(chunk*out, W)x(W, chunk*out) dot per channel + diagonal-block
extraction is bit-exact but SLOWER (1.29 vs 1.12 ms) — the extra
chunk-squared MXU work plus non-128-aligned lane slices cost more than
the tiny dots' launch overhead ever did.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 8     # crops per grid step: bounds VMEM (weights + tmp per chunk).
# r5 sweep at the stage-2/3 design point: chunk 16 TIES 8 (1.11 ms both,
# grid-step overhead is not the cost), chunk 32 fails Mosaic compile
# (tpu_compile_helper exit 1). 8 stays the default.


def _row_weights(y1, dy, out_size: int, supersample: int, size: int,
                 transposed: bool):
    """Per-crop hat weights as a 2-D array, generated from two scalars.

    Returns (out_size, size) when ``transposed`` is False, else
    (size, out_size). Matches ops/resize.py::_hat_weights(clamp=False)
    folded with the supersample mean, evaluated in f32."""
    s = supersample * out_size
    shape = (size, out_size) if transposed else (out_size, size)
    o_dim, h_dim = (1, 0) if transposed else (0, 1)
    oo = jax.lax.broadcasted_iota(jnp.int32, shape, o_dim).astype(jnp.float32)
    hh = jax.lax.broadcasted_iota(jnp.int32, shape, h_dim).astype(jnp.float32)
    acc = None
    for u in range(supersample):
        i_s = supersample * oo + float(u)
        ys = y1 + (i_s + 0.5) / s * dy - 0.5
        w = jnp.maximum(0.0, 1.0 - jnp.abs(hh - ys))
        acc = w if acc is None else acc + w
    return acc / supersample


def _crop_kernel(boxes_ref, img_ref, out_ref, *, out_size: int,
                 supersample: int, chunk: int):
    C, H, W = img_ref.shape
    g = pl.program_id(0)
    # per-chunk row weights, stacked (chunk*out, H): sublane concat
    r_blocks = []
    ct_blocks = []
    for k in range(chunk):
        y1 = boxes_ref[g * chunk + k, 0]
        x1 = boxes_ref[g * chunk + k, 1]
        dy = boxes_ref[g * chunk + k, 2] - y1
        dx = boxes_ref[g * chunk + k, 3] - x1
        r_blocks.append(_row_weights(y1, dy, out_size, supersample, H,
                                     transposed=False))
        # column weights generated pre-transposed (W, out): Mosaic
        # transposes are relayout copies, iota math is free
        ct_blocks.append(_row_weights(x1, dx, out_size, supersample, W,
                                      transposed=True))
    r_stack = jnp.concatenate(r_blocks, axis=0)          # (chunk*out, H)
    for c in range(C):
        tmp = jax.lax.dot(r_stack, img_ref[c],
                          preferred_element_type=jnp.float32)
        for k in range(chunk):
            out_ref[k, c] = jax.lax.dot(
                tmp[k * out_size:(k + 1) * out_size, :], ct_blocks[k],
                preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("out_size", "supersample", "interpret",
                                    "chunk"))
def crop_resize_zero_pallas(img, boxes, out_size: int, supersample: int = 2,
                            interpret: bool = False, chunk: int = CHUNK):
    """(H, W, C) f32 image + (K, 4) [y1, x1, y2, x2] boxes ->
    (K, out, out, C) crops; outside='zero' semantics only (the detector's
    stage-2/3 contract). K must be a multiple of ``chunk`` (the detector's
    static caps are powers of two); vmap adds a leading batch dim."""
    H, W, C = img.shape
    K = boxes.shape[0]
    assert K % chunk == 0, f"K={K} must be a multiple of {chunk}"
    x = jnp.transpose(img, (2, 0, 1))                    # (C, H, W)
    out = pl.pallas_call(
        functools.partial(_crop_kernel, out_size=out_size,
                          supersample=supersample, chunk=chunk),
        grid=(K // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # whole image resident across all crop chunks (index map is
            # grid-independent, so the block is fetched once)
            pl.BlockSpec((C, H, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, C, out_size, out_size),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, C, out_size, out_size),
                                       jnp.float32),
        interpret=interpret,
    )(boxes.astype(jnp.float32), x)
    return jnp.transpose(out, (0, 2, 3, 1))              # (K, out, out, C)
