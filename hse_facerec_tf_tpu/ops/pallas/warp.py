"""Batched inverse-affine bilinear warp as a Pallas kernel (ladder +
selection-matmul form) — the augmentation hot path of both reference
training loops (``facerec_keras_train.py:164-168`` and
``age_gender_train.py:127-133``: shear/rotation/zoom/shift/hflip per
Keras ``ImageDataGenerator``).

Why a kernel: the XLA form (train/augment.py::_warp_one, the Catmull-Smith
two-pass einsum) must materialize per-image hat-weight tensors —
``bf16[256,224,224,224]`` = 5.75 GB of HBM traffic per batch-256 pass, 40%
of the r3 train step (BENCH_r03 fusion profile: fusion.1482/1483/1485 =
26.6 ms/step of 66.8). Those weights are a pure function of 6 affine
scalars per image; this kernel regenerates them on the fly in VMEM.
Measured: **2.65 ms vs 30.4 ms** per batch-256×224² warp on v5e-1 (11.5×).

Decomposition per pass (pass A vertical, pass B horizontal; two-pass factor
identical to _warp_one): the source index for destination (o, x) is
``base(o,x) + j``, base = i0(o) + k(x), taps j ∈ {0,1,2}:

- ``k(x)`` (and pass B's ``k2(y)``): shift amount invariant ALONG the shift
  axis → exact butterfly ladder of ≤8 static masked power-of-two circular
  rolls, select-by-destination-bit. (Butterfly-by-destination composes
  ONLY under that invariance — a destination-dependent amount along its
  own axis reads stale mask bits at intermediate hops; measured wrong.)
- ``i0(o)`` (pass B: ``j0(xo)``): per-row monotone selection → 0/1
  selection MATMUL on the MXU (same formulation that beats gathers 12× in
  ops/resize.py). The horizontal flip is folded into pass B's selection
  matrix and weight grids (evaluate the m00>0 warp at mirrored lanes) —
  lax.rev is unimplemented in Mosaic and the fold is free.
- fractional 2-tap blend with clip-to-edge semantics, exactly:
  ``t = clip(r, 0, S-1) - base; out = Σ_j hat(t-j)·tap_j``. Three taps
  cover the floor(A)+floor(B) vs floor(A+B) off-by-one; every
  out-of-support tap gets hat weight 0, so circular wraps never leak into
  valid pixels, and the trailing valid-mask fill handles the rest.

All control flow is static (no drift loops: a dynamic-span roll-accumulate
variant measured 20.6 ms — barely better than XLA). Selection dots run in
bf16: the 0/1 lhs is exact, the rhs rounds the image to bf16 — the same
error class as the einsum path's bf16 hat weights (max |Δ| ≈ 6e-3 on unit-
range images, measured against _warp_one).

Mosaic lowering constraints honored here (each cost a compile failure):
float iotas (use int32 + convert), dynamic lane rotates need lanes%128==0
(pass B pads W→WP), selects between i1 vectors (cast masks to f32 first).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat(t):
    """Bilinear (hat) kernel, matching train/augment.py::_tri."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _ladder(chans, m, axis, size):
    """Circularly shift every array in ``chans`` by ``m`` (int32 >= 0,
    destination-indexed, CONSTANT along ``axis``) along ``axis`` via
    static masked power-of-two rolls."""
    b = 0
    while (1 << b) < size:
        sel = ((m >> b) & 1).astype(jnp.float32)
        chans = [sel * pltpu.roll(u, size - (1 << b), axis) + (1.0 - sel) * u
                 for u in chans]
        b += 1
    return chans


def _warp_kernel(scal_ref, img_ref, out_ref):
    C, H, W = img_ref.shape[1], img_ref.shape[2], img_ref.shape[3]
    WP = ((W + 127) // 128) * 128
    n = pl.program_id(0)
    m00 = scal_ref[n, 0]
    m01 = scal_ref[n, 1]
    m02 = scal_ref[n, 2]
    m10 = scal_ref[n, 3]
    m11 = scal_ref[n, 4]
    m12 = scal_ref[n, 5]
    flip = scal_ref[n, 6]
    fill = scal_ref[n, 7]

    # ---- pass A (vertical): ia[c](o,x) = lerp img[c](a*o + b*x + g, x)
    b_ = m10 / m00
    a = m11 - b_ * m01
    g = m12 - b_ * m02

    oy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ox = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    r0 = a * oy.astype(jnp.float32) + g
    bx = b_ * ox.astype(jnp.float32)
    i0 = jnp.floor(r0).astype(jnp.int32)
    k = jnp.floor(bx).astype(jnp.int32)
    t = jnp.clip(r0 + bx, 0.0, H - 1.0) - (i0 + k).astype(jnp.float32)
    wa = [_hat(t), _hat(t - 1), _hat(t - 2)]

    # per-column pre-shift: p(y,x) = img(y + k(x), x)
    p = _ladder([img_ref[0, c] for c in range(C)], jnp.mod(k, H), 0, H)
    # per-row selection matmul: G(o,i) = [i == i0(o) mod H]
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
    sub_o = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
    i0_hh = jnp.mod(jnp.floor(a * sub_o.astype(jnp.float32) + g)
                    .astype(jnp.int32), H)
    G = (lane_i == i0_hh).astype(jnp.bfloat16)
    ia = []
    for c in range(C):
        acc = None
        v = p[c]
        for j in range(3):
            sel = jnp.dot(G, v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            acc = wa[j] * sel if acc is None else acc + wa[j] * sel
            if j < 2:
                v = pltpu.roll(v, H - 1, 0)
        ia.append(acc)

    # ---- pass B (horizontal): out[c](y,xo) = lerp ia[c](y, m00*xo+m01*y+m02)
    ypi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xpi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ypf = ypi.astype(jnp.float32)
    # fold the horizontal flip: evaluate the m00>0 warp at mirrored lanes
    xef = jnp.where(flip < 0, (W - 1) - xpi.astype(jnp.float32),
                    xpi.astype(jnp.float32))
    c0 = m00 * xef + m02
    ky = m01 * ypf
    j0 = jnp.floor(c0).astype(jnp.int32)
    k2 = jnp.floor(ky).astype(jnp.int32)
    t2 = jnp.clip(c0 + ky, 0.0, W - 1.0) - (j0 + k2).astype(jnp.float32)
    wb = [_hat(t2), _hat(t2 - 1), _hat(t2 - 2)]

    # per-row pre-shift on the padded lane circle: q(y,x) = ia(y, x + k2(y))
    padc = jnp.zeros((H, WP - W), jnp.float32)
    yp_wp = jax.lax.broadcasted_iota(jnp.int32, (H, WP), 0).astype(jnp.float32)
    k2p = jnp.mod(jnp.floor(m01 * yp_wp).astype(jnp.int32), WP)
    q = _ladder([jnp.concatenate([ia[c], padc], axis=1) for c in range(C)],
                k2p, 1, WP)
    # per-column selection matmul: G2(i,xo) = [i == j0(xo_eff) mod WP]
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (WP, W), 0)
    lane_x = jax.lax.broadcasted_iota(jnp.int32, (WP, W), 1)
    xef_c = jnp.where(flip < 0, (W - 1) - lane_x.astype(jnp.float32),
                      lane_x.astype(jnp.float32))
    j0_c = jnp.mod(jnp.floor(m00 * xef_c + m02).astype(jnp.int32), WP)
    G2 = (sub_i == j0_c).astype(jnp.bfloat16)

    sx = c0 + ky
    sy = m10 * xef + m11 * ypf + m12
    valid = ((sx >= 0) & (sx <= W - 1) & (sy >= 0)
             & (sy <= H - 1)).astype(jnp.float32)
    for c in range(C):
        acc = None
        v = q[c]
        for j in range(3):
            sel = jnp.dot(v.astype(jnp.bfloat16), G2,
                          preferred_element_type=jnp.float32)
            acc = wb[j] * sel if acc is None else acc + wb[j] * sel
            if j < 2:
                v = pltpu.roll(v, WP - 1, 1)
        out_ref[0, c] = valid * acc + (1.0 - valid) * fill


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_batch_pallas(images_nhwc, mats, fill, interpret=False):
    """(N,H,W,C) f32 images + (N,2,3) inverse-affine mats (output→input,
    as produced by train/augment.py::_sample_affine) → warped (N,H,W,C).

    Matches _warp_one's two-pass semantics (same factorization, same
    clip-to-edge + fill-mask behavior) to within bf16 rounding of the
    image operand. Requires H, W multiples of 8 (gate in the caller)."""
    n, h, w, c = images_nhwc.shape
    x = jnp.transpose(images_nhwc, (0, 3, 1, 2))     # (N,C,H,W)
    # flip-factor on device: M = M_plus ∘ mirror_x when m00 < 0 (keeps the
    # two-pass division by m00 well-conditioned; |m00| >= 0.8 post-factor
    # for the reference's augmentation ranges)
    m00 = mats[:, 0, 0]
    neg = m00 < 0
    flips = jnp.where(neg, -1.0, 1.0).astype(jnp.float32)
    col0 = mats[:, :, 0]
    adj = jnp.stack([jnp.where(neg, -col0[:, 0], col0[:, 0]),
                     jnp.where(neg, -col0[:, 1], col0[:, 1])], axis=1)
    col2 = mats[:, :, 2] + jnp.where(neg[:, None], col0 * (w - 1), 0.0)
    mats_plus = jnp.stack([adj[:, 0], mats[:, 0, 1], col2[:, 0],
                           adj[:, 1], mats[:, 1, 1], col2[:, 1]], axis=1)
    scal = jnp.concatenate([
        mats_plus,
        flips[:, None],
        jnp.full((n, 1), fill, jnp.float32)], axis=1)  # (N,8)
    out = pl.pallas_call(
        _warp_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        interpret=interpret,
    )(scal, x)
    return jnp.transpose(out, (0, 2, 3, 1))
