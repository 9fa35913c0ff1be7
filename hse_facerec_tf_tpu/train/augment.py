"""On-device data augmentation for face training.

Reproduces the reference's Keras ImageDataGenerator policy
(``facerec_keras_train.py:164-168``: shear 0.3, rotation ±10°, zoom ±0.2,
width/height shift ±0.1, horizontal flip) as a single vmapped inverse-affine
bilinear warp — the whole augmented batch is generated on device, no host
per-image Python.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    rotation_deg: float = 10.0
    shear: float = 0.3
    zoom: float = 0.2
    shift: float = 0.1
    horizontal_flip: bool = True
    fill_value: float = 0.0
    # warp backend: "auto" = Pallas kernel on TPU (ops/pallas/warp.py,
    # 11.5x the einsum form — it regenerates the hat weights in VMEM
    # instead of materializing ~5.75 GB/batch in HBM), einsum elsewhere;
    # "einsum" / "pallas" force one.
    backend: str = "auto"


def _sample_affine(key, cfg: AugmentConfig, h: int, w: int) -> jnp.ndarray:
    """Random 2×3 inverse affine (maps output coords -> input coords),
    centered at the image midpoint."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    theta = jnp.deg2rad(jax.random.uniform(k1, (), minval=-cfg.rotation_deg,
                                           maxval=cfg.rotation_deg))
    shear = jax.random.uniform(k2, (), minval=-cfg.shear, maxval=cfg.shear)
    zx = 1.0 + jax.random.uniform(k3, (), minval=-cfg.zoom, maxval=cfg.zoom)
    zy = 1.0 + jax.random.uniform(k4, (), minval=-cfg.zoom, maxval=cfg.zoom)
    tx = jax.random.uniform(k5, (), minval=-cfg.shift, maxval=cfg.shift) * w
    ty = jax.random.uniform(k6, (), minval=-cfg.shift, maxval=cfg.shift) * h
    flip = jnp.where(cfg.horizontal_flip
                     & (jax.random.uniform(k7, ()) < 0.5), -1.0, 1.0)

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # forward = T(center+shift) @ R @ Shear @ Zoom @ Flip @ T(-center);
    # a..d below ARE the inverse linear part (output->input sampling), so the
    # warp matrix uses them directly: x_in = L_inv (x_out - center - t) + center.
    a = cos / zx * flip
    b = (sin + shear * cos) / zy
    c = -sin / zx * flip
    d = (cos - shear * sin) / zy
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    return jnp.array([[a, b, cx - a * (cx + tx) - b * (cy + ty)],
                      [c, d, cy - c * (cx + tx) - d * (cy + ty)]])


def _tri(t):
    """Bilinear (hat) kernel."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _warp_one(img, mat, fill):
    """Inverse-affine bilinear warp as TWO per-line matmul resamplings
    (Catmull-Smith two-pass decomposition) instead of a 2-D point gather.

    TPU point-gathers execute as scalar loads — the 4-tap gather form of
    this warp ran the whole augmentation at ~340 img/s, 18x slower than the
    entire fused train step it feeds. Decomposing the affine into a vertical
    then a horizontal shear-scale pass turns each into ``out_line = W @
    in_line`` with per-line hat-function weight matrices (built on the fly
    in bf16) that run on the MXU — same trick as ops/resize.py's crop
    kernel, measured ~25x faster end-to-end. The two-pass form is exact for
    axis-aligned transforms and adds only sub-pixel smoothing under
    shear/rotation (augmentation noise, not a parity surface). Valid for
    |m00| bounded away from 0 — true for the reference's augmentation
    ranges (rotation <= 10 deg, zoom <= 1.2: |m00| >= 0.8).

    Cost ceiling (r3 profiling): the materialized per-image weight tensors
    (~5.8 GB bf16 per pass at batch 256) bound this form at ~40% of the
    train step; it remains the CPU/mesh-test path and the golden for the
    TPU path. On TPU, augment_batch dispatches to ops/pallas/warp.py
    (ladder + selection-matmul kernel, 11.5x — it regenerates the weights
    in VMEM). Measured non-fixes for THIS form: uint8-quantized weights
    with in-einsum dequant are SLOWER (4.74 vs 4.12 ms per 64-img pass —
    XLA materializes the dequantized operand anyway); banded/shift
    decompositions reduce to per-(image, row) gathers, the 18x-slower form
    this code replaced. The weights are 2-sparse but XLA dot operands must
    be dense — this is the fastest known XLA-expressible form.
    """
    h, w, _ = img.shape
    m00, m01, m02 = mat[0, 0], mat[0, 1], mat[0, 2]
    m10, m11, m12 = mat[1, 0], mat[1, 1], mat[1, 2]
    # x_in = m00*xo + m01*yo + m02 ; y_in = m10*xo + m11*yo + m12.
    # Pass A (vertical, on original columns):  IA(o, x) = I(a*o + b*x + g, x)
    # Pass B (horizontal, on IA rows):         out(y, xo) = IA(y, m00*xo + m01*y + m02)
    # Composing: b*m00 = m10, a + b*m01 = m11, g + b*m02 = m12.
    m00_safe = jnp.where(jnp.abs(m00) < 1e-3,
                         jnp.where(m00 < 0, -1e-3, 1e-3), m00)
    b = m10 / m00_safe
    a = m11 - b * m01
    g = m12 - b * m02
    yo = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    r = jnp.clip(a * yo[:, None] + b * xs[None, :] + g, 0.0, h - 1.0)  # (Ho, W)
    wa = _tri(r[:, :, None] - jnp.arange(h, dtype=jnp.float32)[None, None, :])
    ia = jnp.einsum("oxi,ixc->oxc", wa.astype(jnp.bfloat16), img)      # (Ho, W, C)

    c = jnp.clip(m00 * xs[None, :] + m01 * yo[:, None] + m02, 0.0, w - 1.0)
    wb = _tri(c[:, :, None] - jnp.arange(w, dtype=jnp.float32)[None, None, :])
    out = jnp.einsum("yoi,yic->yoc", wb.astype(jnp.bfloat16), ia)      # (H, Wo, C)

    sx = m00 * xs[None, :] + m01 * yo[:, None] + m02
    sy = m10 * xs[None, :] + m11 * yo[:, None] + m12
    valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    return jnp.where(valid[..., None], out, fill)


def _use_pallas(cfg: AugmentConfig, h: int, w: int) -> bool:
    if cfg.backend == "pallas":
        return True
    if cfg.backend == "einsum":
        return False
    # trace-time decision: the Mosaic kernel exists for TPU only, and its
    # roll/pad tiling assumes 8-aligned spatial dims (true for all training
    # sizes here: 224, 160, 64)
    return (jax.default_backend() == "tpu" and h % 8 == 0 and w % 8 == 0)


def augment_batch(key: jax.Array, images: jnp.ndarray,
                  cfg: AugmentConfig = AugmentConfig()) -> jnp.ndarray:
    """(N, H, W, C) float images -> randomly warped batch (same shape)."""
    n, h, w, _ = images.shape
    keys = jax.random.split(key, n)
    mats = jax.vmap(lambda k: _sample_affine(k, cfg, h, w))(keys)
    if _use_pallas(cfg, h, w):
        from ..ops.pallas.warp import warp_batch_pallas
        return warp_batch_pallas(images, mats, cfg.fill_value)
    return jax.vmap(lambda im, m: _warp_one(im, m, cfg.fill_value))(images, mats)
