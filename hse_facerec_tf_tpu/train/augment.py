"""On-device data augmentation for face training.

Reproduces the reference's Keras ImageDataGenerator policy
(``facerec_keras_train.py:164-168``: shear 0.3, rotation ±10°, zoom ±0.2,
width/height shift ±0.1, horizontal flip) as a single vmapped inverse-affine
bilinear warp — the whole augmented batch is generated on device, no host
per-image Python.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

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


def _warp_one(img, mat, fill):
    h, w, _ = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = mat[0, 0] * gx + mat[0, 1] * gy + mat[0, 2]
    sy = mat[1, 0] * gx + mat[1, 1] * gy + mat[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)

    def at(yi, xi):
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return img[yi, xi]

    out = (at(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
           + at(y0, x0 + 1) * (wx * (1 - wy))[..., None]
           + at(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
           + at(y0 + 1, x0 + 1) * (wx * wy)[..., None])
    return jnp.where(valid[..., None], out, fill)


def augment_batch(key: jax.Array, images: jnp.ndarray,
                  cfg: AugmentConfig = AugmentConfig()) -> jnp.ndarray:
    """(N, H, W, C) float images -> randomly warped batch (same shape)."""
    n, h, w, _ = images.shape
    keys = jax.random.split(key, n)
    mats = jax.vmap(lambda k: _sample_affine(k, cfg, h, w))(keys)
    return jax.vmap(lambda im, m: _warp_one(im, m, cfg.fill_value))(images, mats)
