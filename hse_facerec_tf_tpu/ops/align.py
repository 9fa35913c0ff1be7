"""Batched 5-landmark similarity-transform face alignment.

TPU-native equivalent of the reference's InsightFace alignment path
(``age_gender_identity/insightface.py:25-74``: skimage SimilarityTransform
estimate + cv2.warpAffine to a 112×112 / 112×96 landmark template;
``insightface_face_embedding.py:41-63`` uses the same via face_preprocess).

Both steps are closed-form and vectorize: the similarity estimate is Umeyama's
least-squares solution (what skimage implements), the warp is an inverse-
affine bilinear gather — all batched with vmap, jit-compatible, zero outside
borders (cv2 borderValue=0).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ArcFace 112×96 template (reference :38-45); x += 8 for 112×112 (:44-45).
ARCFACE_TEMPLATE_96 = np.array([
    [30.2946, 51.6963],
    [65.5318, 51.5014],
    [48.0252, 71.7366],
    [33.5493, 92.3655],
    [62.7299, 92.2041]], dtype=np.float32)


def arcface_template(width: int = 112) -> np.ndarray:
    t = ARCFACE_TEMPLATE_96.copy()
    if width == 112:
        t[:, 0] += 8.0
    return t


def estimate_similarity(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Umeyama similarity estimate mapping src -> dst (both (K, 2)).

    Returns a 2×3 affine [sR | t] minimizing Σ ||dst - (sR·src + t)||², with
    reflection handling — the same solution skimage's
    ``SimilarityTransform.estimate`` computes.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]                     # (2, 2)
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.array([1.0, 1.0]) * jnp.array([1.0, 0.0]) + jnp.array([0.0, 1.0]) * d
    r = u @ jnp.diag(diag) @ vt
    var_s = jnp.mean(jnp.sum(sc * sc, axis=1))
    scale = jnp.sum(s * diag) / jnp.maximum(var_s, 1e-12)
    t = mu_d - scale * (r @ mu_s)
    m = jnp.concatenate([scale * r, t[:, None]], axis=1)  # (2, 3)
    return m


def warp_affine(img: jnp.ndarray, m: jnp.ndarray, out_hw: Tuple[int, int]
                ) -> jnp.ndarray:
    """cv2.warpAffine semantics: ``m`` maps src -> dst; we sample dst pixels at
    m^-1 · (x, y, 1) with bilinear interpolation, zero outside."""
    H, W = img.shape[0], img.shape[1]
    oh, ow = out_hw
    img = img.astype(jnp.float32)
    # invert [A | t]
    a = m[:, :2]
    t = m[:, 2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv_a = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / det
    inv_t = -inv_a @ t

    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv_a[0, 0] * gx + inv_a[0, 1] * gy + inv_t[0]
    sy = inv_a[1, 0] * gx + inv_a[1, 1] * gy + inv_t[1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    # zero ring: out-of-image taps read 0, so boundary pixels blend partially
    # with black exactly like cv2's BORDER_CONSTANT bilinear.
    img_p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))

    def at(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32) + 1, 0, H + 1)
        xi = jnp.clip(xi.astype(jnp.int32) + 1, 0, W + 1)
        return img_p[yi, xi]

    out = (at(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
           + at(y0, x0 + 1) * (wx * (1 - wy))[..., None]
           + at(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
           + at(y0 + 1, x0 + 1) * (wx * wy)[..., None])
    return out


def align_faces(img: jnp.ndarray, landmarks: jnp.ndarray, out_size: int = 112
                ) -> jnp.ndarray:
    """Align each face to the ArcFace template.

    img: (H, W, 3); landmarks: (N, 5, 2) [x, y] detected points (e.g. from the
    MTCNN O-Net, pipelines/detector.py). Returns (N, out_size, out_size, 3).
    """
    template = jnp.asarray(arcface_template(out_size))

    def one(lmk):
        m = estimate_similarity(lmk, template)
        return warp_affine(img, m, (out_size, out_size))

    return jax.vmap(one)(landmarks.astype(jnp.float32))


def landmarks_from_detector(points: np.ndarray) -> np.ndarray:
    """Detector landmark layout (N, 10) [x0..x4, y0..y4] -> (N, 5, 2)."""
    points = np.asarray(points)
    return np.stack([points[:, 0:5], points[:, 5:10]], axis=-1)
