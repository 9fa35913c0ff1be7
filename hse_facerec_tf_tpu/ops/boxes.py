"""Vectorized bounding-box math for the MTCNN cascade.

Device-side, mask-aware equivalents of the reference's NumPy helpers
(``facial_analysis.py:354-476``: ``bbreg``, ``generateBoundingBox``, ``rerec``,
``pad``). Boxes are (N, 4) float [x1, y1, x2, y2] in the reference's 1-indexed
MATLAB-lineage convention (+1 widths); padding entries are ignored via masks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

STRIDE = 2
CELLSIZE = 12


def bbreg(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """Calibrate boxes by regression offsets (reference ``bbreg`` :354-367)."""
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    return jnp.stack([
        boxes[:, 0] + reg[:, 0] * w,
        boxes[:, 1] + reg[:, 1] * h,
        boxes[:, 2] + reg[:, 2] * w,
        boxes[:, 3] + reg[:, 3] * h,
    ], axis=1)


def bbreg_stage1(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """Stage-1 box refinement: widths WITHOUT the +1 (reference
    ``mtcnn_detect_faces`` :526-531 — distinct from the shared ``bbreg``)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    return jnp.stack([
        boxes[:, 0] + reg[:, 0] * w,
        boxes[:, 1] + reg[:, 1] * h,
        boxes[:, 2] + reg[:, 2] * w,
        boxes[:, 3] + reg[:, 3] * h,
    ], axis=1)


def rerec(boxes: jnp.ndarray) -> jnp.ndarray:
    """Expand boxes to squares around their centers (reference ``rerec`` :467-476)."""
    h = boxes[:, 3] - boxes[:, 1]
    w = boxes[:, 2] - boxes[:, 0]
    l = jnp.maximum(w, h)
    x1 = boxes[:, 0] + w * 0.5 - l * 0.5
    y1 = boxes[:, 1] + h * 0.5 - l * 0.5
    return jnp.stack([x1, y1, x1 + l, y1 + l], axis=1)


def fix(x: jnp.ndarray) -> jnp.ndarray:
    """Truncate toward zero (np.fix semantics used on box coords)."""
    return jnp.trunc(x)


def generate_boxes(prob_map: jnp.ndarray, reg_map: jnp.ndarray, scale: float,
                   threshold: float, max_boxes: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """P-Net heatmap -> candidate boxes, statically shaped.

    prob_map/reg_map are in the *transposed-feed* orientation the cascade uses
    (first spatial axis = image x) — reference ``generateBoundingBox``
    :369-394 combined with the transposes at :508-512. Grid cell (i, j) with
    prob >= threshold maps to box
      x1 = fix((2i+1)/scale), y1 = fix((2j+1)/scale),
      x2 = fix((2i+12)/scale), y2 = fix((2j+12)/scale).

    Returns (boxes (K,4), scores (K,), reg (K,4), valid (K,)) where K =
    max_boxes, selected as the top-K scores (all above-threshold cells retained
    when they fit; lowest-score cells dropped otherwise).
    """
    gx, gy = prob_map.shape
    flat_scores = prob_map.reshape(-1)
    k = min(max_boxes, gx * gy)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    ii = (top_idx // gy).astype(jnp.float32)
    jj = (top_idx % gy).astype(jnp.float32)
    x1 = fix((STRIDE * ii + 1.0) / scale)
    y1 = fix((STRIDE * jj + 1.0) / scale)
    x2 = fix((STRIDE * ii + CELLSIZE) / scale)
    y2 = fix((STRIDE * jj + CELLSIZE) / scale)
    boxes = jnp.stack([x1, y1, x2, y2], axis=1)
    # reference quirk (facial_analysis.py:381-386): when exactly ONE cell
    # passes the threshold, the reg maps are flipud'd before the gather —
    # reproduced bug-for-bug for parity.
    n_above = jnp.sum(flat_scores >= threshold)
    reg_plain = reg_map.reshape(-1, 4)[top_idx]
    reg_flip = reg_map[::-1].reshape(-1, 4)[top_idx]
    reg = jnp.where(n_above == 1, reg_flip, reg_plain)
    valid = top_scores >= threshold
    if k < max_boxes:
        pad = max_boxes - k
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
        top_scores = jnp.concatenate([top_scores, jnp.zeros((pad,), top_scores.dtype)])
        reg = jnp.concatenate([reg, jnp.zeros((pad, 4), reg.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return boxes, top_scores, reg, valid


def select_top(boxes, scores, valid, extra, k: int):
    """Compact padded candidates: keep the top-k valid entries (by score).

    extra: pytree of (N, ...) arrays gathered alongside. Returns same structure
    with leading dim k."""
    masked = jnp.where(valid, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(masked, k)
    new_valid = jnp.isfinite(top_scores)
    gather = lambda a: a[idx]
    return (gather(boxes), jnp.where(new_valid, top_scores, 0.0), new_valid,
            jax.tree.map(gather, extra))
