"""Masked greedy non-maximum suppression for static-shape TPU pipelines.

Reproduces the reference MTCNN NMS semantics (``facial_analysis.py:397-428``:
greedy by descending score; overlap = inter/union ('Union') or
inter/min-area ('Min'); +1 box widths) under XLA's static-shape constraints:
boxes are padded to a fixed N with a validity mask, and the sequential
suppression loop is a ``lax.fori_loop`` over a precomputed pairwise overlap
matrix. Returns a keep-mask rather than dynamically-sized indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_overlap(boxes: jnp.ndarray, method: str = "union") -> jnp.ndarray:
    """(N, 4) [x1, y1, x2, y2] -> (N, N) overlap ratios (+1 widths, as in the
    reference's MATLAB-lineage numerics)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    if method == "min":
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(denom, 1e-10)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             threshold: float, method: str = "union") -> jnp.ndarray:
    """Greedy NMS over padded boxes.

    boxes:  (N, 4) [x1, y1, x2, y2]
    scores: (N,)
    valid:  (N,) bool — padding mask
    Returns keep: (N,) bool (subset of valid).

    Matches the reference's greedy order exactly: repeatedly take the highest
    scoring not-yet-suppressed box, keep it, suppress boxes with overlap >
    threshold.
    """
    n = boxes.shape[0]
    overlap = pairwise_overlap(boxes, method)
    neg_inf = jnp.float32(-jnp.inf)
    scores0 = jnp.where(valid, scores, neg_inf)

    # Early-exit while_loop: real candidate counts are far below the padded N
    # (most padded entries are invalid), so iterating only while any box is
    # alive is the difference between ~30 and ~5000 sequential steps.
    def cond(state):
        _, alive_scores, it = state
        return (it < n) & jnp.any(alive_scores > neg_inf)

    def body(state):
        keep, alive_scores, it = state
        i = jnp.argmax(alive_scores)
        keep = keep.at[i].set(True)
        # suppress i itself and all overlaps > threshold with i
        suppress = (overlap[i] > threshold) | (jnp.arange(n) == i)
        alive_scores = jnp.where(suppress, neg_inf, alive_scores)
        return keep, alive_scores, it + 1

    keep0 = jnp.zeros((n,), dtype=bool)
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, scores0, jnp.int32(0)))
    return keep


def nms_numpy(boxes, scores, threshold: float, method: str = "union"):
    """Host-side exact NMS (same semantics, dynamic shapes) for tests and the
    CPU reference pipeline. Returns kept indices in pick order."""
    import numpy as np

    if len(boxes) == 0:
        return np.zeros((0,), dtype=np.int64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(scores)
    pick = []
    while order.size > 0:
        i = order[-1]
        pick.append(i)
        rest = order[:-1]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        if method == "min":
            o = inter / np.minimum(area[i], area[rest])
        else:
            o = inter / (area[i] + area[rest] - inter)
        order = rest[o <= threshold]
    return np.asarray(pick, dtype=np.int64)
