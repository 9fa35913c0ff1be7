"""Host-side golden MTCNN: faithful dynamic-shape re-expression of the
reference cascade driver (``facial_analysis.py:478-604``) using cv2 resizes and
the native JAX nets for conv evaluation. Used to validate the static-shape TPU
pipeline end to end.

Sharing the net forwards with the code under test is safe because the net
numerics are pinned separately against the independent numpy-float64 golden
executor on the shipped mtcnn.pb
(test_models.py::test_mtcnn_nets_vs_independent_float64_executor); this module
only has to be an independent reimplementation of the DRIVER logic (pyramid,
NMS, box algebra, crops)."""

from __future__ import annotations

import cv2
import jax
import numpy as np

from hse_facerec_tf_tpu.models import mtcnn as nets
from hse_facerec_tf_tpu.ops.nms import nms_numpy


def _bbreg(bb, reg):
    w = bb[:, 2] - bb[:, 0] + 1
    h = bb[:, 3] - bb[:, 1] + 1
    out = bb.copy()
    out[:, 0] = bb[:, 0] + reg[:, 0] * w
    out[:, 1] = bb[:, 1] + reg[:, 1] * h
    out[:, 2] = bb[:, 2] + reg[:, 2] * w
    out[:, 3] = bb[:, 3] + reg[:, 3] * h
    return out


def _rerec(bb):
    h = bb[:, 3] - bb[:, 1]
    w = bb[:, 2] - bb[:, 0]
    l = np.maximum(w, h)
    out = bb.copy()
    out[:, 0] = bb[:, 0] + w * 0.5 - l * 0.5
    out[:, 1] = bb[:, 1] + h * 0.5 - l * 0.5
    out[:, 2] = out[:, 0] + l
    out[:, 3] = out[:, 1] + l
    return out


def _generate_bb(imap, reg, scale, t):
    stride, cell = 2, 12
    y, x = np.where(imap >= t)   # imap oriented (x_dim, y_dim) via transposed feed
    score = imap[(y, x)]
    if y.shape[0] == 1:
        # reference flipud quirk for single-candidate levels (:381-386)
        reg = reg[::-1]
    reg_sel = reg[(y, x)]
    bb = np.stack([y, x], axis=1).astype(np.float32)
    q1 = np.fix((stride * bb + 1) / scale)
    q2 = np.fix((stride * bb + cell) / scale)
    return np.hstack([q1, q2, score[:, None], reg_sel])


def _pad_crop(img, box, out_size):
    """Zero-padded crop per reference pad()/crop loop, then INTER_AREA resize."""
    h, w = img.shape[:2]
    x1, y1, x2, y2 = [int(v) for v in box[:4]]
    tmpw = x2 - x1 + 1
    tmph = y2 - y1 + 1
    tmp = np.zeros((tmph, tmpw, 3), dtype=np.float64)
    sx1, sy1 = max(x1, 1), max(y1, 1)
    sx2, sy2 = min(x2, w), min(y2, h)
    if sx2 >= sx1 and sy2 >= sy1:
        tmp[sy1 - y1:sy2 - y1 + 1, sx1 - x1:sx2 - x1 + 1] = \
            img[sy1 - 1:sy2, sx1 - 1:sx2]
    return cv2.resize(tmp, (out_size, out_size), interpolation=cv2.INTER_AREA)


def detect_golden(params, img: np.ndarray, minsize: int = 40,
                  thresholds=(0.6, 0.7, 0.9), factor: float = 0.709):
    """Returns (boxes (n,5), points (10,n)) — reference contract."""
    pnet = jax.jit(nets.pnet)
    rnet = jax.jit(nets.rnet)
    onet = jax.jit(nets.onet)

    h, w = img.shape[:2]
    m = 12.0 / minsize
    minl = min(h, w) * m
    scales = []
    k = 0
    while minl >= 12:
        scales.append(m * factor ** k)
        minl *= factor
        k += 1

    total = np.empty((0, 9))
    for scale in scales:
        hs, ws = int(np.ceil(h * scale)), int(np.ceil(w * scale))
        # resize the uint8 image exactly as the reference does (:505)
        level = cv2.resize(img.astype(np.uint8), (ws, hs),
                           interpolation=cv2.INTER_AREA).astype(np.float64)
        level = (level - 127.5) * 0.0078125
        level_t = np.transpose(level, (1, 0, 2))[None].astype(np.float32)
        reg, prob = pnet(params["pnet"], level_t)
        boxes = _generate_bb(np.asarray(prob)[0, :, :, 1], np.asarray(reg)[0], scale,
                             thresholds[0])
        if len(boxes):
            pick = nms_numpy(boxes[:, :4], boxes[:, 4], 0.5, "union")
            if len(pick):
                total = np.vstack([total, boxes[pick]])

    if len(total) == 0:
        return np.zeros((0, 5)), np.zeros((10, 0))
    pick = nms_numpy(total[:, :4], total[:, 4], 0.7, "union")
    total = total[pick]
    # stage-1 refinement uses widths WITHOUT +1 (facial_analysis.py:526-531)
    regw = total[:, 2] - total[:, 0]
    regh = total[:, 3] - total[:, 1]
    refined = np.stack([total[:, 0] + total[:, 5] * regw,
                        total[:, 1] + total[:, 6] * regh,
                        total[:, 2] + total[:, 7] * regw,
                        total[:, 3] + total[:, 8] * regh,
                        total[:, 4]], axis=1)
    total = refined
    total[:, :4] = np.fix(_rerec(total[:, :4].copy()))

    # stage 2
    crops = np.stack([_pad_crop(img.astype(np.float64), b, 24) for b in total])
    crops = ((crops - 127.5) * 0.0078125).transpose(0, 2, 1, 3).astype(np.float32)
    reg, prob = rnet(params["rnet"], crops)
    reg, prob = np.asarray(reg), np.asarray(prob)
    scores = prob[:, 1]
    ipass = scores > thresholds[1]
    total = np.hstack([total[ipass, :4], scores[ipass, None]])
    reg = reg[ipass]
    if len(total) == 0:
        return np.zeros((0, 5)), np.zeros((10, 0))
    pick = nms_numpy(total[:, :4], total[:, 4], 0.7, "union")
    total = total[pick]
    total[:, :4] = _bbreg(total[:, :4].copy(), reg[pick])
    total[:, :4] = np.fix(_rerec(total[:, :4].copy()))

    # stage 3
    crops = np.stack([_pad_crop(img.astype(np.float64), b, 48) for b in total])
    crops = ((crops - 127.5) * 0.0078125).transpose(0, 2, 1, 3).astype(np.float32)
    reg, lmk, prob = onet(params["onet"], crops)
    reg, lmk, prob = np.asarray(reg), np.asarray(lmk), np.asarray(prob)
    scores = prob[:, 1]
    ipass = scores > thresholds[2]
    total = np.hstack([total[ipass, :4], scores[ipass, None]])
    reg, lmk = reg[ipass], lmk[ipass]
    if len(total) == 0:
        return np.zeros((0, 5)), np.zeros((10, 0))
    bw = total[:, 2] - total[:, 0] + 1
    bh = total[:, 3] - total[:, 1] + 1
    points = np.zeros((len(total), 10))
    points[:, 0:5] = bw[:, None] * lmk[:, 0:5] + total[:, 0:1] - 1
    points[:, 5:10] = bh[:, None] * lmk[:, 5:10] + total[:, 1:2] - 1
    total[:, :4] = _bbreg(total[:, :4].copy(), reg)
    pick = nms_numpy(total[:, :4], total[:, 4], 0.7, "min")
    return total[pick], points[pick].T
