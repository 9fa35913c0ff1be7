"""TPU-native MTCNN face-detection pipeline.

Reimplements the reference's three-stage cascade driver
(``facial_analysis.py:478-604`` ``mtcnn_detect_faces``) as a *single
jit-compiled XLA program* per image-shape bucket:

  - r3 per-fusion profile @640×480 batch 8: busy 0.90 ms/img with NO single
    hotspot — the top fusion is 11% (a P-Net conv at ~350 GB/s) and the rest
    is a long tail of small-channel convs (P-Net's 3→10→16→32 channels use
    ≤32 of the MXU's 128 lanes, inherently) across pyramid levels. The
    packed-canvas fix for the tail was a measured loser (r2, CLAUDE.md);
    wall time is within ~5% of busy, so there is no dispatch slack either.
  - the scale pyramid is static (levels derived from (H, W, minsize) at trace
    time); each level's INTER_AREA resize is two trace-time-weighted matmuls
    (ops/resize.py), fused with the (x-127.5)/128 normalization;
  - P-Net runs per level inside the same program; candidate extraction uses
    top-k + validity masks instead of dynamic ``np.where`` (SURVEY.md §7
    "hard parts": shape bucketing + masked NMS);
  - the sequential NMS loops run as ``lax.fori_loop`` over precomputed overlap
    matrices (ops/nms.py);
  - R-Net / O-Net stages crop with a gather-based supersampled-bilinear
    approximation of INTER_AREA, batched to fixed box counts.

Numerical conventions match the reference exactly where static shapes allow:
transposed-feed orientation (:508-511), 1-indexed box math (+1 widths),
``np.fix`` truncation, zero-padded out-of-image crops, thresholds
[0.6, 0.7, 0.9], pyramid factor 0.709, per-scale NMS 0.5 'Union', global 0.7
'Union', final 0.7 'Min'.

Host API: ``MTCNNDetector.detect(img)`` takes an RGB numpy image and returns
(boxes (n, 5) [x1, y1, x2, y2, score], landmarks (n, 10) [x0..x4, y0..y4]) in
pixel coordinates — the same contract as reference
``FacialImageProcessing.detect_faces`` (:210-223).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import mtcnn as nets
from ..ops import boxes as B
from ..ops.nms import nms_mask
from ..ops.resize import crop_resize_bilinear, resize_pyramid


def pyramid_scales(h: int, w: int, minsize: int, factor: float = 0.709) -> List[float]:
    """Static scale pyramid (reference :489-497)."""
    m = 12.0 / minsize
    minl = min(h, w) * m
    scales = []
    k = 0
    while minl >= 12:
        scales.append(m * (factor ** k))
        minl *= factor
        k += 1
    return scales


class MTCNNDetector:
    """Three-stage MTCNN with per-(H, W) jit cache.

    Args:
      params: {'pnet','rnet','onet'} pytrees (models/mtcnn.py import).
      minsize: minimum face size in pixels (reference ctor param :37).
      thresholds, factor: cascade constants (reference :481-483).
      max_stage1/2/3: static box-count caps (padding sizes) per stage.
      precision: matmul precision for the P/R/O-net forwards and the
        crop-resize einsums. Default HIGH (bf16_3x): measured drift vs
        HIGHEST on TPU is ~1e-6 on net probabilities (well inside the
        cascade's decision margins) for ~0.7 ms less per 640x480 image.
        Precision.DEFAULT (pure bf16) is the fast mode: 1.27 vs 1.66 ms
        @640x480, identical detections on the fixture, but crop pixels
        carry ~0.25-LSB noise so scores drift ~1e-3 — borderline
        detections near the 0.6/0.7/0.9 thresholds may flip.
        The pyramid resize always runs HIGHEST — its output is rounded to
        integer pixels to match cv2's uint8 resize bit-exactly, so rounding
        sits on .5 boundaries that bf16_3x error could flip.
    """

    def __init__(self, params, minsize: int = 40,
                 thresholds=(0.6, 0.7, 0.9), factor: float = 0.709,
                 max_level_boxes: int = 384, max_stage2: int = 128,
                 max_stage3: int = 64, supersample: int = 2,
                 precision=jax.lax.Precision.HIGH):
        self.params = params
        self.minsize = minsize
        self.thresholds = thresholds
        self.factor = factor
        self.max_level_boxes = max_level_boxes
        self.max_stage2 = max_stage2
        self.max_stage3 = max_stage3
        self.supersample = supersample
        self.precision = precision
        self._jitted: Dict[Tuple[int, int], object] = {}

    # ---------- stage 1 ----------

    def _stage1(self, img_f, h, w, scales):
        """All pyramid levels + per-level NMS + global NMS + refine.

        Also returns a scalar ``truncated`` flag: True whenever a static box
        budget (per-level top-k, global-NMS pool, stage-2 cap) dropped
        candidates that the reference's unbounded lists would have kept
        (``facial_analysis.py:478-604`` has no caps)."""
        th1 = self.thresholds[0]
        truncated = jnp.zeros((), bool)
        all_boxes, all_scores, all_regs, all_valid = [], [], [], []
        sizes = [(int(np.ceil(h * s)), int(np.ceil(w * s))) for s in scales]
        # one stacked row-matmul for every pyramid level (ops/resize.py):
        # the per-level skinny einsums were the cascade's single largest cost
        levels = resize_pyramid(img_f, sizes, "cv2_area")
        for scale, level in zip(scales, levels):
            # reference resizes the uint8 image (facial_analysis.py:505), so
            # level pixels are integer-rounded before normalization
            level = jnp.clip(jnp.round(level), 0.0, 255.0)
            level = (level - 127.5) * 0.0078125
            # transposed-feed convention: first spatial axis = image x
            level_t = jnp.transpose(level, (1, 0, 2))[None]
            reg_map, prob_map = nets.pnet(self.params["pnet"], level_t,
                                          precision=self.precision)
            kmax = min(self.max_level_boxes, prob_map.shape[1] * prob_map.shape[2])
            truncated |= jnp.sum(prob_map[0, :, :, 1] > th1) > kmax
            boxes, scores, regs, valid = B.generate_boxes(
                prob_map[0, :, :, 1], reg_map[0], scale, th1, kmax)
            keep = nms_mask(boxes, scores, valid, 0.5, "union")
            all_boxes.append(boxes)
            all_scores.append(scores)
            all_regs.append(regs)
            all_valid.append(valid & keep)
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        regs = jnp.concatenate(all_regs)
        valid = jnp.concatenate(all_valid)
        # bound the global-NMS candidate set: the overlap matrix is O(N^2) and
        # per-level NMS already thinned each level, so the top max_global
        # survivors by score lose nothing in practice.
        max_global = min(boxes.shape[0], 4 * self.max_stage2)
        truncated |= jnp.sum(valid) > max_global
        boxes, scores, valid, regs = B.select_top(boxes, scores, valid, regs,
                                                  max_global)
        keep = nms_mask(boxes, scores, valid, 0.7, "union")
        truncated |= jnp.sum(valid & keep) > self.max_stage2
        boxes, scores, valid, regs = B.select_top(boxes, scores, valid & keep, regs,
                                                  self.max_stage2)
        boxes = B.bbreg_stage1(boxes, regs)
        boxes = B.fix(B.rerec(boxes))
        return boxes, scores, valid, truncated

    # ---------- stages 2 & 3 ----------

    def _crop_batch(self, img_f, boxes, out_size):
        """1-indexed [x1,y1,x2,y2] -> zero-padded crops, transposed-feed."""
        # 0-indexed half-open crop rect: rows [y1-1, y2), cols [x1-1, x2)
        rect = jnp.stack([boxes[:, 1] - 1.0, boxes[:, 0] - 1.0,
                          boxes[:, 3], boxes[:, 2]], axis=1)
        crops = crop_resize_bilinear(img_f, rect, out_size,
                                     supersample=self.supersample, outside="zero",
                                     precision=self.precision)
        crops = (crops - 127.5) * 0.0078125
        return jnp.transpose(crops, (0, 2, 1, 3))  # swap spatial axes

    def _stage2(self, img_f, boxes, valid):
        th2 = self.thresholds[1]
        crops = self._crop_batch(img_f, boxes, 24)
        regs, probs = nets.rnet(self.params["rnet"], crops, precision=self.precision)
        scores = probs[:, 1]
        valid = valid & (scores > th2)
        keep = nms_mask(boxes, scores, valid, 0.7, "union")
        truncated = jnp.sum(valid & keep) > self.max_stage3
        boxes, scores, valid, regs = B.select_top(boxes, scores, valid & keep, regs,
                                                  self.max_stage3)
        boxes = B.bbreg(boxes, regs)
        boxes = B.fix(B.rerec(boxes))
        return boxes, scores, valid, truncated

    def _stage3(self, img_f, boxes, valid):
        th3 = self.thresholds[2]
        crops = self._crop_batch(img_f, boxes, 48)
        regs, lmks, probs = nets.onet(self.params["onet"], crops,
                                      precision=self.precision)
        scores = probs[:, 1]
        valid = valid & (scores > th3)
        w = boxes[:, 2] - boxes[:, 0] + 1.0
        h = boxes[:, 3] - boxes[:, 1] + 1.0
        points_x = w[:, None] * lmks[:, 0:5] + boxes[:, 0:1] - 1.0
        points_y = h[:, None] * lmks[:, 5:10] + boxes[:, 1:2] - 1.0
        points = jnp.concatenate([points_x, points_y], axis=1)
        boxes = B.bbreg(boxes, regs)
        keep = nms_mask(boxes, scores, valid, 0.7, "min")
        valid = valid & keep
        return boxes, scores, points, valid

    # ---------- full pipeline ----------

    def _pipeline_one(self, img, h: int, w: int, scales):
        """The full (un-jitted) cascade for one image. Returns
        (boxes, scores, points, valid, truncated)."""
        img_f = img.astype(jnp.float32)
        if not scales:
            z = jnp.zeros
            return (z((self.max_stage3, 4)), z((self.max_stage3,)),
                    z((self.max_stage3, 10)), jnp.zeros((self.max_stage3,), bool),
                    jnp.zeros((), bool))
        boxes, scores, valid, trunc1 = self._stage1(img_f, h, w, scales)
        boxes, scores, valid, trunc2 = self._stage2(img_f, boxes, valid)
        boxes, scores, points, valid = self._stage3(img_f, boxes, valid)
        return boxes, scores, points, valid, trunc1 | trunc2

    def _build(self, h: int, w: int):
        scales = pyramid_scales(h, w, self.minsize, self.factor)
        return jax.jit(lambda img: self._pipeline_one(img, h, w, scales))

    def detect_fn(self, h: int, w: int):
        """The jitted (boxes, scores, points, valid) pipeline for shape (h, w)."""
        key = (h, w)
        if key not in self._jitted:
            self._jitted[key] = self._build(h, w)
        return self._jitted[key]

    def detect_batch_fn(self, h: int, w: int):
        """vmapped cascade: (N, h, w, 3) -> per-image (boxes, scores, points,
        valid) stacked on a leading axis. One XLA program for the whole batch —
        the album-scan throughput path (the reference loops detect per photo,
        ``process_photos.py:238-261``)."""
        key = ("batch", h, w)
        if key not in self._jitted:
            scales = pyramid_scales(h, w, self.minsize, self.factor)
            self._jitted[key] = jax.jit(
                jax.vmap(lambda img: self._pipeline_one(img, h, w, scales)))
        return self._jitted[key]

    def detect_batch(self, images: np.ndarray):
        """(N, H, W, 3) uniform-size RGB -> list of (boxes (n_i, 5),
        landmarks (10, n_i)) per image."""
        n, h, w = images.shape[0], images.shape[1], images.shape[2]
        fn = self.detect_batch_fn(h, w)
        boxes, scores, points, valid, truncated = jax.device_get(
            fn(jnp.asarray(images)))
        self._warn_truncated(bool(truncated.any()))
        out = []
        for i in range(n):
            v = valid[i]
            out.append((np.concatenate([boxes[i][v], scores[i][v][:, None]], axis=1),
                        points[i][v].T))
        return out

    def _warn_truncated(self, truncated: bool) -> None:
        self.last_truncated = truncated
        if truncated:
            import warnings

            warnings.warn(
                "MTCNN box budget saturated: some candidates were dropped "
                f"(caps: level={self.max_level_boxes}, "
                f"stage2={self.max_stage2}, stage3={self.max_stage3}). The "
                "reference cascade is unbounded — construct MTCNNDetector "
                "with larger max_stage2/max_stage3 for crowd photos.",
                RuntimeWarning, stacklevel=3)

    def detect(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Host API: RGB (H, W, 3) image -> (boxes (n,5), landmarks (10, n)).

        Landmark layout matches the reference's ``points`` output
        (rows x0..x4, y0..y4; ``facial_analysis.py:595-597``). Sets
        ``self.last_truncated`` and warns when a box budget saturated."""
        h, w = img.shape[:2]
        fn = self.detect_fn(h, w)
        boxes, scores, points, valid, truncated = jax.device_get(
            fn(jnp.asarray(img)))
        self._warn_truncated(bool(truncated))
        v = valid
        b = boxes[v]
        s = scores[v]
        p = points[v]
        out = np.concatenate([b, s[:, None]], axis=1)
        return out, p.T

    @classmethod
    def from_pb(cls, pb_path: str, **kwargs) -> "MTCNNDetector":
        return cls(nets.import_mtcnn_params(pb_path), **kwargs)
