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
      crop_backend: "auto" | "pallas" | "einsum" — stage-2/3 crop+resize
        implementation. "auto" picks the fused Pallas kernel
        (``ops/pallas/crop.py``, 2.2x the einsum form; see
        ``_use_pallas_crop``) on TPU below HIGHEST precision, the
        hat-weight einsums otherwise (CPU, exact-parity mode).
      max_escalations: how many cap-doubling retries ``detect``/
        ``detect_batch`` may take when the ``truncated`` flag reports that
        a static budget dropped candidates (crowd photos). Each tier is a
        separate compiled program (cached persistently, so the compile cost
        is paid once per shape+tier ever); 0 disables escalation and
        restores warn-only behavior. ``FacialAnalyzer.analyze`` escalates
        its fused programs through the same tiers.
    """

    def __init__(self, params, minsize: int = 40,
                 thresholds=(0.6, 0.7, 0.9), factor: float = 0.709,
                 max_level_boxes: int = 384, max_stage2: int = 128,
                 max_stage3: int = 64, supersample: int = 2,
                 precision=jax.lax.Precision.HIGH,
                 max_escalations: int = 2, crop_backend: str = "auto"):
        self.params = params
        self.minsize = minsize
        self.thresholds = thresholds
        self.factor = factor
        self.max_level_boxes = max_level_boxes
        self.max_stage2 = max_stage2
        self.max_stage3 = max_stage3
        self.supersample = supersample
        self.precision = precision
        self.max_escalations = max_escalations
        self.crop_backend = crop_backend
        self._jitted: Dict[Tuple[int, int], object] = {}

    def caps_for(self, h: int, w: int, tier: int = 0) -> Tuple[int, int, int]:
        """Effective (max_level_boxes, max_stage2, max_stage3) for an
        (h, w) image: candidate counts grow with image area, so the static
        budgets scale by area relative to the 640x480 the defaults were
        sized for (the 784x588 reference fixture alone has 149 stage-1
        survivors vs the base stage-2 cap of 128). Each (h, w) compiles its
        own program anyway, so per-shape budgets add no shape buckets; at
        or below VGA with tier 0 the ctor values are returned unchanged.

        ``tier`` doubles every budget per step: area scaling cannot
        anticipate crowd DENSITY (a 10x9 face grid at 800x720 has 137
        stage-2 NMS survivors vs the area-scaled cap of 128), so
        ``detect``/``detect_batch`` escalate tiers until the ``truncated``
        flag clears (bounded by ``max_escalations``). The area part is
        clamped at 16x (~4K), and each budget is further clamped at an
        absolute ceiling (level 8192 / stage2 2048 / stage3 1024 — the
        global-NMS pool is 4x stage2, so its O(N^2) overlap matrix stays
        <=256 MB f32 even at the top tier; without the ceiling, tier 2 on
        a 4K image would materialize a 32768^2 = 4.3 GB matrix inside one
        program). The ceilings are ~8x the densest published group photos;
        if a tier's caps equal the previous tier's (all at ceiling),
        escalation stops early and the ``truncated`` warning fires."""
        scale = min(16.0, max(1.0, (h * w) / (640.0 * 480.0))) * (2.0 ** tier)
        if scale == 1.0:
            return self.max_level_boxes, self.max_stage2, self.max_stage3
        # explicit ctor values above a ceiling are respected (never reduced)
        up = lambda v, ceil: min(max(ceil, v), int(np.ceil(v * scale / 32.0) * 32))
        return (up(self.max_level_boxes, 8192), up(self.max_stage2, 2048),
                up(self.max_stage3, 1024))

    # ---------- stage 1 ----------

    def _stage1(self, img_f, h, w, scales, max_level, max_s2,
                im2col_min_px: int = nets.PNET_IM2COL_MIN_PIXELS):
        """All pyramid levels + per-level NMS + global NMS + refine.

        Also returns a scalar ``truncated`` flag: True whenever a static box
        budget (per-level top-k, global-NMS pool, stage-2 cap) dropped
        candidates that the reference's unbounded lists would have kept
        (``facial_analysis.py:478-604`` has no caps). ``max_level``/
        ``max_s2`` are the per-shape budgets from ``caps_for``."""
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
            # big levels run the im2col P-Net form (3→27 input lanes on the
            # MXU; r4 measured +20% at 144×192, a loss below ~20k px)
            lvl_px = level_t.shape[1] * level_t.shape[2]
            reg_map, prob_map = nets.pnet(
                self.params["pnet"], level_t, precision=self.precision,
                im2col=lvl_px >= im2col_min_px)
            kmax = min(max_level, prob_map.shape[1] * prob_map.shape[2])
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
        max_global = min(boxes.shape[0], 4 * max_s2)
        truncated |= jnp.sum(valid) > max_global
        boxes, scores, valid, regs = B.select_top(boxes, scores, valid, regs,
                                                  max_global)
        keep = nms_mask(boxes, scores, valid, 0.7, "union")
        truncated |= jnp.sum(valid & keep) > max_s2
        boxes, scores, valid, regs = B.select_top(boxes, scores, valid & keep, regs,
                                                  max_s2)
        boxes = B.bbreg_stage1(boxes, regs)
        boxes = B.fix(B.rerec(boxes))
        return boxes, scores, valid, truncated

    # ---------- stages 2 & 3 ----------

    def _use_pallas_crop(self, n_boxes: int) -> bool:
        """Trace-time choice between the fused Pallas crop kernel and the
        two-einsum form for stage-2/3 crops. The einsum form materializes
        its (K, out, W, C) row-pass intermediate in HBM — 24% of batch-8
        detect device-busy at 341 GB/s (r5 fusion profile) — while the
        kernel keeps the chain VMEM-resident: 1.13 vs 2.52 ms per batch-8
        cascade crop pass (r5 microbench), drift vs the einsum ~4e-5
        relative (Mosaic f32 multi-pass dots), so HIGHEST (exact-parity
        mode) keeps the einsums."""
        if self.crop_backend == "pallas":
            return True
        if self.crop_backend == "einsum":
            return False
        from ..ops.pallas import crop as pallas_crop
        return (jax.default_backend() == "tpu"
                and self.precision != jax.lax.Precision.HIGHEST
                and n_boxes % pallas_crop.CHUNK == 0)

    def _crop_batch(self, img_f, boxes, out_size):
        """1-indexed [x1,y1,x2,y2] -> zero-padded crops, transposed-feed."""
        # 0-indexed half-open crop rect: rows [y1-1, y2), cols [x1-1, x2)
        rect = jnp.stack([boxes[:, 1] - 1.0, boxes[:, 0] - 1.0,
                          boxes[:, 3], boxes[:, 2]], axis=1)
        if self._use_pallas_crop(boxes.shape[0]):
            from ..ops.pallas.crop import crop_resize_zero_pallas
            crops = crop_resize_zero_pallas(img_f, rect, out_size,
                                            self.supersample)
        else:
            crops = crop_resize_bilinear(img_f, rect, out_size,
                                         supersample=self.supersample,
                                         outside="zero",
                                         precision=self.precision)
        crops = (crops - 127.5) * 0.0078125
        return jnp.transpose(crops, (0, 2, 1, 3))  # swap spatial axes

    def _stage2(self, img_f, boxes, valid, max_s3):
        th2 = self.thresholds[1]
        crops = self._crop_batch(img_f, boxes, 24)
        regs, probs = nets.rnet(self.params["rnet"], crops, precision=self.precision)
        scores = probs[:, 1]
        valid = valid & (scores > th2)
        keep = nms_mask(boxes, scores, valid, 0.7, "union")
        truncated = jnp.sum(valid & keep) > max_s3
        boxes, scores, valid, regs = B.select_top(boxes, scores, valid & keep, regs,
                                                  max_s3)
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

    def _pipeline_one(self, img, h: int, w: int, scales, tier: int = 0,
                      batched: bool = False):
        """The full (un-jitted) cascade for one image. Returns
        (boxes, scores, points, valid, truncated). ``batched``: built for
        the vmapped batch program — P-Net's im2col cutoff drops to
        ``PNET_IM2COL_MIN_PIXELS_BATCHED`` (the batch amortizes the slice
        concat; see that constant's measurement note)."""
        img_f = img.astype(jnp.float32)
        max_level, max_s2, max_s3 = self.caps_for(h, w, tier)
        if not scales:
            z = jnp.zeros
            return (z((max_s3, 4)), z((max_s3,)),
                    z((max_s3, 10)), jnp.zeros((max_s3,), bool),
                    jnp.zeros((), bool))
        im2col_px = (nets.PNET_IM2COL_MIN_PIXELS_BATCHED if batched
                     else nets.PNET_IM2COL_MIN_PIXELS)
        boxes, scores, valid, trunc1 = self._stage1(img_f, h, w, scales,
                                                    max_level, max_s2,
                                                    im2col_px)
        boxes, scores, valid, trunc2 = self._stage2(img_f, boxes, valid, max_s3)
        boxes, scores, points, valid = self._stage3(img_f, boxes, valid)
        return boxes, scores, points, valid, trunc1 | trunc2

    def _build(self, h: int, w: int, tier: int = 0):
        return jax.jit(self.detect_core(h, w, tier))

    def detect_core(self, h: int, w: int, tier: int = 0,
                    batched: bool = False):
        """UNJITTED single-image cascade for shape (h, w) — the building
        block callers vmap into batch programs (analyzer batch paths,
        ``detect_batch_fn``). Pass ``batched=True`` when the result runs
        under vmap so batch-tuned trace-time choices (the P-Net im2col
        cutoff) apply."""
        scales = pyramid_scales(h, w, self.minsize, self.factor)
        return lambda img: self._pipeline_one(img, h, w, scales, tier,
                                              batched=batched)

    def detect_fn(self, h: int, w: int, tier: int = 0):
        """The jitted (boxes, scores, points, valid) pipeline for shape (h, w)."""
        key = (h, w, tier)
        if key not in self._jitted:
            self._jitted[key] = self._build(h, w, tier)
        return self._jitted[key]

    def detect_batch_fn(self, h: int, w: int, tier: int = 0):
        """vmapped cascade: (N, h, w, 3) -> per-image (boxes, scores, points,
        valid) stacked on a leading axis. One XLA program for the whole batch —
        the album-scan throughput path (the reference loops detect per photo,
        ``process_photos.py:238-261``)."""
        key = ("batch", h, w, tier)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                jax.vmap(self.detect_core(h, w, tier, batched=True)))
        return self._jitted[key]

    def detect_batch(self, images: np.ndarray):
        """(N, H, W, 3) uniform-size RGB -> list of (boxes (n_i, 5),
        landmarks (10, n_i)) per image. Escalates cap tiers on truncation
        like ``detect`` (the whole batch re-runs at the higher tier)."""
        n, h, w = images.shape[0], images.shape[1], images.shape[2]
        dev = jnp.asarray(images)
        for tier in range(self.max_escalations + 1):
            fn = self.detect_batch_fn(h, w, tier)
            boxes, scores, points, valid, truncated = jax.device_get(fn(dev))
            if (not truncated.any() or tier == self.max_escalations
                    or self.caps_for(h, w, tier + 1) == self.caps_for(h, w, tier)):
                break
        self._warn_truncated(bool(truncated.any()), self.caps_for(h, w, tier))
        out = []
        for i in range(n):
            v = valid[i]
            out.append((np.concatenate([boxes[i][v], scores[i][v][:, None]], axis=1),
                        points[i][v].T))
        return out

    def _warn_truncated(self, truncated: bool, caps=None) -> None:
        self.last_truncated = truncated
        if truncated:
            import warnings

            lvl, s2, s3 = caps or (self.max_level_boxes, self.max_stage2,
                                   self.max_stage3)
            warnings.warn(
                "MTCNN box budget saturated: some candidates were dropped "
                f"(effective caps: level={lvl}, "
                f"stage2={s2}, stage3={s3}). The "
                "reference cascade is unbounded — raise max_escalations "
                "(detect/detect_batch) or max_stage2/max_stage3 for crowd "
                "photos.",
                RuntimeWarning, stacklevel=3)

    def detect(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Host API: RGB (H, W, 3) image -> (boxes (n,5), landmarks (10, n)).

        Landmark layout matches the reference's ``points`` output
        (rows x0..x4, y0..y4; ``facial_analysis.py:595-597``). When a static
        box budget saturates (dense crowds), retries at doubled-cap tiers —
        matching the reference's unbounded cascade — up to
        ``max_escalations``; sets ``self.last_truncated`` and warns only if
        the top tier still truncates."""
        h, w = img.shape[:2]
        dev = jnp.asarray(img)
        for tier in range(self.max_escalations + 1):
            fn = self.detect_fn(h, w, tier)
            boxes, scores, points, valid, truncated = jax.device_get(fn(dev))
            if (not truncated or tier == self.max_escalations
                    or self.caps_for(h, w, tier + 1) == self.caps_for(h, w, tier)):
                break
        self._warn_truncated(bool(truncated), self.caps_for(h, w, tier))
        v = valid
        b = boxes[v]
        s = scores[v]
        p = points[v]
        out = np.concatenate([b, s[:, None]], axis=1)
        return out, p.T

    @classmethod
    def from_pb(cls, pb_path: str, **kwargs) -> "MTCNNDetector":
        return cls(nets.import_mtcnn_params(pb_path), **kwargs)
