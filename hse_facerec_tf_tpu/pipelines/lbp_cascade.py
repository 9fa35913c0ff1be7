"""Native LBP cascade face detector (reads OpenCV cascade XML).

The reference's fallback detector is ``cv2.CascadeClassifier`` over
``lbpcascade_frontalface.xml`` (``facial_analysis.py:63,210-223``). OpenCV 5
removed the legacy cascade API, so this is a from-scratch evaluator of the
same XML format: boosted stages of multi-block LBP features computed from an
integral image, evaluated *vectorized over all candidate windows per stage*
(the early-exit cascade becomes a shrinking alive-mask), with multi-scale
sliding windows and min-neighbors rectangle grouping.

Semantics follow the OpenCV LBP evaluator: 3×3 cell grid per feature, 8
neighbor-vs-center comparisons packed clockwise from top-left
(TL=128 … L=1), 256-bit subset lookup choosing between two leaf values,
stage sum compared to the stage threshold.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

REFERENCE_CASCADE = "/root/reference/age_gender_identity/lbpcascade_frontalface.xml"


@dataclass
class _Stage:
    threshold: float
    feat_idx: np.ndarray      # (W,) int
    subsets: np.ndarray       # (W, 8) int32 bitmasks (256 bits)
    leaves: np.ndarray        # (W, 2) float


class LBPCascade:
    def __init__(self, xml_path: Optional[str] = None):
        xml_path = xml_path or REFERENCE_CASCADE
        root = ET.parse(xml_path).getroot()
        c = root.find("cascade")
        self.win_h = int(c.findtext("height"))
        self.win_w = int(c.findtext("width"))
        assert c.findtext("featureType").strip() == "LBP", "LBP cascades only"

        rects = []
        for f in c.find("features"):
            vals = [int(v) for v in f.findtext("rect").split()]
            rects.append(vals)  # x, y, cell_w, cell_h
        self.rects = np.asarray(rects, dtype=np.int64)

        self.stages: List[_Stage] = []
        for s in c.find("stages"):
            threshold = float(s.findtext("stageThreshold"))
            fidx, subsets, leaves = [], [], []
            for wc in s.find("weakClassifiers"):
                internal = wc.findtext("internalNodes").split()
                # [0, -1, featureIdx, subset x8]
                fidx.append(int(internal[2]))
                subsets.append([int(v) for v in internal[3:11]])
                leaves.append([float(v) for v in wc.findtext("leafValues").split()])
            self.stages.append(_Stage(
                threshold, np.asarray(fidx),
                np.asarray(subsets, dtype=np.int64), np.asarray(leaves)))

    # ------------------------------------------------------------------

    def _eval_windows(self, integral: np.ndarray, xs: np.ndarray, ys: np.ndarray
                      ) -> np.ndarray:
        """Evaluate the cascade at window top-lefts (xs, ys). Returns a bool
        mask of windows passing all stages. Vectorized per stage over the
        currently-alive windows."""
        alive = np.ones(len(xs), dtype=bool)

        def cell_sum(x0, y0, w, h):
            return (integral[y0 + h, x0 + w] - integral[y0, x0 + w]
                    - integral[y0 + h, x0] + integral[y0, x0])

        for stage in self.stages:
            if not alive.any():
                break
            ax = xs[alive]
            ay = ys[alive]
            total = np.zeros(len(ax))
            for fi, subset, leaf in zip(stage.feat_idx, stage.subsets, stage.leaves):
                rx, ry, cw, ch = self.rects[fi]
                x0 = ax + rx
                y0 = ay + ry
                # 3×3 grid of cells; cells[r][c] sums
                cells = [[cell_sum(x0 + c * cw, y0 + r * ch, cw, ch)
                          for c in range(3)] for r in range(3)]
                center = cells[1][1]
                code = ((cells[0][0] >= center).astype(np.int64) << 7
                        | (cells[0][1] >= center) << 6
                        | (cells[0][2] >= center) << 5
                        | (cells[1][2] >= center) << 4
                        | (cells[2][2] >= center) << 3
                        | (cells[2][1] >= center) << 2
                        | (cells[2][0] >= center) << 1
                        | (cells[1][0] >= center) << 0)
                bit = (subset[code >> 5] >> (code & 31)) & 1
                total += np.where(bit == 1, leaf[0], leaf[1])
            passed = total >= stage.threshold
            idx = np.where(alive)[0]
            alive[idx[~passed]] = False
        return alive

    def detect(self, img_rgb: np.ndarray, scale_factor: float = 1.1,
               min_neighbors: int = 3, min_size: int = 40,
               step: int = 2) -> np.ndarray:
        """(H, W, 3) RGB -> (n, 5) [x1, y1, x2, y2, score] face boxes."""
        gray = np.asarray(img_rgb, dtype=np.float64) @ np.array([0.299, 0.587, 0.114])
        H, W = gray.shape
        candidates: List[Tuple[int, int, int, int]] = []
        scale = max(1.0, min_size / self.win_w)
        while self.win_w * scale <= W and self.win_h * scale <= H:
            inv = 1.0 / scale
            sw, sh = int(W * inv), int(H * inv)
            # area-downscale via ops.resize semantics (host numpy version)
            ys_idx = (np.arange(sh + 1) * scale).astype(np.int64).clip(0, H)
            xs_idx = (np.arange(sw + 1) * scale).astype(np.int64).clip(0, W)
            small = _area_downscale(gray, sh, sw)
            integral = np.zeros((sh + 1, sw + 1))
            integral[1:, 1:] = small.cumsum(0).cumsum(1)

            gx = np.arange(0, sw - self.win_w + 1, step)
            gy = np.arange(0, sh - self.win_h + 1, step)
            if len(gx) == 0 or len(gy) == 0:
                break
            xs, ys = np.meshgrid(gx, gy)
            xs, ys = xs.ravel(), ys.ravel()
            keep = self._eval_windows(integral, xs, ys)
            for x, y in zip(xs[keep], ys[keep]):
                candidates.append((int(x * scale), int(y * scale),
                                   int((x + self.win_w) * scale),
                                   int((y + self.win_h) * scale)))
            scale *= scale_factor

        return _group_rectangles(candidates, min_neighbors)


def _area_downscale(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Quick area-average downscale (host numpy)."""
    H, W = img.shape
    yi = (np.linspace(0, H, oh + 1)).astype(np.int64)
    xi = (np.linspace(0, W, ow + 1)).astype(np.int64)
    integ = np.zeros((H + 1, W + 1))
    integ[1:, 1:] = img.cumsum(0).cumsum(1)
    ys0, ys1 = yi[:-1], yi[1:]
    xs0, xs1 = xi[:-1], xi[1:]
    sums = (integ[np.ix_(ys1, xs1)] - integ[np.ix_(ys0, xs1)]
            - integ[np.ix_(ys1, xs0)] + integ[np.ix_(ys0, xs0)])
    areas = np.maximum((ys1 - ys0)[:, None] * (xs1 - xs0)[None, :], 1)
    return sums / areas


def _group_rectangles(rects: List[Tuple[int, int, int, int]],
                      min_neighbors: int) -> np.ndarray:
    """cv2.groupRectangles-style clustering: union similar rects, average each
    group, keep groups with > min_neighbors members."""
    n = len(rects)
    if n == 0:
        return np.zeros((0, 5))
    r = np.asarray(rects, dtype=np.float64)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    w = r[:, 2] - r[:, 0]
    eps = 0.2
    for i in range(n):
        for j in range(i + 1, n):
            delta = eps * (min(w[i], w[j]))
            if (abs(r[i, 0] - r[j, 0]) <= delta and abs(r[i, 1] - r[j, 1]) <= delta
                    and abs(r[i, 2] - r[j, 2]) <= delta
                    and abs(r[i, 3] - r[j, 3]) <= delta):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    groups = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    out = []
    for members in groups.values():
        if len(members) <= min_neighbors:
            continue
        avg = r[members].mean(axis=0)
        out.append([*avg, float(len(members))])
    return np.asarray(out) if out else np.zeros((0, 5))
