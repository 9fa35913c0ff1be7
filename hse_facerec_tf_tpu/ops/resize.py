"""TPU-native image resize kernels with cv2/PIL-compatible semantics.

The reference depends on three distinct resize semantics (SURVEY.md §2.4, §7):
  - ``cv2.resize(..., INTER_AREA)``  — MTCNN pyramid & stage crops
    (reference ``facial_analysis.py:505,547,577``)
  - ``cv2.resize(...)`` INTER_LINEAR — age/gender face crops
    (``facial_analysis.py:95,144,175``; ``process_photos.py:38``)
  - ``scipy.misc.imresize(..., 'bilinear')`` (PIL triangle filter) —
    embedding preprocessing (``facerec_test.py:84,93``)

Design: for static output shapes, each 1-D resampling is a sparse
source→target weight matrix computed at trace time in NumPy and applied as a
dense matmul (separable: rows then cols). On TPU this runs on the MXU and
fuses with surrounding normalize ops — no gather in the hot path. The weight
matrices are tiny ((H_out, H_in)) and constant-folded by XLA.

All functions accept (..., H, W, C) arrays and are batch-polymorphic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_weights_cv2(src: int, dst: int) -> np.ndarray:
    """cv2.INTER_LINEAR 1-D weights: half-pixel centers, edge clamp."""
    w = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    for i in range(dst):
        f = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(f))
        a = f - i0
        i0c = min(max(i0, 0), src - 1)
        i1c = min(max(i0 + 1, 0), src - 1)
        w[i, i0c] += 1.0 - a
        w[i, i1c] += a
    return w


@functools.lru_cache(maxsize=256)
def _area_weights_cv2(src: int, dst: int) -> np.ndarray:
    """cv2.INTER_AREA 1-D weights: pixel-area overlap averaging.

    Each target cell i covers source interval [i*s, (i+1)*s), s = src/dst;
    source pixels contribute proportionally to their overlap. For upscale
    (s < 1) this degenerates to nearest — same as cv2's area path."""
    w = np.zeros((dst, src), dtype=np.float32)
    s = src / dst
    for i in range(dst):
        lo = i * s
        hi = (i + 1) * s
        j0 = int(np.floor(lo))
        j1 = min(int(np.ceil(hi)), src)
        for j in range(j0, j1):
            overlap = min(hi, j + 1) - max(lo, j)
            if overlap > 0:
                w[i, j] = overlap / s
    return w


@functools.lru_cache(maxsize=256)
def _triangle_weights_pil(src: int, dst: int) -> np.ndarray:
    """PIL (Pillow ≥2.7) BILINEAR 1-D weights: triangle filter with support
    scaled by the downscale factor, weights normalized. Matches
    ``scipy.misc.imresize(interp='bilinear')`` which wraps PIL."""
    w = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale
    for i in range(dst):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), src)
        xs = np.arange(xmin, xmax)
        dist = (xs + 0.5 - center) / filterscale
        k = np.clip(1.0 - np.abs(dist), 0.0, None)
        tot = k.sum()
        if tot > 0:
            w[i, xmin:xmax] = k / tot
    return w


@functools.lru_cache(maxsize=256)
def _cubic_weights_cv2(src: int, dst: int) -> np.ndarray:
    """cv2.INTER_CUBIC 1-D weights: 4-tap cubic convolution (a = -0.75),
    half-pixel centers, edge clamp. Used by the reference's InsightFace
    letterbox resize (``age_gender_identity/insightface.py:89``)."""
    a = -0.75

    def k(x):
        x = abs(x)
        if x <= 1.0:
            return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
        if x < 2.0:
            return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
        return 0.0

    w = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    for i in range(dst):
        f = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(f))
        for j in range(i0 - 1, i0 + 3):
            jc = min(max(j, 0), src - 1)
            w[i, jc] += k(f - j)
    return w


@functools.lru_cache(maxsize=256)
def _nearest_weights_pil(src: int, dst: int) -> np.ndarray:
    """PIL NEAREST 1-D selection matrix: source index = floor((i+0.5)*scale)
    (Keras ``image.load_img`` default interpolation — the reference's
    keras_vggface extractor path, ``facerec_test.py:141-144``)."""
    w = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    for i in range(dst):
        j = min(int((i + 0.5) * scale), src - 1)
        w[i, j] = 1.0
    return w


_WEIGHT_FNS = {
    "cv2_linear": _linear_weights_cv2,
    "cv2_area": _area_weights_cv2,
    "pil_bilinear": _triangle_weights_pil,
    "pil_nearest": _nearest_weights_pil,
    "cv2_cubic": _cubic_weights_cv2,
}


def resize(img: jnp.ndarray, out_hw: Tuple[int, int], method: str = "cv2_linear",
           precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., out_h, out_w, C) with the given semantics.

    method: 'cv2_linear' | 'cv2_area' | 'pil_bilinear' | 'cv2_cubic'.
    """
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = out_hw
    wfn = _WEIGHT_FNS[method]
    mh = jnp.asarray(wfn(h, oh))          # (oh, h)
    mw = jnp.asarray(wfn(w, ow))          # (ow, w)
    x = img.astype(jnp.float32)
    # rows: contract source H with mh -> out rows
    x = jnp.einsum("oh,...hwc->...owc", mh, x, precision=precision)
    x = jnp.einsum("pw,...owc->...opc", mw, x, precision=precision)
    return x


def resize_host(img: np.ndarray, out_hw: Tuple[int, int],
                method: str = "cv2_linear") -> np.ndarray:
    """Host-side (NumPy) resize with the EXACT same 1-D weight matrices as
    the on-device ``resize`` — for collapsing mixed-size datasets onto one
    compiled program (each distinct source (H, W) otherwise costs a fresh
    1-9 min XLA compile over the tunnel). Same separable contraction, f32.

    Accepts (..., H, W, C); returns float32 (..., out_h, out_w, C)."""
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = out_hw
    wfn = _WEIGHT_FNS[method]
    mh = wfn(h, oh)                       # (oh, h)
    mw = wfn(w, ow)                       # (ow, w)
    x = np.asarray(img, dtype=np.float32)
    x = np.einsum("oh,...hwc->...owc", mh, x)
    x = np.einsum("pw,...owc->...opc", mw, x)
    return np.ascontiguousarray(x, dtype=np.float32)


def resize_pyramid(img: jnp.ndarray, out_hws, method: str = "cv2_area",
                   precision=jax.lax.Precision.HIGHEST):
    """Resize one (..., H, W, C) image to SEVERAL output sizes at once.

    Semantically identical to ``[resize(img, hw, method) for hw in out_hws]``
    (same trace-time weight matrices, same contraction), but the row
    reductions of all levels stack into ONE (Σoh, H) matmul against the
    source — for the MTCNN scale pyramid this replaces 8 skinny einsums
    (M=14..144) with one well-shaped M≈500 matmul the MXU can tile,
    measured ~5x faster than the per-level form at 640x480. The per-level
    column matmuls stay separate (they are tiny and shape-heterogeneous).
    """
    h, w = img.shape[-3], img.shape[-2]
    wfn = _WEIGHT_FNS[method]
    stacked = jnp.asarray(np.concatenate([wfn(h, oh) for oh, _ in out_hws]))
    x = img.astype(jnp.float32)
    rows = jnp.einsum("oh,...hwc->...owc", stacked, x, precision=precision)
    outs = []
    off = 0
    for oh, ow in out_hws:
        mw = jnp.asarray(wfn(w, ow))
        outs.append(jnp.einsum("pw,...owc->...opc", mw,
                               rows[..., off:off + oh, :, :],
                               precision=precision))
        off += oh
    return outs


def _hat_weights(coord: jnp.ndarray, size: int, clamp: bool) -> jnp.ndarray:
    """Per-box bilinear hat weights, built on device from traced coords.

    coord: (N, s) fractional source positions. Returns (N, s, size) with
    w[n, i, j] = max(0, 1 - |j - coord[n, i]|) — exactly the two bilinear
    taps per sample. ``clamp`` pulls coords into [0, size-1] first
    (border-replicate); without it, out-of-range samples get all-zero rows,
    reproducing a zero-padded source (the reference's black crop buffers)."""
    if clamp:
        coord = jnp.clip(coord, 0.0, size - 1.0)
    j = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(j[None, None, :] - coord[..., None]))


def crop_resize_bilinear(img: jnp.ndarray, boxes: jnp.ndarray, out_size: int,
                         supersample: int = 2, outside: str = "clamp",
                         precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Batched dynamic crop + resize with area-approximating bilinear sampling.

    img:   (H, W, C) source image (float32).
    boxes: (N, 4) [y1, x1, y2, x2] pixel coords (may be traced values).
    out:   (N, out_size, out_size, C).

    Sampling grid uses cv2 half-pixel convention. ``supersample`` s produces an
    (s*out)² bilinear sample grid averaged s×s — approximating INTER_AREA for
    the MTCNN stage crops (reference ``facial_analysis.py:547,577``) while
    remaining jit-compatible with traced box coordinates.

    outside: 'clamp' replicates border pixels; 'zero' reproduces the
    reference's zero-padded crop buffers (``facial_analysis.py:545-547``:
    out-of-image regions of a box read as black).

    Implementation: separable bilinear as two per-box MATMULS against hat
    weight matrices built on device ((N, out, H) rows, (N, out, W) cols).
    TPU point-gathers are an order of magnitude slower than MXU matmuls at
    these sizes (measured: 128 24² crops @640×480 batch 8 run 12× faster as
    matmuls than as the equivalent gather), and the gather form anti-scales
    under vmap. Accumulation-order float differences vs a direct gather are
    ≤2e-3 pixel units.

    Contraction order (r5 negative result, measured on the 640×480 batch-8
    detect profile): the row-first form's (N, out, 640, C) intermediate is
    the detector's single largest HBM cost (the two stage-2/3 crop row
    passes move 189 MB/batch at 24% of device busy, 341 GB/s), and
    column-first (contract the larger axis first) shrinks the intermediate
    and the second pass by W/H = 25% ON PAPER — but measured SLOWER
    (device busy 258.3 → 269.8 ms): XLA's layout for the (N, H, out, C)
    intermediate sustains only ~297 GB/s and it inserts a 17 ms relayout
    copy, eating the byte saving. Keep row-first; don't retry without a
    layout-level reason.
    """
    img = jnp.asarray(img, jnp.float32)
    R, C = _crop_weights(boxes, img.shape[0], img.shape[1], out_size,
                         supersample, outside)
    rows = jnp.einsum("nih,hwc->niwc", R, img, precision=precision)
    return jnp.einsum("niwc,njw->nijc", rows, C, precision=precision)


def _crop_weights(boxes, H: int, W: int, out_size: int, supersample: int,
                  outside: str):
    """Per-box row/column hat-weight matrices ((N, out, H), (N, out, W))."""
    s = supersample * out_size
    boxes = boxes.astype(jnp.float32)
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    idx = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = y1[:, None] + idx[None, :] * (y2 - y1)[:, None] - 0.5   # (N, s)
    xs = x1[:, None] + idx[None, :] * (x2 - x1)[:, None] - 0.5
    clamp = outside == "clamp"
    R = _hat_weights(ys, H, clamp)                                # (N, s, H)
    C = _hat_weights(xs, W, clamp)                                # (N, s, W)
    if supersample > 1:
        # fold the s×s box filter into the weight matrices
        R = R.reshape(R.shape[0], out_size, supersample, H).mean(axis=2)
        C = C.reshape(C.shape[0], out_size, supersample, W).mean(axis=2)
    return R, C


def crop_resize_bilinear_lanes(images: jnp.ndarray, lanes: jnp.ndarray,
                               boxes: jnp.ndarray, out_size: int,
                               supersample: int = 1, outside: str = "clamp",
                               precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """``crop_resize_bilinear`` where each box crops from ITS OWN image of a
    batch: images (L, H, W, C), lanes (N,) int image index per box, boxes
    (N, 4) [y1, x1, y2, x2] -> (N, out, out, C).

    The per-box source image is a whole-row axis-0 gather (large contiguous
    blocks — cheap, unlike point gathers); the resample itself is the same
    two-matmul hat-weight form. This is what lets a batched pipeline compact
    boxes ACROSS batch lanes before paying crop+head compute
    (``pipelines/analyzer.py`` batch path)."""
    images = jnp.asarray(images, jnp.float32)
    R, C = _crop_weights(boxes, images.shape[1], images.shape[2], out_size,
                         supersample, outside)
    per_box = images[lanes]                                       # (N, H, W, C)
    rows = jnp.einsum("nih,nhwc->niwc", R, per_box, precision=precision)
    return jnp.einsum("niwc,njw->nijc", rows, C, precision=precision)
