"""UTKFace age/gender benchmark.

Reproduces the reference's ``utkface_test.py`` protocol: ground truth encoded
in filenames ``{age}_{gender}_{race}_{date}.jpg`` (:348-349), metrics = gender
accuracy, exact-Adience-bucket accuracy, ±5-years accuracy, and age MAE
(:359-377). Age buckets follow ``get_age_range`` (:14-20).
Baseline numbers: ``age_gender_identity/README.md:30-33`` (BASELINE.md rows).
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# Adience age buckets (reference get_age_range :14-20)
ADIENCE_BUCKETS: Sequence[Tuple[int, int]] = (
    (0, 2), (4, 6), (8, 13), (15, 20), (25, 32), (38, 43), (48, 53), (60, 100))


def age_to_bucket(age: float) -> int:
    """Index of the Adience range whose center is nearest (the reference picks
    the range containing the age, else nearest bound)."""
    age = float(age)
    for i, (lo, hi) in enumerate(ADIENCE_BUCKETS):
        if lo <= age <= hi:
            return i
    dists = [min(abs(age - lo), abs(age - hi)) for lo, hi in ADIENCE_BUCKETS]
    return int(np.argmin(dists))


_FNAME_RE = re.compile(r"^(\d+)_(\d)_")


def parse_utkface_filename(fname: str) -> Optional[Tuple[int, int]]:
    """-> (age, gender) with gender 0=male, 1=female; None if malformed."""
    m = _FNAME_RE.match(os.path.basename(fname))
    if not m:
        return None
    return int(m.group(1)), int(m.group(2))


def evaluate_age_gender(predict_fn: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
                        image_paths: Sequence[str], batch_size: int = 64,
                        age_range: Optional[Tuple[int, int]] = None) -> Dict[str, float]:
    """predict_fn: batch of RGB uint8 (N,H,W,3) -> (ages (N,), p_male (N,)).

    age_range: optional (lo, hi) ground-truth filter — e.g. (21, 60) for the
    CORAL-paper subset (``age_gender_identity/README.md:32``).
    """
    from ..utils.image_io import imread_rgb

    records = []
    for p in image_paths:
        parsed = parse_utkface_filename(p)
        if parsed is None:
            continue
        age, gender = parsed
        if age_range is not None and not (age_range[0] <= age <= age_range[1]):
            continue
        records.append((p, age, gender))

    n = len(records)
    gender_ok = bucket_ok = within5 = 0
    abs_err = 0.0
    by_size: Dict[Tuple[int, int], List[int]] = {}
    imgs = []
    for i, (p, _, _) in enumerate(records):
        im = imread_rgb(p)
        imgs.append(im)
        by_size.setdefault(im.shape[:2], []).append(i)

    pred_age = np.zeros(n)
    pred_male = np.zeros(n)
    for size, idxs in by_size.items():
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            batch = np.stack([imgs[i] for i in chunk])
            ages, p_male = predict_fn(batch)
            pred_age[chunk] = np.asarray(ages)
            pred_male[chunk] = np.asarray(p_male)

    for i, (_, true_age, true_gender) in enumerate(records):
        pred_gender = 0 if pred_male[i] >= 0.6 else 1   # is_male threshold (:76-81)
        gender_ok += pred_gender == true_gender
        bucket_ok += age_to_bucket(pred_age[i]) == age_to_bucket(true_age)
        within5 += abs(pred_age[i] - true_age) <= 5
        abs_err += abs(pred_age[i] - true_age)

    return {
        "n": n,
        "gender_accuracy": gender_ok / n if n else 0.0,
        "age_bucket_accuracy": bucket_ok / n if n else 0.0,
        "age_within5_accuracy": within5 / n if n else 0.0,
        "age_mae": abs_err / n if n else 0.0,
    }


def multihead_predict_fn(mh_params, face_size: int = 224):
    """Standard predictor over the multi-head model (aligned crops, no
    detection — reference :22-34 feeds pre-aligned UTKFace images directly)."""
    import jax
    import jax.numpy as jnp

    from ..models.multihead import expected_age_top_k, multihead_apply
    from ..ops.preprocess import IMAGENET_MEANS_BGR
    from ..ops.resize import resize

    means = np.asarray(IMAGENET_MEANS_BGR, dtype=np.float32)

    @jax.jit
    def fn(images):
        x = resize(images.astype(jnp.float32), (face_size, face_size), "cv2_linear")
        x = x[..., ::-1] - means
        out = multihead_apply(mh_params, x)
        return 1.0 + expected_age_top_k(out.age_probs, 2), out.gender_prob

    return lambda batch: tuple(np.asarray(a) for a in fn(jnp.asarray(batch)))
