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

# Adience age buckets (reference adience_age_list, utkface_test.py:15)
ADIENCE_BUCKETS: Sequence[Tuple[int, int]] = (
    (0, 2), (4, 6), (8, 12), (15, 20), (25, 32), (38, 43), (48, 53), (60, 100))


def age_to_bucket(age: float) -> int:
    """Exact reference ``get_age_range`` (``utkface_test.py:16-20``): the first
    bucket whose boundary midpoint — (this bucket's upper + next bucket's
    lower) / 2 — is >= the age; the last bucket otherwise. Boundary midpoints:
    3, 7, 13.5, 22.5, 35, 45.5, 56.5."""
    age = float(age)
    for ind in range(len(ADIENCE_BUCKETS) - 1):
        if age <= (ADIENCE_BUCKETS[ind][1] + ADIENCE_BUCKETS[ind + 1][0]) / 2:
            return ind
    return len(ADIENCE_BUCKETS) - 1


_FNAME_RE = re.compile(r"^(\d+)_(\d)_")


def parse_utkface_filename(fname: str) -> Optional[Tuple[int, int]]:
    """-> (age, gender) with gender 0=male, 1=female; None if malformed."""
    m = _FNAME_RE.match(os.path.basename(fname))
    if not m:
        return None
    return int(m.group(1)), int(m.group(2))


def read_csv_split(db_dir: str, csv_name: str = "utk_test.csv") -> List[str]:
    """The reference's CSV test-split reader (``utkface_test.py:316-330``):
    second column of ``utk_test.csv`` (header skipped), existing files only."""
    import csv

    files: List[str] = []
    with open(os.path.join(db_dir, csv_name)) as f:
        for i, row in enumerate(csv.reader(f)):
            if i == 0 or len(row) < 2:
                continue
            if os.path.exists(os.path.join(db_dir, row[1])):
                files.append(row[1])
    return files


def evaluate_age_gender(predict_fn: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
                        image_paths: Sequence[str], batch_size: int = 64,
                        age_range: Optional[Tuple[int, int]] = None,
                        clamp_range: Optional[Tuple[int, int]] = None,
                        clamp_to_age_range: bool = True,
                        host_resize_to: Optional[Tuple[int, int]] = None,
                        host_resize_method: str = "cv2_linear",
                        ) -> Dict[str, float]:
    """predict_fn: batch of RGB uint8 (N,H,W,3) -> (ages (N,), p_male (N,)).

    age_range: optional (lo, hi) ground-truth filter — e.g. (21, 60) for the
    CORAL-paper subset (``age_gender_identity/README.md:32``).

    Predicted ages are clamped into ``clamp_range`` when given; otherwise
    into ``age_range`` while ``clamp_to_age_range`` (the default — the
    reference's CSV-split path clamps predictions to 21-60 unconditionally,
    ``utkface_test.py:354-358``). Pass ``clamp_to_age_range=False`` to filter
    ground truth without clamping predictions.

    host_resize_to: resize every image on the HOST (exact device weight
    matrices, ``ops.resize.resize_host``) to one (H, W) before prediction,
    collapsing in-the-wild mixed-resolution datasets onto a single compiled
    program. Only valid for backends whose device path starts with a plain
    resize to that size (e.g. the multihead 'ours' backend) — letterboxing
    backends (insightface) must see the original aspect ratio.
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
    pred_age = np.zeros(n)
    pred_male = np.zeros(n)

    # Streamed extraction: threaded decode overlapped with device compute,
    # per-size buckets flushed at batch_size (never the whole dataset in
    # RAM), and tails REPEAT-PADDED to batch_size so every size bucket
    # compiles exactly one program — an unpadded tail chunk would be a
    # fresh multi-minute XLA compile per bucket over a remote device link.
    from ..parallel.sharding import pad_batch
    from ..utils.prefetch import bounded_thread_map

    def _decode(item):
        i, path = item
        im = imread_rgb(path)
        if host_resize_to is not None and im.shape[:2] != tuple(host_resize_to):
            from ..ops.resize import resize_host

            im = resize_host(im, tuple(host_resize_to), host_resize_method)
        return i, im

    def _flush(bucket):
        idxs = [i for i, _ in bucket]
        batch, n_valid = pad_batch(np.stack([im for _, im in bucket]),
                                   batch_size)
        ages, p_male = predict_fn(batch)
        pred_age[idxs] = np.asarray(ages)[:n_valid]
        pred_male[idxs] = np.asarray(p_male)[:n_valid]
        bucket.clear()

    buckets: Dict[Tuple[int, int], List] = {}
    decoded = bounded_thread_map(
        _decode, [(i, p) for i, (p, _, _) in enumerate(records)],
        workers=4, depth=2 * batch_size)
    for i, im in decoded:
        bucket = buckets.setdefault(im.shape[:2], [])
        bucket.append((i, im))
        if len(bucket) == batch_size:
            _flush(bucket)
    for bucket in buckets.values():
        if bucket:
            _flush(bucket)

    effective_clamp = clamp_range if clamp_range is not None else (
        age_range if clamp_to_age_range else None)
    if effective_clamp is not None:
        pred_age = np.clip(pred_age, effective_clamp[0], effective_clamp[1])

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
    # params ride as a jit ARGUMENT, device_put once — closure-captured
    # device constants are re-fetched at every lowering, and numpy args
    # would re-upload the model every call (CLAUDE.md residency rules)
    params = jax.device_put(mh_params)

    @jax.jit
    def fn(p, images):
        x = resize(images.astype(jnp.float32), (face_size, face_size), "cv2_linear")
        # reference resizes the uint8 crop (facial_analysis.py:95), so pixels
        # are integer-rounded before mean subtraction
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
        x = x[..., ::-1] - means
        out = multihead_apply(p, x)
        return 1.0 + expected_age_top_k(out.age_probs, 2), out.gender_prob

    return lambda batch: tuple(
        np.asarray(a) for a in fn(params, jnp.asarray(batch)))


def insightface_predict_fn(ga_params):
    """InsightFace gender-age backend (reference ``utkface_test.py:227-238``
    with ``insightface.py:92-132`` semantics): black letterbox + cubic resize
    to 112², IResNet fc1(202), gender/age decoded from binary pairs. The hard
    gender class doubles as p_male (reference: is_female = genders[0] < 0.5)."""
    import jax
    import jax.numpy as jnp

    from ..models.arcface import decode_gender_age, iresnet_embed
    from ..ops.resize import resize

    @jax.jit
    def fn(images):
        h, w = images.shape[1], images.shape[2]
        x = images.astype(jnp.float32)
        if h != w:  # letterbox: pad left (w<h) or top (w>=h) with black
            if w < h:
                x = jnp.pad(x, ((0, 0), (0, 0), (h - w, 0), (0, 0)))
            else:
                x = jnp.pad(x, ((0, 0), (w - h, 0), (0, 0), (0, 0)))
        x = resize(x, (112, 112), "cv2_cubic")
        out = iresnet_embed(ga_params, x)
        gender, age = decode_gender_age(out)
        return age.astype(jnp.float32), gender.astype(jnp.float32)

    return lambda batch: tuple(np.asarray(a) for a in fn(jnp.asarray(batch)))


def converted_pb_predict_fn(age_pb: str, gender_pb: str,
                            mean: float = 127.0):
    """Converted-checkpoint pb backend (reference ``utkface_test.py:113-150``,
    consuming the ``age_net.pb``/``gender_net.pb`` its :41-86 conversion
    emits, e.g. rude-carnie Adience inception): taps ``input``→``prob``,
    resize to 256², subtract the scalar mean, resize to the placeholder's
    size, RGB→BGR; gender female iff prob[0] < 0.5; age = midpoint of the
    argmax Adience bucket."""
    import jax
    import jax.numpy as jnp

    from ..core.graph_compiler import compile_pb
    from ..ops.resize import resize
    from ..pipelines.heads import _placeholder_hw

    age_cg = compile_pb(age_pb, ["prob"])
    gender_cg = compile_pb(gender_pb, ["prob"])
    age_hw = _placeholder_hw(age_cg.graph, "input") or (227, 227)
    gender_hw = _placeholder_hw(gender_cg.graph, "input") or (227, 227)
    midpoints = jnp.asarray([(lo + hi) / 2 for lo, hi in ADIENCE_BUCKETS])

    @jax.jit
    def fn(images):
        x = resize(images.astype(jnp.float32), (256, 256), "cv2_linear") - mean
        xa = resize(x, age_hw, "cv2_linear")[..., ::-1]
        xg = resize(x, gender_hw, "cv2_linear")[..., ::-1]
        (age_prob,) = age_cg.fn(age_cg.params, {"input": xa})
        (gender_prob,) = gender_cg.fn(gender_cg.params, {"input": xg})
        age_prob = age_prob.reshape(images.shape[0], -1)
        gender_prob = gender_prob.reshape(images.shape[0], -1)
        ages = midpoints[jnp.argmax(age_prob, axis=1)]
        # prob[0] >= 0.5 -> male in this backend's convention (:145); return
        # the hard decision so the shared 0.6 threshold can't re-interpret it
        p_male = (gender_prob[:, 0] >= 0.5).astype(jnp.float32)
        return ages, p_male

    return lambda batch: tuple(np.asarray(a) for a in fn(jnp.asarray(batch)))


def converted_logits_predict_fn(age_pb: str, gender_pb: str):
    """rude-carnie converted-pb backend (reference ``utkface_test.py:89-109``,
    consuming the Adience inception checkpoints its :35-86 conversion freezes
    with a softmax node named ``logits``): taps ``Placeholder``→``logits``,
    direct resize to the 227² placeholder size, float32, NO mean subtraction
    and NO channel flip (RGB straight in); gender female iff logits[0] < 0.5;
    age = midpoint of the argmax Adience bucket. The reference runs this
    branch with ``adience_range=True`` (only gender / bucket accuracies are
    meaningful — midpoint ages make MAE a bucket artifact)."""
    import jax
    import jax.numpy as jnp

    from ..core.graph_compiler import compile_pb
    from ..ops.resize import resize
    from ..pipelines.heads import _placeholder_hw

    age_cg = compile_pb(age_pb, ["logits"])
    gender_cg = compile_pb(gender_pb, ["logits"])
    age_hw = _placeholder_hw(age_cg.graph, "Placeholder") or (227, 227)
    gender_hw = _placeholder_hw(gender_cg.graph, "Placeholder") or (227, 227)
    midpoints = jnp.asarray([(lo + hi) / 2 for lo, hi in ADIENCE_BUCKETS])

    @jax.jit
    def fn(images):
        x = images.astype(jnp.float32)
        xa = resize(x, age_hw, "cv2_linear")
        xg = resize(x, gender_hw, "cv2_linear")
        (age_prob,) = age_cg.fn(age_cg.params, {"Placeholder": xa})
        (gender_prob,) = gender_cg.fn(gender_cg.params, {"Placeholder": xg})
        age_prob = age_prob.reshape(images.shape[0], -1)
        gender_prob = gender_prob.reshape(images.shape[0], -1)
        ages = midpoints[jnp.argmax(age_prob, axis=1)]
        # logits[0] >= 0.5 -> male (:106); hard decision for the shared
        # 0.6 consumer threshold
        p_male = (gender_prob[:, 0] >= 0.5).astype(jnp.float32)
        return ages, p_male

    return lambda batch: tuple(np.asarray(a) for a in fn(jnp.asarray(batch)))


def facenet_predict_fn(ir_params, face_size: int = 160):
    """FaceNet Inception-ResNet-v1 backend (reference ``utkface_test.py:
    186-225``): 160² resize, tf.image.per_image_standardization, age =
    expectation over the 101-way softmax, gender argmax (index 1 = male;
    is_female = gender == 0)."""
    import jax
    import jax.numpy as jnp

    from ..models.inception_resnet import inception_resnet_v1_age_gender
    from ..ops.resize import resize

    @jax.jit
    def fn(images):
        x = resize(images.astype(jnp.float32), (face_size, face_size), "cv2_linear")
        n = face_size * face_size * 3
        m = x.mean(axis=(1, 2, 3), keepdims=True)
        sd = jnp.maximum(x.std(axis=(1, 2, 3), keepdims=True),
                         1.0 / jnp.sqrt(float(n)))
        age_logits, gender_logits = inception_resnet_v1_age_gender(
            ir_params, (x - m) / sd)
        ages = jax.nn.softmax(age_logits) @ jnp.arange(0.0, 101.0)
        gender = jnp.argmax(gender_logits, axis=1)
        return ages, gender.astype(jnp.float32)

    return lambda batch: tuple(np.asarray(a) for a in fn(jnp.asarray(batch)))


def agendernet_predict_fn(mn2_params, face_size: int = 96):
    """AgenderNet MobileNetV2 backend (reference ``utkface_test.py:240-256``):
    96² resize, Keras mobilenet_v2 preprocessing (inside the model), gender
    argmax (0 = female, returned as a hard decision), age = expectation.

    The reference feeds the cv2.imread BGR image straight through (no
    cvtColor, :246-249); inputs here are RGB so the channels are flipped to
    match the external checkpoint's expectation."""
    import jax
    import jax.numpy as jnp

    from ..models.mobilenet_v2 import agendernet_apply, decode_agendernet
    from ..ops.resize import resize

    @jax.jit
    def fn(images):
        x = images.astype(jnp.float32)[..., ::-1]   # RGB -> reference's BGR feed
        x = resize(x, (face_size, face_size), "cv2_linear")
        gender_probs, age_probs = agendernet_apply(mn2_params, x)
        gender, ages = decode_agendernet(gender_probs, age_probs)
        return ages, gender.astype(jnp.float32)

    return lambda batch: tuple(np.asarray(a) for a in fn(jnp.asarray(batch)))


def ssrnet_predict_fn(age_params, gender_params, face_size: int = 64):
    """SSR-Net backend (reference ``utkface_test.py:258-288``): 64² resize,
    per-image min-max normalization to 0-255 (cv2.normalize NORM_MINMAX),
    separate age (V=101) and gender (V=1) models; female iff gender < 0.5.

    The reference feeds the cv2.imread BGR image straight through (no
    cvtColor, :280-283); inputs here are RGB so the channels are flipped to
    match the external checkpoint's expectation."""
    import jax
    import jax.numpy as jnp

    from ..models.ssrnet import ssrnet_apply
    from ..ops.resize import resize

    @jax.jit
    def fn(images):
        x = images.astype(jnp.float32)[..., ::-1]   # RGB -> reference's BGR feed
        x = resize(x, (face_size, face_size), "cv2_linear")
        lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
        x = (x - lo) / jnp.maximum(hi - lo, 1e-6) * 255.0
        ages = ssrnet_apply(age_params, x, V=101.0)
        gender = ssrnet_apply(gender_params, x, V=1.0)
        return ages, (gender >= 0.5).astype(jnp.float32)

    return lambda batch: tuple(np.asarray(a) for a in fn(jnp.asarray(batch)))


def bknet_predict_fn(bk_params):
    """BKNet-style backend (reference ``utkface_test.py:153-184``): 48²
    grayscale (x − 128)/255, age = argmax of the 101-way head, female iff
    gender argmax == 0."""
    import jax
    import jax.numpy as jnp

    from ..models.bknet import bknet_apply, preprocess_bknet

    @jax.jit
    def fn(x):
        _, gender_logits, age_logits = bknet_apply(bk_params, x)
        ages = jnp.argmax(age_logits, axis=1).astype(jnp.float32)
        gender = jnp.argmax(gender_logits, axis=1)   # 1 = male
        return ages, gender.astype(jnp.float32)

    return lambda batch: tuple(
        np.asarray(a) for a in fn(jnp.asarray(preprocess_bknet(np.asarray(batch)))))


def wide_resnet_predict_fn(wrn_params, face_size: int = 64):
    """WideResNet-16-8 backend (reference ``utkface_test.py:290-314``):
    cv2-linear resize to 64², gender softmax [female, male], age =
    expectation over the 101-way softmax.

    The reference feeds the cv2.imread BGR image straight through (no
    cvtColor, :303-306); inputs here are RGB so the channels are flipped to
    match the external checkpoint's expectation."""
    import jax
    import jax.numpy as jnp

    from ..models.wide_resnet import wide_resnet_16_8
    from ..ops.resize import resize

    @jax.jit
    def fn(images):
        x = images.astype(jnp.float32)[..., ::-1]   # RGB -> reference's BGR feed
        x = resize(x, (face_size, face_size), "cv2_linear")
        gender_probs, age_probs = wide_resnet_16_8(wrn_params, x)
        ages = age_probs @ jnp.arange(0.0, 101.0)
        # reference: female iff P(female idx 0) > 0.5 (:313); hard decision so
        # the shared 0.6 threshold can't re-interpret borderline probs
        p_male = (gender_probs[:, 0] <= 0.5).astype(jnp.float32)
        return ages, p_male

    return lambda batch: tuple(np.asarray(a) for a in fn(jnp.asarray(batch)))
