"""Eval protocols (LFW/UTKFace), model zoo, sharded train step."""

import os

import cv2
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from hse_facerec_tf_tpu.eval import lfw, utkface
from hse_facerec_tf_tpu.models.zoo import MODEL_ZOO, build_extractor
from hse_facerec_tf_tpu.parallel.train_step import run_one_sharded_step


def test_utkface_filename_parsing():
    assert utkface.parse_utkface_filename("25_0_1_20170113.jpg") == (25, 0)
    assert utkface.parse_utkface_filename("3_1_0_x.jpg") == (3, 1)
    assert utkface.parse_utkface_filename("badname.jpg") is None


def test_age_buckets():
    assert utkface.age_to_bucket(1) == 0
    assert utkface.age_to_bucket(30) == 4
    assert utkface.age_to_bucket(70) == 7
    assert utkface.age_to_bucket(22) == 3      # 22 <= (20+25)/2
    assert utkface.age_to_bucket(14) == 3      # 14 > (12+15)/2 = 13.5
    assert utkface.age_to_bucket(13.5) == 2    # boundary tie -> lower bucket


def test_age_bucket_rule_matches_reference_exactly():
    """Dense-grid exact match against the reference ``get_age_range``
    (utkface_test.py:15-20) — catches any bucket-list or tie-rule drift
    (e.g. a (8, 13) bucket or nearest-bound fallback diverges in
    (13.5, 14])."""
    adience_age_list = [(0, 2), (4, 6), (8, 12), (15, 20), (25, 32),
                        (38, 43), (48, 53), (60, 100)]

    def get_age_range(real_age):                      # reference :16-20
        for ind in range(len(adience_age_list) - 1):
            if real_age <= (adience_age_list[ind][1]
                            + adience_age_list[ind + 1][0]) / 2:
                return ind
        return len(adience_age_list) - 1

    for age in [x / 4.0 for x in range(0, 101 * 4)]:
        assert utkface.age_to_bucket(age) == get_age_range(age), age


def test_utkface_eval_with_synthetic_predictor(tmp_path, rng):
    # fabricate a tiny UTKFace-style dir
    paths = []
    truths = [(25, 0), (40, 1), (8, 0), (60, 1)]
    for i, (age, gender) in enumerate(truths):
        img = np.zeros((64, 64, 3), np.uint8)
        img[:, :, 0] = age                       # truth encoded in pixels
        img[:, :, 1] = 255 if gender == 0 else 0
        p = str(tmp_path / f"{age}_{gender}_0_2017{i:04d}.png")  # lossless
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)

    class Oracle:
        """Reads the truth straight out of the batch pixels (channel 0 = age,
        channel 1 = 255*is_male), so predictions stay aligned under any
        filtering/ordering the evaluator applies."""

        def __call__(self, batch):
            ages = batch[:, 0, 0, 0].astype(np.float32)
            males = (batch[:, 0, 0, 1] > 127).astype(np.float32)
            return ages, males

    stats = utkface.evaluate_age_gender(Oracle(), paths)
    assert stats["n"] == 4
    assert stats["gender_accuracy"] == 1.0
    assert stats["age_mae"] == 0.0
    assert stats["age_within5_accuracy"] == 1.0

    # age-range filter (CORAL subset protocol)
    stats2 = utkface.evaluate_age_gender(Oracle(), paths, age_range=(21, 60))
    assert stats2["n"] == 3


def test_lfw_protocol_with_synthetic_dataset(tmp_path, rng):
    # directory-per-class dataset of colored squares
    for c in range(4):
        d = tmp_path / f"person_{c}"
        d.mkdir()
        base = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        for j in range(4):
            img = np.clip(base.astype(int) + rng.randint(-6, 6, base.shape), 0, 255)
            cv2.imwrite(str(d / f"{j}.jpg"), img.astype(np.uint8))

    class MeanColorExtractor:
        def extract_files(self, paths):
            from hse_facerec_tf_tpu.utils.image_io import imread_rgb

            return np.stack([imread_rgb(p).reshape(-1, 3).mean(0) for p in paths])

    feats, labels, names = lfw.extract_dataset_features(
        str(tmp_path), MeanColorExtractor(),
        cache_file=str(tmp_path / "cache.npz"))
    assert len(names) == 4 and len(labels) == 16
    res = lfw.identification_benchmark(feats, labels, "split50")
    assert res["accuracy"] > 0.9
    res2 = lfw.identification_benchmark(feats, labels, "single")
    assert res2["accuracy"] > 0.9
    # cache hit path
    feats2, labels2, _ = lfw.extract_dataset_features(
        str(tmp_path), None, cache_file=str(tmp_path / "cache.npz"))
    np.testing.assert_allclose(feats, feats2)

    suite = lfw.classifier_suite(feats, labels, pca_components=2)
    assert set(suite) == {"1nn", "1nn_pca2", "3nn", "3nn_pca2"}


def test_gallery_probe_suite_matches_reference_sklearn(rng):
    """gallery_probe_suite vs a literal transcription of the reference's
    classifier loop (facerec_test.py:270-288: Pipeline(PCA(16), estimator),
    fit on RAW gallery features, accuracy on the probe set)."""
    from sklearn.decomposition import PCA
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.neighbors import KNeighborsClassifier
    from sklearn.pipeline import Pipeline
    from sklearn.svm import SVC, LinearSVC

    from hse_facerec_tf_tpu.pipelines.identification import gallery_probe_suite

    n_classes, dim = 6, 24
    centers = rng.randn(n_classes, dim).astype(np.float32) * 3
    def sample(n_per):
        X = np.concatenate([c + rng.randn(n_per, dim).astype(np.float32)
                            for c in centers])
        y = np.repeat(np.arange(n_classes), n_per)
        return X, y
    Xg, yg = sample(8)
    Xp, yp = sample(5)

    got = gallery_probe_suite(Xg, yg, Xp, yp, pca_components=16, rf_seed=0)

    ref_rows = [
        ("1-NN+PCA", Pipeline([("pca", PCA(n_components=16)),
                               ("classifier", KNeighborsClassifier(1, p=2))])),
        ("1-NN", KNeighborsClassifier(1, p=2)),
        ("3-NN+PCA", Pipeline([("pca", PCA(n_components=16)),
                               ("classifier", KNeighborsClassifier(3, p=2))])),
        ("3-NN", KNeighborsClassifier(3, p=2)),
        ("rf", RandomForestClassifier(n_estimators=100, max_depth=10,
                                      random_state=0)),
        ("svm", SVC()),
        ("linear svm+PCA", Pipeline([("pca", PCA(n_components=16)),
                                     ("classifier", LinearSVC())])),
        ("linear svm", LinearSVC()),
    ]
    assert set(got) == {name for name, _ in ref_rows}
    for name, clf in ref_rows:
        clf.fit(Xg, yg)
        want = float(np.mean(clf.predict(Xp) == yp))
        assert got[name] == pytest.approx(want, abs=1e-9), (name, got[name], want)
    # sanity: the problem is actually separable
    assert got["1-NN"] > 0.8


def test_zoo_specs():
    assert set(MODEL_ZOO) >= {"agegender_identity", "vgg2_mobilenet", "vgg2_resnet"}
    spec = MODEL_ZOO["vgg2_mobilenet"]
    assert spec.input_size == (192, 192)
    assert spec.normalization == "caffe"
    spec_r = MODEL_ZOO["vgg2_resnet"]
    assert spec_r.normalization == "vggface2"
    assert spec_r.embedding_dim == 2048


def test_sharded_train_step_2d_mesh():
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("data", "model"))
    metrics = run_one_sharded_step(mesh, n_classes=32, image_size=32)
    assert np.isfinite(metrics["loss"])


def test_sharded_matches_single_device():
    """dp×tp sharded step computes the same loss as an unsharded step."""
    devices = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh2 = Mesh(devices, axis_names=("data", "model"))
    m_sharded = run_one_sharded_step(mesh2, n_classes=16, image_size=32, seed=7, batch=8)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    m_single = run_one_sharded_step(mesh1, n_classes=16, image_size=32, seed=7, batch=8)
    assert abs(m_sharded["loss"] - m_single["loss"]) < 1e-3


def test_threshold_search(rng):
    from hse_facerec_tf_tpu.eval.threshold_search import search_distance_threshold
    from hse_facerec_tf_tpu.ops.distance import pairwise_euclidean

    def blobs(seed):
        r = np.random.RandomState(seed)
        centers = r.randn(4, 8).astype(np.float32) * 3
        feats = np.concatenate([c + 0.1 * r.randn(6, 8).astype(np.float32)
                                for c in centers])
        labels = np.repeat(np.arange(4), 6)
        d = np.array(pairwise_euclidean(feats, feats))
        np.fill_diagonal(d, 0)
        return d, labels

    result = search_distance_threshold([blobs(0), blobs(1)],
                                       thresholds=np.linspace(0.2, 3.0, 15),
                                       statistic="bcubed_f",
                                       early_stop_target=2.0)  # no target stop
    assert result["best_score"] > 0.95
    assert 0.2 < result["best_threshold"] < 3.0
    assert len(result["trace"]) >= 2


def test_graph_extractor_generic_pb(rng):
    """Any frozen pb becomes an extractor (the TensorFlowInference pattern):
    here the shipped multi-head pb via its identity tap."""
    from hse_facerec_tf_tpu.models.zoo import AGEGENDER_PB, graph_extractor

    ex = graph_extractor(AGEGENDER_PB, "input_1:0", "global_pooling/Mean:0",
                         (224, 224), normalization="caffe",
                         resize_method="cv2_linear", batch_size=2)
    imgs = (rng.rand(2, 112, 112, 3) * 255).astype(np.uint8)
    feats = ex.extract_batch(imgs)
    assert feats.shape == (2, 1024)
    assert np.linalg.norm(feats, axis=1).min() > 0


def test_cascade_fallback(rng, fixture_img_640):
    import cv2

    from hse_facerec_tf_tpu.pipelines.cascade_fallback import \
        CascadeFallbackDetector

    det = CascadeFallbackDetector()
    boxes, points = det.detect(fixture_img_640)
    assert boxes.shape[1] == 5
    assert len(boxes) >= 1  # finds at least one frontal face on the fixture
    noise = (rng.rand(200, 200, 3) * 255).astype(np.uint8)
    empty, _ = det.detect(noise)
    assert empty.shape == (0, 5)


def test_sharded_age_gender_pair_runs():
    """Alternating multi-task age/gender steps under mesh sharding (pure DP
    over all axes, params replicated) execute and produce finite losses."""
    import jax
    from jax.sharding import Mesh

    from hse_facerec_tf_tpu.parallel.train_step import (
        run_one_sharded_age_gender_pair)

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("data", "model"))
    metrics = run_one_sharded_age_gender_pair(mesh)
    assert np.isfinite(metrics["age_loss"]) and np.isfinite(metrics["gender_loss"])
    assert 0.0 <= metrics["age_acc"] <= 1.0


def test_utkface_host_resize_single_program(tmp_path, rng):
    """host_resize_to collapses mixed-resolution images onto one prediction
    bucket; with a size-invariant oracle the metrics are unchanged, and the
    predict fn sees exactly one (H, W)."""
    import cv2

    from hse_facerec_tf_tpu.eval import utkface

    paths = []
    sizes = [(100, 80), (200, 160), (64, 64)]
    for i, (age, g) in enumerate([(30, 0), (40, 1), (25, 0)]):
        img = np.zeros((*sizes[i], 3), np.uint8)
        img[:, :, 0] = age
        img[:, :, 1] = 255 * (1 - g)
        p = str(tmp_path / f"{age}_{g}_x_{i}.png")   # lossless
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)

    seen = []

    class Oracle:
        def __call__(self, batch):
            seen.append(batch.shape[1:3])
            ages = batch[:, 0, 0, 0].astype(np.float32)
            males = (batch[:, 0, 0, 1] > 127).astype(np.float32)
            return np.round(ages), males

    stats = utkface.evaluate_age_gender(Oracle(), paths,
                                        host_resize_to=(64, 64))
    assert set(seen) == {(64, 64)}
    assert stats["n"] == 3
    assert stats["gender_accuracy"] == 1.0
    assert stats["age_mae"] <= 0.5   # constant image, exact resize


def test_utkface_clamp_flags(tmp_path, rng):
    """clamp_to_age_range=False filters ground truth without touching
    predictions; explicit clamp_range clamps without filtering."""
    import cv2

    from hse_facerec_tf_tpu.eval import utkface

    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :, 0] = 30
    img[:, :, 1] = 255
    p = str(tmp_path / "30_0_x_0.jpg")
    cv2.imwrite(p, img)

    class Off:  # predicts 90, male
        def __call__(self, batch):
            return np.full(len(batch), 90.0), np.ones(len(batch))

    # default: clamp to the gt filter range (reference CSV-split behavior)
    s1 = utkface.evaluate_age_gender(Off(), [p], age_range=(21, 60))
    assert s1["age_mae"] == 30.0          # 90 clamped to 60
    s2 = utkface.evaluate_age_gender(Off(), [p], age_range=(21, 60),
                                     clamp_to_age_range=False)
    assert s2["age_mae"] == 60.0          # unclamped
    s3 = utkface.evaluate_age_gender(Off(), [p], clamp_range=(21, 50))
    assert s3["age_mae"] == 20.0          # explicit clamp, no filter
