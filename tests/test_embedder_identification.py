"""Embedding extraction + identification pipeline tests, incl. 8-device mesh."""

import numpy as np
import pytest

import jax

from hse_facerec_tf_tpu.models.multihead import import_multihead_params, multihead_apply
from hse_facerec_tf_tpu.parallel.sharding import make_mesh
from hse_facerec_tf_tpu.pipelines.embedder import EmbeddingExtractor
from hse_facerec_tf_tpu.pipelines import identification as ident

from .conftest import AGEGENDER_PB


@pytest.fixture(scope="module")
def mh_params():
    return import_multihead_params(str(AGEGENDER_PB))


def identity_fn(params, x):
    return multihead_apply(params, x).identity


def test_extract_batch_matches_single(mh_params, rng):
    ex = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                            normalization="vggface2", resize_method="cv2_linear",
                            batch_size=4)
    imgs = (rng.rand(6, 112, 112, 3) * 255).astype(np.uint8)
    feats = ex.extract_batch(imgs)
    assert feats.shape == (6, 1024)
    one = ex.extract_batch(imgs[2:3])
    np.testing.assert_allclose(feats[2], one[0], atol=1e-3)


def test_extract_sharded_mesh(mh_params, rng):
    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.devices.size == 8
    ex = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                            normalization="vggface2", resize_method="cv2_linear",
                            batch_size=8, mesh=mesh)
    imgs = (rng.rand(8, 96, 96, 3) * 255).astype(np.uint8)
    feats = ex.extract_batch(imgs)
    ex1 = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                             normalization="vggface2", resize_method="cv2_linear",
                             batch_size=8)
    feats1 = ex1.extract_batch(imgs)
    np.testing.assert_allclose(feats, feats1, atol=1e-3)


def test_knn_identifier_sharded_mesh(rng):
    """KNNIdentifier(mesh=...) routes k=1 euclidean through the
    gallery-sharded distributed sweep and matches the single-device path."""
    from hse_facerec_tf_tpu.parallel.sharding import make_mesh

    feats, labels = _synthetic_classes(rng)
    probe_idx = rng.permutation(len(feats))[:20]
    sharded = ident.KNNIdentifier(mesh=make_mesh()).fit(feats, labels)
    plain = ident.KNNIdentifier().fit(feats, labels)
    np.testing.assert_array_equal(sharded.predict(feats[probe_idx]),
                                  plain.predict(feats[probe_idx]))


def test_bounded_thread_map_order_and_bound():
    """Results come back in input order; in-flight work never exceeds depth
    (submission is throttled, unlike ThreadPoolExecutor.map)."""
    import threading

    from hse_facerec_tf_tpu.utils.prefetch import bounded_thread_map

    lock = threading.Lock()
    live = 0
    max_live = 0

    def work(x):
        nonlocal live, max_live
        with lock:
            live += 1
            max_live = max(max_live, live)
        out = x * x
        with lock:
            live -= 1
        return out

    got = list(bounded_thread_map(work, range(100), workers=4, depth=6))
    assert got == [x * x for x in range(100)]
    assert max_live <= 6
    # inline mode
    assert list(bounded_thread_map(work, range(5), workers=0)) == [0, 1, 4, 9, 16]


def test_extract_files_streamed_matches_batch(mh_params, rng, tmp_path):
    """The streamed file loader (threaded decode + async device dispatch +
    size buckets) must reproduce extract_batch exactly, across mixed source
    sizes, partial buckets, and both worker modes."""
    import cv2

    sizes = [(100, 100), (80, 120), (100, 100), (100, 100), (80, 120),
             (100, 100), (100, 100)]
    paths, imgs = [], []
    for i, (h, w) in enumerate(sizes):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img_{i}.png")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
        imgs.append(img)

    ex = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                            normalization="vggface2", resize_method="cv2_linear",
                            batch_size=3)
    want = np.stack([ex.extract_batch(im[None])[0] for im in imgs])
    got = ex.extract_files(paths, decode_workers=4)
    np.testing.assert_allclose(got, want, atol=1e-3)
    got0 = ex.extract_files(paths, decode_workers=0)
    np.testing.assert_allclose(got0, want, atol=1e-3)


def _synthetic_classes(rng, n_classes=12, per_class=6, dim=64, noise=0.15):
    centers = rng.randn(n_classes, dim).astype(np.float32)
    feats, labels = [], []
    for c in range(n_classes):
        for _ in range(per_class):
            feats.append(centers[c] + noise * rng.randn(dim).astype(np.float32))
            labels.append(c)
    return np.stack(feats), np.asarray(labels)


def test_knn_identifier_vs_sklearn(rng):
    from sklearn.neighbors import KNeighborsClassifier
    from sklearn.preprocessing import normalize

    feats, labels = _synthetic_classes(rng)
    tr = np.arange(len(labels)) % 2 == 0
    te = ~tr
    ours = ident.KNNIdentifier(k=1).fit(feats[tr], labels[tr])
    got = ours.predict(feats[te])
    sk = KNeighborsClassifier(n_neighbors=1, p=2).fit(normalize(feats[tr]), labels[tr])
    want = sk.predict(normalize(feats[te]))
    np.testing.assert_array_equal(got, want)


def test_knn3_majority(rng):
    feats, labels = _synthetic_classes(rng, noise=0.05)
    knn = ident.KNNIdentifier(k=3).fit(feats, labels)
    assert knn.score(feats, labels) == 1.0


def test_drop_singletons():
    feats = np.arange(10, dtype=np.float32).reshape(5, 2)
    labels = np.array([0, 0, 1, 2, 2])
    f2, l2 = ident.drop_singleton_classes(feats, labels)
    assert len(l2) == 4
    assert set(l2.tolist()) == {0, 1}


def test_stratified_eval_protocol(rng):
    feats, labels = _synthetic_classes(rng, noise=0.05)
    mean, std = ident.stratified_split_eval(feats, labels)
    assert mean > 0.95


def test_single_image_protocol(rng):
    feats, labels = _synthetic_classes(rng, noise=0.05)
    mean, std = ident.single_image_eval(feats, labels, n_splits=3)
    assert mean > 0.9


def test_pca_projection(rng):
    feats, labels = _synthetic_classes(rng)
    tr_p, te_p = ident.pca_project(feats, feats, 8)
    assert tr_p.shape == (len(feats), 8)
    from sklearn.decomposition import PCA

    want = PCA(n_components=8).fit_transform(feats)
    # PCA components defined up to sign
    for j in range(8):
        col = tr_p[:, j]
        assert (np.allclose(col, want[:, j], atol=1e-2)
                or np.allclose(col, -want[:, j], atol=1e-2))


def test_flip_tta_and_l2_output(mh_params, rng):
    """InsightFace-style extractor options (insightface_face_embedding.py:47-62):
    mirrored-sum features, L2-normalized rows."""
    ex = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                            normalization="vggface2", resize_method="cv2_linear",
                            batch_size=2, flip_tta=True, l2_normalize_output=True)
    imgs = (rng.rand(2, 224, 224, 3) * 255).astype(np.uint8)
    feats = ex.extract_batch(imgs)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)
    # flip symmetry: mirrored input gives identical TTA features
    feats_m = ex.extract_batch(imgs[:, :, ::-1, :])
    np.testing.assert_allclose(feats, feats_m, atol=1e-3)


def test_host_resize_matches_device(mh_params, rng):
    """ops.resize.resize_host applies the EXACT same weight matrices as the
    on-device resize; embeddings through the host path match the fused
    device-resize path."""
    from hse_facerec_tf_tpu.ops.resize import resize, resize_host

    img = (rng.rand(3, 97, 131, 3) * 255).astype(np.uint8)
    for method in ("cv2_linear", "pil_bilinear", "cv2_area", "pil_nearest"):
        host = resize_host(img, (224, 224), method)
        dev = np.asarray(resize(jax.numpy.asarray(img, dtype=jax.numpy.float32),
                                (224, 224), method))
        np.testing.assert_allclose(host, dev, atol=2e-3)

    dev_ex = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                                normalization="vggface2",
                                resize_method="cv2_linear", batch_size=4,
                                host_resize="never")
    host_ex = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                                 normalization="vggface2",
                                 resize_method="cv2_linear", batch_size=4,
                                 host_resize="always")
    want = dev_ex.extract_batch(img)
    got = host_ex.extract_batch(img)
    np.testing.assert_allclose(got, want, atol=1e-2)
    cos = np.sum(got * want, axis=1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999999
    # 'always' must compile only the native-size program
    assert list(host_ex._jitted) == [(224, 224)]


def test_host_resize_auto_bounds_compiles(mh_params, rng):
    """'auto' compiles at most max_compiled_shapes device programs; further
    shapes route through the native-size program via host resize, with
    matching embeddings."""
    ex = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                            normalization="vggface2",
                            resize_method="cv2_linear", batch_size=2,
                            host_resize="auto", max_compiled_shapes=2)
    ref = EmbeddingExtractor(identity_fn, mh_params, (224, 224),
                             normalization="vggface2",
                             resize_method="cv2_linear", batch_size=2,
                             host_resize="never")
    shapes = [(50, 60), (70, 50), (90, 110), (41, 33)]
    for hw in shapes:
        img = (rng.rand(2, *hw, 3) * 255).astype(np.uint8)
        got = ex.extract_batch(img)
        want = ref.extract_batch(img)
        cos = np.sum(got * want, axis=1) / (
            np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
        assert cos.min() > 0.999999
    assert len(ex._jitted) <= 3   # 2 device-shape programs + the 224 program
    assert (224, 224) in ex._jitted
