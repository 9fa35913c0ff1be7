"""Face identification: on-device 1-NN / k-NN and the reference's protocols.

TPU-native replacement for the reference's sklearn-based evaluation
(``facerec_test.py:200-207,269-288,401-432``): features are L2-normalized on
device, the gallery×probe distance matrix is one MXU matmul, and prediction is
argmin/top-k + majority vote — no per-pair Python.

Protocol reproduction (for accuracy parity with BASELINE.md):
  - 50 % StratifiedShuffleSplit, seed 0, 1 split (``classifier_tester`` :200-207)
  - singleton-class removal before splitting (:408-414)
  - single-gallery-image-per-class protocol (``get_single_image_per_class_cv``
    :177-198, seeds 0, 10 splits)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import l2_normalize, nearest_neighbor, top_k_neighbors


class KNNIdentifier:
    """k-NN classifier over L2-normalized embeddings, fully on device.

    ``mesh``: optional device mesh — k=1 euclidean prediction then runs the
    gallery-sharded distributed sweep (``parallel/knn.py``: gallery split
    over the 'data' axis, one (devices, M) all-gather combine) instead of
    the single-device matmul.

    ``quantized``: store the gallery int8 (symmetric global scale,
    ``ops/pallas/knn.py::quantize_embeddings`` — 4× less device memory per
    enrolled identity) and run k=1 euclidean prediction through the int8 MXU
    kernel (2× the bf16 peak on v5e) or its exact XLA twin off-TPU.
    Distances are exact squared-L2 between the dequantized embeddings; for
    L2-normalized embeddings the quantization noise (~1e-2 of the
    same-vs-cross-class margin) does not move top-1 decisions
    (tests/test_pallas_knn.py pins this)."""

    def __init__(self, k: int = 1, metric: str = "euclidean", normalize: bool = True,
                 mesh=None, quantized: bool = False):
        if quantized and (k != 1 or metric != "euclidean"):
            raise ValueError("quantized gallery supports k=1 euclidean only")
        self.k = k
        self.metric = metric
        self.normalize = normalize
        self.mesh = mesh
        self.quantized = quantized
        self._gallery = None
        self._labels = None        # host numpy: used for host indexing only
        self._labels_dev = None    # device copy for the on-device argmin path

    def fit(self, features: np.ndarray, labels: np.ndarray) -> "KNNIdentifier":
        g = jnp.asarray(features, jnp.float32)
        if self.normalize:
            g = l2_normalize(g)
        if self.quantized and self.mesh is None:
            from ..ops.pallas.knn import quantize_embeddings

            self._gallery = quantize_embeddings(g)     # (q int8, scale)
        else:
            self._gallery = g   # mesh path quantizes inside the sharded sweep
        # labels stay HOST-side: 3 of the 4 predict paths only index with
        # them on host, and re-downloading a device copy per predict costs a
        # ~30 ms round trip over the tunnel each call
        self._labels = np.asarray(labels)
        self._labels_dev = jnp.asarray(self._labels)
        return self

    def predict(self, probes: np.ndarray) -> np.ndarray:
        p = jnp.asarray(probes, jnp.float32)
        if self.normalize:
            p = l2_normalize(p)
        if self.k == 1:
            if self.mesh is not None and self.metric == "euclidean":
                from ..parallel.knn import nearest_neighbor_sharded

                _, idx = nearest_neighbor_sharded(p, self._gallery, self.mesh,
                                                  int8=self.quantized)
                return self._labels[np.asarray(idx)]
            if self.quantized:
                from ..ops.pallas.knn import nearest_neighbor_auto

                _, idx = nearest_neighbor_auto(p, self._gallery, int8=True)
                return self._labels[np.asarray(idx)]
            pred, _ = nearest_neighbor(self._gallery, self._labels_dev, p,
                                       self.metric)
            return np.asarray(pred)
        idx, _ = top_k_neighbors(self._gallery, p, self.k, self.metric)
        votes = self._labels[np.asarray(idx)]  # (M, k)
        out = np.empty(len(votes), dtype=votes.dtype)
        for i, row in enumerate(votes):
            vals, counts = np.unique(row, return_counts=True)
            out[i] = vals[np.argmax(counts)]
        return out

    def score(self, probes: np.ndarray, labels: np.ndarray) -> float:
        return float(np.mean(self.predict(probes) == np.asarray(labels)))


def pca_project(train: np.ndarray, test: np.ndarray, n_components: int,
                ) -> Tuple[np.ndarray, np.ndarray]:
    """PCA fit on train, project both — on device via SVD (the reference's
    1-NN+PCA pipeline, ``facerec_test.py:418-424``)."""
    x = jnp.asarray(train, jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    _, _, vt = jnp.linalg.svd(x - mean, full_matrices=False)
    comps = vt[:n_components].T
    proj = lambda a: np.asarray((jnp.asarray(a, jnp.float32) - mean) @ comps)
    return proj(train), proj(test)


def drop_singleton_classes(features: np.ndarray, labels: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Remove classes with a single sample and re-encode labels 0..C-1
    (reference ``facerec_test.py:408-414``)."""
    labels = np.asarray(labels)
    vals, counts = np.unique(labels, return_counts=True)
    keep_classes = set(vals[counts > 1].tolist())
    mask = np.array([l in keep_classes for l in labels])
    kept = labels[mask]
    remap = {v: i for i, v in enumerate(np.unique(kept))}
    return features[mask], np.array([remap[l] for l in kept])


def stratified_split_eval(features: np.ndarray, labels: np.ndarray,
                          classifier: Optional[KNNIdentifier] = None,
                          test_size: float = 0.5, seed: int = 0,
                          n_splits: int = 1) -> Tuple[float, float]:
    """The reference's ``classifier_tester`` protocol: StratifiedShuffleSplit
    (sklearn, same seed → same split), accuracy mean/std."""
    from sklearn.model_selection import StratifiedShuffleSplit

    classifier = classifier or KNNIdentifier(k=1)
    sss = StratifiedShuffleSplit(n_splits=n_splits, test_size=test_size,
                                 random_state=seed)
    accs = []
    for tr, te in sss.split(features, labels):
        classifier.fit(features[tr], labels[tr])
        accs.append(classifier.score(features[te], labels[te]))
    return float(np.mean(accs)), float(np.std(accs))


def single_image_per_class_splits(labels: np.ndarray, n_splits: int = 10,
                                  seed: int = 0):
    """Gallery = 1 random image per class, probe = rest
    (reference ``get_single_image_per_class_cv`` :177-198).

    Returns the list of (train, test) index pairs, built EAGERLY: the
    reference seeds the global numpy RNG once and generates every split in
    one uninterrupted loop (:180-190), so all shuffles must run before any
    consumer code (e.g. an unseeded RandomForest) can touch np.random —
    a lazy generator would silently desync the reference-identical
    shuffle sequence."""
    labels = np.asarray(labels)
    inds = np.arange(len(labels))
    # intentionally seeds/consumes the GLOBAL numpy RNG: reproducing the
    # reference's accuracy numbers requires the identical shuffle sequence.
    np.random.seed(seed)
    splits = []
    for _ in range(n_splits):
        tr, te = [], []
        for lbl in np.unique(labels):
            tmp = inds[labels == lbl].copy()
            np.random.shuffle(tmp)
            tr.extend(tmp[:1])
            te.extend(tmp[1:])
        splits.append((np.asarray(tr), np.asarray(te)))
    return splits


def single_image_eval(features: np.ndarray, labels: np.ndarray,
                      n_splits: int = 10, seed: int = 0) -> Tuple[float, float]:
    accs = []
    knn = KNNIdentifier(k=1)
    for tr, te in single_image_per_class_splits(labels, n_splits, seed):
        knn.fit(features[tr], labels[tr])
        accs.append(knn.score(features[te], labels[te]))
    return float(np.mean(accs)), float(np.std(accs))


def gallery_probe_eval(gallery_features, gallery_labels, probe_features,
                       probe_labels, k: int = 1,
                       quantized: bool = False) -> float:
    """Separate Gallery/Probe directory protocol
    (``tf_train_test_recognition`` :220-288). ``quantized`` enrolls the
    gallery int8 (k=1 only; see ``KNNIdentifier``)."""
    knn = KNNIdentifier(k=k, quantized=quantized).fit(gallery_features,
                                                      gallery_labels)
    return knn.score(probe_features, probe_labels)


def gallery_probe_suite(gallery_features, gallery_labels, probe_features,
                        probe_labels, pca_components: int = 16,
                        rf_seed: Optional[int] = None) -> dict:
    """The reference's full gallery/probe classifier comparison
    (``facerec_test.py:270-288``): 1-NN / 3-NN ± PCA(16), Random Forest
    (100 trees, depth 10), SVC, LinearSVC ± PCA(16) — each fit on the RAW
    gallery features and scored on the probe set (the reference computes
    L2-normalized copies at :264-267 but fits the classifiers on the
    un-normalized arrays).

    The k-NN rows run on device (MXU distance matmul + top-k); the sklearn
    estimators are host-side, as the reference's are. ``rf_seed`` pins the
    forest's RNG for reproducible tests (the reference leaves it unseeded).
    """
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.svm import SVC, LinearSVC

    Xg = np.asarray(gallery_features, np.float32)
    Xp = np.asarray(probe_features, np.float32)
    yg = np.asarray(gallery_labels)
    yp = np.asarray(probe_labels)

    results = {}
    Xg_pca, Xp_pca = pca_project(Xg, Xp, pca_components)
    for k in (1, 3):
        knn = KNNIdentifier(k=k, normalize=False).fit(Xg, yg)
        results[f"{k}-NN"] = knn.score(Xp, yp)
        knn_p = KNNIdentifier(k=k, normalize=False).fit(Xg_pca, yg)
        results[f"{k}-NN+PCA"] = knn_p.score(Xp_pca, yp)

    def sk_score(clf, xg, xp):
        clf.fit(xg, yg)
        return float(np.mean(clf.predict(xp) == yp))

    results["rf"] = sk_score(
        RandomForestClassifier(n_estimators=100, max_depth=10,
                               random_state=rf_seed), Xg, Xp)
    results["svm"] = sk_score(SVC(), Xg, Xp)
    results["linear svm"] = sk_score(LinearSVC(), Xg, Xp)
    results["linear svm+PCA"] = sk_score(LinearSVC(), Xg_pca, Xp_pca)
    return results
