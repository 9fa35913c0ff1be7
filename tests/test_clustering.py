"""Clustering pipeline + metrics tests."""

import numpy as np
import pytest

from hse_facerec_tf_tpu.eval.clustering_metrics import bcubed, clustering_statistics
from hse_facerec_tf_tpu.ops.distance import pairwise_euclidean
from hse_facerec_tf_tpu.pipelines.clustering import (clusters_to_labels,
                                                     get_facial_clusters)


def _blobs(rng, n_classes=5, per_class=8, dim=16, spread=0.05):
    centers = rng.randn(n_classes, dim).astype(np.float32) * 3
    feats, labels = [], []
    for c in range(n_classes):
        feats.extend(centers[c] + spread * rng.randn(per_class, dim).astype(np.float32))
        labels.extend([c] * per_class)
    feats = np.stack(feats)
    return feats, np.asarray(labels)


@pytest.fixture(scope="module")
def blob_data():
    feats, labels = _blobs(np.random.RandomState(12345))
    dist = np.array(pairwise_euclidean(feats, feats))
    np.fill_diagonal(dist, 0.0)
    return dist, labels


@pytest.mark.parametrize("method", ["scipy", "rankorder", "dbscan"])
def test_clusters_recover_blobs(blob_data, method):
    dist, labels = blob_data
    clusters = get_facial_clusters(dist, distance_threshold=1.0, method=method)
    assert len(clusters) == len(np.unique(labels))
    for cluster in clusters:
        assert len(set(labels[cluster])) == 1
    # sorted by size, descending
    sizes = [len(c) for c in clusters]
    assert sizes == sorted(sizes, reverse=True)


def test_scipy_matches_reference_hac(blob_data):
    """Our scipy path == direct scipy single-linkage fcluster (the reference's
    exact code path, facial_clustering.py:240-243)."""
    import scipy.cluster.hierarchy as hac
    from scipy.spatial.distance import squareform

    dist, labels = blob_data
    clusters = get_facial_clusters(dist, 1.0, method="scipy")
    z = hac.linkage(squareform(dist, checks=False), method="single")
    want = hac.fcluster(z, 1.0, "distance")
    got = clusters_to_labels(clusters, len(labels))
    # same partition (label values may differ)
    from sklearn.metrics import adjusted_rand_score
    assert adjusted_rand_score(want, got) == 1.0


def test_same_photo_constraint(rng):
    """Two faces from the same photo must end in different clusters
    (facial_clustering.py:244-259)."""
    feats, labels = _blobs(rng, n_classes=2, per_class=4, spread=0.01)
    dist = np.array(pairwise_euclidean(feats, feats))
    np.fill_diagonal(dist, 0.0)
    # faces 0 and 1 (same class) came from the same photo
    photo_idx = np.arange(len(labels))
    photo_idx[1] = photo_idx[0]
    clusters = get_facial_clusters(dist, 1.0, all_indices=photo_idx, method="scipy")
    for cluster in clusters:
        assert not (0 in cluster and 1 in cluster)
    # without the constraint they cluster together
    clusters2 = get_facial_clusters(dist, 1.0, method="scipy")
    assert any(0 in c and 1 in c for c in clusters2)


def test_dbscan_min_samples(blob_data):
    dist, labels = blob_data
    clusters = get_facial_clusters(dist, 1.0, no_images_in_cluster=3, method="dbscan")
    assert all(len(c) >= 3 for c in clusters)


def test_bcubed_perfect_and_degenerate():
    y = np.array([0, 0, 1, 1, 2])
    p, r, f = bcubed(y, y)
    assert p == r == f == 1.0
    # all-in-one-cluster: in the reference's argument orientation
    # (BCubed_stat(y_true, y_pred), facial_clustering_test.py:353-359)
    # "precision" averages over same-true pairs -> 1.0 here, and "recall"
    # averages over same-pred pairs -> mean class share.
    pred = np.zeros_like(y)
    p, r, f = bcubed(y, pred)
    assert p == 1.0
    assert r == pytest.approx(np.mean([2 / 5, 2 / 5, 2 / 5, 2 / 5, 1 / 5]))


def test_bcubed_matches_reference_formula(rng):
    """Vectorized bcubed == the reference's O(N²) loop implementation."""
    y_true = rng.randint(0, 4, size=30)
    y_pred = rng.randint(0, 5, size=30)

    def ref_bcubed(y_t, y_p):
        cdict = {i: {v} for i, v in enumerate(y_t)}
        ldict = {i: {v} for i, v in enumerate(y_p)}
        def mp(e1, e2):
            return min(len(cdict[e1] & cdict[e2]), len(ldict[e1] & ldict[e2])) / len(cdict[e1] & cdict[e2])
        def mr(e1, e2):
            return min(len(cdict[e1] & cdict[e2]), len(ldict[e1] & ldict[e2])) / len(ldict[e1] & ldict[e2])
        p = np.mean([np.mean([mp(e1, e2) for e2 in cdict if cdict[e1] & cdict[e2]]) for e1 in cdict])
        r = np.mean([np.mean([mr(e1, e2) for e2 in cdict if ldict[e1] & ldict[e2]]) for e1 in cdict])
        return p, r

    p_ref, r_ref = ref_bcubed(y_true, y_pred)
    p, r, _ = bcubed(y_true, y_pred)
    assert p == pytest.approx(p_ref)
    assert r == pytest.approx(r_ref)


def test_clustering_statistics(blob_data):
    dist, labels = blob_data
    clusters = get_facial_clusters(dist, 1.0, method="scipy")
    y_pred = clusters_to_labels(clusters, len(labels))
    stats = clustering_statistics(labels, y_pred)
    assert stats["ari"] == 1.0
    assert stats["v_measure"] == 1.0
    assert stats["bcubed_f"] == 1.0


def test_rankorder_native_matches_python(rng):
    """C++ rank-order core == pure-Python implementation on random geometry."""
    from hse_facerec_tf_tpu.native import rankorder as native_ro
    from hse_facerec_tf_tpu.pipelines.clustering import _rank_order_clusters

    if not native_ro.available():
        pytest.skip("no g++ toolchain")
    feats, labels = _blobs(rng, n_classes=6, per_class=7, spread=0.4)
    dist = np.array(pairwise_euclidean(feats, feats))
    np.fill_diagonal(dist, 0.0)
    want = _rank_order_clusters(dist)
    got = native_ro.rank_order_cluster_native(dist)
    canon = lambda cs: sorted(tuple(sorted(c)) for c in cs)
    assert canon(got) == canon(want)


def test_rankorder_small_n_divisor():
    """With fewer than k_norm=12 faces the normalization divisor is n (the
    neighbour-list length), not 12 — the reference's min(len(list), K)
    (facial_clustering.py:85-86). A /12 divisor at n=6 doubles every
    normalized distance and over-fragments small albums: at this geometry
    the buggy divisor loses two of the three pairs."""
    from hse_facerec_tf_tpu.native import rankorder as native_ro
    from hse_facerec_tf_tpu.pipelines.clustering import _rank_order_clusters

    feats, _ = _blobs(np.random.RandomState(0), n_classes=3, per_class=2,
                      spread=1.6)
    dist = np.array(pairwise_euclidean(feats, feats))
    np.fill_diagonal(dist, 0.0)
    canon = lambda cs: sorted(tuple(sorted(c)) for c in cs)
    got = canon(_rank_order_clusters(dist))
    assert got == [(0, 1), (2, 3), (4, 5)]
    # the buggy /12 divisor is equivalent to halving the threshold — it
    # fragments this geometry (sanity that the case discriminates)
    assert canon(_rank_order_clusters(dist, norm_threshold=0.45)) != got
    if native_ro.available():
        assert canon(native_ro.rank_order_cluster_native(dist)) == got


def test_rankorder_native_speed(rng):
    """Native core should beat the Python loop comfortably at N=300."""
    import time

    from hse_facerec_tf_tpu.native import rankorder as native_ro
    from hse_facerec_tf_tpu.pipelines.clustering import _rank_order_clusters

    if not native_ro.available():
        pytest.skip("no g++ toolchain")
    feats, _ = _blobs(rng, n_classes=30, per_class=10, spread=0.3)
    dist = np.array(pairwise_euclidean(feats, feats))
    np.fill_diagonal(dist, 0.0)
    t0 = time.perf_counter(); native_ro.rank_order_cluster_native(dist); t_n = time.perf_counter() - t0
    t0 = time.perf_counter(); _rank_order_clusters(dist); t_p = time.perf_counter() - t0
    assert t_n < t_p, (t_n, t_p)


def test_rankorder_grid_search_matches_reference_loop(rng):
    """search_rankorder_thresholds vs a literal transcription of the
    reference's 2-D grid (facial_clustering_test.py:451-472), sharing
    clustering_score so only the loop/early-stop logic is under test."""
    from hse_facerec_tf_tpu.eval.threshold_search import (
        clustering_score, search_rankorder_thresholds)

    feats, labels = _blobs(rng, n_classes=4, per_class=6)
    dist = np.array(pairwise_euclidean(feats, feats))
    np.fill_diagonal(dist, 0.0)
    datasets = [(dist, labels)]

    got = search_rankorder_thresholds(datasets)

    bestStatistic, prevStatistic = 0, 0
    bestThreshold = (0, 0)
    for distanceThreshold in np.linspace(1.02, 1.1, 9):   # reference :452
        prevStatistic = 0
        bestChanged = False
        for rankThreshold in range(12, 22, 2):
            currentStatistic = np.mean([
                clustering_score(d, y, (float(distanceThreshold), rankThreshold),
                                 "rankorder", "v_measure")
                for d, y in datasets])
            if currentStatistic > bestStatistic:
                bestStatistic = currentStatistic
                bestThreshold = (float(distanceThreshold), rankThreshold)
                bestChanged = True
            if currentStatistic <= prevStatistic:          # reference :469
                break
            prevStatistic = currentStatistic
        if not bestChanged:
            break

    assert got["best_threshold"] == bestThreshold
    assert got["best_score"] == pytest.approx(bestStatistic, abs=1e-12)


def test_cluster_cli_multi_dataset_with_search(tmp_path, capsys):
    """One CLI call over two fixture dirs: per-dataset stats, mean±std rows,
    and the grid-search table (reference test_avg_clustering +
    test_avg_clustering_with_model_selection shapes)."""
    import json

    import cv2

    from hse_facerec_tf_tpu import cli

    rng = np.random.RandomState(5)
    for d, shift in (("setA", 0), ("setB", 40)):
        for person in range(3):
            pdir = tmp_path / d / f"person{person}"
            pdir.mkdir(parents=True)
            base = np.full((96, 96, 3), 40 + shift + person * 60, np.uint8)
            for i in range(3):
                img = base + rng.randint(0, 12, base.shape).astype(np.uint8)
                cv2.imwrite(str(pdir / f"{i}.jpg"), img)

    cli.main(["cluster", str(tmp_path / "setA"), str(tmp_path / "setB"),
              "--search-threshold", "--batch-size", "4"])
    out = json.loads(capsys.readouterr().out)
    assert set(out["datasets"]) == {str(tmp_path / "setA"), str(tmp_path / "setB")}
    assert "best_threshold" in out["search"]
    assert len(out["search"]["trace"]) >= 1
    for row in ("mean", "std"):
        assert set(out[row]) == set(next(iter(out["datasets"].values())))
