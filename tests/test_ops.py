"""ops/ kernels vs cv2 / PIL / scipy golden outputs (SURVEY.md §4 test plan (a))."""

import cv2
import numpy as np
import pytest
from PIL import Image

from hse_facerec_tf_tpu.ops import distance as D
from hse_facerec_tf_tpu.ops import nms as N
from hse_facerec_tf_tpu.ops.preprocess import (normalize_caffe, normalize_mtcnn,
                                               normalize_tf, preprocess_batch)
from hse_facerec_tf_tpu.ops.resize import crop_resize_bilinear, resize


@pytest.fixture(scope="module")
def img():
    r = np.random.RandomState(12345)
    return (r.rand(97, 133, 3) * 255).astype(np.uint8)


@pytest.mark.parametrize("out_hw", [(24, 24), (48, 48), (64, 80), (224, 224)])
def test_resize_cv2_linear(img, out_hw):
    want = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize(img.astype(np.float32), out_hw, "cv2_linear"))
    # cv2 uses fixed-point uint8 arithmetic; allow ~1 LSB
    assert np.abs(got - want.astype(np.float32)).max() <= 1.0


@pytest.mark.parametrize("out_hw", [(24, 24), (48, 48), (33, 47)])
def test_resize_cv2_area(img, out_hw):
    want = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA)
    got = np.asarray(resize(img.astype(np.float32), out_hw, "cv2_area"))
    assert np.abs(got - want.astype(np.float32)).max() <= 1.0


def test_resize_area_pyramid_scale(img):
    """MTCNN pyramid scale factors (0.709^k) — reference facial_analysis.py:505."""
    h, w = img.shape[:2]
    for k in range(1, 4):
        scale = 0.709 ** k
        hs, ws = int(np.ceil(h * scale)), int(np.ceil(w * scale))
        want = cv2.resize(img, (ws, hs), interpolation=cv2.INTER_AREA)
        got = np.asarray(resize(img.astype(np.float32), (hs, ws), "cv2_area"))
        assert np.abs(got - want.astype(np.float32)).max() <= 1.0


def test_resize_pil_bilinear(img):
    pil = Image.fromarray(img).resize((224, 224), Image.BILINEAR)
    want = np.asarray(pil).astype(np.float32)
    got = np.asarray(resize(img.astype(np.float32), (224, 224), "pil_bilinear"))
    assert np.abs(got - want).max() <= 1.0


def test_resize_batched(img):
    batch = np.stack([img, img[::-1]]).astype(np.float32)
    got = np.asarray(resize(batch, (32, 32), "cv2_linear"))
    single0 = np.asarray(resize(batch[0], (32, 32), "cv2_linear"))
    np.testing.assert_allclose(got[0], single0, atol=1e-4)


def test_crop_resize_matches_cv2_crop_then_resize(img):
    """Integer-aligned boxes: gather-based crop+resize vs cv2 on the crop."""
    f = img.astype(np.float32)
    boxes = np.array([[10, 20, 74, 84], [0, 0, 48, 48]], dtype=np.float32)  # y1 x1 y2 x2
    got = np.asarray(crop_resize_bilinear(f, boxes, 24, supersample=1))
    for i, (y1, x1, y2, x2) in enumerate(boxes.astype(int)):
        crop = f[y1:y2, x1:x2]
        want = cv2.resize(crop, (24, 24), interpolation=cv2.INTER_LINEAR)
        assert np.abs(got[i] - want).max() <= 1.5


def test_normalizers(img):
    f = img.astype(np.float32)
    got = np.asarray(normalize_caffe(f))
    want = f[..., ::-1] - np.array([103.939, 116.779, 123.68], dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(normalize_mtcnn(f)), (f - 127.5) * 0.0078125, atol=1e-6)
    np.testing.assert_allclose(np.asarray(normalize_tf(f)), f / 127.5 - 1.0, atol=1e-6)


def test_preprocess_batch(img):
    batch = np.stack([img, img])
    out = np.asarray(preprocess_batch(batch, (224, 224), "vggface2"))
    assert out.shape == (2, 224, 224, 3)
    want = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    want = want[..., ::-1] - np.array([91.4953, 103.8827, 131.0912], dtype=np.float32)
    assert np.abs(out[0] - want).max() <= 1.0


def test_pairwise_distances(rng):
    a = rng.rand(13, 32).astype(np.float32)
    b = rng.rand(7, 32).astype(np.float32)
    got = np.asarray(D.pairwise_sqeuclidean(a, b))
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)

    got_chi = np.asarray(D.pairwise_chi2(a, b))
    def chi2(x, y):
        s = x + y
        return np.where(s > 0, (x - y) ** 2 / np.where(s > 0, s, 1), 0).sum()
    want_chi = np.array([[chi2(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got_chi, want_chi, rtol=1e-5)

    got_kl = np.asarray(D.pairwise_kl(a, b))
    want_kl = np.array([[((x + 1e-3) * np.log((x + 1e-3) / (y + 1e-3))).sum() for y in b] for x in a])
    np.testing.assert_allclose(got_kl, want_kl, rtol=1e-4, atol=1e-3)


def test_emd_unit_cost_equals_half_l1(rng):
    """Reference wasserstein_dist uses cost matrix (1 - I): EMD == L1/2 for
    equal-mass histograms (facerec_test.py:166-175)."""
    x = rng.rand(16); x /= x.sum()
    y = rng.rand(16); y /= y.sum()
    got = float(D.emd_1d(x.astype(np.float32), y.astype(np.float32)))
    np.testing.assert_allclose(got, 0.5 * np.abs(x - y).sum(), rtol=1e-5)


def test_nearest_neighbor(rng):
    gallery = rng.rand(20, 16).astype(np.float32)
    labels = np.arange(20) % 5
    probes = gallery[[3, 7, 11]] + rng.randn(3, 16).astype(np.float32) * 1e-3
    pred, dist = D.nearest_neighbor(gallery, labels, probes)
    np.testing.assert_array_equal(np.asarray(pred), labels[[3, 7, 11]])
    assert np.asarray(dist).max() < 0.1


@pytest.mark.parametrize("method", ["union", "min"])
def test_nms_mask_vs_numpy(rng, method):
    n = 60
    centers = rng.rand(n, 2) * 100
    sizes = rng.rand(n, 2) * 30 + 5
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    # pad with invalid entries
    pad = 20
    boxes_p = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
    scores_p = np.concatenate([scores, np.zeros((pad,), np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    keep = np.asarray(N.nms_mask(boxes_p, scores_p, valid, 0.5, method))
    want = N.nms_numpy(boxes, scores, 0.5, method)
    got_idx = np.where(keep)[0]
    assert set(got_idx.tolist()) == set(want.tolist())
