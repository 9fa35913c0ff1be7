"""End-to-end detector pipeline vs host golden cascade on the shipped fixture."""

import cv2
import numpy as np
import pytest

from hse_facerec_tf_tpu.models.mtcnn import import_mtcnn_params
from hse_facerec_tf_tpu.pipelines.detector import MTCNNDetector, pyramid_scales

from .conftest import MTCNN_PB, TEST_IMAGE
from .golden_mtcnn import detect_golden


@pytest.fixture(scope="module")
def params():
    return import_mtcnn_params(str(MTCNN_PB))


@pytest.fixture(scope="module")
def test_img(fixture_img_640):
    return fixture_img_640


def _iou(a, b):
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1 + 1) * max(0.0, y2 - y1 + 1)
    area = lambda r: (r[2] - r[0] + 1) * (r[3] - r[1] + 1)
    return inter / (area(a) + area(b) - inter)


def test_pyramid_scales():
    scales = pyramid_scales(480, 640, minsize=40)
    assert scales[0] == pytest.approx(12.0 / 40)
    assert all(scales[i + 1] == pytest.approx(scales[i] * 0.709) for i in range(len(scales) - 1))
    # terminates when min-side support < 12px
    assert 480 * scales[-1] >= 12 > 480 * scales[-1] * 0.709


def test_detector_vs_golden_on_fixture(params, test_img):
    golden_boxes, golden_points = detect_golden(params, test_img, minsize=40)
    det = MTCNNDetector(params, minsize=40)
    boxes, points = det.detect(test_img)

    assert len(golden_boxes) > 0, "fixture should contain at least one face"
    assert len(boxes) == len(golden_boxes)

    # match each golden box to a detected box with high IoU and close score
    used = set()
    for gb in golden_boxes:
        best, best_iou = None, 0.0
        for i, bb in enumerate(boxes):
            if i in used:
                continue
            iou = _iou(gb, bb)
            if iou > best_iou:
                best, best_iou = i, iou
        assert best_iou > 0.8, f"golden box {gb} unmatched (best IoU {best_iou})"
        assert abs(boxes[best][4] - gb[4]) < 0.05
        used.add(best)

    # landmarks within a few pixels of golden
    for j, gp in enumerate(golden_points.T):
        dists = np.abs(points.T - gp).max(axis=1)
        assert dists.min() < 4.0


def test_detector_vs_golden_fuzz_composites(params, test_img, rng):
    """Randomized parity fuzz: face crops from the fixture composited onto
    noise backgrounds at random positions/scales — box count, IoU, and score
    agreement with the host golden cascade on every composite (one shared
    image shape, so the device program compiles once)."""
    faces_src = [test_img[110:210, 265:355],      # the boy
                 test_img[200:280, 575:665]]      # the adult
    det = MTCNNDetector(params, minsize=40)
    for seed in range(4):
        r = np.random.RandomState(seed)
        canvas = (r.rand(240, 320, 3) * 255).astype(np.uint8)
        n_faces = r.randint(1, 4)
        for _ in range(n_faces):
            crop = faces_src[r.randint(len(faces_src))]
            size = r.randint(60, 100)
            face = cv2.resize(crop, (size, size))
            y = r.randint(0, 240 - size)
            x = r.randint(0, 320 - size)
            canvas[y:y + size, x:x + size] = face
        golden_boxes, _ = detect_golden(params, canvas, minsize=40)
        boxes, _ = det.detect(canvas)
        assert len(boxes) == len(golden_boxes), (seed, len(boxes), len(golden_boxes))
        used = set()
        for gb in golden_boxes:
            ious = [(_iou(gb, bb), i) for i, bb in enumerate(boxes) if i not in used]
            best_iou, best = max(ious, default=(0.0, None))
            assert best_iou > 0.8, (seed, gb, best_iou)
            assert abs(boxes[best][4] - gb[4]) < 0.05
            used.add(best)


def test_detector_no_faces(params, rng):
    noise = (rng.rand(160, 160, 3) * 255).astype(np.uint8)
    det = MTCNNDetector(params, minsize=40)
    boxes, points = det.detect(noise)
    assert boxes.shape == (0, 5), boxes   # uniform noise: nothing survives O-Net
    assert points.shape == (10, 0)


def test_detector_small_image(params):
    det = MTCNNDetector(params, minsize=40)
    tiny = np.zeros((20, 20, 3), dtype=np.uint8)
    boxes, _ = det.detect(tiny)  # pyramid empty -> no faces, no crash
    assert len(boxes) == 0


def test_detect_batch_matches_single(params, test_img):
    det = MTCNNDetector(params, minsize=40)
    batch = np.stack([test_img, test_img[:, ::-1]])  # image + mirror
    results = det.detect_batch(batch)
    assert len(results) == 2
    single0, _ = det.detect(test_img)
    boxes0, points0 = results[0]
    assert len(boxes0) == len(single0)
    for b in single0:
        ious = [_iou(b, bb) for bb in boxes0]
        assert max(ious) > 0.99


def test_caps_scale_with_image_area(params):
    """Static box budgets scale with image area relative to 640x480:
    identity at or below VGA (bit-identical HLO for the bench shapes),
    proportional above, clamped at 16x."""
    det = MTCNNDetector(params)
    assert det.caps_for(480, 640) == (384, 128, 64)
    assert det.caps_for(240, 320) == (384, 128, 64)
    lvl, s2, s3 = det.caps_for(588, 784)      # the reference fixture, 1.5x
    assert (lvl, s2, s3) == (608, 224, 128)
    # 4K hits the 16x clamp; anything larger stays there
    assert det.caps_for(2160, 3840) == det.caps_for(4320, 7680) \
        == (6144, 2048, 1024)
    # escalation tiers double every budget per step
    assert det.caps_for(480, 640, tier=1) == (768, 256, 128)
    assert det.caps_for(480, 640, tier=2) == (1536, 512, 256)


def test_caps_absolute_ceilings_stop_escalation(params):
    """Each budget is clamped at an absolute ceiling (level 8192 / stage2
    2048 / stage3 1024) so a high tier on a huge image can never
    materialize a multi-GB NMS overlap matrix; once every budget sits at
    its ceiling, further tiers are identical and detect()'s escalation
    loop stops early (detector.py caps_for docstring)."""
    det = MTCNNDetector(params)
    # 4K tier 1: stage2/stage3 already ceiling-clamped, level still growing
    assert det.caps_for(2160, 3840, tier=1) == (8192, 2048, 1024)
    # tier 2 == tier 1: all three at ceiling -> escalation has nothing
    # bigger to compile, the loop's caps-equality early-stop must fire
    assert det.caps_for(2160, 3840, tier=2) == det.caps_for(2160, 3840, tier=1)
    # explicit ctor budgets ABOVE a ceiling are respected, never reduced
    big = MTCNNDetector(params, max_stage2=4096)
    assert det.caps_for(2160, 3840)[1] == 2048
    assert big.caps_for(2160, 3840)[1] >= 4096


def test_detector_box_budget_saturation(params, test_img):
    """>64-face synthetic crowd at 800x720: a density the area-scaled
    budgets alone cannot hold (137 stage-2 NMS survivors vs the scaled cap
    of 128) — tier escalation must recover every face the unbounded golden
    cascade finds, and with escalation disabled the same run must saturate
    LOUDLY (truncated flag + warning naming the effective caps)."""
    import warnings

    # tile one face crop into a 10x9 grid (90 faces)
    crop = test_img[110:210, 265:355]      # the boy's face, with margin
    crop = cv2.resize(crop, (80, 80))
    grid = np.tile(crop, (10, 9, 1))       # (800, 720, 3)
    assert grid.shape == (800, 720, 3)

    golden_boxes, _ = detect_golden(params, grid, minsize=40)
    assert len(golden_boxes) > 64, f"expected a >64-face crowd, golden found {len(golden_boxes)}"

    det = MTCNNDetector(params, minsize=40)
    boxes, _ = det.detect(grid)
    assert not det.last_truncated
    assert len(boxes) == len(golden_boxes)
    # the crowd is dense enough that tier 0 truncated and tier 1 compiled
    assert (800, 720, 1) in det._jitted

    fixed = MTCNNDetector(params, minsize=40, max_escalations=0)
    eff = fixed.caps_for(800, 720)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        boxes_f, _ = fixed.detect(grid)
    assert fixed.last_truncated
    assert len(boxes_f) <= eff[2]
    msgs = [str(w.message) for w in caught]
    assert any("box budget saturated" in m and f"stage3={eff[2]}" in m
               for m in msgs)
