"""Fused analyzer + album organizer end-to-end tests on the shipped fixture."""

import os
import shutil
import time

import cv2
import numpy as np
import pytest

from hse_facerec_tf_tpu.config import AlbumConfig
from hse_facerec_tf_tpu.pipelines.album import AlbumOrganizer
from hse_facerec_tf_tpu.pipelines.analyzer import FacialAnalyzer
from hse_facerec_tf_tpu.pipelines.fusion import dempster_shafer_gender

from .conftest import AGEGENDER_PB, MTCNN_PB, TEST_IMAGE


@pytest.fixture(scope="module")
def analyzer():
    return FacialAnalyzer.from_reference_models(str(MTCNN_PB), str(AGEGENDER_PB),
                                                minsize=40)


@pytest.fixture(scope="module")
def fixture_img(fixture_img_640):
    return fixture_img_640


def test_analyzer_finds_faces(analyzer, fixture_img):
    faces = analyzer.analyze(fixture_img)
    assert len(faces) >= 1
    for f in faces:
        x1, y1, x2, y2 = f.bbox
        assert 0 <= x1 < x2 <= fixture_img.shape[1]
        assert 0 <= y1 < y2 <= fixture_img.shape[0]
        assert 1.0 <= f.age <= 101.0
        assert 0.0 <= f.gender_prob <= 1.0
        assert f.identity.shape == (1024,)
        assert np.linalg.norm(f.identity) > 0


def test_analyzer_head_compaction_fallback(analyzer, fixture_img):
    """A head_batch smaller than the face count must trigger the full-width
    re-run and produce the same results as a roomy budget (analyzer.py
    compacts head compute to the first head_batch valid boxes)."""
    small = FacialAnalyzer.from_reference_models(str(MTCNN_PB), str(AGEGENDER_PB),
                                                 minsize=40, head_batch=2)
    want = analyzer.analyze(fixture_img)
    got = small.analyze(fixture_img)
    assert len(want) > 2          # fixture has 4 faces -> budget 2 saturates
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a.bbox == b.bbox
        assert a.age == pytest.approx(b.age, abs=1e-4)
        assert a.gender_prob == pytest.approx(b.gender_prob, abs=1e-5)
        np.testing.assert_allclose(a.identity, b.identity, atol=1e-4)


def test_analyze_batch_matches_single(analyzer, fixture_img, rng):
    """The vmapped fused batch program must reproduce the single-image
    program's results lane-for-lane, including a no-face lane."""
    img2 = np.clip(fixture_img.astype(np.int16) + 8, 0, 255).astype(np.uint8)
    noise = (rng.rand(*fixture_img.shape) * 255).astype(np.uint8)
    batch = np.stack([fixture_img, img2, noise])
    got = analyzer.analyze_batch(batch)
    want = [analyzer.analyze(im) for im in batch]
    assert [len(g) for g in got] == [len(w) for w in want]
    assert len(got[0]) >= 2 and len(got[2]) == 0
    for g_faces, w_faces in zip(got, want):
        for g, w in zip(g_faces, w_faces):
            assert g.bbox == w.bbox
            assert g.age == pytest.approx(w.age, abs=1e-4)
            assert g.gender_prob == pytest.approx(w.gender_prob, abs=1e-5)
            np.testing.assert_allclose(g.identity, w.identity, atol=1e-3)


def test_analyze_batch_head_compaction_fallback(fixture_img):
    """A lane with more valid faces than the compact head budget must be
    re-analyzed through the full-width single-image path."""
    small = FacialAnalyzer.from_reference_models(str(MTCNN_PB), str(AGEGENDER_PB),
                                                 minsize=40, head_batch=2)
    got = small.analyze_batch(np.stack([fixture_img, fixture_img]))
    want = small.analyze(fixture_img)
    assert len(want) > 2
    for g_faces in got:
        assert [f.bbox for f in g_faces] == [f.bbox for f in want]
        for g, w in zip(g_faces, want):
            assert g.age == pytest.approx(w.age, abs=1e-4)


class _CropContentHeads:
    """Deterministic heads for budget/fallback tests (no multihead compile)."""

    identity_dim = 2
    params = {}

    def apply(self, params, crops):
        ages = crops.mean(axis=(1, 2, 3)) + 1.0
        gender = crops[:, 0, 0, 0] / 255.0
        identity = crops.mean(axis=(1, 2))[:, :2]
        return ages, gender, identity


def test_analyze_batch_compact_fallback(fixture_img):
    """The cross-lane-compacted batch path must fall back to the
    single-image program for lanes whose faces overflow the GLOBAL head
    budget — every face still gets real head outputs."""
    from hse_facerec_tf_tpu.models.mtcnn import import_mtcnn_params

    tiled = np.concatenate([fixture_img] * 3, axis=0)   # 12 faces
    an = FacialAnalyzer(import_mtcnn_params(str(MTCNN_PB)),
                        heads=_CropContentHeads(), minsize=40,
                        head_batch=16, max_stage3=16, batch_head_total=8)
    want = an.analyze(tiled)              # budget 16 >= all faces: no fallback
    assert len(want) > 8                  # exceeds the global batch budget
    got = an.analyze_batch(tiled[None])[0]
    assert [f.bbox for f in got] == [f.bbox for f in want]
    for g, w_ in zip(got, want):
        assert g.age == pytest.approx(w_.age, abs=1e-4)
        assert g.age > 0.5                # fallback produced real head outputs


def test_analyze_batch_vmapped_fallback_gate(fixture_img):
    """Regression (vmapped batch path, used by oversample/mesh modes): with
    head_batch >= max_stage3 the lanes still run at the HALVED batch budget,
    so the fallback gate must compare that budget — not head_batch — or
    truncated lanes silently return zeroed head outputs."""
    from hse_facerec_tf_tpu.models.mtcnn import import_mtcnn_params

    tiled = np.concatenate([fixture_img] * 3, axis=0)   # 12 faces
    an = FacialAnalyzer(import_mtcnn_params(str(MTCNN_PB)),
                        heads=_CropContentHeads(), minsize=40,
                        head_batch=16, max_stage3=16, oversample=True)
    assert an._batch_head_budget() == 8
    want = an.analyze(tiled)
    assert len(want) > 8
    got = an.analyze_batch(tiled[None])[0]
    assert [f.bbox for f in got] == [f.bbox for f in want]
    for g, w_ in zip(got, want):
        assert g.age == pytest.approx(w_.age, abs=1e-4)
        assert g.age > 0.5


def test_analyze_escalates_detector_caps(fixture_img):
    """A 90-face crowd saturates the area-scaled detector budgets at tier 0
    (137 stage-2 NMS survivors vs the scaled cap of 128); the fused analyze
    path must escalate to doubled-cap tiers like ``MTCNNDetector.detect``
    instead of silently truncating, and ``analyze_batch`` must route such
    lanes through the escalating single-image path."""
    import warnings

    from hse_facerec_tf_tpu.models.mtcnn import import_mtcnn_params
    from hse_facerec_tf_tpu.pipelines.detector import MTCNNDetector

    crop = cv2.resize(fixture_img[110:210, 265:355], (80, 80))
    grid = np.tile(crop, (10, 9, 1))        # (800, 720, 3)

    params = import_mtcnn_params(str(MTCNN_PB))
    det = MTCNNDetector(params, minsize=40)
    boxes, _ = det.detect(grid)   # escalates; golden-equal in test_detector
    assert not det.last_truncated and len(boxes) > 64

    an = FacialAnalyzer(params, heads=_CropContentHeads(), minsize=40,
                        head_batch=128)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        faces = an.analyze(grid)
    assert len(faces) == len(boxes)
    assert not an.detector.last_truncated
    assert (800, 720, 1) in an.detector._jitted    # tier-1 detect compiled
    assert not any("box budget saturated" in str(w.message) for w in caught)
    for f in faces:
        assert f.age > 0.5            # real head outputs for every face

    got = an.analyze_batch(grid[None])[0]
    assert [f.bbox for f in got] == [f.bbox for f in faces]
    assert not an.detector.last_truncated


def test_analyze_batch_sharded_mesh(analyzer, fixture_img, rng):
    """analyze_batch GSPMD-sharded over an 8-device 'data' mesh must equal
    the single-device batch path (pure batch DP — the cascade has no
    cross-image communication)."""
    from hse_facerec_tf_tpu.models.mtcnn import import_mtcnn_params
    from hse_facerec_tf_tpu.models.multihead import import_multihead_params
    from hse_facerec_tf_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()   # 8 virtual CPU devices (conftest)
    assert mesh.devices.size == 8
    small = cv2.resize(fixture_img, (320, 240))
    imgs = np.stack([np.clip(small.astype(np.int16) + 4 * i, 0, 255
                             ).astype(np.uint8) for i in range(8)])
    sharded = FacialAnalyzer(import_mtcnn_params(str(MTCNN_PB)),
                             import_multihead_params(str(AGEGENDER_PB)),
                             minsize=40, mesh=mesh)
    plain = FacialAnalyzer(import_mtcnn_params(str(MTCNN_PB)),
                           import_multihead_params(str(AGEGENDER_PB)),
                           minsize=40)
    got = sharded.analyze_batch(imgs)
    want = plain.analyze_batch(imgs)
    # mesh mode must run the per-shard COMPACTED program, not the
    # per-lane-budget vmapped downgrade (VERDICT-2 #7)
    assert any(k[0] == "cbatch_mesh" for k in sharded._jitted)
    assert [len(g) for g in got] == [len(w) for w in want]
    assert sum(len(g) for g in got) >= 8
    for g_faces, w_faces in zip(got, want):
        for g, w in zip(g_faces, w_faces):
            assert g.bbox == w.bbox
            assert g.age == pytest.approx(w.age, abs=1e-4)
            np.testing.assert_allclose(g.identity, w.identity, atol=1e-3)

    # a lane count that doesn't divide the mesh is zero-padded up to a mesh
    # multiple and still matches
    got6 = sharded.analyze_batch(imgs[:6])
    want6 = plain.analyze_batch(imgs[:6])
    assert [len(g) for g in got6] == [len(w) for w in want6]
    for g_faces, w_faces in zip(got6, want6):
        for g, w in zip(g_faces, w_faces):
            assert g.bbox == w.bbox
            np.testing.assert_allclose(g.identity, w.identity, atol=1e-3)


def test_analyzer_matches_host_crop_path(analyzer, fixture_img):
    """Fused on-device crop+multihead ≈ host cv2 crop + direct model call
    (the reference's two-step path, facial_analysis.py:264-284)."""
    import jax

    from hse_facerec_tf_tpu.models.multihead import (expected_age_top_k,
                                                     multihead_apply)

    faces = analyzer.analyze(fixture_img)
    f = faces[0]
    x1, y1, x2, y2 = f.bbox
    crop = fixture_img[y1:y2, x1:x2]
    resized = cv2.resize(crop, (224, 224)).astype(np.float32)
    x = resized[..., ::-1] - np.array([103.939, 116.779, 123.68], np.float32)
    out = jax.jit(multihead_apply)(analyzer.mh_params, x[None])
    age = 1.0 + float(expected_age_top_k(out.age_probs, 2)[0])
    a = f.identity / np.linalg.norm(f.identity)
    b = np.asarray(out.identity[0])
    b = b / np.linalg.norm(b)
    assert float(a @ b) > 0.98
    assert abs(age - f.age) < 3.0
    assert abs(float(out.gender_prob[0]) - f.gender_prob) < 0.1


def test_analyzer_rotation_retry(analyzer, fixture_img):
    rotated = np.ascontiguousarray(np.rot90(fixture_img, 1))  # 90° ccw
    faces, rot = analyzer.analyze_with_rotations(rotated)
    assert len(faces) >= 1
    assert rot in (90, 270)


def test_dempster_shafer_gender():
    assert dempster_shafer_gender([0.95, 0.9, 0.85]) == 0   # male evidence
    assert dempster_shafer_gender([0.05, 0.1, 0.15]) == 1   # female evidence


def test_album_organizer(analyzer, fixture_img, tmp_path_factory, rng):
    album = tmp_path_factory.mktemp("album")
    # two photos containing the same people + one no-face photo
    img2 = fixture_img.copy()
    img2[:, :, :] = np.clip(img2.astype(np.int16) + 8, 0, 255).astype(np.uint8)
    noise = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(album / "a.jpg"), cv2.cvtColor(fixture_img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "b.jpg"), cv2.cvtColor(img2, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "c.jpg"), cv2.cvtColor(noise, cv2.COLOR_RGB2BGR))
    # distinct mtimes 3 days apart (date-span filter needs >= 2 days)
    now = time.time()
    os.utime(album / "a.jpg", (now - 3 * 86400, now - 3 * 86400))
    os.utime(album / "b.jpg", (now, now))

    cfg = AlbumConfig(min_no_photos=2, min_days_difference=2, distance_threshold=0.9, minsize=40)
    org = AlbumOrganizer(analyzer, cfg)
    result = org.process_album(str(album), use_cache=False)

    assert result["n_photos"] == 3
    assert result["n_faces"] >= 2
    assert len(result["clusters"]) >= 1
    assert all(g in ("male", "female") for g in result["cluster_genders"])

    res_dir = album / "clusters"
    cluster_dirs = [d for d in os.listdir(res_dir)
                    if d != "public" and os.path.isdir(res_dir / d)]
    assert len(cluster_dirs) == len(result["clusters"])
    for d in cluster_dirs:
        parts = d.split(" ")
        assert len(parts) == 3 and parts[1] in ("male", "female")
        assert len(os.listdir(res_dir / d)) >= 2
    # the noise photo has no clustered/big face -> public, downscaled to width 200
    pub = res_dir / "public"
    assert "c.jpg" in os.listdir(pub)
    assert cv2.imread(str(pub / "c.jpg")).shape[1] == 200


def test_album_batched_scan_matches_sequential(analyzer, fixture_img,
                                               tmp_path_factory, rng):
    """Batched same-shape analysis (with partial-bucket padding and the
    no-face fallback) must produce the same album features as the
    reference-style photo-at-a-time loop."""
    album = tmp_path_factory.mktemp("album_batched")
    img2 = np.clip(fixture_img.astype(np.int16) + 8, 0, 255).astype(np.uint8)
    noise = (rng.rand(240, 320, 3) * 255).astype(np.uint8)   # different shape
    cv2.imwrite(str(album / "a.jpg"), cv2.cvtColor(fixture_img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "b.jpg"), cv2.cvtColor(img2, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "c.jpg"), cv2.cvtColor(noise, cv2.COLOR_RGB2BGR))

    batched = AlbumOrganizer(analyzer, AlbumConfig(minsize=40), analyze_batch=2)
    seq = AlbumOrganizer(analyzer, AlbumConfig(minsize=40), analyze_batch=1)
    fb = batched.scan_album(str(album), use_cache=False)
    fs = seq.scan_album(str(album), use_cache=False)
    assert fb.indices == fs.indices
    np.testing.assert_allclose(fb.features, fs.features, atol=1e-3)
    np.testing.assert_allclose(fb.born_years, fs.born_years, atol=1e-3)
    assert fb.private_photo_indices == fs.private_photo_indices


def test_album_batched_rotation_retry_matches_sequential(
        analyzer, fixture_img, tmp_path_factory, rng):
    """A rotated photo in a batched scan recovers its faces through the
    BATCHED rotation retry (``_batched_rotation_retry`` — shape-bucketed
    fused passes, 90° then 270°) with the same results as the sequential
    per-photo ``analyze_with_rotations`` loop; face-less photos still end
    empty after both rotations."""
    album = tmp_path_factory.mktemp("album_rot_retry")
    rotated = np.ascontiguousarray(np.rot90(fixture_img, 1))   # 90° cw photo
    noise = (rng.rand(rotated.shape[0], rotated.shape[1], 3) * 255
             ).astype(np.uint8)
    cv2.imwrite(str(album / "a.jpg"), cv2.cvtColor(rotated, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "b.jpg"), cv2.cvtColor(fixture_img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "c.jpg"), cv2.cvtColor(noise, cv2.COLOR_RGB2BGR))

    batched = AlbumOrganizer(analyzer, AlbumConfig(minsize=40), analyze_batch=2)
    seq = AlbumOrganizer(analyzer, AlbumConfig(minsize=40), analyze_batch=1)
    fb = batched.scan_album(str(album), use_cache=False)
    fs = seq.scan_album(str(album), use_cache=False)
    assert fb.indices == fs.indices
    assert len(fb.indices) >= 2          # the rotated photo's faces came back
    np.testing.assert_allclose(fb.features, fs.features, atol=1e-3)
    np.testing.assert_allclose(fb.born_years, fs.born_years, atol=1e-3)


def test_analyze_batch_rotations_pair_matches_two_pass(analyzer, fixture_img,
                                                       rng):
    """``analyze_batch_rotations_padded`` (ONE upright upload, device-side
    rot90/rot270, both cascades in one program) must reproduce the two-pass
    form it replaces: ``analyze_batch_padded`` over host-rotated copies per
    rotation. Device and host rot90 are the same exact reindexing, so
    results must agree to numerical noise."""
    rotated = np.ascontiguousarray(np.rot90(fixture_img, 1))   # 90° cw photo
    noise = (rng.rand(*rotated.shape) * 255).astype(np.uint8)
    imgs = np.stack([rotated, noise])

    pairs = analyzer.analyze_batch_rotations_padded(imgs, 2)
    ref90 = analyzer.analyze_batch_padded(
        np.stack([np.ascontiguousarray(np.rot90(im, 3)) for im in imgs]), 2)
    ref270 = analyzer.analyze_batch_padded(
        np.stack([np.ascontiguousarray(np.rot90(im, 1)) for im in imgs]), 2)

    assert len(pairs) == 2
    # the rotated fixture photo recovers its faces in the 90° view
    assert len(pairs[0][0]) == len(ref90[0]) > 0
    for got, want in zip(pairs[0][0], ref90[0]):
        assert got.bbox == want.bbox
        np.testing.assert_allclose(got.age, want.age, atol=1e-3)
        np.testing.assert_allclose(got.identity, want.identity, atol=1e-3)
    # the noise lane stays empty at 90°; its 270° view matches the two-pass
    assert pairs[1][0] == [] and len(pairs[1][1]) == len(ref270[1])


def test_analyze_batch_retry_padded_policy(analyzer, fixture_img, rng):
    """``analyze_batch_retry_padded`` (one upload; upright pass on the
    resident array; rotation pair only when some lane is faceless) must
    reproduce the reference retry policy per photo: upright faces win with
    rotation 0; a 90°-rotated photo comes back with rotation in {90, 270}
    and the same faces ``analyze_with_rotations`` finds; a noise photo
    ends empty."""
    rotated = np.ascontiguousarray(np.rot90(fixture_img, 1))
    noise = (rng.rand(*rotated.shape) * 255).astype(np.uint8)
    jit2 = np.clip(rotated.astype(np.int16)
                   + rng.randint(-8, 9, rotated.shape), 0, 255).astype(np.uint8)
    imgs = np.stack([rotated, noise, jit2])

    got = analyzer.analyze_batch_retry_padded(imgs, 4)
    assert len(got) == 3
    for lane in (0, 2):
        faces, rot = got[lane]
        ref_faces, ref_rot = analyzer.analyze_with_rotations(imgs[lane])
        assert rot == ref_rot and rot in (90, 270)
        assert len(faces) == len(ref_faces) > 0
        for a, b in zip(faces, ref_faces):
            assert a.bbox == b.bbox
            np.testing.assert_allclose(a.identity, b.identity, atol=1e-3)
    assert got[1] == ([], 270)     # nothing anywhere -> empty after 270


def test_album_downscale_buckets(analyzer, fixture_img, tmp_path_factory):
    """With ``downscale``, photos of mixed large resolutions (portrait AND
    landscape) collapse onto ONE letterboxed analysis shape — aspect
    preserved, faces still found; photos within bounds untouched; the
    features cache keyed on the setting."""
    album = tmp_path_factory.mktemp("album_downscale")
    big = cv2.resize(fixture_img, (960, 720))          # landscape, over bounds
    cv2.imwrite(str(album / "a.jpg"), cv2.cvtColor(big, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "b.jpg"), cv2.cvtColor(fixture_img, cv2.COLOR_RGB2BGR))

    org = AlbumOrganizer(analyzer, AlbumConfig(minsize=40), analyze_batch=2,
                         downscale=(640, 480))
    ds, chw = org._maybe_downscale(big)
    assert ds.shape == (480, 640, 3) and chw == (480, 640)
    # portrait (720x960 after rot90): letterboxed into the SAME bucket with
    # aspect preserved — content in a 360-wide column, black to the right
    portrait = np.ascontiguousarray(np.rot90(big))     # (960, 720, 3)
    pout, pchw = org._maybe_downscale(portrait)
    assert pout.shape == (480, 640, 3)
    assert pchw == (480, 360)
    assert pout[:, 361:].max() == 0
    assert pout[:, :360].max() > 0
    same, same_chw = org._maybe_downscale(fixture_img)
    assert same.shape == fixture_img.shape
    assert same_chw == fixture_img.shape[:2]
    # big-face privacy fraction divides by the CONTENT width (360), not the
    # padded canvas (640): a 90px face is 25% of the real portrait photo
    face = type("F", (), {"bbox": (10, 10, 100, 100), "age": 30.0,
                          "gender_prob": 0.7,
                          "identity": np.ones(1024, np.float32)})()
    *_, big_face = org._faces_to_outputs(pout, [face], pchw[1])
    assert big_face          # 90/360 = 0.25 >= 0.05
    org_strict = AlbumOrganizer(
        analyzer, AlbumConfig(min_face_width_percent=0.26, minsize=40), analyze_batch=2,
        downscale=(640, 480))
    *_, big_face = org_strict._faces_to_outputs(pout, [face], pchw[1])
    assert not big_face      # 0.25 < 0.26 (would pass vs canvas: 90/640)
    faces = org.scan_album(str(album), use_cache=True)   # writes the cache
    # both photos analyzed at the 640x480 bucket; all faces found
    assert faces.indices.count(0) >= 2 and faces.indices.count(1) >= 2
    assert faces.features.shape[1] == 1024

    # a different downscale setting must NOT be served the stale cache:
    # the recompute rewrites it under the new setting
    assert os.path.exists(album / "features.npz")
    other = AlbumOrganizer(analyzer, AlbumConfig(minsize=40), analyze_batch=2)
    fresh = other.scan_album(str(album), use_cache=True)
    assert len(fresh.indices) >= 4
    d = np.load(album / "features.npz", allow_pickle=True)
    assert str(d["downscale"]) == "None"


def test_album_cache_roundtrip(analyzer, fixture_img, tmp_path_factory):
    album = tmp_path_factory.mktemp("album_cache")
    cv2.imwrite(str(album / "a.jpg"), cv2.cvtColor(fixture_img, cv2.COLOR_RGB2BGR))
    org = AlbumOrganizer(analyzer, AlbumConfig(minsize=40))
    first = org.scan_album(str(album), use_cache=True)
    assert os.path.exists(album / "features.npz")
    second = org.scan_album(str(album), use_cache=True)
    np.testing.assert_allclose(first.features, second.features)
    assert first.indices == second.indices


def test_album_montage(analyzer, fixture_img, tmp_path_factory):
    album = tmp_path_factory.mktemp("album_montage")
    img2 = np.clip(fixture_img.astype(np.int16) + 5, 0, 255).astype(np.uint8)
    cv2.imwrite(str(album / "a.jpg"), cv2.cvtColor(fixture_img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "b.jpg"), cv2.cvtColor(img2, cv2.COLOR_RGB2BGR))
    now = time.time()
    os.utime(album / "a.jpg", (now - 3 * 86400, now - 3 * 86400))
    cfg = AlbumConfig(min_no_photos=2, min_days_difference=2, distance_threshold=0.9, minsize=40)
    org = AlbumOrganizer(analyzer, cfg)
    result = org.process_album(str(album), use_cache=False)
    if result["clusters"]:
        assert os.path.exists(album / "clusters" / "montage.png")


def test_album_outputs_from_cache(analyzer, fixture_img, tmp_path_factory):
    """Regression: cached facial_images must stay uint8 image arrays so
    cluster-dir writes and the montage work on a cache-hit run."""
    album = tmp_path_factory.mktemp("album_cached_outputs")
    img2 = np.clip(fixture_img.astype(np.int16) + 5, 0, 255).astype(np.uint8)
    cv2.imwrite(str(album / "a.jpg"), cv2.cvtColor(fixture_img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(album / "b.jpg"), cv2.cvtColor(img2, cv2.COLOR_RGB2BGR))
    now = time.time()
    os.utime(album / "a.jpg", (now - 3 * 86400, now - 3 * 86400))
    cfg = AlbumConfig(min_no_photos=2, min_days_difference=2, distance_threshold=0.9, minsize=40)
    org = AlbumOrganizer(analyzer, cfg)
    first = org.process_album(str(album), use_cache=True)
    # second run hits features.npz; outputs must still be writable
    second = org.process_album(str(album), use_cache=True)
    assert second["n_faces"] == first["n_faces"]
    if second["clusters"]:
        res_dir = album / "clusters"
        cluster_dirs = [d for d in os.listdir(res_dir)
                        if os.path.isdir(res_dir / d) and d != "public"]
        assert cluster_dirs
        sample = next((res_dir / cluster_dirs[0]).iterdir())
        assert cv2.imread(str(sample)) is not None


def test_analyze_with_rotations_rotated_fixture(analyzer, fixture_img):
    """The rotation-retry contract (reference process_photos.py:241-247): on
    a photo rotated 90° clockwise so that upright detection finds nothing,
    analyze_with_rotations must report the rotation it applied and return
    boxes in THAT rotated orientation's coordinates — pinned against a direct
    analyze() call on the equivalently pre-rotated image."""
    # 90° counter-clockwise rotation of the fixture: faces become sideways
    # and the upright cascade finds none (the cw orientation still catches
    # one sideways face, so ccw is the retry-path fixture)
    rotated = np.ascontiguousarray(np.rot90(fixture_img, k=1))
    assert analyzer.analyze(rotated) == []

    faces, rotation = analyzer.analyze_with_rotations(rotated)
    assert rotation in (90, 270)
    assert len(faces) == len(analyzer.analyze(fixture_img))

    # the coordinates must live in the orientation analyze_with_rotations
    # used internally: np.rot90(input, 3 if rot==90 else 1)
    k = 3 if rotation == 90 else 1
    want = analyzer.analyze(np.ascontiguousarray(np.rot90(rotated, k)))
    assert [f.bbox for f in faces] == [f.bbox for f in want]
    for got_f, want_f in zip(faces, want):
        assert got_f.age == pytest.approx(want_f.age, abs=1e-6)


def test_analyzer_oversampling_semantics(fixture_img):
    """5-crop oversampling (reference facial_analysis.py:248-253, disabled
    upstream): base box + four ±10 diagonal shifts of the DILATED box, each
    clipped, predictions averaged, identity from the base crop. Verified
    with deterministic crop-content heads against a host recomputation of
    the offsets/clip/averaging."""
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.models.mtcnn import import_mtcnn_params
    from hse_facerec_tf_tpu.ops.resize import crop_resize_bilinear

    class FakeHeads:
        identity_dim = 3
        params = {}

        def apply(self, params, crops):
            ages = crops.mean(axis=(1, 2, 3))
            gender = crops[:, 0, 0, 0] / 255.0
            identity = crops.mean(axis=(1, 2))
            return ages, gender, identity

    mtcnn = import_mtcnn_params(str(MTCNN_PB))
    over = FacialAnalyzer(mtcnn, heads=FakeHeads(), minsize=40, oversample=True)
    base = FacialAnalyzer(mtcnn, heads=FakeHeads(), minsize=40)
    got = over.analyze(fixture_img)
    plain = base.analyze(fixture_img)
    assert len(got) == len(plain) >= 2

    h, w = fixture_img.shape[:2]
    img_f = fixture_img.astype(np.float32)
    for g in got:
        x1, y1, x2, y2 = (np.floor(np.asarray(g.raw_bbox))
                          + np.array([-10, -10, 10, 10]))
        rects = []
        for dy, dx in ((0, 0), (-10, -10), (10, -10), (-10, 10), (10, 10)):
            rects.append([np.clip(y1 + dy, 0, h), np.clip(x1 + dx, 0, w),
                          np.clip(y2 + dy, 0, h), np.clip(x2 + dx, 0, w)])
        crops = np.asarray(crop_resize_bilinear(
            img_f, jnp.asarray(np.asarray(rects, np.float32)), 224,
            supersample=1, outside="clamp"))
        want_age = crops.mean(axis=(1, 2, 3)).mean()
        want_gender = (crops[:, 0, 0, 0] / 255.0).mean()
        want_identity = crops[0].mean(axis=(0, 1))
        assert g.age == pytest.approx(want_age, abs=1e-3)
        assert g.gender_prob == pytest.approx(want_gender, abs=1e-4)
        np.testing.assert_allclose(g.identity, want_identity, atol=1e-3)
    # identity must equal the base (non-oversampled) crop's identity
    for g, p in zip(got, plain):
        np.testing.assert_allclose(g.identity, p.identity, atol=1e-4)
        assert g.bbox == p.bbox


def test_cli_album_minsize_default(tmp_path, monkeypatch):
    """``cmd_album`` builds its engine with the reference album default
    minsize=112 (``process_photos.py:385``), while an explicit ``--minsize``
    still overrides it."""
    from hse_facerec_tf_tpu import cli

    seen = {}

    class _Stop(Exception):
        pass

    def fake_build(args):
        seen["minsize"] = args.minsize
        raise _Stop

    monkeypatch.setattr(cli, "_build_analyzer", fake_build)
    (tmp_path / "x.jpg").write_bytes(b"")   # pass cmd_analyze's exists check
    for argv, want in ((["album", str(tmp_path)], 112),
                       (["album", str(tmp_path), "--minsize", "40"], 40),
                       (["analyze", str(tmp_path / "x.jpg")], 40)):
        with pytest.raises(_Stop):
            cli.main(argv)
        assert seen.pop("minsize") == want, argv


def test_video_frames_batched_matches_sequential(analyzer, fixture_img,
                                                 tmp_path):
    """annotated_video_frames with batch>1 must select the SAME frames (the
    skip is fixed) and produce the same faces as the per-frame path, tail
    group included."""
    from hse_facerec_tf_tpu.pipelines.video import annotated_video_frames

    path = str(tmp_path / "clip.mp4")
    h, w = fixture_img.shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for i in range(22):     # 22 frames, skip 2 -> 11 selected; batch 4 -> tail 3
        frame = np.clip(fixture_img.astype(np.int16) + (i % 3), 0,
                        255).astype(np.uint8)
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()

    seq = list(annotated_video_frames(analyzer, path, frame_skip=2, batch=1))
    bat = list(annotated_video_frames(analyzer, path, frame_skip=2, batch=4))
    assert len(seq) == len(bat) == 11
    for (fs, faces_s), (fb, faces_b) in zip(seq, bat):
        assert fs.shape == fb.shape
        assert [f.bbox for f in faces_b] == [f.bbox for f in faces_s]
        for a, b in zip(faces_b, faces_s):
            assert a.age == pytest.approx(b.age, abs=1e-3)


def test_album_video_batched_matches_sequential(analyzer, fixture_img,
                                                tmp_path):
    """The batched video scan (candidate pre-analysis + policy replay) must
    process the SAME frames with the SAME outputs as the reference's
    sequential adaptive-skip loop."""
    path = str(tmp_path / "albumclip.mp4")
    h, w = fixture_img.shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for i in range(40):
        frame = np.clip(fixture_img.astype(np.int16) + (i % 4), 0,
                        255).astype(np.uint8)
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()

    cfg = AlbumConfig(min_no_frames=4, distance_threshold=0.9, minsize=40)
    mdate = time.gmtime(0)
    seq = AlbumOrganizer(analyzer, cfg, analyze_batch=1).process_video(
        path, mdate)
    bat = AlbumOrganizer(analyzer, cfg, analyze_batch=4).process_video(
        path, mdate)
    s_crops, s_ages, s_genders, s_feats, s_any = seq
    b_crops, b_ages, b_genders, b_feats, b_any = bat
    assert s_any and b_any
    assert s_ages == b_ages
    np.testing.assert_allclose(b_genders, s_genders, atol=1e-6)
    assert len(b_crops) == len(s_crops)
    for a, b in zip(b_crops, s_crops):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(b_feats, s_feats):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_album_config_minsize_authoritative(analyzer):
    """AlbumConfig.minsize governs the organizer's engine: a mismatched
    analyzer is recloned at the config's value (sharing heads/params; the
    caller's analyzer is untouched), matching the reference's minsize=112
    construction (process_photos.py:385)."""
    org = AlbumOrganizer(analyzer, AlbumConfig())        # default 112
    assert analyzer.detector.minsize == 40               # caller untouched
    assert org.analyzer.detector.minsize == 112
    assert org.analyzer.heads is analyzer.heads          # shared, no reimport
    # matching config keeps the analyzer instance itself
    same = AlbumOrganizer(analyzer, AlbumConfig(minsize=40))
    assert same.analyzer is analyzer


def test_imread_rgb_bounded(tmp_path):
    """DCT-scaled JPEG decode for downscaled analysis: the reduced image
    always covers the target box (in either EXIF orientation), non-JPEGs
    and already-small JPEGs fall back to full decode, and the reduced
    pixels stay close to full-decode-then-resize."""
    import cv2

    from hse_facerec_tf_tpu.utils.image_io import imread_rgb, imread_rgb_bounded

    rng = np.random.RandomState(3)
    big = np.clip(rng.randn(1500, 2400, 3) * 20 + 128, 0, 255).astype(np.uint8)
    big = cv2.GaussianBlur(big, (0, 0), 3)      # realistic JPEG content
    p = str(tmp_path / "big.jpg")
    cv2.imwrite(p, cv2.cvtColor(big, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])

    out = imread_rgb_bounded(p, 640, 480)
    # 2400x1500 into 640x480: fit scale 0.267 -> reduce by 2 (1200x750)
    assert out.shape == (750, 1200, 3)
    assert out.shape[1] >= 640 and out.shape[0] >= 480
    full = imread_rgb(p)
    a = cv2.resize(full, (640, 400)).astype(np.int16)
    b = cv2.resize(out, (640, 400)).astype(np.int16)
    assert np.abs(a - b).mean() < 4.0

    # a small JPEG and a PNG both take the exact full-decode path
    small_p = str(tmp_path / "small.jpg")
    cv2.imwrite(small_p, cv2.cvtColor(big[:400, :600], cv2.COLOR_RGB2BGR))
    assert imread_rgb_bounded(small_p, 640, 480).shape[:2] == (400, 600)
    png_p = str(tmp_path / "img.png")
    cv2.imwrite(png_p, cv2.cvtColor(big, cv2.COLOR_RGB2BGR))
    np.testing.assert_array_equal(imread_rgb_bounded(png_p, 640, 480),
                                  imread_rgb(png_p))

    # orientation safety: a portrait target box on the same landscape
    # source must still be covered after a hypothetical 90-degree EXIF
    # rotation (the chosen reduction is the min over both orientations)
    out_portrait = imread_rgb_bounded(p, 480, 640)
    h, w = out_portrait.shape[:2]
    assert (w >= 480 and h >= 640) or (h >= 480 and w >= 640)


def test_album_downscale_uses_bounded_decode(analyzer, tmp_path, monkeypatch):
    """With --downscale, the album scan routes photo loads through the
    bounded decoder; without it, full decode keeps native-size semantics."""
    from hse_facerec_tf_tpu.pipelines.album import AlbumOrganizer
    from hse_facerec_tf_tpu.utils import image_io

    calls = {"bounded": 0, "full": 0}
    orig_b, orig_f = image_io.imread_rgb_bounded, image_io.imread_rgb
    monkeypatch.setattr(image_io, "imread_rgb_bounded",
                        lambda *a: calls.__setitem__("bounded", calls["bounded"] + 1) or orig_b(*a))
    org = AlbumOrganizer(analyzer, downscale=(640, 480))
    import cv2

    p = str(tmp_path / "x.jpg")
    cv2.imwrite(p, np.zeros((1200, 1600, 3), np.uint8))
    img = org._read_photo(p)
    assert calls["bounded"] == 1
    assert img.shape[0] >= 480 and img.shape[1] >= 640

    org_native = AlbumOrganizer(analyzer)
    assert org_native._read_photo(p).shape[:2] == (1200, 1600)
    assert calls["bounded"] == 1


def test_album_cluster_labels_from_gallery(tmp_path):
    """Clusters are named by majority 1-NN vote of member faces against an
    enrollment gallery; unmatched clusters keep numeric names; duplicate
    and unsafe labels are sanitized/suffixed in the output dirs."""
    import time as _time

    from hse_facerec_tf_tpu.pipelines.album import AlbumFaces, AlbumOrganizer
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery

    rng = np.random.RandomState(7)
    alice = rng.randn(16).astype(np.float32)
    bob = rng.randn(16).astype(np.float32)
    g = EnrollmentGallery()
    g.enroll("Alice/Smith", alice)       # '/' must be sanitized in dir names
    g.enroll("bob", bob)

    def near(v, n):
        out = v[None] + 0.02 * rng.randn(n, 16).astype(np.float32)
        return out / np.linalg.norm(out, axis=1, keepdims=True)

    # cluster 0: 3 alice-ish faces; cluster 1: 2 bob + 1 alice (majority
    # bob); cluster 2: unknown person
    feats = np.concatenate([near(alice, 3), near(bob, 2), near(alice, 1),
                            near(rng.randn(16).astype(np.float32), 2)])
    crops = [np.zeros((8, 8, 3), np.uint8)] * len(feats)
    faces = AlbumFaces(files=["a.jpg"], mdates=[_time.localtime()],
                       facial_images=crops, born_years=np.zeros(len(feats)),
                       genders=np.full(len(feats), 0.9),
                       features=feats, indices=[0] * len(feats),
                       private_photo_indices=[])
    clusters = [[0, 1, 2], [3, 4, 5], [6, 7]]

    class _NoAnalyzer:        # _label_clusters/_write_outputs never touch it
        face_size = 224

    org = AlbumOrganizer.__new__(AlbumOrganizer)
    org.gallery = g
    from hse_facerec_tf_tpu.config import AlbumConfig

    org.config = AlbumConfig()
    labels = org._label_clusters(faces, clusters)
    assert labels == ["Alice/Smith", "bob", None]

    org._write_outputs(str(tmp_path), faces, clusters,
                       ["male", "male", "female"], [1980, 1990, 2000],
                       n_image_files=1, cluster_labels=labels)
    dirs = sorted(os.listdir(tmp_path / "clusters"))
    assert "AliceSmith male 1980" in dirs          # '/' stripped
    assert "bob male 1990" in dirs
    assert "2 female 2000" in dirs                 # unmatched keeps number

    # no-gallery organizer: all-numeric naming unchanged
    org.gallery = None
    assert org._label_clusters(faces, clusters) == [None, None, None]

    # duplicate labels get collision-suffixed dirs
    org._write_outputs(str(tmp_path), faces, [[0], [1]], ["male", "male"],
                       [1980, 1980], n_image_files=1,
                       cluster_labels=["bob", "bob"])
    dirs = sorted(os.listdir(tmp_path / "clusters"))
    assert "bob male 1980" in dirs and "bob (1) male 1980" in dirs

def test_video_frames_labeler_batches(tmp_path, monkeypatch):
    """The optional ``labeler`` (person names from an enrollment gallery) is
    called ONCE per flushed analyze batch with the FLAT face list, and each
    frame's draw call receives exactly its slice of the returned labels."""
    import hse_facerec_tf_tpu.pipelines.video as V
    from hse_facerec_tf_tpu.pipelines.analyzer import FaceResult

    def face(k):
        return FaceResult(bbox=(k, 0, k + 4, 4), raw_bbox=(k, 0, k + 4, 4),
                          score=0.9, age=30.0, gender_prob=0.7,
                          identity=np.full(8, float(k), np.float32),
                          landmarks=np.zeros(10))

    counts = [2, 0, 1, 3, 1, 2, 0, 1]     # faces per selected frame

    class _Stub:
        def __init__(self):
            self.pos = 0

        def analyze_batch_padded(self, frames, batch):
            out = []
            for _ in range(len(frames)):
                out.append([face(j) for j in range(counts[self.pos])])
                self.pos += 1
            return out

    path = str(tmp_path / "lab.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (32, 32))
    for _ in range(8):
        writer.write(np.full((32, 32, 3), 128, np.uint8))
    writer.release()

    label_calls = []

    def labeler(faces):
        label_calls.append(len(faces))
        base = sum(label_calls[:-1])
        return [f"L{base + i}" for i in range(len(faces))]

    drawn = []
    monkeypatch.setattr(
        V, "draw_faces",
        lambda fr, fc, labels=None: (drawn.append((len(fc), labels)), fr)[1])

    out = list(V.annotated_video_frames(_Stub(), path, frame_skip=1,
                                        batch=4, labeler=labeler))
    assert len(out) == 8
    # one labeler call per flush, over the flat face lists (2+0+1+3, 1+2+0+1)
    assert label_calls == [6, 4]
    assert [n for n, _ in drawn] == counts
    flat = [l for _, ls in drawn if ls for l in ls]
    assert flat == [f"L{i}" for i in range(10)]
    # zero-face frames got an empty slice, not a misaligned one
    assert all(ls == [] for n, ls in drawn if n == 0)

    # without a labeler nothing is ranked and draw gets labels=None
    drawn.clear()
    out = list(V.annotated_video_frames(_Stub(), path, frame_skip=1, batch=4))
    assert [ls for _, ls in drawn] == [None] * 8

def test_process_image_dir_batched(tmp_path):
    """Batched process_image_dir yields the same (name, faces) sequence as
    the per-image path: consecutive same-shape images group into one padded
    analyze call, a shape change flushes the group, order is preserved."""
    from hse_facerec_tf_tpu.pipelines.analyzer import FaceResult
    from hse_facerec_tf_tpu.pipelines.video import process_image_dir

    # names sort as written: a..f; shapes AAAB BA -> groups |AAA|B|B|A|
    shapes = {"a": (40, 60), "b": (40, 60), "c": (40, 60),
              "d": (80, 20), "e": (80, 20), "f": (40, 60)}
    for name, (h, w) in shapes.items():
        cv2.imwrite(str(tmp_path / f"{name}.png"),
                    np.full((h, w, 3), ord(name), np.uint8))
    (tmp_path / "notes.txt").write_text("skip me")

    def face(v):
        return FaceResult(bbox=(0, 0, 4, 4), raw_bbox=(0, 0, 4, 4),
                          score=0.9, age=float(v), gender_prob=0.5,
                          identity=np.zeros(4, np.float32),
                          landmarks=np.zeros(10))

    class _Stub:
        def __init__(self):
            self.calls = []          # (n_real, lanes) per device program

        def analyze(self, img):
            return [face(img[0, 0, 0])]

        def analyze_batch_padded(self, imgs, lanes):
            self.calls.append((len(imgs), lanes))
            return [[face(im[0, 0, 0])] for im in imgs]

    seq_stub, bat_stub = _Stub(), _Stub()
    seq = list(process_image_dir(seq_stub, str(tmp_path), batch=1))
    bat = list(process_image_dir(bat_stub, str(tmp_path), batch=4))

    assert [n for n, _, _ in bat] == [n for n, _, _ in seq] == [
        f"{c}.png" for c in "abcdef"]
    for (_, _, fs), (_, _, fb) in zip(seq, bat):
        assert fb[0].age == fs[0].age        # pixel value round-tripped
    # grouping: |abc| same shape, |de| the other shape, |f| the tail
    assert bat_stub.calls == [(3, 4), (2, 4), (1, 4)]
    assert seq_stub.calls == []              # batch=1 never pads

def test_album_gallery_label_edge_cases(tmp_path, rng):
    """A digit-named person cannot silently merge with a numeric cluster
    dir, and a wrong-dim gallery degrades to anonymous names with a warning
    instead of discarding the finished clustering run."""
    import time as _time

    from hse_facerec_tf_tpu.pipelines.album import AlbumFaces, AlbumOrganizer
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery

    feats = rng.randn(3, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    faces = AlbumFaces(files=["a.jpg"], mdates=[_time.localtime()],
                       facial_images=[np.zeros((8, 8, 3), np.uint8)] * 3,
                       born_years=np.zeros(3), genders=np.full(3, 0.9),
                       features=feats, indices=[0] * 3,
                       private_photo_indices=[])

    org = AlbumOrganizer.__new__(AlbumOrganizer)
    from hse_facerec_tf_tpu.config import AlbumConfig

    org.config = AlbumConfig()

    # person named '1' lands on cluster 0 -> dir '1 male 1980'; numeric
    # cluster 1 must not reuse that exact dir
    org._write_outputs(str(tmp_path), faces, [[0], [1]], ["male", "male"],
                       [1980, 1980], n_image_files=1,
                       cluster_labels=["1", None])
    dirs = sorted(d for d in os.listdir(tmp_path / "clusters")
                  if d != "public")
    assert dirs == ["1 (1) male 1980", "1 male 1980"]

    # gallery enrolled with a different embedder (dim 8 != faces dim 16):
    # warn + unlabeled, never raise
    g = EnrollmentGallery()
    g.enroll("alice", rng.randn(8))
    org.gallery = g
    with pytest.warns(RuntimeWarning, match="cluster naming skipped"):
        labels = org._label_clusters(faces, [[0, 1], [2]])
    assert labels == [None, None]

def test_video_downscale_before_rotation(tmp_path, monkeypatch):
    """Reference order (facial_analysis.py:654-661): bound the frame to
    <=640x480 FIRST, then rotate — a 1280x960 video with rotation=90 must
    come out 640h x 480w, not 480h x 640w."""
    import hse_facerec_tf_tpu.pipelines.video as V

    path = str(tmp_path / "rot.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (1280, 960))
    for _ in range(2):
        writer.write(np.full((960, 1280, 3), 90, np.uint8))
    writer.release()
    monkeypatch.setattr(V, "video_rotation", lambda p: 90)

    class _Stub:
        def analyze(self, img):
            return []

    frames = [fr for fr, _ in V.annotated_video_frames(_Stub(), path,
                                                       frame_skip=1, batch=1)]
    assert frames and all(fr.shape == (640, 480, 3) for fr in frames)

def test_video_frames_no_rotation_retry(tmp_path, monkeypatch):
    """The reference's 90/270 rotation retry is PHOTO-loop-only
    (process_photos.py:241-247); its video loop calls plain process_image
    (:108). Both video paths must analyze each selected frame exactly once
    — a faceless clip must never trigger extra rotated analyses."""
    from hse_facerec_tf_tpu.pipelines.album import AlbumOrganizer

    path = str(tmp_path / "faceless.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (32, 32))
    for _ in range(20):
        writer.write(np.zeros((32, 32, 3), np.uint8))
    writer.release()

    calls = {"single": 0, "batch": 0}

    class _Stub:
        face_size = 8

        def analyze(self, img):
            calls["single"] += 1
            return []

        def analyze_batch_padded(self, imgs, lanes):
            calls["batch"] += len(imgs)
            return [[] for _ in imgs]

    for analyze_batch in (1, 4):
        calls["single"] = calls["batch"] = 0
        org = AlbumOrganizer.__new__(AlbumOrganizer)
        org.analyzer = _Stub()
        org.config = AlbumConfig()
        org.analyze_batch = analyze_batch
        org.downscale = None
        from hse_facerec_tf_tpu.utils.profiling import StageTimer

        org.timer = StageTimer()
        out = org.process_video(path, time.gmtime(0))
        assert out[:4] == ([], [], [], [])
        # delta stays 5 -> 4 selected frames; batch mode pre-analyzes the
        # divisible-by-3-or-5 candidates but NEVER single-frame retries
        if analyze_batch == 1:
            assert calls == {"single": 4, "batch": 0}
        else:
            assert calls["single"] == 0 and calls["batch"] >= 4


def test_video_cluster_features_are_raw_means(tmp_path):
    """Reference process_video (:145-153) means the RAW per-frame features
    of a cluster (normalization happens only when the album merges the
    video cluster, :293-296) — mean-of-normalized is a different vector
    when member norms differ."""
    from hse_facerec_tf_tpu.pipelines.album import AlbumOrganizer
    from hse_facerec_tf_tpu.pipelines.analyzer import FaceResult

    path = str(tmp_path / "two.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (32, 32))
    for _ in range(30):
        writer.write(np.full((32, 32, 3), 50, np.uint8))
    writer.release()

    base = np.zeros(8, np.float32)
    base[0] = 1.0
    norms = iter(float(1 + 2 * k) for k in range(64))

    class _Stub:
        face_size = 8
        seen = []

        def analyze(self, img):
            s = next(norms)
            _Stub.seen.append(s)
            return [FaceResult(bbox=(0, 0, 8, 8), raw_bbox=(0, 0, 8, 8),
                               score=1.0, age=30.0, gender_prob=0.9,
                               identity=base * s, landmarks=np.zeros(10))]

    org = AlbumOrganizer.__new__(AlbumOrganizer)
    org.analyzer = _Stub()
    org.config = AlbumConfig(min_no_frames=3)
    org.analyze_batch = 1
    org.downscale = None
    crops, ages, genders, feats, has = org.process_video(path, time.gmtime(0))
    assert has and len(feats) == 1
    # all frames share one direction -> one cluster; its feature is the
    # RAW mean: mean(norm_i) * e0, not the unit vector
    want = np.mean(_Stub.seen) * base
    np.testing.assert_allclose(feats[0], want, rtol=1e-6)


def test_album_cache_invalidated_by_content_change(analyzer, fixture_img,
                                                   tmp_path, monkeypatch):
    """features.npz must not be returned for a changed album: adding a
    photo (or touching one) forces a rescan; an unchanged album still hits
    the cache."""
    import hse_facerec_tf_tpu.pipelines.album as album_mod

    d = tmp_path / "alb"
    d.mkdir()
    cv2.imwrite(str(d / "a.jpg"), cv2.cvtColor(fixture_img,
                                               cv2.COLOR_RGB2BGR))
    org = AlbumOrganizer(analyzer, AlbumConfig(minsize=40))
    first = org.scan_album(str(d))
    assert os.path.exists(d / "features.npz")

    analyzed = {"n": 0}
    orig = AlbumOrganizer._analyze_photos

    def counting(self, album_dir, files):
        analyzed["n"] += 1
        return orig(self, album_dir, files)

    monkeypatch.setattr(AlbumOrganizer, "_analyze_photos", counting)
    # unchanged -> cache hit, no re-analysis
    again = org.scan_album(str(d))
    assert analyzed["n"] == 0 and len(again.indices) == len(first.indices)

    # new photo -> stale cache detected, full rescan sees both photos
    cv2.imwrite(str(d / "b.jpg"), cv2.cvtColor(fixture_img,
                                               cv2.COLOR_RGB2BGR))
    rescan = org.scan_album(str(d))
    assert analyzed["n"] == 1
    assert len(rescan.files) == 2
    assert len(rescan.indices) == 2 * len(first.indices)

def test_cli_video_writer_uses_source_fps(tmp_path, monkeypatch):
    """`cli video --out` writes at source_fps / frame_skip (real playback
    speed), never fps=0; --frame-skip < 1 exits cleanly."""
    from hse_facerec_tf_tpu import cli

    path = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                             (32, 32))
    for _ in range(6):
        writer.write(np.zeros((32, 32, 3), np.uint8))
    writer.release()

    class _Stub:
        def analyze_batch_padded(self, imgs, lanes):
            return [[] for _ in imgs]

    monkeypatch.setattr(cli, "_build_analyzer", lambda a: _Stub())
    captured = {}
    real_writer = cv2.VideoWriter

    def spy_writer(filename, fourcc, fps, size):
        captured["fps"] = fps
        return real_writer(filename, fourcc, fps, size)

    monkeypatch.setattr(cv2, "VideoWriter", spy_writer)
    out = str(tmp_path / "out.mp4")
    cli.main(["video", path, "--out", out, "--frame-skip", "2"])
    assert abs(captured["fps"] - 12.0) < 0.1

    with pytest.raises(SystemExit):
        cli.main(["video", path, "--frame-skip", "0"])
