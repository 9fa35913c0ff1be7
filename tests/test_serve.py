"""Serving layer: batching worker + HTTP endpoints (driven over a real socket)."""

import http.client
import json
import os
import threading
import time

import cv2
import numpy as np
import pytest

from hse_facerec_tf_tpu.serve import _BatchingWorker


class _FakeExtractor:
    def __init__(self):
        self.batch_sizes = []

    def extract_batch(self, imgs):
        self.batch_sizes.append(len(imgs))
        return imgs.reshape(len(imgs), -1)[:, :8].astype(np.float32)


def test_batching_worker_coalesces(rng):
    ex = _FakeExtractor()
    worker = _BatchingWorker(ex.extract_batch, max_batch=8, max_wait_ms=500.0)
    imgs = [(rng.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(6)]
    results = [None] * 6

    def call(i):
        results[i] = worker.submit(imgs[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):
        np.testing.assert_allclose(results[i], imgs[i].reshape(-1)[:8])
    # concurrent submissions must have been coalesced into fewer device calls
    assert max(ex.batch_sizes) > 1


def test_analyze_pow2_padding():
    """Cross-request analyze batching pads lanes to powers of two so only a
    bounded set of programs compiles per shape, and trims the results back."""
    from hse_facerec_tf_tpu.pipelines.analyzer import FacialAnalyzer
    from hse_facerec_tf_tpu.serve import _analyze_batch_pow2

    class FakeAnalyzer:
        # the real shared zero-pad + n_valid contract
        analyze_batch_padded = FacialAnalyzer.analyze_batch_padded

        def __init__(self):
            self.lane_counts = []

        def analyze_batch(self, imgs, n_valid=None):
            self.lane_counts.append(len(imgs))
            n = len(imgs) if n_valid is None else n_valid
            return [[("face", float(im.sum()))] for im in imgs[:n]]

    fa = FakeAnalyzer()
    for n, lanes in [(1, 1), (2, 2), (3, 4), (5, 8), (8, 8)]:
        imgs = np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1) * np.ones(
            (n, 4, 4, 3), np.float32)
        out = _analyze_batch_pow2(fa, imgs)
        assert fa.lane_counts[-1] == lanes
        assert len(out) == n
        assert out[-1][0][1] == imgs[-1].sum()


def test_prewarm_buckets_cover_every_reachable_pad_shape():
    """--prewarm must compile the exact bucket set extract_batch's pow2
    padding rule can produce — including the NEXT pow2 above a non-pow2
    max_batch (a 33-48-image batch under --max-batch 48 pads to 64)."""
    from hse_facerec_tf_tpu.serve import _prewarm_buckets

    def reachable(max_batch, cap):
        out = set()
        for take in range(1, max_batch + 1):
            take = min(take, cap)               # chunking clamps first
            out.add(min(max(8, 1 << max(0, (take - 1).bit_length())), cap))
        return sorted(out)

    for max_batch, cap in [(32, 64), (48, 64), (12, 64), (8, 64),
                           (1, 64), (64, 64), (128, 64), (100, 48),
                           (5, 4), (33, 64)]:
        assert _prewarm_buckets(max_batch, cap) == reachable(max_batch, cap), \
            (max_batch, cap, _prewarm_buckets(max_batch, cap),
             reachable(max_batch, cap))


def test_http_endpoints(rng):
    from http.server import ThreadingHTTPServer

    from hse_facerec_tf_tpu.serve import make_handler

    fake = _FakeExtractor()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(_BatchingWorker(fake.extract_batch), analyze_worker=None))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["ok"] is True

        img = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode(".png", img)
        conn.request("POST", "/embed", body=enc.tobytes())
        r = conn.getresponse()
        assert r.status == 200
        emb = json.loads(r.read())["embedding"]
        assert len(emb) == 8

        conn.request("POST", "/embed", body=b"not an image")
        r = conn.getresponse()
        assert r.status == 400

        conn.request("POST", "/nope", body=enc.tobytes())
        r = conn.getresponse()
        assert r.status == 404

        conn.request("POST", "/analyze", body=enc.tobytes())
        r = conn.getresponse()
        assert r.status == 503  # analyzer disabled

        conn.request("GET", "/stats")
        r = conn.getresponse()
        assert r.status == 200
        stats = json.loads(r.read())
        assert stats["embed"]["count"] == 1
        assert stats["embed"]["p95_ms"] >= 0

        # /profile: per-fusion device profile of the embed program (the CPU
        # backend still produces a trace; 503 is the no-profiler fallback)
        conn.request("GET", "/profile")
        r = conn.getresponse()
        assert r.status in (200, 503)
        if r.status == 200:
            prof = json.loads(r.read())
            assert set(prof) >= {"busy_ms", "hbm_gbs_busy", "top"}
        else:
            r.read()
    finally:
        server.shutdown()


def test_request_deadline_returns_504(rng):
    """A wedged device call must not hang the client: submit() raises
    TimeoutError at the deadline and the handler maps it to 504."""
    from http.server import ThreadingHTTPServer

    from hse_facerec_tf_tpu.serve import make_handler

    block = threading.Event()

    def stuck_process(imgs):
        block.wait(30)          # simulates a hung accelerator link
        return [np.zeros(8, np.float32)] * len(imgs)

    worker = _BatchingWorker(stuck_process, max_batch=4, max_wait_ms=1.0)
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(worker, analyze_worker=None, request_timeout_s=0.5))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        ok, enc = cv2.imencode(".png", img)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        t0 = time.monotonic()
        conn.request("POST", "/embed", body=enc.tobytes())
        r = conn.getresponse()
        assert r.status == 504
        assert time.monotonic() - t0 < 5
        assert "within" in json.loads(r.read())["error"]
    finally:
        block.set()
        server.shutdown()


def test_abandoned_requests_dropped_after_recovery():
    """Requests that timed out while the device was wedged must NOT be
    processed once the worker recovers — only live requests run.
    ``pipeline_depth=1`` pins the strictly serial worker's contract: only
    ONE request can be irrevocably in flight behind a wedge."""
    block = threading.Event()
    processed = []

    def process(imgs):
        block.wait(30)
        processed.append(len(imgs))
        return [im.reshape(-1)[:4] for im in imgs]

    worker = _BatchingWorker(process, max_batch=1, max_wait_ms=1.0,
                             pipeline_depth=1)
    imgs = [np.full((4, 4, 3), i, np.uint8) for i in range(3)]
    # request 0 goes in-flight and wedges; 1 and 2 queue behind it
    t0 = threading.Thread(target=lambda: worker.submit(imgs[0]), daemon=True)
    t0.start()
    time.sleep(0.2)
    with pytest.raises(TimeoutError):
        worker.submit(imgs[1], timeout_s=0.3)      # queued -> abandoned
    block.set()                                    # device recovers
    out = worker.submit(imgs[2], timeout_s=10)     # live request succeeds
    np.testing.assert_array_equal(out, imgs[2].reshape(-1)[:4])
    t0.join(timeout=5)
    # batches processed: the wedged request 0 and live request 2 — the
    # abandoned request 1 was dropped, so only TWO process() calls ran
    assert len(processed) == 2


def test_abandoned_requests_dropped_pipelined():
    """Depth-2 pipelined worker: up to ``pipeline_depth`` requests can be
    irrevocably in flight behind a wedge (the device call cannot be
    cancelled), but requests still in the QUEUE when they time out are
    dropped on recovery — the post-outage backlog never delays live
    traffic by more than the in-flight depth."""
    block = threading.Event()
    processed = []

    def process(imgs):
        block.wait(30)
        processed.append(len(imgs))
        return [im.reshape(-1)[:4] for im in imgs]

    worker = _BatchingWorker(process, max_batch=1, max_wait_ms=1.0,
                             pipeline_depth=2)
    imgs = [np.full((4, 4, 3), i, np.uint8) for i in range(4)]
    # requests 0 and 1 occupy both slots and wedge; 2 queues behind them
    threads = [threading.Thread(target=lambda i=i: worker.submit(imgs[i]),
                                daemon=True) for i in range(2)]
    for t in threads:
        t.start()
    time.sleep(0.3)
    with pytest.raises(TimeoutError):
        worker.submit(imgs[2], timeout_s=0.3)      # QUEUED -> abandoned
    block.set()                                    # device recovers
    out = worker.submit(imgs[3], timeout_s=10)     # live request succeeds
    np.testing.assert_array_equal(out, imgs[3].reshape(-1)[:4])
    for t in threads:
        t.join(timeout=5)
    # processed: the two wedged in-flight requests + the live one; the
    # queued-and-abandoned request 2 was dropped
    assert len(processed) == 3


def test_enrollment_gallery_roundtrip(tmp_path, rng):
    """Enroll/identify/remove with persistence: atomic .npz survives a
    reload, ranking is int8 (exact dequantized-L2), threshold gates the
    label but the nearest neighbor is always reported."""
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery

    path = str(tmp_path / "gallery.npz")
    g = EnrollmentGallery(path=path)
    assert g.identify(rng.randn(16)) == (None, None, None)

    alice = rng.randn(16).astype(np.float32)
    bob = rng.randn(16).astype(np.float32)
    assert g.enroll("alice", alice) == 1
    assert g.enroll("bob", bob) == 2
    assert g.enroll("alice", alice + 0.01 * rng.randn(16)) == 3

    label, dist, nearest = g.identify(alice)
    assert label == "alice" and nearest == "alice"
    assert dist < 0.05
    # a probe near bob matches bob
    assert g.identify(bob + 0.01 * rng.randn(16))[0] == "bob"
    # an unrelated probe is rejected by the threshold but still names
    # the nearest enrollment
    label, dist, nearest = g.identify(rng.randn(16), threshold=0.2)
    assert label is None and dist > 0.2 and nearest in ("alice", "bob")

    # persistence: a fresh instance sees the same gallery
    g2 = EnrollmentGallery(path=path)
    assert len(g2) == 3
    assert g2.identify(alice)[0] == "alice"
    assert g2.stats()["n_labels"] == 2

    # remove drops all of a label's enrollments and persists
    assert g2.remove("alice") == 2
    assert g2.identify(alice, threshold=10.0)[0] == "bob"
    assert len(EnrollmentGallery(path=path)) == 1

    with pytest.raises(ValueError):
        g2.enroll("carol", rng.randn(8))        # dim mismatch
    with pytest.raises(ValueError):
        g2.enroll("", rng.randn(16))


def test_http_enroll_identify(tmp_path, rng):
    """The serving enrollment surface end-to-end over a real socket:
    /enroll -> /gallery -> /identify (match + below-threshold null) ->
    DELETE /enroll."""
    from http.server import ThreadingHTTPServer

    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery
    from hse_facerec_tf_tpu.serve import make_handler

    fake = _FakeExtractor()
    gallery = EnrollmentGallery(path=str(tmp_path / "g.npz"))
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(_BatchingWorker(fake.extract_batch), analyze_worker=None,
                     gallery=gallery, identify_threshold=0.5))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        # two distinguishable "faces": the fake extractor embeds the first 8
        # pixels, so constant-color images give distinct embeddings
        img_a = np.full((16, 16, 3), 200, np.uint8)
        img_b = np.zeros((16, 16, 3), np.uint8)
        img_b[0, :4] = 255                       # orthogonal-ish pattern
        enc_a = cv2.imencode(".png", img_a)[1].tobytes()
        enc_b = cv2.imencode(".png", img_b)[1].tobytes()

        conn.request("POST", "/enroll", body=enc_a)
        assert conn.getresponse().status == 400    # label required

        conn.request("POST", "/enroll?label=alice", body=enc_a)
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read()) == {"label": "alice", "n_enrolled": 1}
        conn.request("POST", "/enroll?label=bob", body=enc_b)
        assert json.loads(conn.getresponse().read())["n_enrolled"] == 2

        conn.request("GET", "/gallery")
        stats = json.loads(conn.getresponse().read())
        assert stats["n_enrolled"] == 2 and stats["n_labels"] == 2

        conn.request("POST", "/identify", body=enc_a)
        r = json.loads(conn.getresponse().read())
        assert r["label"] == "alice" and r["distance"] < 0.05

        # same probe with an impossible threshold: null label, nearest kept
        conn.request("POST", "/identify?threshold=-1", body=enc_a)
        r = json.loads(conn.getresponse().read())
        assert r["label"] is None and r["nearest"] == "alice"

        conn.request("DELETE", "/enroll?label=alice")
        assert json.loads(conn.getresponse().read())["removed"] == 1
        conn.request("POST", "/identify", body=enc_a)
        r = json.loads(conn.getresponse().read())
        assert r["label"] != "alice"

        # /stats picked up the new endpoint timers
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["enroll"]["count"] == 2
        assert stats["identify"]["count"] == 3
    finally:
        server.shutdown()


def test_build_server_data_parallel(monkeypatch, tmp_path):
    """--data-parallel builds a 1-D all-device mesh and threads it through
    both the embed extractor and the analyzer (plumbing test: the sharded
    compute paths themselves are pinned in test_eval_parallel / the
    analyzer mesh tests)."""
    import jax

    import hse_facerec_tf_tpu.serve as serve_mod
    from hse_facerec_tf_tpu.models import zoo

    seen = {}

    class FakeExtractor:
        input_size = (224, 224)

        def extract_batch(self, imgs):
            return imgs.reshape(len(imgs), -1)[:, :4]

    def fake_build_extractor(model, mesh=None, **kw):
        seen["extractor_mesh"] = mesh
        return FakeExtractor()

    class FakeAnalyzer:
        @classmethod
        def from_reference_models(cls, *a, mesh=None, **kw):
            seen["analyzer_mesh"] = mesh
            return cls()

    class FakeGallery:
        def __init__(self, path=None, mesh=None, **kw):
            seen["gallery_mesh"] = mesh

    monkeypatch.setattr("hse_facerec_tf_tpu.models.zoo.build_extractor",
                        fake_build_extractor)
    monkeypatch.setattr("hse_facerec_tf_tpu.pipelines.analyzer.FacialAnalyzer",
                        FakeAnalyzer)
    monkeypatch.setattr(
        "hse_facerec_tf_tpu.pipelines.gallery.EnrollmentGallery", FakeGallery)
    srv = serve_mod.build_server(port=0, data_parallel=True)
    try:
        assert seen["extractor_mesh"] is not None
        assert seen["analyzer_mesh"] is seen["extractor_mesh"]
        # the enrollment gallery shards its ranking state over the SAME mesh
        assert seen["gallery_mesh"] is seen["extractor_mesh"]
        assert seen["extractor_mesh"].devices.size == len(jax.devices())
    finally:
        srv.server_close()

    srv = serve_mod.build_server(port=0, data_parallel=False,
                                 with_analyzer=False)
    try:
        assert seen["extractor_mesh"] is None
    finally:
        srv.server_close()


def test_http_face_mode_and_analyze_identify(rng):
    """Face-aware serving: /enroll and /identify default to the LARGEST
    detected face's identity feature when the analyzer runs; /analyze?
    identify=1 labels every face against the gallery; no-face probes 422."""
    from http.server import ThreadingHTTPServer

    from hse_facerec_tf_tpu.pipelines.analyzer import FaceResult
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery
    from hse_facerec_tf_tpu.serve import make_handler

    def face(x1, y1, x2, y2, ident):
        return FaceResult(bbox=(x1, y1, x2, y2), raw_bbox=(x1, y1, x2, y2),
                          score=0.99, age=30.0, gender_prob=0.9,
                          identity=np.asarray(ident, np.float32),
                          landmarks=np.zeros(10, np.float32))

    e1 = rng.randn(16).astype(np.float32)      # big face's identity
    e2 = rng.randn(16).astype(np.float32)      # small face's identity

    def fake_analyze(imgs):
        out = []
        for im in imgs:
            if im[0, 0, 0] == 255:             # marker: a no-face image
                out.append([])
            else:
                out.append([face(0, 0, 8, 8, e2),          # small
                            face(0, 0, 60, 60, e1)])       # largest
        return out

    def extract16(imgs):       # whole-image embeddings, same dim as faces
        return imgs.reshape(len(imgs), -1)[:, :16].astype(np.float32)

    gallery = EnrollmentGallery()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(_BatchingWorker(extract16),
                     _BatchingWorker(fake_analyze, max_batch=4),
                     gallery=gallery, identify_threshold=0.5))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        img = np.full((64, 64, 3), 100, np.uint8)
        enc = cv2.imencode(".png", img)[1].tobytes()
        noface = np.full((64, 64, 3), 255, np.uint8)
        enc_nf = cv2.imencode(".png", noface)[1].tobytes()

        # face-mode enrollment stores the LARGEST face's identity (e1)
        conn.request("POST", "/enroll?label=alice", body=enc)
        assert json.loads(conn.getresponse().read())["n_enrolled"] == 1
        # the stored row is e1 L2-normalized: probing with it must hit at
        # ~zero distance (int8 ranking noise only)
        want = e1 / np.linalg.norm(e1)
        label, dist, _ = gallery.identify(want)
        assert label == "alice" and dist < 0.05

        conn.request("POST", "/identify", body=enc)
        r = json.loads(conn.getresponse().read())
        assert r["label"] == "alice" and r["distance"] < 0.05

        # no-face probes are 422 in face mode, fine in image mode
        conn.request("POST", "/enroll?label=bob", body=enc_nf)
        assert conn.getresponse().status == 422
        conn.request("POST", "/identify", body=enc_nf)
        assert conn.getresponse().status == 422
        conn.request("POST", "/identify?mode=image", body=enc_nf)
        assert conn.getresponse().status == 200

        conn.request("POST", "/identify?mode=sideways", body=enc)
        assert conn.getresponse().status == 400

        # /analyze?identify=1: the big face matches alice, the small
        # face's identity (e2) is far -> null label but nearest reported
        conn.request("POST", "/analyze?identify=1", body=enc)
        faces = json.loads(conn.getresponse().read())["faces"]
        assert len(faces) == 2
        by_label = {f["label"]: f for f in faces}
        assert by_label[None]["nearest"] == "alice"
        assert by_label["alice"]["distance"] < 0.05
        # without the flag, no identification keys
        conn.request("POST", "/analyze", body=enc)
        faces = json.loads(conn.getresponse().read())["faces"]
        assert "label" not in faces[0]
    finally:
        server.shutdown()


def test_gallery_identify_many_batches(rng, monkeypatch):
    """identify_many ranks all probes in ONE device call and matches
    per-probe identify exactly (including empty-gallery and empty-probe
    edges)."""
    from hse_facerec_tf_tpu.ops.pallas import knn as knn_mod
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery

    g = EnrollmentGallery()
    probes = rng.randn(5, 32).astype(np.float32)
    assert g.identify_many(probes) == [(None, None, None)] * 5

    for i in range(8):
        g.enroll(f"p{i % 4}", rng.randn(32))

    calls = []
    orig = knn_mod.nearest_neighbor_auto

    def counting(p, gal, **kw):
        calls.append(len(p))
        return orig(p, gal, **kw)

    monkeypatch.setattr(knn_mod, "nearest_neighbor_auto", counting)
    many = g.identify_many(probes, threshold=0.9)
    assert calls == [5]
    # single-probe calls re-quantize each probe with its own scale, so
    # distances agree only to quantization noise; labels/nearest exactly
    singles = [g.identify(p, threshold=0.9) for p in probes]
    for (l1, d1, n1), (l2, d2, n2) in zip(many, singles):
        assert (l1, n1) == (l2, n2)
        assert abs(d1 - d2) < 5e-3
    assert g.identify_many(np.zeros((0, 32), np.float32)) == []
    with pytest.raises(ValueError):
        g.identify_many(probes[:, :8])

def test_gallery_enroll_many(tmp_path, rng):
    """Bulk enrollment appends everything under one lock, persists ONCE,
    and validates labels/dims like per-item enroll."""
    from hse_facerec_tf_tpu.pipelines import gallery as gal_mod

    path = str(tmp_path / "g.npz")
    g = gal_mod.EnrollmentGallery(path=path)
    g.enroll("seed", rng.randn(16))

    saves = []
    orig = gal_mod.EnrollmentGallery._save_locked
    gal_mod.EnrollmentGallery._save_locked = (
        lambda self: (saves.append(1), orig(self)))
    try:
        n = g.enroll_many(["alice", "bob", "alice"],
                          rng.randn(3, 16).astype(np.float32))
    finally:
        gal_mod.EnrollmentGallery._save_locked = orig
    assert n == 4 and saves == [1]
    assert len(gal_mod.EnrollmentGallery(path=path)) == 4
    assert g.stats()["n_labels"] == 3

    # bulk-enrolled rows are normalized and rankable like enroll()'s
    probe = np.asarray(g._feats[1]) * 3.0
    assert g.identify(probe)[0] == "alice"

    with pytest.raises(ValueError):
        g.enroll_many(["x"], rng.randn(1, 8))          # dim mismatch
    with pytest.raises(ValueError):
        g.enroll_many(["x", ""], rng.randn(2, 16))     # empty label
    with pytest.raises(ValueError):
        g.enroll_many(["x"], rng.randn(2, 16))         # count mismatch
    assert len(g) == 4                                 # nothing partial


def test_cli_enroll_face_mode(tmp_path, rng, monkeypatch, capsys):
    """`cli enroll` (face mode) walks a people tree with BATCHED analysis
    (same-shape photos fused into one pow2-padded program), embeds the
    LARGEST face per photo, rotation-retries then skips no-face photos, and
    --replace swaps a person's rows atomically while keeping persons whose
    new photos all failed detection."""
    import json

    import cv2

    from hse_facerec_tf_tpu import cli
    from hse_facerec_tf_tpu.pipelines.analyzer import FaceResult
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery

    people = tmp_path / "people"
    vecs = {10: rng.randn(16).astype(np.float32),
            20: rng.randn(16).astype(np.float32)}
    pixel = {"Alice/Smith": 10, "bob": 20}   # '/' must be sanitized later
    for name, n_imgs in [("Alice/Smith", 2), ("bob", 1)]:
        d = people / name.replace("/", "_")
        d.mkdir(parents=True)
        for i in range(n_imgs):
            cv2.imwrite(str(d / f"{i}.png"),           # png: lossless marker
                        np.full((32, 32, 3), pixel[name], np.uint8))
    # a photo in which no face will ever be found (marker 0)
    cv2.imwrite(str(people / "Alice_Smith" / "noface.png"),
                np.zeros((32, 32, 3), np.uint8))

    def face(vec, scale):
        s = int(10 * scale)
        return FaceResult(bbox=(0, 0, s, s), raw_bbox=(0, 0, s, s),
                          score=0.99, age=30.0, gender_prob=0.9,
                          identity=vec * scale, landmarks=np.zeros(10))

    class _StubAnalyzer:
        batch_calls = []
        rotation_calls = []

        def analyze_batch_padded(self, imgs, lanes):
            _StubAnalyzer.batch_calls.append((len(imgs), lanes))
            out = []
            for im in imgs:
                v = int(im[0, 0, 0])
                # two faces per photo; the LARGER carries the marker vector
                out.append([] if v == 0 else [face(vecs[v], 0.5),
                                              face(vecs[v], 1.0)])
            return out

        def analyze(self, img):
            # the retry path is rotations-ONLY (no redundant upright pass)
            _StubAnalyzer.rotation_calls.append(int(img[0, 0, 0]))
            return []

    monkeypatch.setattr(cli, "_build_analyzer", lambda a: _StubAnalyzer())

    gpath = str(tmp_path / "gal.npz")
    cli.main(["enroll", str(people), gpath])
    out = json.loads(capsys.readouterr().out)
    assert out["n_added"] == 3 and out["n_people_added"] == 2
    assert out["skipped_no_face"] == [os.path.join("Alice_Smith",
                                                   "noface.png")]
    # all four same-shape photos went through ONE fused program (4 lanes),
    # and only the no-face photo hit the retry: two rotated attempts, no
    # redundant upright re-analysis
    assert _StubAnalyzer.batch_calls == [(4, 4)]
    assert _StubAnalyzer.rotation_calls == [0, 0]

    g = EnrollmentGallery(path=gpath)
    assert len(g) == 3 and g.stats()["n_labels"] == 2
    # the LARGEST face's identity (scale 1.0 vector) was enrolled
    assert g.identify(vecs[10])[0] == "Alice_Smith"
    assert g.identify(vecs[20])[0] == "bob"

    # --replace with a stale person whose new photos all fail detection:
    # Carol's old rows survive (with a warning), others are swapped in the
    # same atomic update
    g.enroll("Carol", rng.randn(16))
    carol = people / "Carol"
    carol.mkdir()
    cv2.imwrite(str(carol / "bad.png"), np.zeros((32, 32, 3), np.uint8))
    _StubAnalyzer.batch_calls.clear()
    cli.main(["enroll", str(people), gpath, "--replace"])
    captured = capsys.readouterr()
    assert "Carol" in captured.err and "kept" in captured.err
    g2 = EnrollmentGallery(path=gpath)
    assert len(g2) == 4                     # 3 replaced + Carol kept
    assert g2.identify(np.asarray(g._feats[-1]) * 2.0)[0] == "Carol"


def test_cli_analyze_gallery_labels(tmp_path, rng, monkeypatch, capsys):
    """`cli analyze --gallery` ranks every detected face against the
    enrollment gallery in one batched call and reports
    label/distance/nearest per face (null label beyond the threshold)."""
    import cv2

    from hse_facerec_tf_tpu import cli
    from hse_facerec_tf_tpu.pipelines.analyzer import FaceResult
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery

    alice = rng.randn(16).astype(np.float32)
    gpath = str(tmp_path / "g.npz")
    EnrollmentGallery(path=gpath).enroll("alice", alice)

    img = str(tmp_path / "p.jpg")
    cv2.imwrite(img, rng.randint(0, 255, (32, 32, 3)).astype(np.uint8))

    def face(vec):
        return FaceResult(bbox=(0, 0, 8, 8), raw_bbox=(0, 0, 8, 8),
                          score=0.9, age=30.0, gender_prob=0.7,
                          identity=vec, landmarks=np.zeros(10))

    class _Stub:
        def analyze_with_rotations(self, _):
            return [face(alice * 2.0),
                    face(rng.randn(16).astype(np.float32))], 0

    monkeypatch.setattr(cli, "_build_analyzer", lambda args: _Stub())
    cli.main(["analyze", img, "--gallery", gpath,
              "--match-threshold", "0.5"])
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert len(rows) == 2
    assert rows[0]["label"] == "alice" and rows[0]["distance"] < 0.05
    assert rows[1]["label"] is None and rows[1]["nearest"] == "alice"
    assert rows[1]["distance"] > 0.5

def test_gallery_replace_atomic(tmp_path, rng):
    """enroll_many(replace_labels=...) swaps rows in ONE atomic update:
    validation failures leave memory and disk untouched, the swap persists
    in a single save, and the ranking-mode preference survives reload."""
    from hse_facerec_tf_tpu.pipelines import gallery as gal_mod

    path = str(tmp_path / "g.npz")
    g = gal_mod.EnrollmentGallery(path=path)
    alice_old = rng.randn(16).astype(np.float32)
    g.enroll("alice", alice_old)
    g.enroll("bob", rng.randn(16))

    # failed validation (dim mismatch vs the SURVIVING rows) must not drop
    # alice's old rows — not in memory, not on disk
    with pytest.raises(ValueError):
        g.enroll_many(["alice"], rng.randn(1, 8), replace_labels=["alice"])
    assert len(g) == 2 and g.identify(alice_old)[0] == "alice"
    assert len(gal_mod.EnrollmentGallery(path=path)) == 2

    # successful replace: one save, old alice rows gone, new ones in
    saves = []
    orig = gal_mod.EnrollmentGallery._save_locked
    gal_mod.EnrollmentGallery._save_locked = (
        lambda self: (saves.append(1), orig(self)))
    try:
        alice_new = rng.randn(2, 16).astype(np.float32)
        n = g.enroll_many(["alice", "alice"], alice_new,
                          replace_labels=["alice"])
    finally:
        gal_mod.EnrollmentGallery._save_locked = orig
    assert n == 3 and saves == [1]
    assert g.identify(alice_new[0])[0] == "alice"
    label, dist, _ = g.identify(alice_old, threshold=10.0)
    assert dist > 0.1                  # the old row is really gone

    # replacing EVERY row may change the embedding dim (new --model)
    n = g.enroll_many(["x", "y"], rng.randn(2, 32).astype(np.float32),
                      replace_labels=["alice", "bob"])
    assert n == 2 and g.stats()["dim"] == 32

    # drop-only update (no additions) still persists
    n = g.enroll_many([], np.zeros((0, 0), np.float32),
                      replace_labels=["x"])
    assert n == 1 and len(gal_mod.EnrollmentGallery(path=path)) == 1


def test_gallery_ranking_mode_persists(tmp_path, rng):
    """--exact galleries stay f32 when reloaded without arguments (serve
    and album open the file with no quantized override); an explicit ctor
    bool still wins."""
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery

    path = str(tmp_path / "g.npz")
    g = EnrollmentGallery(path=path, quantized=False)
    g.enroll("a", rng.randn(16))
    assert EnrollmentGallery(path=path).quantized is False
    assert EnrollmentGallery(path=path, quantized=True).quantized is True
    # default for fresh and legacy (no 'ranking' field) files is int8
    assert EnrollmentGallery().quantized is True
    data = dict(np.load(path, allow_pickle=False))
    data.pop("ranking")
    np.savez(path, **data)
    assert EnrollmentGallery(path=path).quantized is True

def test_gallery_mesh_sharded_ranking(rng):
    """EnrollmentGallery(mesh=...) ranks through the gallery-sharded
    distributed 1-NN (state placed once per gallery version) and matches
    the single-device gallery exactly — int8 and f32, non-divisible N,
    rebuild after new enrollments."""
    from hse_facerec_tf_tpu.parallel.sharding import make_mesh
    from hse_facerec_tf_tpu.pipelines.gallery import EnrollmentGallery

    mesh = make_mesh()
    assert mesh.devices.size == 8
    feats = rng.randn(19, 32).astype(np.float32)    # 19 % 8 -> padded shards
    labels = [f"p{i % 7}" for i in range(19)]
    probes = np.concatenate([rng.randn(5, 32).astype(np.float32),
                             feats[3:4] * 2.0])     # one exact-hit probe
    for quantized in (True, False):
        local = EnrollmentGallery(quantized=quantized)
        sharded = EnrollmentGallery(quantized=quantized, mesh=mesh)
        local.enroll_many(labels, feats)
        sharded.enroll_many(labels, feats)
        want = local.identify_many(probes, threshold=0.9)
        got = sharded.identify_many(probes, threshold=0.9)
        for (l1, d1, n1), (l2, d2, n2) in zip(want, got):
            assert (l1, n1) == (l2, n2)
            assert d1 == pytest.approx(d2, abs=1e-4)
        assert got[-1][0] == "p3" and got[-1][1] < 0.05  # int8 noise ~1e-2

        # enrollment invalidates and rebuilds the sharded state
        new = rng.randn(32).astype(np.float32)
        sharded.enroll("newcomer", new)
        assert sharded.identify(new * 0.5)[0] == "newcomer"

    # repeated queries reuse the cached shard_map program (a fresh closure
    # per query would re-trace the distributed sweep every request)
    from hse_facerec_tf_tpu.parallel import knn as pknn

    before = pknn._sharded_ranker.cache_info().hits
    sharded.identify_many(probes)
    sharded.identify_many(probes)
    assert pknn._sharded_ranker.cache_info().hits > before

def test_identify_honors_request_deadline(rng):
    """Gallery ranking is device work: a wedged ranking call must return
    504 within the per-request deadline, not hang the handler thread."""
    from http.server import ThreadingHTTPServer

    from hse_facerec_tf_tpu.serve import make_handler

    block = threading.Event()

    class WedgedGallery:
        def identify(self, emb, threshold=0.82):
            block.wait(30)            # simulates a hung device link
            return ("x", 0.1, "x")

        def identify_many(self, embs, threshold=0.82):
            return [self.identify(e) for e in embs]

        def enroll(self, label, emb):
            return 1

        def stats(self):
            return {}

        def __len__(self):
            return 1

    fake = _FakeExtractor()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(_BatchingWorker(fake.extract_batch), analyze_worker=None,
                     request_timeout_s=0.5, gallery=WedgedGallery()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        enc = cv2.imencode(".png", img)[1].tobytes()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        t0 = time.monotonic()
        conn.request("POST", "/identify?mode=image", body=enc)
        r = conn.getresponse()
        assert r.status == 504
        assert time.monotonic() - t0 < 5
        assert "within" in json.loads(r.read())["error"]
    finally:
        block.set()
        server.shutdown()
