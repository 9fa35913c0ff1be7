"""Serving layer: batching worker + HTTP endpoints (driven over a real socket)."""

import http.client
import json
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
    processed once the worker recovers — only live requests run."""
    block = threading.Event()
    processed = []

    def process(imgs):
        block.wait(30)
        processed.append(len(imgs))
        return [im.reshape(-1)[:4] for im in imgs]

    worker = _BatchingWorker(process, max_batch=1, max_wait_ms=1.0)
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
