"""Parity for the fused Pallas crop+resize kernel (ops/pallas/crop.py).

The kernel replaces the two-einsum ``crop_resize_bilinear(outside='zero')``
form for the detector's stage-2/3 crop batches (reference semantics:
facial_analysis.py:545-547,577 — zero-padded crop buffers resized with
INTER_AREA). Interpret mode on CPU checks the weight math (hat weights +
supersample fold + zero outside) against the einsum path at HIGHEST; the
Mosaic multi-pass-bf16 drift on TPU is separately bounded at ~4e-5
relative (r5 microbench) and excluded from the HIGHEST exact-parity mode
by ``MTCNNDetector._use_pallas_crop``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hse_facerec_tf_tpu.ops.pallas.crop import CHUNK, crop_resize_zero_pallas
from hse_facerec_tf_tpu.ops.resize import crop_resize_bilinear


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def _boxes(rng, K, H, W, oob=False):
    y1 = rng.uniform(-30 if oob else 0, H - 20, (K,))
    x1 = rng.uniform(-30 if oob else 0, W - 20, (K,))
    s = rng.uniform(6, 150, (K,))
    return np.stack([y1, x1, y1 + s, x1 + s], -1).astype(np.float32)


@pytest.mark.parametrize("out_size,supersample", [(24, 2), (48, 2), (24, 1)])
def test_kernel_matches_einsum_form(rng, out_size, supersample):
    H, W = 120, 160
    img = (rng.rand(H, W, 3) * 255).astype(np.float32)
    boxes = _boxes(rng, 2 * CHUNK, H, W)
    want = np.asarray(crop_resize_bilinear(
        jnp.asarray(img), jnp.asarray(boxes), out_size,
        supersample=supersample, outside="zero",
        precision=jax.lax.Precision.HIGHEST))
    got = np.asarray(crop_resize_zero_pallas(
        jnp.asarray(img), jnp.asarray(boxes), out_size, supersample,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-2)  # 0-255 pixel units


def test_out_of_range_boxes_are_zero_padded(rng):
    """Boxes hanging off the image read zeros outside (the reference's
    black crop buffers), and fully-outside rows are exactly zero."""
    H, W = 96, 128
    img = (rng.rand(H, W, 3) * 255 + 1.0).astype(np.float32)  # strictly >0
    boxes = _boxes(rng, CHUNK, H, W, oob=True)
    boxes[0] = [-40.0, -40.0, -8.0, -8.0]  # fully outside
    want = np.asarray(crop_resize_bilinear(
        jnp.asarray(img), jnp.asarray(boxes), 24, supersample=2,
        outside="zero", precision=jax.lax.Precision.HIGHEST))
    got = np.asarray(crop_resize_zero_pallas(
        jnp.asarray(img), jnp.asarray(boxes), 24, 2, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-2)
    assert np.all(got[0] == 0.0)


def test_vmapped_batch_form(rng):
    """The detector calls the kernel under vmap (detect_batch lanes)."""
    H, W, L = 64, 96, 3
    imgs = (rng.rand(L, H, W, 3) * 255).astype(np.float32)
    boxes = np.stack([_boxes(rng, CHUNK, H, W) for _ in range(L)])
    want = np.asarray(jax.vmap(
        lambda im, b: crop_resize_bilinear(
            im, b, 24, supersample=2, outside="zero",
            precision=jax.lax.Precision.HIGHEST))(
        jnp.asarray(imgs), jnp.asarray(boxes)))
    got = np.asarray(jax.vmap(
        lambda im, b: crop_resize_zero_pallas(im, b, 24, 2, interpret=True))(
        jnp.asarray(imgs), jnp.asarray(boxes)))
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_detector_gating():
    """CPU/auto and HIGHEST stay on the einsum path; explicit overrides
    win; non-CHUNK-multiple budgets fall back."""
    from hse_facerec_tf_tpu.pipelines.detector import MTCNNDetector
    det = MTCNNDetector.__new__(MTCNNDetector)
    det.precision = jax.lax.Precision.HIGH
    det.crop_backend = "auto"
    on_tpu = jax.default_backend() == "tpu"
    assert det._use_pallas_crop(128) == on_tpu
    assert not det._use_pallas_crop(129)          # not a CHUNK multiple
    det.precision = jax.lax.Precision.HIGHEST
    assert not det._use_pallas_crop(128)          # exact-parity mode
    det.crop_backend = "pallas"
    assert det._use_pallas_crop(128)
    det.crop_backend = "einsum"
    det.precision = jax.lax.Precision.HIGH
    assert not det._use_pallas_crop(128)
