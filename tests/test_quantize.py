"""Weight quantization roundtrip + model-quality preservation."""

import os

import jax
import numpy as np
import pytest

from hse_facerec_tf_tpu.core.graphdef import dequantize_min_first
from hse_facerec_tf_tpu.models.mobilenet import init_mobilenet_params, mobilenet_embed
from hse_facerec_tf_tpu.ops.quantize import (dequantize_pytree, load_quantized,
                                             quantize_array, quantize_pytree,
                                             save_quantized)


def test_quantize_array_roundtrip(rng):
    w = (rng.randn(64, 64) * 0.1).astype(np.float32)
    q, mn, mx = quantize_array(w)
    back = dequantize_min_first(q, mn, mx)
    step = (mx - mn) / 255.0
    assert np.abs(back - w).max() <= step  # within one quantization step
    assert q.dtype == np.uint8


def test_quantize_zero_representable(rng):
    """MIN_FIRST rounds the range so 0.0 is exactly representable — zeros in
    weights must come back as exactly zero (why TF uses this mode)."""
    w = (rng.randn(40, 40) * 0.2).astype(np.float32)
    w[::3] = 0.0
    q, mn, mx = quantize_array(w)
    back = dequantize_min_first(q, mn, mx)
    np.testing.assert_array_equal(back[::3], 0.0)


def test_pytree_roundtrip_and_size(tmp_path, rng):
    params = init_mobilenet_params(jax.random.PRNGKey(0))
    store = quantize_pytree(params)
    assert len(store["quantized"]) > 0
    back = dequantize_pytree(store)

    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    a = np.asarray(mobilenet_embed(params, x))
    b = np.asarray(mobilenet_embed(back, x))
    cos = float((a * b).sum()) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999  # BASELINE-style fidelity bar

    fq = str(tmp_path / "model_q")
    save_quantized(params, fq)
    loaded = load_quantized(fq)
    c = np.asarray(mobilenet_embed(loaded, x))
    np.testing.assert_allclose(b, c, atol=1e-5)

    # quantized file should be much smaller than an f32 dump
    ff = str(tmp_path / "model_f.npz")
    from hse_facerec_tf_tpu.train.checkpoints import save_pytree

    save_pytree(params, ff)
    assert os.path.getsize(fq + ".npz") < 0.45 * os.path.getsize(ff)
