"""Pallas 1-NN kernel correctness (interpret mode on CPU) + auto dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hse_facerec_tf_tpu.ops.distance import pairwise_sqeuclidean
from hse_facerec_tf_tpu.ops.pallas.knn import (nearest_neighbor_auto,
                                               nearest_neighbor_tpu)


def _reference_nn(p, g):
    d = np.asarray(pairwise_sqeuclidean(p, g))
    idx = d.argmin(axis=1)
    return d[np.arange(len(p)), idx], idx


def test_kernel_interpret_matches_reference(rng):
    # sizes that exercise padding on both axes
    p = rng.randn(70, 128).astype(np.float32)
    g = rng.randn(1500, 128).astype(np.float32)
    dmin, idx = nearest_neighbor_tpu(jnp.asarray(p), jnp.asarray(g),
                                     bf16=False, interpret=True)
    want_d, want_i = _reference_nn(p, g)
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    np.testing.assert_allclose(np.asarray(dmin), want_d, rtol=1e-4, atol=1e-3)


def test_kernel_interpret_multiple_probe_tiles(rng):
    p = rng.randn(300, 64).astype(np.float32)
    g = rng.randn(1025, 64).astype(np.float32)  # forces a ragged gallery tile
    dmin, idx = nearest_neighbor_tpu(jnp.asarray(p), jnp.asarray(g),
                                     bf16=False, interpret=True)
    want_d, want_i = _reference_nn(p, g)
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    np.testing.assert_allclose(np.asarray(dmin), want_d, rtol=1e-4, atol=1e-3)


def test_auto_dispatch_cpu(rng):
    p = rng.randn(10, 32).astype(np.float32)
    g = rng.randn(50, 32).astype(np.float32)
    dmin, idx = nearest_neighbor_auto(jnp.asarray(p), jnp.asarray(g))
    want_d, want_i = _reference_nn(p, g)
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    np.testing.assert_allclose(np.asarray(dmin), want_d, rtol=1e-4, atol=1e-3)
