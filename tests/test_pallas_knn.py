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


def test_kernel_interpret_design_point_shape(rng):
    """Out-of-HBM regime in miniature: a long gallery sweep (10 tiles) with
    ragged edges on both axes — the tiled accumulation pattern the kernel
    exists for. Exact agreement with the materialized-matrix reference."""
    p = rng.randn(300, 256).astype(np.float32)
    g = rng.randn(10 * 1024 + 7, 256).astype(np.float32)
    dmin, idx = nearest_neighbor_tpu(jnp.asarray(p), jnp.asarray(g),
                                     bf16=False, interpret=True)
    want_d, want_i = _reference_nn(p, g)
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    np.testing.assert_allclose(np.asarray(dmin), want_d, rtol=1e-4, atol=1e-3)


def test_chunked_xla_matches_reference(rng):
    from hse_facerec_tf_tpu.ops.pallas.knn import nearest_neighbor_chunked_xla

    p = rng.randn(700, 64).astype(np.float32)
    g = rng.randn(2000, 64).astype(np.float32)
    dmin, idx = nearest_neighbor_chunked_xla(jnp.asarray(p), jnp.asarray(g),
                                             chunk=512, bf16=False)
    want_d, want_i = _reference_nn(p, g)
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    np.testing.assert_allclose(np.asarray(dmin), want_d, rtol=1e-4, atol=1e-3)


def test_sharded_knn_matches_single_device(rng):
    """Gallery-sharded distributed 1-NN over the 8-device mesh == the
    single-device reference, including cross-shard tie-break (lowest global
    index) and gallery padding."""
    from hse_facerec_tf_tpu.parallel.knn import nearest_neighbor_sharded
    from hse_facerec_tf_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 8
    p = rng.randn(37, 64).astype(np.float32)
    g = rng.randn(1003, 64).astype(np.float32)   # pads to 8*126
    # plant exact duplicates in different shards: tie must resolve to the
    # LOWEST global index, as argmin does on one device
    g[900] = g[10]
    p[0] = g[10]
    dmin, idx = nearest_neighbor_sharded(jnp.asarray(p), jnp.asarray(g), mesh)
    want_d, want_i = _reference_nn(p, g)
    np.testing.assert_array_equal(np.asarray(idx), want_i)
    assert int(idx[0]) == 10
    np.testing.assert_allclose(np.asarray(dmin), want_d, rtol=1e-4, atol=1e-3)


def test_auto_dispatch_routing_rule():
    """The Pallas path engages exactly when the (M, N) f32 matrix exceeds the
    HBM comfort limit on a TPU backend (design point: 8192 probes x 1M
    gallery = 32 GB > 16 GB HBM)."""
    from hse_facerec_tf_tpu.ops.pallas.knn import use_pallas_path

    assert not use_pallas_path(1024, 204800, "tpu")          # 0.8 GB: XLA wins
    assert use_pallas_path(8192, 1_048_576, "tpu")           # 32 GB: matrix-free
    assert use_pallas_path(1024, 204800, "axon", force=True)
    assert not use_pallas_path(8192, 1_048_576, "cpu")       # never off-TPU


def test_nearest_neighbor_tie_breaking_lowest_index():
    """Duplicated gallery rows (exact distance ties) must resolve to the
    LOWEST global index across split-chain and tile boundaries, matching
    np.argmin semantics."""
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.ops.pallas.knn import nearest_neighbor_tpu

    rng = np.random.RandomState(5)
    probes = rng.randn(17, 8).astype(np.float32)
    base = rng.randn(40, 8).astype(np.float32)
    # every gallery row duplicated at base_idx + 40 AND + 80: ties everywhere
    gallery = np.concatenate([base, base, base])
    dmin, idx = nearest_neighbor_tpu(
        jnp.asarray(probes), jnp.asarray(gallery), bf16=False,
        interpret=True, tile_m=8, tile_n=16, splits=2)
    ref = ((probes[:, None, :] - gallery[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    assert np.asarray(idx).max() < 40     # always the FIRST duplicate
    np.testing.assert_allclose(np.asarray(dmin), ref.min(1), atol=1e-4)
