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


def test_int8_kernel_matches_dequantized_reference(rng):
    """The int8 kernel's ranking math is EXACT squared-L2 between the
    dequantized vectors (int32 MXU dot is exact; scales fold into the norm
    terms) — so it must agree with a float64 reference computed on the
    dequantized values, including argmin, with ragged tiles on both axes.
    The default pack_idx epilogue reports the distance with its low 10
    mantissa bits masked (where the argmin index rode through the single-min
    pass) — a ≤2^-13-of-(d+offset) one-sided blur on the REPORTED value
    only; pack_idx=False keeps the bit-exact two-pass epilogue."""
    from hse_facerec_tf_tpu.ops.pallas.knn import (nearest_neighbor_tpu_int8,
                                                   quantize_embeddings)

    p = rng.randn(300, 64).astype(np.float32)
    g = rng.randn(1025, 64).astype(np.float32)
    dmin, idx = nearest_neighbor_tpu_int8(jnp.asarray(p), jnp.asarray(g),
                                          interpret=True)
    dmin_exact, idx_exact = nearest_neighbor_tpu_int8(
        jnp.asarray(p), jnp.asarray(g), interpret=True, pack_idx=False)

    qa, sa = (np.asarray(t) for t in quantize_embeddings(jnp.asarray(p)))
    qb, sb = (np.asarray(t) for t in quantize_embeddings(jnp.asarray(g)))
    pa = qa.astype(np.float64) * sa
    gb = qb.astype(np.float64) * sb
    d = ((pa[:, None, :] - gb[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
    np.testing.assert_array_equal(np.asarray(idx_exact), d.argmin(1))
    np.testing.assert_allclose(np.asarray(dmin_exact), d.min(1), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(dmin), d.min(1), rtol=2e-3,
                               atol=1e-3)


def test_int8_kernel_tie_breaking_lowest_index(rng):
    """Duplicated gallery rows quantize identically -> exact int ties ->
    the kernel must pick the lowest global index, like np.argmin."""
    from hse_facerec_tf_tpu.ops.pallas.knn import nearest_neighbor_tpu_int8

    probes = rng.randn(17, 8).astype(np.float32)
    base = rng.randn(40, 8).astype(np.float32)
    gallery = np.concatenate([base, base, base])
    dmin, idx = nearest_neighbor_tpu_int8(
        jnp.asarray(probes), jnp.asarray(gallery),
        interpret=True, tile_m=8, tile_n=16, splits=2)
    assert np.asarray(idx).max() < 40


def test_int8_top1_agreement_on_normalized_embeddings(rng):
    """On L2-normalized clustered embeddings (the identification regime),
    int8 quantization must preserve every top-1 decision vs the exact f32
    path — the margin between same-class and cross-class distances dwarfs
    the ~1e-2 quantization noise."""
    from hse_facerec_tf_tpu.ops.pallas.knn import nearest_neighbor_tpu_int8

    centers = rng.randn(64, 128).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    g = np.repeat(centers, 8, axis=0) + 0.05 * rng.randn(512, 128).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    p = centers + 0.05 * rng.randn(64, 128).astype(np.float32)
    p /= np.linalg.norm(p, axis=1, keepdims=True)

    _, want = _reference_nn(p, g)
    _, got = nearest_neighbor_tpu_int8(jnp.asarray(p), jnp.asarray(g),
                                       interpret=True)
    got = np.asarray(got)
    # identity decision = which class the nearest row belongs to
    np.testing.assert_array_equal(got // 8, want // 8)


def test_int8_xla_twin_matches_pallas_kernel(rng):
    """nearest_neighbor_int8_xla computes the kernel's exact math in plain
    XLA — idx must agree with the interpret-mode Pallas kernel everywhere
    (same quantization, same scaled domain, same lowest-index ties)."""
    from hse_facerec_tf_tpu.ops.pallas.knn import (nearest_neighbor_int8_xla,
                                                   nearest_neighbor_tpu_int8q,
                                                   quantize_embeddings)

    p = rng.randn(70, 32).astype(np.float32)
    base = rng.randn(100, 32).astype(np.float32)
    g = np.concatenate([base, base[:30]])      # some exact ties
    qb, sb = quantize_embeddings(jnp.asarray(g))
    d1, i1 = nearest_neighbor_tpu_int8q(jnp.asarray(p), qb, sb, interpret=True,
                                        tile_m=16, tile_n=32, splits=2)
    d2, i2 = nearest_neighbor_int8_xla(jnp.asarray(p), qb, sb)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # pack_idx=True reports d with 10 low mantissa bits masked (one-sided);
    # the exact epilogue must match the twin bit-close
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-3,
                               atol=1e-4)
    d1e, i1e = nearest_neighbor_tpu_int8q(jnp.asarray(p), qb, sb,
                                          interpret=True, tile_m=16,
                                          tile_n=32, splits=2, pack_idx=False)
    np.testing.assert_array_equal(np.asarray(i1e), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1e), np.asarray(d2), rtol=1e-5,
                               atol=1e-4)


def test_int8_sharded_matches_single_device(rng):
    """Gallery-sharded int8 1-NN over the 8-device mesh == the single-device
    int8 XLA twin, including zero-padded shard masking (1003 rows -> 8×126)
    and cross-shard lowest-index ties."""
    from hse_facerec_tf_tpu.ops.pallas.knn import (nearest_neighbor_int8_xla,
                                                   quantize_embeddings)
    from hse_facerec_tf_tpu.parallel.knn import nearest_neighbor_sharded
    from hse_facerec_tf_tpu.parallel.sharding import make_mesh

    mesh = make_mesh()
    p = rng.randn(37, 64).astype(np.float32)
    g = rng.randn(1003, 64).astype(np.float32)
    g[900] = g[10]
    p[0] = g[10]
    dmin, idx = nearest_neighbor_sharded(jnp.asarray(p), jnp.asarray(g),
                                         mesh, int8=True)
    qb, sb = quantize_embeddings(jnp.asarray(g))
    want_d, want_i = nearest_neighbor_int8_xla(jnp.asarray(p), qb, sb)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_i))
    assert int(idx[0]) == 10
    np.testing.assert_allclose(np.asarray(dmin), np.asarray(want_d),
                               rtol=1e-5, atol=1e-4)


def test_knn_identifier_quantized(rng):
    """KNNIdentifier(quantized=True) stores an int8 gallery and must reach
    the same predictions as the exact identifier on clustered embeddings —
    with and without a mesh."""
    from hse_facerec_tf_tpu.pipelines.identification import KNNIdentifier
    from hse_facerec_tf_tpu.parallel.sharding import make_mesh

    centers = rng.randn(16, 64).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    g = np.repeat(centers, 6, axis=0) + 0.05 * rng.randn(96, 64).astype(np.float32)
    labels = np.repeat(np.arange(16), 6)
    p = centers + 0.05 * rng.randn(16, 64).astype(np.float32)

    want = KNNIdentifier(k=1).fit(g, labels).predict(p)
    got = KNNIdentifier(k=1, quantized=True).fit(g, labels).predict(p)
    np.testing.assert_array_equal(got, want)
    got_mesh = (KNNIdentifier(k=1, quantized=True, mesh=make_mesh())
                .fit(g, labels).predict(p))
    np.testing.assert_array_equal(got_mesh, want)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        KNNIdentifier(k=3, quantized=True)


def test_int8_packed_gallery_matches_unpacked(rng):
    """pack_quantized_gallery + nearest_neighbor_tpu_int8p == the unpacked
    int8 path exactly (idx and distances), including gallery tile padding."""
    from hse_facerec_tf_tpu.ops.pallas.knn import (nearest_neighbor_tpu_int8p,
                                                   nearest_neighbor_tpu_int8q,
                                                   pack_quantized_gallery,
                                                   quantize_embeddings)

    p = rng.randn(70, 32).astype(np.float32)
    g = rng.randn(1025, 32).astype(np.float32)
    qb, sb = quantize_embeddings(jnp.asarray(g))
    d1, i1 = nearest_neighbor_tpu_int8q(jnp.asarray(p), qb, sb, interpret=True,
                                        tile_m=16, tile_n=128, splits=2)
    qt, b2i, sc = pack_quantized_gallery(qb, sb, tile_n=128)
    d2, i2 = nearest_neighbor_tpu_int8p(jnp.asarray(p), qt, b2i, sc,
                                        interpret=True, tile_m=16,
                                        tile_n=128, splits=2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6,
                               atol=1e-6)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        nearest_neighbor_tpu_int8p(jnp.asarray(p), qt, b2i, sc,
                                   interpret=True, tile_n=512)


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
