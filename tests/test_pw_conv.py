"""Pallas int8 pointwise-conv kernel (ops/pallas/pw_conv.py).

Parity layers (CPU interpret mode; the kernel's int32 accumulation is exact
on both backends so CPU parity transfers):
1. kernel vs the XLA conv form ``_pw_conv_int8`` + ``_requant`` — the exact
   serving numerics it replaces, across every pack factor p ∈ {1, 2, 4};
2. full int8 backbone with ``pallas_pw=True`` vs the XLA-conv backbone;
3. lane-unalignable layers return None from packing (XLA fallback path).
"""

import jax
import jax.numpy as jnp
import numpy as np

from hse_facerec_tf_tpu.models import int8_infer as qi
from hse_facerec_tf_tpu.ops.pallas.pw_conv import (pack_pw_weights,
                                                   pw_conv_int8_pallas)


def _random_layer(rng, c, cout):
    k = (rng.rand(c, cout).astype(np.float32) - 0.5) * 0.2
    s_w = np.maximum(np.abs(k).max(axis=0), 1e-12) / 127.0
    q = np.clip(np.round(k / s_w[None, :]), -127, 127).astype(np.int8)
    scale = (s_w * qi.ACT_SCALE).astype(np.float32)
    bias = (rng.rand(cout).astype(np.float32) - 0.5) * 0.5
    return q, scale, bias


def test_kernel_matches_xla_conv_form_all_pack_factors(rng):
    for c, cout, hw in [(32, 64, 28), (64, 128, 28), (128, 128, 14),
                        (256, 512, 14), (512, 1024, 7)]:
        a = rng.randint(0, 128, (2, hw, hw, c)).astype(np.int8)
        q, scale, bias = _random_layer(rng, c, cout)
        packed = pack_pw_weights(q, scale, bias)
        assert packed is not None
        wp, sp, bp, p = packed
        assert p == max(1, 128 // c)

        ref_f = qi._pw_conv_int8(jnp.asarray(a), jnp.asarray(q),
                                 jnp.asarray(scale), jnp.asarray(bias))
        got_q = np.asarray(pw_conv_int8_pallas(
            jnp.asarray(a), jnp.asarray(wp), jnp.asarray(sp),
            jnp.asarray(bp), p, requant=True, interpret=True))
        got_f = np.asarray(pw_conv_int8_pallas(
            jnp.asarray(a), jnp.asarray(wp), jnp.asarray(sp),
            jnp.asarray(bp), p, requant=False, interpret=True))

        # int32 accumulation is exact; the fused requant must agree with
        # _requant on the f32 epilogue (1-ulp fma drift cannot survive the
        # round on these magnitudes)
        np.testing.assert_array_equal(got_q, np.asarray(qi._requant(ref_f)))
        np.testing.assert_allclose(got_f, np.asarray(ref_f), atol=1e-5)


def test_backbone_pallas_pw_matches_xla_conv_backbone(rng):
    from hse_facerec_tf_tpu.models.mobilenet import init_mobilenet_params

    params = init_mobilenet_params(jax.random.PRNGKey(3), width=0.5)
    qp = jax.tree.map(jnp.asarray, qi.quantize_backbone_int8(params))
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)

    ref = np.asarray(qi.mobilenet_backbone_int8(qp, x, pallas_pw=False))
    got = np.asarray(qi.mobilenet_backbone_int8(qp, x, pallas_pw=True))

    assert got.shape == ref.shape
    # identical integer path; only the final f32 block epilogue can drift
    # by fma association (no requant after it)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_unalignable_layers_fall_back_to_xla(rng):
    # C=24 cannot tile to a 128 minor: packing declines, quantize omits the
    # packed keys, and the backbone dispatch must keep working
    q, scale, bias = _random_layer(rng, 24, 48)
    assert pack_pw_weights(q, scale, bias) is None

    from hse_facerec_tf_tpu.models.mobilenet import init_mobilenet_params
    params = init_mobilenet_params(jax.random.PRNGKey(5), width=0.25)
    qp = qi.quantize_backbone_int8(params)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    ref = np.asarray(qi.mobilenet_backbone_int8(
        jax.tree.map(jnp.asarray, qp), x, pallas_pw=False))
    got = np.asarray(qi.mobilenet_backbone_int8(
        jax.tree.map(jnp.asarray, qp), x, pallas_pw=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_multihead_int8_pallas_matches_conv_form(rng):
    from hse_facerec_tf_tpu.models.multihead import import_multihead_params

    from .conftest import AGEGENDER_PB

    params = import_multihead_params(str(AGEGENDER_PB))
    qp = jax.tree.map(jnp.asarray, qi.quantize_multihead_int8(params))
    # 96^2 keeps interpret-mode grids small; conv params are size-agnostic
    x = jnp.asarray(rng.rand(2, 96, 96, 3).astype(np.float32) * 50)

    ref = qi.multihead_apply_int8(qp, x, pallas_pw=False)
    got = qi.multihead_apply_int8(qp, x, pallas_pw=True)
    # per-block the kernel is exact up to ~1-in-500k single-quantum requant
    # flips at fma round boundaries (verified by per-block isolation); over
    # 13 requant layers those cascade — worst on noise inputs, whose
    # activations crowd the boundaries — so the contract here is the same
    # ranking-level agreement the shipped-weights fidelity test uses (a
    # wiring bug would give cos ≈ 0, not 0.999; on-device the A/B measured
    # cos 0.9999999 on preprocessed photos)
    a, b = np.asarray(ref.identity), np.asarray(got.identity)
    cos = np.sum(a * b, axis=1) / (np.linalg.norm(a, axis=1) *
                                   np.linalg.norm(b, axis=1) + 1e-12)
    assert cos.min() > 0.99, cos
    np.testing.assert_allclose(np.asarray(got.age_probs),
                               np.asarray(ref.age_probs), atol=5e-3)
