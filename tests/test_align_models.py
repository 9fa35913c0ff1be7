"""Alignment op vs skimage/cv2 goldens; new model family shapes."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hse_facerec_tf_tpu.ops.align import (align_faces, arcface_template,
                                          estimate_similarity,
                                          landmarks_from_detector, warp_affine)


def test_estimate_similarity_vs_cv2(rng):
    """cv2.estimateAffinePartial2D (full least squares) as the golden for the
    Umeyama similarity estimate (what skimage SimilarityTransform computes)."""
    # noisy-but-consistent correspondences (LMEDS degenerates on uncorrelated
    # random points); src = template under a known similarity + small noise
    dst = arcface_template(112)
    theta, scale = 0.2, 1.3
    r = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]], np.float32)
    src = (dst - 56.0) @ r.T / scale + 56.0 + rng.randn(5, 2).astype(np.float32) * 0.5
    want, _ = cv2.estimateAffinePartial2D(src.reshape(-1, 1, 2),
                                          dst.reshape(-1, 1, 2),
                                          method=cv2.LMEDS)
    got = np.asarray(estimate_similarity(jnp.asarray(src), jnp.asarray(dst)))
    # cv2 LMEDS is a robust (not exact-LS) estimator; compare in point space
    ones = np.concatenate([src, np.ones((5, 1), np.float32)], axis=1)
    np.testing.assert_allclose(ones @ got.T, ones @ want.T, atol=1.0)


def test_estimate_similarity_exact_recovery(rng):
    """Recover a known similarity transform exactly from noiseless points."""
    theta, scale, tx, ty = 0.3, 1.7, 12.0, -5.0
    r = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    src = rng.rand(5, 2).astype(np.float64) * 50
    dst = (scale * src @ r.T) + np.array([tx, ty])
    m = np.asarray(estimate_similarity(jnp.asarray(src, dtype=jnp.float32),
                                       jnp.asarray(dst, dtype=jnp.float32)))
    np.testing.assert_allclose(m[:, :2], scale * r, atol=1e-3)
    np.testing.assert_allclose(m[:, 2], [tx, ty], atol=1e-2)


def test_warp_affine_vs_cv2(rng):
    img = (rng.rand(80, 100, 3) * 255).astype(np.float32)
    m = np.array([[0.9, 0.1, 5.0], [-0.1, 0.9, 3.0]], dtype=np.float32)
    want = cv2.warpAffine(img, m, (64, 48))
    got = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(m), (48, 64)))
    # interior agreement (borders differ by partial-pixel conventions)
    assert np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2]).max() < 1.5


def test_align_faces_roundtrip(rng):
    """Aligning a face whose landmarks already match the template ~= identity
    crop at the landmark positions."""
    img = (rng.rand(200, 200, 3) * 255).astype(np.float32)
    template = arcface_template(112) + np.array([40.0, 50.0])  # shifted copy
    aligned = np.asarray(align_faces(jnp.asarray(img), jnp.asarray(template[None])))
    assert aligned.shape == (1, 112, 112, 3)
    # the warp should be a pure translation by (-40, -50)
    want = img[50:50 + 112, 40:40 + 112]
    assert np.abs(aligned[0] - want).max() < 1e-2


def test_landmark_layout():
    pts = np.arange(20).reshape(2, 10).astype(np.float32)
    lmk = landmarks_from_detector(pts)
    assert lmk.shape == (2, 5, 2)
    np.testing.assert_array_equal(lmk[0, :, 0], pts[0, 0:5])
    np.testing.assert_array_equal(lmk[0, :, 1], pts[0, 5:10])


def test_inception_resnet_v1_shapes(rng):
    from hse_facerec_tf_tpu.models.inception_resnet import (
        inception_resnet_v1, inception_resnet_v1_age_gender,
        init_inception_resnet_v1_params)

    params = init_inception_resnet_v1_params(jax.random.PRNGKey(0), with_heads=True)
    x = rng.rand(1, 160, 160, 3).astype(np.float32)
    emb = inception_resnet_v1(params, x)
    assert emb.shape == (1, 128)
    age, gender = inception_resnet_v1_age_gender(params, x)
    assert age.shape == (1, 101) and gender.shape == (1, 2)


def test_wide_resnet_shapes(rng):
    from hse_facerec_tf_tpu.models.wide_resnet import (init_wide_resnet_params,
                                                       wide_resnet_16_8)

    params = init_wide_resnet_params(jax.random.PRNGKey(0))
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    gender, age = wide_resnet_16_8(params, x)
    assert gender.shape == (2, 2) and age.shape == (2, 101)
    np.testing.assert_allclose(np.asarray(gender).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(age).sum(-1), 1.0, rtol=1e-4)
