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
    # head must be reference-weight-compatible: AveragePooling2D(8,8,s1,'same')
    # + Flatten = 16·16·512 inputs to the bias-free Dense heads
    # (reference wide_resnet.py:133-138)
    assert params["gender"]["kernel"].shape == (16 * 16 * 512, 2)
    assert params["age"]["kernel"].shape == (16 * 16 * 512, 101)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    gender, age = wide_resnet_16_8(params, x)
    assert gender.shape == (2, 2) and age.shape == (2, 101)
    np.testing.assert_allclose(np.asarray(gender).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(age).sum(-1), 1.0, rtol=1e-4)


def test_wide_resnet_h5_import_roundtrip(rng, tmp_path):
    """Write a Keras-layout h5 in the external checkpoint's auto-numbered
    naming (utkface_test.py:294-302) and check the importer maps every tensor
    onto the right pytree slot (forward equality vs hand-built params)."""
    import h5py

    from hse_facerec_tf_tpu.models.wide_resnet import (
        init_wide_resnet_params, wide_resnet_16_8, wide_resnet_params_from_h5)

    params = init_wide_resnet_params(jax.random.PRNGKey(1))

    # flatten into keras creation order
    convs, bns = [], []
    convs.append(np.asarray(params["conv1"]["kernel"]))
    for g in (1, 2, 3):
        for b in range(2):
            blk = params[f"g{g}_b{b}"]
            bns.append(blk["bn1"])
            convs.append(np.asarray(blk["conv1"]))
            bns.append(blk["bn2"])
            convs.append(np.asarray(blk["conv2"]))
            if "proj" in blk:
                convs.append(np.asarray(blk["proj"]))
    bns.append(params["bn_final"])

    path = tmp_path / "wrn.h5"
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")

        def put(layer, weights):
            lg = root.create_group(layer).create_group(layer)
            for wname, arr in weights.items():
                lg.create_dataset(wname, data=np.asarray(arr))

        for i, kern in enumerate(convs, start=1):
            put(f"conv2d_{i}", {"kernel": kern})
        for i, bn in enumerate(bns, start=1):
            put(f"batch_normalization_{i}",
                {"gamma": bn["gamma"], "beta": bn["beta"],
                 "moving_mean": bn["mean"], "moving_variance": bn["var"]})
        put("dense_1", {"kernel": params["gender"]["kernel"]})
        put("dense_2", {"kernel": params["age"]["kernel"]})

    imported = wide_resnet_params_from_h5(str(path))
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    g0, a0 = wide_resnet_16_8(params, x)
    g1, a1 = wide_resnet_16_8(imported, x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-6)


def test_inception_resnet_slim_npz_import(rng, tmp_path):
    """Inverse-map init params to slim variable names, re-import, and check
    forward equality — including the Bottleneck FC whose slim BatchNorm must
    fold exactly into the dense kernel/bias."""
    from hse_facerec_tf_tpu.models.inception_resnet import (
        inception_resnet_v1, init_inception_resnet_v1_params,
        inception_resnet_v1_params_from_npz)

    p0 = init_inception_resnet_v1_params(jax.random.PRNGKey(2), with_heads=True)
    R = "InceptionResnetV1"
    w = {}

    def put_cb(scope, cb):
        w[f"{scope}/weights"] = np.asarray(cb["kernel"])
        bn = cb["bn"]
        w[f"{scope}/BatchNorm/beta"] = np.asarray(bn["beta"])
        w[f"{scope}/BatchNorm/moving_mean"] = np.asarray(bn["mean"])
        w[f"{scope}/BatchNorm/moving_variance"] = np.asarray(bn["var"])
        # no gamma: slim scale=False

    def put_up(scope, up):
        w[f"{scope}/weights"] = np.asarray(up["kernel"])
        w[f"{scope}/biases"] = np.asarray(up["bias"])

    stem = {"conv1a": "Conv2d_1a_3x3", "conv2a": "Conv2d_2a_3x3",
            "conv2b": "Conv2d_2b_3x3", "conv3b": "Conv2d_3b_1x1",
            "conv4a": "Conv2d_4a_3x3", "conv4b": "Conv2d_4b_3x3"}
    for k, s in stem.items():
        put_cb(f"{R}/{s}", p0[k])
    for i in range(5):
        s = f"{R}/Repeat/block35_{i + 1}"
        blk = p0[f"block35_{i}"]
        put_cb(f"{s}/Branch_0/Conv2d_1x1", blk["b0"])
        put_cb(f"{s}/Branch_1/Conv2d_0a_1x1", blk["b1a"])
        put_cb(f"{s}/Branch_1/Conv2d_0b_3x3", blk["b1b"])
        put_cb(f"{s}/Branch_2/Conv2d_0a_1x1", blk["b2a"])
        put_cb(f"{s}/Branch_2/Conv2d_0b_3x3", blk["b2b"])
        put_cb(f"{s}/Branch_2/Conv2d_0c_3x3", blk["b2c"])
        put_up(f"{s}/Conv2d_1x1", blk["up"])
    ra = p0["reduction_a"]
    put_cb(f"{R}/Mixed_6a/Branch_0/Conv2d_1a_3x3", ra["b0"])
    put_cb(f"{R}/Mixed_6a/Branch_1/Conv2d_0a_1x1", ra["b1a"])
    put_cb(f"{R}/Mixed_6a/Branch_1/Conv2d_0b_3x3", ra["b1b"])
    put_cb(f"{R}/Mixed_6a/Branch_1/Conv2d_1a_3x3", ra["b1c"])
    for i in range(10):
        s = f"{R}/Repeat_1/block17_{i + 1}"
        blk = p0[f"block17_{i}"]
        put_cb(f"{s}/Branch_0/Conv2d_1x1", blk["b0"])
        put_cb(f"{s}/Branch_1/Conv2d_0a_1x1", blk["b1a"])
        put_cb(f"{s}/Branch_1/Conv2d_0b_1x7", blk["b1b"])
        put_cb(f"{s}/Branch_1/Conv2d_0c_7x1", blk["b1c"])
        put_up(f"{s}/Conv2d_1x1", blk["up"])
    rb = p0["reduction_b"]
    put_cb(f"{R}/Mixed_7a/Branch_0/Conv2d_0a_1x1", rb["b0a"])
    put_cb(f"{R}/Mixed_7a/Branch_0/Conv2d_1a_3x3", rb["b0b"])
    put_cb(f"{R}/Mixed_7a/Branch_1/Conv2d_0a_1x1", rb["b1a"])
    put_cb(f"{R}/Mixed_7a/Branch_1/Conv2d_1a_3x3", rb["b1b"])
    put_cb(f"{R}/Mixed_7a/Branch_2/Conv2d_0a_1x1", rb["b2a"])
    put_cb(f"{R}/Mixed_7a/Branch_2/Conv2d_0b_3x3", rb["b2b"])
    put_cb(f"{R}/Mixed_7a/Branch_2/Conv2d_1a_3x3", rb["b2c"])
    for i, scope in list((j, f"{R}/Repeat_2/block8_{j + 1}") for j in range(5)) \
            + [("final", f"{R}/Block8")]:
        blk = p0[f"block8_{i}"]
        put_cb(f"{scope}/Branch_0/Conv2d_1x1", blk["b0"])
        put_cb(f"{scope}/Branch_1/Conv2d_0a_1x1", blk["b1a"])
        put_cb(f"{scope}/Branch_1/Conv2d_0b_1x3", blk["b1b"])
        put_cb(f"{scope}/Branch_1/Conv2d_0c_3x1", blk["b1c"])
        put_up(f"{scope}/Conv2d_1x1", blk["up"])
    # Bottleneck: random BN so the fold is actually exercised
    rs = np.random.RandomState(7)
    K = np.asarray(p0["bottleneck"]["kernel"])
    bmean = rs.randn(128).astype(np.float32) * 0.1
    bvar = rs.rand(128).astype(np.float32) + 0.5
    bbeta = rs.randn(128).astype(np.float32) * 0.1
    w[f"{R}/Bottleneck/weights"] = K
    w[f"{R}/Bottleneck/BatchNorm/beta"] = bbeta
    w[f"{R}/Bottleneck/BatchNorm/moving_mean"] = bmean
    w[f"{R}/Bottleneck/BatchNorm/moving_variance"] = bvar
    w["logits/age/weights"] = np.asarray(p0["age"]["kernel"])
    w["logits/age/biases"] = np.asarray(p0["age"]["bias"])
    w["logits/gender/weights"] = np.asarray(p0["gender"]["kernel"])
    w["logits/gender/biases"] = np.asarray(p0["gender"]["bias"])

    npz = tmp_path / "facenet_slim.npz"
    np.savez(npz, **w)
    p1 = inception_resnet_v1_params_from_npz(str(npz))

    x = np.random.RandomState(3).rand(1, 160, 160, 3).astype(np.float32) * 2 - 1
    # golden: run with identity bottleneck (kernel=K, bias=0), apply the
    # bottleneck BN by hand
    import copy

    p_ref = dict(p0)
    p_ref["bottleneck"] = {"kernel": jnp.asarray(K), "bias": jnp.zeros((128,))}
    raw = np.asarray(inception_resnet_v1(p_ref, x))
    want = (raw - bmean) / np.sqrt(bvar + 1e-3) + bbeta
    got = np.asarray(inception_resnet_v1(p1, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
