"""Full-int8 MobileNet serving path (models/int8_infer.py).

Three layers of verification:
1. the int8 pointwise dot is EXACT integer math vs a numpy int32 golden;
2. the whole int8 backbone matches an independent numpy reimplementation of
   the quantized arithmetic (same scheme, none of the same code);
3. fidelity on the SHIPPED reference weights: int8 vs f32 multi-head outputs
   on real photo crops (embedding cosine, age error, gender decisions).
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from .conftest import AGEGENDER_PB, TEST_IMAGE

from hse_facerec_tf_tpu.models import int8_infer as qi
from hse_facerec_tf_tpu.models.int8_infer import (
    ACT_SCALE, mobilenet_backbone_int8, multihead_apply_int8,
    quantize_backbone_int8, quantize_multihead_int8)


def test_pw_conv_int8_dot_is_exact_integer_math(rng):
    a = rng.randint(0, 128, size=(2, 5, 5, 64)).astype(np.int8)
    q = rng.randint(-127, 128, size=(64, 96)).astype(np.int8)
    scale = rng.rand(96).astype(np.float32) * 1e-2
    bias = rng.randn(96).astype(np.float32)

    out = np.asarray(qi._pw_conv_int8(jnp.asarray(a), jnp.asarray(q),
                                      jnp.asarray(scale), jnp.asarray(bias)))

    acc = a.reshape(-1, 64).astype(np.int32) @ q.astype(np.int32)
    ref = np.clip(acc.astype(np.float32) * scale + bias, 0, 6)
    ref = ref.reshape(2, 5, 5, 96)
    # the integer accumulation must be bit-exact; the epilogue is plain f32
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def _numpy_int8_backbone(qp, x):
    """Independent numpy golden of the int8 arithmetic. The depthwise taps
    are rounded to bf16 exactly as the device path computes them; the conv
    accumulates in f32 (assoc-order differences vs XLA stay ≤ ~1e-6)."""
    def bf16(a):
        return np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)

    def conv(x, k, stride, groups=1):
        kh, kw, cin_g, cout = k.shape
        n, h, w, cin = x.shape
        oh, ow = -(-h // stride), -(-w // stride)
        ph = max((oh - 1) * stride + kh - h, 0)
        pw_ = max((ow - 1) * stride + kw - w, 0)
        xp = np.zeros((n, h + ph, w + pw_, cin), np.float32)
        xp[:, ph // 2:ph // 2 + h, pw_ // 2:pw_ // 2 + w] = x
        out = np.zeros((n, oh, ow, cout), np.float32)
        gs_in, gs_out = cin // groups, cout // groups
        for g in range(groups):
            xs = xp[..., g * gs_in:(g + 1) * gs_in]
            ks = k[..., g * gs_out:(g + 1) * gs_out]
            for i in range(kh):
                for j in range(kw):
                    patch = xs[:, i:i + oh * stride:stride,
                               j:j + ow * stride:stride, :]
                    out[..., g * gs_out:(g + 1) * gs_out] += np.einsum(
                        "nhwc,co->nhwo", patch, ks[i, j], dtype=np.float32)
        return out

    def requant(y):
        return np.round(y / ACT_SCALE).astype(np.int8)

    c1 = qp["conv1"]
    y = conv(bf16(x), bf16(c1["kernel"]), 2)
    a = requant(np.clip(y + c1["bias"], 0, 6))
    nblocks = len(qi.MOBILENET_V1_BLOCKS)
    for i, (stride, _) in enumerate(qi.MOBILENET_V1_BLOCKS, start=1):
        dw = qp[f"dw{i}"]
        kh, kw, c, m = dw["kernel"].shape
        k = bf16(dw["kernel"]).reshape(kh, kw, 1, c * m)
        y = conv(a.astype(np.float32), k, stride, groups=c)
        a = requant(np.clip(y + dw["bias"], 0, 6))
        pw = qp[f"pw{i}"]
        acc = a.reshape(-1, a.shape[-1]).astype(np.int32) @ \
            pw["q"].astype(np.int32)
        y = np.clip(acc.astype(np.float32) * pw["scale"] + pw["bias"],
                    0, 6).reshape(a.shape[0], a.shape[1], a.shape[2], -1)
        if i == nblocks:
            return y
        a = requant(y)
    return y


def test_int8_backbone_matches_numpy_golden(rng):
    from hse_facerec_tf_tpu.models.mobilenet import init_mobilenet_params

    params = init_mobilenet_params(jax.random.PRNGKey(7), width=0.25)
    qp = quantize_backbone_int8(params)
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1

    got = np.asarray(mobilenet_backbone_int8(
        jax.tree.map(jnp.asarray, qp), jnp.asarray(x)))
    ref = _numpy_int8_backbone(qp, x)

    assert got.shape == ref.shape
    # f32 accumulation-order differences can flip a requant boundary by one
    # quantum; demand near-total agreement plus tight final tolerance.
    cos = np.dot(got.ravel(), ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12)
    assert cos > 0.99999, cos
    np.testing.assert_allclose(got, ref, atol=2.5 * ACT_SCALE)


def test_quantize_folds_bn_and_affine_forms_identically():
    from hse_facerec_tf_tpu.models.mobilenet import init_mobilenet_params

    params = init_mobilenet_params(jax.random.PRNGKey(3), width=0.25)
    # build the folded form via the same algebra the h5/pb importers use
    folded = {}
    for name, p in params.items():
        dw = name.startswith("dw")
        f = qi._fold_inference_affine(p, depthwise=dw)
        folded[name] = f
    qa = quantize_backbone_int8(params)
    qb = quantize_backbone_int8(folded)
    for k in qa:
        for field in qa[k]:
            np.testing.assert_allclose(qa[k][field], qb[k][field],
                                       rtol=1e-6, atol=1e-7)


@pytest.fixture(scope="module")
def real_multihead():
    from hse_facerec_tf_tpu.models.multihead import import_multihead_params

    return import_multihead_params(str(AGEGENDER_PB))


@pytest.fixture(scope="module")
def face_crops():
    """224² crops from the shipped demo photo: the whole frame plus two
    quadrant crops (realistic activation statistics, no detector needed)."""
    from hse_facerec_tf_tpu.ops.preprocess import IMAGENET_MEANS_BGR

    img = cv2.cvtColor(cv2.imread(str(TEST_IMAGE)), cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    crops = [img, img[: h // 2, : w // 2], img[h // 4:, w // 4:]]
    batch = np.stack([cv2.resize(c, (224, 224)) for c in crops]).astype(
        np.float32)
    means = np.asarray(IMAGENET_MEANS_BGR, np.float32)
    return batch[..., ::-1] - means


def test_int8_multihead_fidelity_on_shipped_weights(real_multihead, face_crops):
    from hse_facerec_tf_tpu.models.multihead import (expected_age_top_k,
                                                     multihead_apply)

    x = jnp.asarray(face_crops)
    f32 = multihead_apply(real_multihead, x)
    qp = jax.tree.map(jnp.asarray, quantize_multihead_int8(real_multihead))
    q = multihead_apply_int8(qp, x)

    # identity embeddings: downstream use is cosine ranking
    a = np.asarray(f32.identity)
    b = np.asarray(q.identity)
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.98, cos

    age_f32 = np.asarray(expected_age_top_k(f32.age_probs))
    age_q = np.asarray(expected_age_top_k(q.age_probs))
    assert np.abs(age_f32 - age_q).max() < 3.0, (age_f32, age_q)

    g_f32 = np.asarray(f32.gender_prob) >= 0.6
    g_q = np.asarray(q.gender_prob) >= 0.6
    assert (g_f32 == g_q).all(), (f32.gender_prob, q.gender_prob)


def test_hybrid_int8_prefix_blocks_run_bf16(real_multihead, face_crops):
    """``bf16_blocks_below`` keeps a float prefix (XLA's int8 conv emitter
    is slow on the early big-activation blocks — r3 fusion profile) and
    must be at least as faithful as the all-int8 path: fewer quantized
    layers, same contract."""
    from hse_facerec_tf_tpu.models.multihead import multihead_apply

    x = jnp.asarray(face_crops)
    f32 = multihead_apply(real_multihead, x)
    qp = jax.tree.map(jnp.asarray,
                      quantize_multihead_int8(real_multihead,
                                              bf16_blocks_below=4))
    # prefix blocks keep float kernels, suffix blocks are quantized
    assert "q" not in qp["backbone"]["pw4"]
    assert "q" in qp["backbone"]["pw5"]
    q = multihead_apply_int8(qp, x)
    a, b = np.asarray(f32.identity), np.asarray(q.identity)
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.98, cos
    g_f32 = np.asarray(f32.gender_prob) >= 0.6
    g_q = np.asarray(q.gender_prob) >= 0.6
    assert (g_f32 == g_q).all()


def test_int8_zoo_extractor_matches_f32_extractor(tmp_path):
    """The *_int8 zoo variants plug into the full extraction pipeline
    (resize + normalize + batch) and track their f32 base closely."""
    from hse_facerec_tf_tpu.models.zoo import build_extractor, weights_origin

    assert weights_origin("agegender_identity_int8") == "imported"

    img = cv2.cvtColor(cv2.imread(str(TEST_IMAGE)), cv2.COLOR_BGR2RGB)
    paths = []
    for i in range(2):
        p = tmp_path / f"crop{i}.jpg"
        h, w = img.shape[:2]
        cv2.imwrite(str(p), cv2.cvtColor(
            img[i * h // 4: i * h // 4 + h // 2,
                i * w // 4: i * w // 4 + w // 2], cv2.COLOR_RGB2BGR))
        paths.append(str(p))

    f32 = build_extractor("agegender_identity", batch_size=2)
    q = build_extractor("agegender_identity_int8", batch_size=2)
    a = f32.extract_files(paths)
    b = q.extract_files(paths)
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.98, cos


def test_int8_heads_analyzer_matches_f32_decisions(fixture_img_640):
    """End-to-end: the fused analyze program with int8 heads finds the same
    faces and makes the same age/gender calls as the f32 engine."""
    from hse_facerec_tf_tpu.pipelines.analyzer import FacialAnalyzer
    from .conftest import MTCNN_PB

    f32 = FacialAnalyzer.from_reference_models(str(MTCNN_PB),
                                               str(AGEGENDER_PB))
    q = FacialAnalyzer.from_reference_models(str(MTCNN_PB), str(AGEGENDER_PB),
                                             int8_heads=True)
    a = f32.analyze(fixture_img_640)
    b = q.analyze(fixture_img_640)
    assert len(a) == len(b) and len(a) > 0
    for fa, fb in zip(a, b):
        assert fa.bbox == fb.bbox            # detection path is untouched
        assert abs(fa.age - fb.age) < 3.0
        assert fa.is_male() == fb.is_male()
        cos = float(np.dot(fa.identity, fb.identity) /
                    (np.linalg.norm(fa.identity) *
                     np.linalg.norm(fb.identity)))
        assert cos > 0.98, cos


def test_int8_embed_jits_and_is_batch_stable(real_multihead, face_crops):
    """One compiled program serves any batch row order (pure function)."""
    qp = jax.tree.map(jnp.asarray,
                      quantize_backbone_int8(real_multihead["backbone"]))
    fn = jax.jit(lambda x: qi.mobilenet_embed_int8(qp, x))
    x = jnp.asarray(face_crops)
    out = np.asarray(fn(x))
    flipped = np.asarray(fn(x[::-1]))
    np.testing.assert_allclose(out, flipped[::-1], rtol=0, atol=0)
