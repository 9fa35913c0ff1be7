"""Two-model age/gender configuration (reference ``facial_analysis.py:132-208``).

Synthesizes two small frozen graphs — an age net (softmax tap, 192² input) and
a gender net (sigmoid tap, 224² input) with the non-sota tensor names — via
the wire-level GraphBuilder, compiles them through core/graph_compiler, and
pins the heads' semantics against a numpy golden: per-model input resize,
BGR + Caffe means, renormalized top-2 age expectation, empty identity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder
from hse_facerec_tf_tpu.pipelines.heads import TwoModelHeads

CAFFE_MEANS = np.array([103.939, 116.779, 123.68], np.float32)


def _small_net_pb(path, rng, hw, n_out, act):
    """input_1 (N,hw,hw,3) → Mean over H,W → MatMul(3,n_out) → act tap
    'predictions/<act>'."""
    b = GraphBuilder()
    x = b.placeholder("input_1", [-1, hw, hw, 3])
    pooled = b.mean("pool", x, [1, 2])
    w = rng.randn(3, n_out).astype(np.float32)
    logits = b.matmul("predictions/MatMul", pooled, b.const("w", w))
    b.simple(act, f"predictions/{act}", [logits])
    with open(path, "wb") as f:
        f.write(b.serialize())
    return w


@pytest.fixture(scope="module")
def two_model(tmp_path_factory):
    rng = np.random.RandomState(0)
    d = tmp_path_factory.mktemp("twomodel")
    age_pb = str(d / "age_net.pb")
    gender_pb = str(d / "gender_net.pb")
    w_age = _small_net_pb(age_pb, rng, 192, 100, "Softmax")
    w_gender = _small_net_pb(gender_pb, rng, 224, 1, "Sigmoid")
    return age_pb, gender_pb, w_age, w_gender


def test_two_model_heads_match_numpy(two_model, rng):
    age_pb, gender_pb, w_age, w_gender = two_model
    heads = TwoModelHeads(age_pb, gender_pb)
    assert heads.age_hw == (192, 192)
    assert heads.gender_hw == (224, 224)

    crops = rng.rand(3, 224, 224, 3).astype(np.float32) * 255.0
    ages, gender_prob, identity = heads.apply(heads.params, jnp.asarray(crops))
    assert identity.shape == (3, 0)   # reference: features=[] (:284)

    import cv2

    for i in range(3):
        # age: cv2-linear resize to 192², BGR + Caffe means, top-2 expectation
        xa = cv2.resize(crops[i], (192, 192))[..., ::-1] - CAFFE_MEANS
        logits = xa.mean(axis=(0, 1)) @ w_age
        e = np.exp(logits - logits.max())
        probs = e / e.sum()
        top2 = np.argsort(probs)[::-1][:2]
        norm = probs[top2] / probs[top2].sum()
        want_age = 1.0 + float((top2 * norm).sum())
        assert abs(float(ages[i]) - want_age) < 0.2

        xg = crops[i][..., ::-1] - CAFFE_MEANS
        want_g = 1.0 / (1.0 + np.exp(-(xg.mean(axis=(0, 1)) @ w_gender)[0]))
        assert abs(float(gender_prob[i]) - want_g) < 1e-3


def test_analyzer_from_two_model_pbs(two_model, fixture_img_640):
    """The fused detect+two-heads program compiles and runs end-to-end."""
    from hse_facerec_tf_tpu.pipelines.analyzer import FacialAnalyzer

    from .conftest import MTCNN_PB

    age_pb, gender_pb, _, _ = two_model
    analyzer = FacialAnalyzer.from_two_model_pbs(str(MTCNN_PB), age_pb,
                                                 gender_pb, minsize=40)
    faces = analyzer.analyze(fixture_img_640)
    assert len(faces) >= 1
    for f in faces:
        assert 1.0 <= f.age <= 101.0
        assert 0.0 <= f.gender_prob <= 1.0
        assert f.identity.shape == (0,)


def test_exported_two_model_matches_one_model(fixture_img_640):
    """Round trip: split the shipped multi-head weights into separate age and
    gender frozen graphs (core/graphdef_export) and run the TWO-MODEL
    analyzer — per-face ages and gender probs must match the one-model
    analyzer (same weights, same 224² crops, no extra resize)."""
    import tempfile

    from hse_facerec_tf_tpu.core.graphdef_export import (export_age_pb,
                                                         export_gender_pb)
    from hse_facerec_tf_tpu.models.multihead import import_multihead_params
    from hse_facerec_tf_tpu.pipelines.analyzer import FacialAnalyzer

    from .conftest import AGEGENDER_PB, MTCNN_PB

    params = import_multihead_params(str(AGEGENDER_PB))
    with tempfile.TemporaryDirectory() as d:
        age_pb = f"{d}/age_net.pb"
        gender_pb = f"{d}/gender_net.pb"
        export_age_pb(params, age_pb)
        export_gender_pb(params, gender_pb)

        two = FacialAnalyzer.from_two_model_pbs(str(MTCNN_PB), age_pb,
                                                gender_pb, minsize=40)
        one = FacialAnalyzer.from_reference_models(str(MTCNN_PB),
                                                   str(AGEGENDER_PB), minsize=40)
        faces_two = two.analyze(fixture_img_640)
        faces_one = one.analyze(fixture_img_640)
        assert len(faces_two) == len(faces_one) >= 1
        for f2, f1 in zip(faces_two, faces_one):
            assert f2.bbox == f1.bbox
            assert abs(f2.age - f1.age) < 0.3
            assert abs(f2.gender_prob - f1.gender_prob) < 1e-2
