"""Native JAX models vs graph-compiled reference weights.

The graph compiler is itself validated against an independent torch golden
executor (test_graph_compiler.py), so agreement here pins the native models to
the reference's frozen-graph numerics end to end.
"""

import jax
import numpy as np
import pytest

from hse_facerec_tf_tpu.core.graph_compiler import compile_pb
from hse_facerec_tf_tpu.models import mtcnn as m
from hse_facerec_tf_tpu.models.multihead import (expected_age_top_k,
                                                 import_multihead_params,
                                                 multihead_apply)

from .conftest import MTCNN_PB, AGEGENDER_PB


@pytest.fixture(scope="module")
def mtcnn_params():
    return m.import_mtcnn_params(str(MTCNN_PB))


def test_pnet_native_vs_graph(mtcnn_params, rng):
    cg = compile_pb(str(MTCNN_PB), ["pnet/conv4-2/BiasAdd:0", "pnet/prob1:0"])
    x = (rng.rand(2, 37, 53, 3).astype(np.float32) - 0.5) * 2
    reg_g, prob_g = cg.jit()(cg.params, {"pnet/input": x})
    reg_n, prob_n = jax.jit(m.pnet)(mtcnn_params["pnet"], x)
    np.testing.assert_allclose(np.asarray(reg_n), np.asarray(reg_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob_n), np.asarray(prob_g), atol=1e-5)


def test_rnet_native_vs_graph(mtcnn_params, rng):
    cg = compile_pb(str(MTCNN_PB), ["rnet/conv5-2/conv5-2:0", "rnet/prob1:0"])
    x = (rng.rand(6, 24, 24, 3).astype(np.float32) - 0.5) * 2
    reg_g, prob_g = cg.jit()(cg.params, {"rnet/input": x})
    reg_n, prob_n = jax.jit(m.rnet)(mtcnn_params["rnet"], x)
    np.testing.assert_allclose(np.asarray(reg_n), np.asarray(reg_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob_n), np.asarray(prob_g), atol=1e-5)


def test_onet_native_vs_graph(mtcnn_params, rng):
    cg = compile_pb(str(MTCNN_PB),
                    ["onet/conv6-2/conv6-2:0", "onet/conv6-3/conv6-3:0", "onet/prob1:0"])
    x = (rng.rand(6, 48, 48, 3).astype(np.float32) - 0.5) * 2
    reg_g, lmk_g, prob_g = cg.jit()(cg.params, {"onet/input": x})
    reg_n, lmk_n, prob_n = jax.jit(m.onet)(mtcnn_params["onet"], x)
    np.testing.assert_allclose(np.asarray(reg_n), np.asarray(reg_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lmk_n), np.asarray(lmk_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob_n), np.asarray(prob_g), atol=1e-5)


def test_rnet_onet_im2col_matches_conv(mtcnn_params, rng):
    """The shifted-slice im2col form of the R/O-Net VALID convs is a pure
    reformulation: pinned exactly against the conv form (ADVICE r4 — the
    option is unmeasured on TPU for R/O, so parity is what keeps it)."""
    x24 = (rng.rand(6, 24, 24, 3).astype(np.float32) - 0.5) * 2
    for a, b in zip(jax.jit(lambda p, v: m.rnet(p, v, im2col=True))(
                        mtcnn_params["rnet"], x24),
                    jax.jit(m.rnet)(mtcnn_params["rnet"], x24)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    x48 = (rng.rand(6, 48, 48, 3).astype(np.float32) - 0.5) * 2
    for a, b in zip(jax.jit(lambda p, v: m.onet(p, v, im2col=True))(
                        mtcnn_params["onet"], x48),
                    jax.jit(m.onet)(mtcnn_params["onet"], x48)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multihead_native_vs_graph(rng):
    params = import_multihead_params(str(AGEGENDER_PB))
    cg = compile_pb(str(AGEGENDER_PB),
                    ["age_pred/Softmax:0", "gender_pred/Sigmoid:0", "global_pooling/Mean:0"])
    x = rng.rand(2, 224, 224, 3).astype(np.float32) * 255.0 - 120.0
    age_g, gender_g, id_g = cg.jit()(cg.params, {"input_1": x})
    out = jax.jit(multihead_apply)(params, x)
    # identity features must match to high cosine (BASELINE target: >0.999)
    a = np.asarray(out.identity); b = np.asarray(id_g)
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.9999, cos
    np.testing.assert_allclose(np.asarray(out.age_probs), np.asarray(age_g), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.gender_prob), np.asarray(gender_g)[:, 0], atol=2e-4)


def test_expected_age_top2():
    probs = np.zeros((1, 100), dtype=np.float32)
    probs[0, 30] = 0.5
    probs[0, 40] = 0.3
    probs[0, 10] = 0.2
    # top-2 bins are 30 (5/8) and 40 (3/8) -> 33.75
    age = expected_age_top_k(probs, k=2)
    np.testing.assert_allclose(np.asarray(age), [30 * 5 / 8 + 40 * 3 / 8], rtol=1e-5)


def test_mobilenet_init_shapes():
    from hse_facerec_tf_tpu.models.mobilenet import (init_mobilenet_params,
                                                     mobilenet_classify,
                                                     mobilenet_embed)
    params = init_mobilenet_params(jax.random.PRNGKey(0), n_classes=17)
    x = np.zeros((2, 96, 96, 3), dtype=np.float32)
    emb = mobilenet_embed(params, x)
    assert emb.shape == (2, 1024)
    logits = mobilenet_classify(params, x)
    assert logits.shape == (2, 17)


def test_zoo_random_init_warns_loudly():
    """Missing vgg2 blobs must not silently produce garbage embeddings
    (the reference lists them in .MISSING_LARGE_BLOBS)."""
    import os
    import warnings

    import pytest

    from hse_facerec_tf_tpu.models import zoo

    assert zoo.weights_origin("agegender_identity") == "imported"
    if not os.path.exists(zoo.VGG2_MOBILENET_H5):
        assert zoo.weights_origin("vgg2_mobilenet") == "random"
        with pytest.warns(RuntimeWarning, match="RANDOM"):
            zoo.MODEL_ZOO["vgg2_mobilenet"].build_params()
    with pytest.warns(RuntimeWarning, match="RANDOM"):
        zoo.MODEL_ZOO["vgg2_resnet"].build_params()


def test_mtcnn_nets_vs_independent_float64_executor(mtcnn_params, rng):
    """P/R/O-net native forwards pinned DIRECTLY against the independent
    numpy-float64 golden executor on the shipped mtcnn.pb — closing the loop
    the compiler-based pins above leave open (a bug shared by the native nets
    and the JAX graph compiler would cancel out there; the float64 executor
    shares no code with either)."""
    from hse_facerec_tf_tpu.core.graphdef import load_graphdef

    from . import golden_tf_executor as golden

    graph = load_graphdef(str(MTCNN_PB))

    x = rng.rand(2, 12, 12, 3).astype(np.float32) * 2 - 1
    reg_g, prob_g = golden.run_graph(
        graph, {"pnet/input": x}, ["pnet/conv4-2/BiasAdd:0", "pnet/prob1:0"])
    reg_n, prob_n = jax.jit(m.pnet)(mtcnn_params["pnet"], x)
    np.testing.assert_allclose(np.asarray(reg_n), reg_g, atol=2e-5)
    np.testing.assert_allclose(np.asarray(prob_n), prob_g, atol=2e-5)

    x = rng.rand(3, 24, 24, 3).astype(np.float32) * 2 - 1
    reg_g, prob_g = golden.run_graph(
        graph, {"rnet/input": x}, ["rnet/conv5-2/conv5-2:0", "rnet/prob1:0"])
    reg_n, prob_n = jax.jit(m.rnet)(mtcnn_params["rnet"], x)
    np.testing.assert_allclose(np.asarray(reg_n), reg_g, atol=2e-5)
    np.testing.assert_allclose(np.asarray(prob_n), prob_g, atol=2e-5)

    x = rng.rand(3, 48, 48, 3).astype(np.float32) * 2 - 1
    reg_g, lmk_g, prob_g = golden.run_graph(
        graph, {"onet/input": x},
        ["onet/conv6-2/conv6-2:0", "onet/conv6-3/conv6-3:0", "onet/prob1:0"])
    reg_n, lmk_n, prob_n = jax.jit(m.onet)(mtcnn_params["onet"], x)
    np.testing.assert_allclose(np.asarray(reg_n), reg_g, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lmk_n), lmk_g, atol=2e-5)
    np.testing.assert_allclose(np.asarray(prob_n), prob_g, atol=2e-5)
