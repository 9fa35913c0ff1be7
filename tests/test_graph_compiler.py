"""Parity: JAX graph compiler vs independent torch-based golden executor.

Both execute the *shipped reference weights* (``mtcnn.pb``, quantized
age/gender pb), so these tests pin the compiled XLA programs to the frozen-graph
semantics the reference relies on (``facial_analysis.py:336-351,83-89``).
"""

import numpy as np
import pytest

from hse_facerec_tf_tpu.core.graphdef import load_graphdef, extract_constants
from hse_facerec_tf_tpu.core.graph_compiler import compile_graph

from .conftest import MTCNN_PB, AGEGENDER_PB
from . import golden_tf_executor as golden


@pytest.fixture(scope="module")
def mtcnn_graph():
    return load_graphdef(str(MTCNN_PB))


@pytest.fixture(scope="module")
def agegender_graph():
    return load_graphdef(str(AGEGENDER_PB))


def _compare(cg, graph, feeds, outputs, atol=1e-4):
    got = cg.jit()(cg.params, feeds)
    want = golden.run_graph(graph, feeds, outputs)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=atol, rtol=1e-4)


def test_parse_shapes(mtcnn_graph):
    consts = extract_constants(mtcnn_graph)
    assert consts["pnet/conv1/weights"].shape == (3, 3, 3, 10)
    assert consts["rnet/conv4/weights"].shape == (576, 128)
    assert consts["onet/conv5/weights"].shape == (1152, 256)
    assert consts["pnet/PReLU1/alpha"].shape == (10,)


def test_pnet_parity(mtcnn_graph, rng):
    outputs = ["pnet/conv4-2/BiasAdd:0", "pnet/prob1:0"]
    cg = compile_graph(mtcnn_graph, outputs)
    x = (rng.rand(1, 46, 62, 3).astype(np.float32) - 0.5) * 2
    _compare(cg, mtcnn_graph, {"pnet/input": x}, outputs)


def test_rnet_parity(mtcnn_graph, rng):
    outputs = ["rnet/conv5-2/conv5-2:0", "rnet/prob1:0"]
    cg = compile_graph(mtcnn_graph, outputs)
    x = (rng.rand(4, 24, 24, 3).astype(np.float32) - 0.5) * 2
    _compare(cg, mtcnn_graph, {"rnet/input": x}, outputs)


def test_onet_parity(mtcnn_graph, rng):
    outputs = ["onet/conv6-2/conv6-2:0", "onet/conv6-3/conv6-3:0", "onet/prob1:0"]
    cg = compile_graph(mtcnn_graph, outputs)
    x = (rng.rand(3, 48, 48, 3).astype(np.float32) - 0.5) * 2
    _compare(cg, mtcnn_graph, {"onet/input": x}, outputs)


def test_agegender_parity(agegender_graph, rng):
    outputs = ["age_pred/Softmax:0", "gender_pred/Sigmoid:0", "global_pooling/Mean:0"]
    cg = compile_graph(agegender_graph, outputs)
    x = rng.rand(1, 224, 224, 3).astype(np.float32) * 255.0 - 120.0
    _compare(cg, agegender_graph, {"input_1": x}, outputs, atol=5e-3)


def _keras_bn_graphdef(rng):
    """Synthesize a frozen-Keras-style graph the way the reference's
    ``freeze_session`` leaves it (``facerec_keras_train.py:70-83``): unfolded
    FusedBatchNorm behind Switch/Merge learning-phase control flow keyed on a
    boolean placeholder (``conv1_bn/keras_learning_phase:0``,
    ``facerec_test.py:64,118-119,212``). The training branch multiplies by 2 so
    any branch mix-up fails loudly."""
    from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder
    from hse_facerec_tf_tpu.core.graphdef import parse_graphdef

    w = rng.randn(3, 3, 3, 4).astype(np.float32) * 0.3
    gamma = rng.rand(4).astype(np.float32) + 0.5
    beta = rng.randn(4).astype(np.float32)
    mean = rng.randn(4).astype(np.float32) * 0.2
    var = rng.rand(4).astype(np.float32) + 0.3

    b = GraphBuilder()
    x = b.placeholder("input_1", [-1, 8, 8, 3])
    conv = b.conv2d("conv1/convolution", x, b.const("conv1/kernel", w))
    lp = b.placeholder_bool("conv1_bn/keras_learning_phase")
    sw = b.switch("conv1_bn/cond/Switch", conv, lp)
    train_y = b.simple("Mul", "conv1_bn/cond/train_branch",
                       [sw + ":1", b.const("two", np.float32(2.0).reshape(()))])
    bn = b.fused_batch_norm(
        "conv1_bn/cond/FusedBatchNorm", sw + ":0",
        b.const("conv1_bn/gamma", gamma), b.const("conv1_bn/beta", beta),
        b.const("conv1_bn/moving_mean", mean),
        b.const("conv1_bn/moving_variance", var), epsilon=1e-3)
    merged = b.merge("conv1_bn/cond/Merge", [train_y, bn + ":0"])
    b.simple("Relu", "conv1/Relu", [merged])
    return parse_graphdef(b.serialize()), (w, gamma, beta, mean, var)


def test_frozen_keras_bn_control_flow(rng):
    """FusedBatchNorm + Switch/Merge learning-phase graphs compile and match
    an independently computed conv+BN golden (inference branch selected)."""
    graph, (w, gamma, beta, mean, var) = _keras_bn_graphdef(rng)
    x = rng.rand(2, 8, 8, 3).astype(np.float32) * 2 - 1

    cg = compile_graph(graph, ["conv1/Relu:0"])
    (got,) = cg.jit()(cg.params, {"input_1": x})

    conv = golden._conv2d_tf(x.astype(np.float64), w.astype(np.float64),
                             (1, 1), "SAME")
    want = np.maximum(
        (conv - mean) * (gamma / np.sqrt(var + 1e-3)) + beta, 0.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
    # the dead training branch must be pruned out of the trace entirely
    assert "two" not in cg.params
    assert all(n.name != "conv1_bn/cond/train_branch" for n in cg._needed)


def test_frozen_keras_bn_training_branch(rng):
    """learning_phase=True statically selects the other Switch branch."""
    graph, (w, *_rest) = _keras_bn_graphdef(rng)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)

    cg = compile_graph(graph, ["conv1/Relu:0"], learning_phase=True)
    (got,) = cg.jit()(cg.params, {"input_1": x})
    conv = golden._conv2d_tf(x.astype(np.float64), w.astype(np.float64),
                             (1, 1), "SAME")
    np.testing.assert_allclose(np.asarray(got), np.maximum(conv * 2.0, 0.0),
                               atol=1e-5, rtol=1e-5)


def test_agegender_batched(agegender_graph, rng):
    """The reference runs batch-1 per sess.run; our compiled fn is batch-polymorphic."""
    outputs = ["global_pooling/Mean:0"]
    cg = compile_graph(agegender_graph, outputs)
    x = rng.rand(3, 224, 224, 3).astype(np.float32) * 255.0 - 120.0
    fn = cg.jit()
    (batched,) = fn(cg.params, {"input_1": x})
    singles = [np.asarray(fn(cg.params, {"input_1": x[i : i + 1]})[0])[0] for i in range(3)]
    np.testing.assert_allclose(np.asarray(batched), np.stack(singles), atol=2e-4, rtol=1e-4)


def test_const_feeds_scalar_placeholder(rng):
    """Extra-feed tensors pinned at compile time — the reference's
    additional_input_value convention (facerec_test.py:51,118-119, e.g.
    insightface.pb dropout_rate:0 = 0.9)."""
    from hse_facerec_tf_tpu.core.graphdef import parse_graphdef
    from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder

    b = GraphBuilder()
    x = b.placeholder("input", [-1, 4, 4, 3])
    rate = b.placeholder("dropout_rate", [])
    pooled = b.mean("pool", x, [1, 2])
    b.simple("Mul", "out", [pooled, rate])
    graph = parse_graphdef(b.serialize())

    xv = rng.rand(2, 4, 4, 3).astype(np.float32)
    cg = compile_graph(graph, ["out:0"],
                       const_feeds={"dropout_rate:0": np.float32(0.9)})
    (got,) = cg.jit()(cg.params, {"input": xv})
    np.testing.assert_allclose(np.asarray(got),
                               xv.mean(axis=(1, 2)) * 0.9, atol=1e-6)

    # without the feed the placeholder is unfed: a loud error, not a default
    cg_nofeed = compile_graph(graph, ["out:0"])
    with pytest.raises(KeyError):
        cg_nofeed.fn(cg_nofeed.params, {"input": xv})


def test_const_feeds_bool_drives_branch_pruning(rng):
    """A bool const feed (FaceNet's phase_train:0) statically resolves
    Switch/Merge control flow like the learning_phase flag does."""
    graph, (w, gamma, beta, mean, var) = _keras_bn_graphdef(rng)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)

    cg = compile_graph(
        graph, ["conv1/Relu:0"],
        const_feeds={"conv1_bn/keras_learning_phase:0": np.bool_(True)})
    (got,) = cg.jit()(cg.params, {"input_1": x})
    conv = golden._conv2d_tf(x.astype(np.float64), w.astype(np.float64),
                             (1, 1), "SAME")
    np.testing.assert_allclose(np.asarray(got), np.maximum(conv * 2.0, 0.0),
                               atol=1e-5, rtol=1e-5)

    cg_inf = compile_graph(
        graph, ["conv1/Relu:0"],
        const_feeds={"conv1_bn/keras_learning_phase:0": np.bool_(False)})
    (got_inf,) = cg_inf.jit()(cg_inf.params, {"input_1": x})
    want = np.maximum((conv - mean) * (gamma / np.sqrt(var + 1e-3)) + beta, 0.0)
    np.testing.assert_allclose(np.asarray(got_inf), want, atol=1e-5, rtol=1e-5)
    # dead training branch pruned under the False feed
    assert all(n.name != "conv1_bn/cond/train_branch" for n in cg_inf._needed)


def test_graph_extractor_extra_feeds(rng, tmp_path):
    """graph_extractor end-to-end with a pinned scalar feed (the FaceNet /
    insightface.pb zoo rows, facerec_test.py:215-216)."""
    from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder
    from hse_facerec_tf_tpu.models.zoo import graph_extractor

    b = GraphBuilder()
    x = b.placeholder("img_inputs", [-1, 8, 8, 3])
    rate = b.placeholder("dropout_rate", [])
    pooled = b.mean("pool", x, [1, 2])
    b.simple("Mul", "embeddings", [pooled, rate])
    pb = str(tmp_path / "ext.pb")
    with open(pb, "wb") as f:
        f.write(b.serialize())

    ex = graph_extractor(pb, "img_inputs:0", "embeddings:0", (8, 8),
                         normalization="none", resize_method="cv2_linear",
                         batch_size=4, extra_feeds={"dropout_rate:0": 0.9})
    imgs = (rng.rand(2, 8, 8, 3) * 255).astype(np.uint8)
    feats = ex.extract_batch(imgs)
    np.testing.assert_allclose(
        feats, imgs.astype(np.float32).mean(axis=(1, 2)) * 0.9, rtol=1e-5)
