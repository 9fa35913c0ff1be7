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


def test_agegender_batched(agegender_graph, rng):
    """The reference runs batch-1 per sess.run; our compiled fn is batch-polymorphic."""
    outputs = ["global_pooling/Mean:0"]
    cg = compile_graph(agegender_graph, outputs)
    x = rng.rand(3, 224, 224, 3).astype(np.float32) * 255.0 - 120.0
    fn = cg.jit()
    (batched,) = fn(cg.params, {"input_1": x})
    singles = [np.asarray(fn(cg.params, {"input_1": x[i : i + 1]})[0])[0] for i in range(3)]
    np.testing.assert_allclose(np.asarray(batched), np.stack(singles), atol=2e-4, rtol=1e-4)
