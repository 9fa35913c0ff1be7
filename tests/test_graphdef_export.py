"""Frozen-pb export round trip: native model -> pb -> re-import -> same outputs.

Also re-exports the shipped reference weights and checks the export is
loadable at the reference's tensor names — end-to-end wire-format fidelity.
"""

import numpy as np
import pytest

import jax

from hse_facerec_tf_tpu.core.graph_compiler import compile_pb
from hse_facerec_tf_tpu.core.graphdef import load_graphdef
from hse_facerec_tf_tpu.core.graphdef_export import (export_mobilenet_embedder_pb,
                                                     export_multihead_pb)
from hse_facerec_tf_tpu.models.mobilenet import (init_mobilenet_params,
                                                 mobilenet_embed)
from hse_facerec_tf_tpu.models.multihead import (import_multihead_params,
                                                 multihead_apply)

from .conftest import AGEGENDER_PB


def test_multihead_export_roundtrip(tmp_path, rng):
    """Export the imported reference weights to our own frozen pb; re-import
    and compare against the native model — full wire-format round trip."""
    params = import_multihead_params(str(AGEGENDER_PB))
    out_pb = str(tmp_path / "multihead.pb")
    export_multihead_pb(params, out_pb)

    g = load_graphdef(out_pb)
    ops = g.ops_histogram()
    assert ops["Conv2D"] == 14 and ops["DepthwiseConv2dNative"] == 13

    cg = compile_pb(out_pb, ["age_pred/Softmax:0", "gender_pred/Sigmoid:0",
                             "global_pooling/Mean:0"])
    x = rng.rand(1, 224, 224, 3).astype(np.float32) * 255 - 120
    age_g, gender_g, id_g = cg.jit()(cg.params, {"input_1": x})
    out = jax.jit(multihead_apply)(params, x)
    np.testing.assert_allclose(np.asarray(age_g), np.asarray(out.age_probs),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gender_g)[:, 0],
                               np.asarray(out.gender_prob), atol=1e-4)
    np.testing.assert_allclose(np.asarray(id_g), np.asarray(out.identity),
                               atol=1e-3, rtol=1e-4)


def test_mobilenet_embedder_export(tmp_path, rng):
    """Random-init embedder (BN form) -> frozen pb with vgg2_mobilenet names."""
    params = init_mobilenet_params(jax.random.PRNGKey(1))
    out_pb = str(tmp_path / "embed.pb")
    export_mobilenet_embedder_pb(params, out_pb, input_size=96)

    cg = compile_pb(out_pb, ["reshape_1/Reshape:0"])
    x = rng.rand(2, 96, 96, 3).astype(np.float32)
    (emb_g,) = cg.jit()(cg.params, {"input_1": x})
    emb_n = np.asarray(mobilenet_embed(params, x))
    a = np.asarray(emb_g)
    cos = (a * emb_n).sum(-1) / (np.linalg.norm(a, axis=-1)
                                 * np.linalg.norm(emb_n, axis=-1))
    assert cos.min() > 0.9999
