"""Structural frozen-pb importer + keras_vggface ResNet-50 parity tests.

Round-trips prove the VERDICT-2 frozen-pb weight path: export a random-init
native model through core/graphdef_export.py (the exact frozen forms the
reference produces/consumes — ``facerec_test.py:212-213``), re-import via
core/pb_import.py's structural walk, and pin embedding equality against both
the native forward and the graph-compiler execution of the same pb. The
ResNet-50 architecture itself is validated against an independent torch
float64 golden (keras_vggface v1 semantics: ZeroPadding(3,3)+VALID stem,
stride on conv1/proj, VALID 3×3/2 max-pool)."""

import numpy as np
import pytest

from hse_facerec_tf_tpu.models.resnet import (STAGES, init_resnet50_params,
                                              resnet50_embed,
                                              resnet50_params_from_h5)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))


# ---------------------------------------------------------------- resnet50


def _torch_resnet50_embed(params, x_nhwc):
    """Independent torch float64 forward from the same param pytree."""
    import torch
    import torch.nn.functional as F

    t = lambda a: torch.from_numpy(np.asarray(a)).double()

    def conv_bn(x, p, stride=1, pad=0, relu=True):
        k = t(p["kernel"]).permute(3, 2, 0, 1)          # HWIO -> OIHW
        x = F.conv2d(x, k, stride=stride, padding=pad)
        bn = p["bn"]
        inv = t(bn["gamma"]) / torch.sqrt(t(bn["var"]) + 1e-3)
        shift = t(bn["beta"]) - t(bn["mean"]) * inv
        x = x * inv[None, :, None, None] + shift[None, :, None, None]
        return F.relu(x) if relu else x

    x = t(x_nhwc).permute(0, 3, 1, 2)
    x = conv_bn(x, params["stem"], stride=2, pad=3)     # ZeroPadding2D((3,3))
    x = F.max_pool2d(x, 3, 2)                           # VALID, floor
    for si, n_blocks in enumerate(STAGES):
        for bi in range(n_blocks):
            p = params[f"stage{si + 1}_block{bi + 1}"]
            stride = 2 if (bi == 0 and si > 0) else 1
            shortcut = x if "proj" not in p else conv_bn(
                x, p["proj"], stride=stride, relu=False)
            y = conv_bn(x, p["conv1"], stride=stride)
            y = conv_bn(y, p["conv2"], pad=1)           # 3x3 'same'
            y = conv_bn(y, p["conv3"], relu=False)
            x = F.relu(y + shortcut)
    return x.mean(dim=(2, 3)).numpy()


@pytest.fixture(scope="module")
def resnet_params():
    import jax

    return init_resnet50_params(jax.random.PRNGKey(11))


def test_resnet50_matches_torch_golden(resnet_params, rng):
    import jax

    x = rng.rand(1, 96, 96, 3).astype(np.float32) * 2 - 1
    got = np.asarray(jax.jit(resnet50_embed)(resnet_params, x))
    want = _torch_resnet50_embed(resnet_params, x)
    assert got.shape == (1, 2048)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    assert _cos(got, want) > 0.999999


def test_resnet50_pb_roundtrip(resnet_params, rng, tmp_path):
    """Native random-init -> frozen pb (keras form: Pad + FusedBatchNorm) ->
    structural import -> identical embeddings; the compiled-graph execution
    of the same pb is the cross-check."""
    import jax

    from hse_facerec_tf_tpu.core.graph_compiler import compile_pb
    from hse_facerec_tf_tpu.core.graphdef_export import export_resnet_embedder_pb
    from hse_facerec_tf_tpu.core.pb_import import resnet50_params_from_pb

    path = str(tmp_path / "vgg2_resnet.pb")
    export_resnet_embedder_pb(resnet_params, path)
    x = rng.rand(1, 96, 96, 3).astype(np.float32) * 2 - 1

    native = np.asarray(jax.jit(resnet50_embed)(resnet_params, x))

    cg = compile_pb(path, ["pool5_7x7_s1:0"])
    (graph_out,) = cg.jit()(cg.params, {"input": x})
    graph_out = np.asarray(graph_out).reshape(1, -1)
    np.testing.assert_allclose(graph_out, native, atol=2e-4, rtol=1e-4)

    imported = resnet50_params_from_pb(path)
    assert "bn" not in imported["stem"], "import should emit the folded form"
    reimported = np.asarray(jax.jit(resnet50_embed)(imported, x))
    np.testing.assert_allclose(reimported, native, atol=2e-4, rtol=1e-4)
    assert _cos(reimported, native) > 0.9999999


def test_resnet50_rcmalli_h5_import(resnet_params, tmp_path, rng):
    """Synthetic h5 in the keras_vggface (rcmalli) layer layout
    ('conv1/7x7_s2', 'conv{s}_{b}_1x1_reduce' + '/bn' groups) imports to the
    identical pytree; conv biases fold into the BN running mean."""
    import h5py
    import jax

    path = str(tmp_path / "rcmalli_vggface_tf_resnet50.h5")
    stem_bias = rng.randn(64).astype(np.float32)

    def put(root, layer, weights):
        g = root
        for part in (layer + "/" + layer).split("/"):
            g = g.require_group(part)
        for k, v in weights.items():
            g.create_dataset(k + ":0", data=np.asarray(v))

    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")

        def put_block(layer, p, bias=None):
            w = {"kernel": p["kernel"]}
            if bias is not None:
                w["bias"] = bias
            put(root, layer, w)
            bn = p["bn"]
            put(root, layer + "/bn",
                {"gamma": bn["gamma"], "beta": bn["beta"],
                 "moving_mean": bn["mean"], "moving_variance": bn["var"]})

        put_block("conv1/7x7_s2", resnet_params["stem"], bias=stem_bias)
        for si, n_blocks in enumerate(STAGES):
            for bi in range(n_blocks):
                p = resnet_params[f"stage{si + 1}_block{bi + 1}"]
                s, b = si + 2, bi + 1
                put_block(f"conv{s}_{b}_1x1_reduce", p["conv1"])
                put_block(f"conv{s}_{b}_3x3", p["conv2"])
                put_block(f"conv{s}_{b}_1x1_increase", p["conv3"])
                if bi == 0:
                    put_block(f"conv{s}_{b}_1x1_proj", p["proj"])

    imported = resnet50_params_from_h5(path)
    # stem bias folds into running mean: BN(x + b) == BN with mean - b
    np.testing.assert_allclose(
        np.asarray(imported["stem"]["bn"]["mean"]),
        np.asarray(resnet_params["stem"]["bn"]["mean"]) - stem_bias, atol=1e-6)
    # full-tree equality except the folded stem mean checked above
    flat_got = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
    flat_want = dict(jax.tree_util.tree_flatten_with_path(resnet_params)[0])
    assert flat_got.keys() == flat_want.keys()
    for path_k, v in flat_got.items():
        if "stem" in str(path_k) and "mean" in str(path_k):
            continue
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(flat_want[path_k]),
                                      err_msg=str(path_k))


def test_resnet50_h5_import_rejects_wrong_arch(tmp_path):
    import h5py

    path = str(tmp_path / "bad.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("conv1")
        g.create_dataset("kernel:0", data=np.zeros((7, 7, 3, 64), np.float32))
    with pytest.raises(KeyError):
        resnet50_params_from_h5(path)


def test_vggface_resnet50_zoo_entry():
    from hse_facerec_tf_tpu.models.zoo import MODEL_ZOO

    spec = MODEL_ZOO["vggface_resnet50"]
    # reference FeatureExtractor uses keras image.load_img (PIL NEAREST) +
    # keras_vggface preprocess_input default version=1
    # (facial_clustering_test.py:305-312)
    assert spec.input_size == (224, 224)
    assert spec.normalization == "vggface1"
    assert spec.resize_method == "pil_nearest"
    assert spec.embedding_dim == 2048


# ---------------------------------------------------------------- mobilenet


def test_mobilenet_pb_roundtrip(rng, tmp_path):
    """Native random-init -> folded frozen pb (BiasAdd + Relu6 form,
    reference vgg2_mobilenet tensor names) -> structural import ->
    identical embeddings."""
    import jax

    from hse_facerec_tf_tpu.core.graph_compiler import compile_pb
    from hse_facerec_tf_tpu.core.graphdef_export import export_mobilenet_embedder_pb
    from hse_facerec_tf_tpu.core.pb_import import mobilenet_params_from_pb
    from hse_facerec_tf_tpu.models.mobilenet import (init_mobilenet_params,
                                                     mobilenet_embed)

    params = init_mobilenet_params(jax.random.PRNGKey(3))
    path = str(tmp_path / "vgg2_mobilenet.pb")
    export_mobilenet_embedder_pb(params, path)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1

    native = np.asarray(jax.jit(mobilenet_embed)(params, x))
    cg = compile_pb(path, ["reshape_1/Reshape:0"])
    (graph_out,) = cg.jit()(cg.params, {"input_1": x})
    np.testing.assert_allclose(np.asarray(graph_out), native,
                               atol=1e-4, rtol=1e-4)

    imported = mobilenet_params_from_pb(path)
    reimported = np.asarray(jax.jit(mobilenet_embed)(imported, x))
    np.testing.assert_allclose(reimported, native, atol=1e-4, rtol=1e-4)
    assert _cos(reimported, native) > 0.9999999


def test_mobilenet_pb_import_rejects_wrong_arch(tmp_path, rng):
    from hse_facerec_tf_tpu.core.graphdef_export import export_resnet_embedder_pb
    from hse_facerec_tf_tpu.core.pb_import import (GraphStructureError,
                                                   mobilenet_params_from_pb)
    import jax

    path = str(tmp_path / "not_mobilenet.pb")
    export_resnet_embedder_pb(init_resnet50_params(jax.random.PRNGKey(0)), path)
    with pytest.raises(GraphStructureError):
        mobilenet_params_from_pb(path)


def test_zoo_vgg2_weights_origin(monkeypatch, tmp_path, rng):
    """Dropping a published pb blob in place flips weights_origin to
    'imported' and the zoo builds from it (VERDICT-2 #3 'done' criterion)."""
    import jax

    from hse_facerec_tf_tpu.core.graphdef_export import (
        export_mobilenet_embedder_pb, export_resnet_embedder_pb)
    from hse_facerec_tf_tpu.models import zoo
    from hse_facerec_tf_tpu.models.mobilenet import (init_mobilenet_params,
                                                     mobilenet_embed)

    assert zoo.weights_origin("vgg2_resnet") == "random"
    assert zoo.weights_origin("vgg2_mobilenet") == "random"

    mb_params = init_mobilenet_params(jax.random.PRNGKey(5))
    mb_pb = str(tmp_path / "vgg2_mobilenet.pb")
    export_mobilenet_embedder_pb(mb_params, mb_pb)
    rn_pb = str(tmp_path / "vgg2_resnet.pb")
    export_resnet_embedder_pb(init_resnet50_params(jax.random.PRNGKey(6)), rn_pb)

    monkeypatch.setattr(zoo, "VGG2_MOBILENET_PB", mb_pb)
    monkeypatch.setattr(zoo, "VGG2_RESNET_PB", rn_pb)
    assert zoo.weights_origin("vgg2_mobilenet") == "imported"
    assert zoo.weights_origin("vgg2_resnet") == "imported"

    with np.errstate(all="ignore"):
        imported = zoo.MODEL_ZOO["vgg2_mobilenet"].build_params()
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jax.jit(mobilenet_embed)(imported, x)),
        np.asarray(jax.jit(mobilenet_embed)(mb_params, x)),
        atol=1e-4, rtol=1e-4)


def test_mobilenet_kerasform_pb_import(rng, tmp_path):
    """Frozen-KERAS-form MobileNet pb — unfolded FusedBatchNorm per conv,
    with the stem's BN additionally wrapped in Switch/Merge learning-phase
    control flow as ``freeze_session`` leaves it (the form the published
    ``vgg2_mobilenet.pb`` would take) — imports through the structural
    walker with the BN folded numerically."""
    import jax

    from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder
    from hse_facerec_tf_tpu.core.pb_import import mobilenet_params_from_pb
    from hse_facerec_tf_tpu.models.mobilenet import (MOBILENET_V1_BLOCKS,
                                                     init_mobilenet_params,
                                                     mobilenet_embed)

    params = init_mobilenet_params(jax.random.PRNGKey(9))
    # make BN stats non-trivial so folding errors would show
    for key in list(params):
        bn = params[key]["bn"]
        n = bn["gamma"].shape[0]
        params[key]["bn"] = {
            "gamma": jax.numpy.asarray(rng.rand(n).astype(np.float32) + 0.5),
            "beta": jax.numpy.asarray(rng.randn(n).astype(np.float32) * 0.1),
            "mean": jax.numpy.asarray(rng.randn(n).astype(np.float32) * 0.2),
            "var": jax.numpy.asarray(rng.rand(n).astype(np.float32) + 0.3),
        }

    g = GraphBuilder()
    x = g.placeholder("input_1", [-1, 64, 64, 3])
    lp = g.placeholder_bool("conv1_bn/keras_learning_phase")

    def conv_bn_relu6(x, key, name, stride, depthwise=False, switch=False):
        p = params[key]
        w = g.const(f"{name}/kernel", np.asarray(p["kernel"], np.float32))
        if depthwise:
            x = g.depthwise_conv2d(f"{name}/depthwise", x, w, stride=stride)
        else:
            x = g.conv2d(f"{name}/Conv2D", x, w, stride=stride)
        bn = p["bn"]
        consts = [g.const(f"{name}_bn/{k}", np.asarray(bn[k], np.float32))
                  for k in ("gamma", "beta", "mean", "var")]
        if switch:
            sw = g.switch(f"{name}_bn/cond/Switch", x, lp)
            train_y = g.simple(
                "Mul", f"{name}_bn/cond/train",
                [sw + ":1", g.const(f"{name}_bn/two",
                                    np.float32(2.0).reshape(()))])
            bn_out = g.fused_batch_norm(f"{name}_bn/FusedBatchNorm",
                                        sw + ":0", *consts, epsilon=1e-3)
            x = g.merge(f"{name}_bn/cond/Merge", [train_y, bn_out + ":0"])
        else:
            x = g.fused_batch_norm(f"{name}_bn/FusedBatchNorm", x, *consts,
                                   epsilon=1e-3)
        return g.simple("Relu6", f"{name}/Relu6", [x])

    x = conv_bn_relu6(x, "conv1", "conv1", 2, switch=True)
    for i, (stride, _) in enumerate(MOBILENET_V1_BLOCKS, start=1):
        x = conv_bn_relu6(x, f"dw{i}", f"conv_dw_{i}", stride, depthwise=True)
        x = conv_bn_relu6(x, f"pw{i}", f"conv_pw_{i}", 1)
    g.mean("global_pooling/Mean", x, [1, 2])
    shape_const = g.const("reshape_1/shape", np.asarray([-1, 1024], np.int32))
    from hse_facerec_tf_tpu.core import protowire as pw
    from hse_facerec_tf_tpu.core.graphdef import DT_FLOAT, DT_INT32
    body = (pw.encode_string_field(1, "reshape_1/Reshape")
            + pw.encode_string_field(2, "Reshape")
            + pw.encode_string_field(3, "global_pooling/Mean")
            + pw.encode_string_field(3, shape_const)
            + GraphBuilder._attr_type("T", DT_FLOAT)
            + GraphBuilder._attr_type("Tshape", DT_INT32))
    g._nodes.append(pw.encode_bytes_field(1, body))

    path = str(tmp_path / "vgg2_mobilenet_keras.pb")
    with open(path, "wb") as f:
        f.write(g.serialize())

    imported = mobilenet_params_from_pb(path)
    assert "bn" not in imported["conv1"]       # folded form
    xin = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    native = np.asarray(jax.jit(mobilenet_embed)(params, xin))
    got = np.asarray(jax.jit(mobilenet_embed)(imported, xin))
    np.testing.assert_allclose(got, native, atol=2e-4, rtol=1e-4)
    assert _cos(got, native) > 0.9999999


def _walk_small_graph(tmp_path, build):
    """Helper: build a tiny conv graph with GraphBuilder, return its _Walk
    and first conv node."""
    from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder
    from hse_facerec_tf_tpu.core.pb_import import _Walk

    g = GraphBuilder()
    out_name = build(g)
    path = str(tmp_path / "tiny.pb")
    with open(path, "wb") as f:
        f.write(g.serialize())
    walk = _Walk(path, [out_name])
    conv = next(n for n in walk.nodes if n.op == "Conv2D")
    return walk, conv


def test_fold_affine_sub_const_minuend(tmp_path, rng):
    """Sub(c, conv) — constant first — must negate the data path:
    c - (s·x + b) == (-s)·x + (c - b)."""
    w = rng.randn(1, 1, 2, 3).astype(np.float32)
    cvec = rng.randn(3).astype(np.float32)
    bvec = rng.randn(3).astype(np.float32)

    def build(g):
        x = g.placeholder("input", [-1, 4, 4, 2])
        conv = g.conv2d("conv/Conv2D", x, g.const("conv/kernel", w))
        added = g.simple("BiasAdd", "conv/BiasAdd",
                         [conv, g.const("conv/bias", bvec)])
        sub = g.simple("Sub", "conv/Sub", [g.const("conv/c", cvec), added])
        return g.simple("Relu", "conv/Relu", [sub])

    walk, conv = _walk_small_graph(tmp_path, build)
    scale, bias, act, _ = walk.fold_affine(conv)
    np.testing.assert_allclose(scale, -np.ones(3), atol=1e-6)
    np.testing.assert_allclose(bias, cvec - bvec, atol=1e-6)
    assert act == "Relu"


def test_fold_affine_stops_at_post_activation_affine(tmp_path, rng):
    """conv → Relu → Mul(c): the post-activation Mul must NOT fold into the
    pre-activation (scale, bias) — relu(c·x) != c·relu(x) in general."""
    w = rng.randn(1, 1, 2, 3).astype(np.float32)

    def build(g):
        x = g.placeholder("input", [-1, 4, 4, 2])
        conv = g.conv2d("conv/Conv2D", x, g.const("conv/kernel", w))
        relu = g.simple("Relu", "conv/Relu", [conv])
        return g.simple("Mul", "post/Mul",
                        [relu, g.const("post/c",
                                       rng.rand(3).astype(np.float32) + 2.0)])

    walk, conv = _walk_small_graph(tmp_path, build)
    scale, bias, act, last = walk.fold_affine(conv)
    np.testing.assert_allclose(scale, np.ones(3), atol=1e-6)
    np.testing.assert_allclose(bias, np.zeros(3), atol=1e-6)
    assert act == "Relu"
    assert last.name == "conv/Relu"     # stopped before the post-act Mul


def test_fold_affine_rejects_non_relu6_clip(tmp_path, rng):
    """conv → Minimum(·, 3): a clip that isn't the ReLU6 bound is not
    foldable — the walk must stop without claiming an activation."""
    w = rng.randn(1, 1, 2, 3).astype(np.float32)

    def build(g):
        x = g.placeholder("input", [-1, 4, 4, 2])
        conv = g.conv2d("conv/Conv2D", x, g.const("conv/kernel", w))
        return g.simple("Minimum", "conv/Min",
                        [conv, g.const("conv/three",
                                       np.float32(3.0).reshape(()))])

    walk, conv = _walk_small_graph(tmp_path, build)
    scale, bias, act, last = walk.fold_affine(conv)
    assert act is None
    assert last.name == "conv/Conv2D"


def test_fold_affine_unfused_bn_const_expressions(tmp_path, rng):
    """TF1-era graphs leave BN as raw Mul/Add where the multiplier is a
    CONST EXPRESSION (gamma·rsqrt(var+eps)) — eval_const must evaluate the
    Rsqrt/Mul/Sub chain numerically and the fold must match a reference
    BN."""
    from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder
    from hse_facerec_tf_tpu.core import protowire as pw
    from hse_facerec_tf_tpu.core.graphdef import DT_FLOAT

    w = rng.randn(1, 1, 2, 3).astype(np.float32)
    gamma = rng.rand(3).astype(np.float32) + 0.5
    beta = rng.randn(3).astype(np.float32)
    mean = rng.randn(3).astype(np.float32) * 0.2
    var = rng.rand(3).astype(np.float32) + 0.3

    def build(g):
        x = g.placeholder("input", [-1, 4, 4, 2])
        conv = g.conv2d("conv/Conv2D", x, g.const("conv/kernel", w))
        # batchnorm/mul = gamma * rsqrt(var + eps) as graph ops over consts
        veps = g.simple("Add", "bn/add_eps",
                        [g.const("bn/var", var),
                         g.const("bn/eps", np.float32(1e-3).reshape(()))])
        # Rsqrt node (unary — build raw since GraphBuilder.simple fits)
        rs = g.simple("Rsqrt", "bn/rsqrt", [veps])
        mul_const = g.simple("Mul", "bn/mul",
                             [g.const("bn/gamma", gamma), rs])
        scaled = g.simple("Mul", "bn/mul_1", [conv, mul_const])
        # batchnorm/sub = beta - mean * mul
        shift = g.simple("Sub", "bn/sub",
                         [g.const("bn/beta", beta),
                          g.simple("Mul", "bn/mul_2",
                                   [g.const("bn/mean", mean), mul_const])])
        out = g.simple("Add", "bn/add_1", [scaled, shift])
        return g.simple("Relu", "conv/Relu", [out])

    walk, conv = _walk_small_graph(tmp_path, build)
    scale, bias, act, _ = walk.fold_affine(conv)
    inv = gamma / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(scale, inv, rtol=1e-6)
    np.testing.assert_allclose(bias, beta - mean * inv, rtol=1e-5, atol=1e-6)
    assert act == "Relu"
