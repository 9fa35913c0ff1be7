"""Model zoo: named configurations mirroring the reference's model selectors.

The reference chooses models via commented-out constructor lines
(``facerec_test.py:209-218``) and module flags (``facial_analysis.py:29-33``).
Here each entry is a declarative spec: builder + input size + preprocessing
(normalization scheme and resize flavor per the reference's per-model
settings), resolved into an ``EmbeddingExtractor`` or analyzer.
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Callable, Dict, Optional, Tuple

import jax

REFERENCE_ROOT = "/root/reference"
MTCNN_PB = os.path.join(REFERENCE_ROOT, "age_gender_identity", "mtcnn.pb")
AGEGENDER_PB = os.path.join(REFERENCE_ROOT, "age_gender_identity",
                            "age_gender_tf2_new-01-0.14-0.92_quantized.pb")
VGG2_MOBILENET_H5 = os.path.join(REFERENCE_ROOT, "models", "vgg2_mobilenet.h5")
VGG2_MOBILENET_PB = os.path.join(REFERENCE_ROOT, "models", "vgg2_mobilenet.pb")
VGG2_RESNET_PB = os.path.join(REFERENCE_ROOT, "models", "vgg2_resnet.pb")


@dataclasses.dataclass
class ModelSpec:
    name: str
    input_size: Tuple[int, int]
    normalization: str       # ops.preprocess.NORMALIZERS key
    resize_method: str
    embedding_dim: int
    build_params: Callable[[], Dict]
    model_fn_factory: Callable  # precision -> f(params, x)
    # extra EmbeddingExtractor options (flip_tta, l2_normalize_output, ...)
    extractor_kwargs: Dict = dataclasses.field(default_factory=dict)

    def model_fn(self, precision=jax.lax.Precision.HIGHEST):
        return self.model_fn_factory(precision)


def _multihead_identity_fn(precision=jax.lax.Precision.HIGHEST):
    from .multihead import multihead_apply

    def fn(params, x):
        return multihead_apply(params, x, precision=precision).identity

    return fn


def _mobilenet_fn(precision=jax.lax.Precision.HIGHEST):
    from .mobilenet import mobilenet_embed

    return lambda params, x: mobilenet_embed(params, x, precision=precision)


def _multihead_identity_int8_fn(precision=jax.lax.Precision.HIGHEST):
    # int8 serving path: precision dial does not apply (integer MXU dots)
    from .int8_infer import multihead_apply_int8

    return lambda params, x: multihead_apply_int8(params, x).identity


def _agegender_int8_params():
    from .int8_infer import quantize_multihead_int8

    return quantize_multihead_int8(_agegender_params())


def _mobilenet_int8_fn(precision=jax.lax.Precision.HIGHEST):
    from .int8_infer import mobilenet_embed_int8

    return lambda params, x: mobilenet_embed_int8(params, x)


def _vgg2_mobilenet_int8_params():
    from .int8_infer import quantize_backbone_int8

    return quantize_backbone_int8(_vgg2_mobilenet_params())


def _resnet_fn(precision=jax.lax.Precision.HIGHEST):
    from .resnet import resnet50_embed

    return lambda params, x: resnet50_embed(params, x, precision=precision)


def _agegender_params():
    from .multihead import import_multihead_params

    return import_multihead_params(AGEGENDER_PB)


def _warn_random_init(name: str, missing_path: str) -> None:
    warnings.warn(
        f"model {name!r}: trained weights not found at {missing_path} "
        "(a blob the reference obtains externally / lists in "
        ".MISSING_LARGE_BLOBS) — using RANDOM initialization. Embeddings "
        "will be meaningless for recognition; provide the weight file or "
        "pick a model with shipped weights (e.g. 'agegender_identity').",
        RuntimeWarning, stacklevel=3)


def weights_origin(name: str) -> str:
    """'imported' if the zoo entry resolves to trained reference weights on
    this machine, 'random' if building it would fall back to random init."""
    if name.endswith("_int8"):       # int8 serving variants share the blobs
        name = name[: -len("_int8")]
    if name == "vgg2_mobilenet":
        return ("imported" if os.path.exists(VGG2_MOBILENET_H5)
                or os.path.exists(VGG2_MOBILENET_PB) else "random")
    if name == "vgg2_resnet":
        return "imported" if os.path.exists(VGG2_RESNET_PB) else "random"
    if name == "insightface_arcface":
        return "imported" if os.path.exists(ARCFACE_NPZ) else "random"
    if name == "vggface_vgg16":
        return "imported" if os.path.exists(VGGFACE_VGG16_H5) else "random"
    if name == "vggface_resnet50":
        return "imported" if os.path.exists(VGGFACE_RESNET50_H5) else "random"
    return "imported"  # shipped pbs (mtcnn, quantized age/gender)


def _vgg2_mobilenet_params():
    """vgg2_mobilenet weights: the Keras ``.h5`` if present, else the frozen
    ``.pb`` via the structural importer (the reference consumes the pb form
    directly, ``facerec_test.py:212``; both blobs are missing upstream:
    .MISSING_LARGE_BLOBS). Falls back to random init — with a loud warning —
    so the pipeline stays runnable."""
    from ..core.h5_import import mobilenet_params_from_h5
    from .mobilenet import init_mobilenet_params

    if os.path.exists(VGG2_MOBILENET_H5):
        return mobilenet_params_from_h5(VGG2_MOBILENET_H5)
    if os.path.exists(VGG2_MOBILENET_PB):
        from ..core.pb_import import mobilenet_params_from_pb

        return mobilenet_params_from_pb(VGG2_MOBILENET_PB)
    _warn_random_init("vgg2_mobilenet", VGG2_MOBILENET_H5)
    return init_mobilenet_params(jax.random.PRNGKey(0))


def _vgg2_resnet_params():
    """vgg2_resnet.pb (reference ``facerec_test.py:213``; missing upstream)
    via the structural frozen-pb importer; random init otherwise."""
    from .resnet import init_resnet50_params

    if os.path.exists(VGG2_RESNET_PB):
        from ..core.pb_import import resnet50_params_from_pb

        return resnet50_params_from_pb(VGG2_RESNET_PB)
    _warn_random_init("vgg2_resnet", VGG2_RESNET_PB)
    return init_resnet50_params(jax.random.PRNGKey(0))


# ArcFace r100 checkpoint as an .npz of flat MXNet param names (the MXNet
# blob itself lives outside the repo — insightface_face_embedding.py:24).
ARCFACE_NPZ = os.environ.get(
    "HSE_FACEREC_ARCFACE_NPZ",
    os.path.join(REFERENCE_ROOT, "models", "arcface_r100.npz"))

# keras_vggface VGG16 weights (rcmalli_vggface_tf_vgg16.h5 — external blob,
# downloaded by keras_vggface in the reference's environment).
VGGFACE_VGG16_H5 = os.environ.get(
    "HSE_FACEREC_VGGFACE16_H5",
    os.path.join(REFERENCE_ROOT, "models", "rcmalli_vggface_tf_vgg16.h5"))

# keras_vggface ResNet-50 weights (rcmalli_vggface_tf_resnet50.h5 — the
# 'resnet50'/avg_pool extractor variant, facial_clustering_test.py:296-300).
VGGFACE_RESNET50_H5 = os.environ.get(
    "HSE_FACEREC_VGGFACE_RESNET50_H5",
    os.path.join(REFERENCE_ROOT, "models", "rcmalli_vggface_tf_resnet50.h5"))


def _vggface_resnet50_params():
    from .resnet import init_resnet50_params, resnet50_params_from_h5

    if os.path.exists(VGGFACE_RESNET50_H5):
        return resnet50_params_from_h5(VGGFACE_RESNET50_H5)
    _warn_random_init("vggface_resnet50", VGGFACE_RESNET50_H5)
    return init_resnet50_params(jax.random.PRNGKey(0))


def _vgg16_params():
    from .vgg16 import init_vgg16_params, vgg16_params_from_h5

    if os.path.exists(VGGFACE_VGG16_H5):
        return vgg16_params_from_h5(VGGFACE_VGG16_H5)
    _warn_random_init("vggface_vgg16", VGGFACE_VGG16_H5)
    return init_vgg16_params(jax.random.PRNGKey(0))


def _vgg16_fn(precision=jax.lax.Precision.HIGHEST):
    from .vgg16 import vgg16_embed

    return lambda params, x: vgg16_embed(params, x, precision=precision)


def _arcface_params():
    from .arcface import init_iresnet_params, iresnet_params_from_npz

    if os.path.exists(ARCFACE_NPZ):
        return iresnet_params_from_npz(ARCFACE_NPZ)
    _warn_random_init("insightface_arcface", ARCFACE_NPZ)
    return init_iresnet_params(jax.random.PRNGKey(0), depth=100)


def _arcface_fn(precision=jax.lax.Precision.HIGHEST):
    from .arcface import iresnet_embed

    return lambda params, x: iresnet_embed(params, x, precision=precision)


MODEL_ZOO: Dict[str, ModelSpec] = {
    # multi-head identity tap — the reference's default age/gender/id model
    # (facial_analysis.py:29-33, facerec_test.py:210 commented variant)
    "agegender_identity": ModelSpec(
        "agegender_identity", (224, 224), "caffe", "cv2_linear", 1024,
        _agegender_params, _multihead_identity_fn),
    # MobileNet-192 VGGFace2 embedder (facerec_test.py:212: convert2BGR=True,
    # imageNetUtilsMean=True; 13 MB / 92.1% LFW∩YTF row in BASELINE.md)
    "vgg2_mobilenet": ModelSpec(
        "vgg2_mobilenet", (192, 192), "caffe", "pil_bilinear", 1024,
        _vgg2_mobilenet_params, _mobilenet_fn),
    # ResNet-50 VGGFace2 embedder (facerec_test.py:213: VGGFace2 means;
    # 95 MB / 97.8% row)
    "vgg2_resnet": ModelSpec(
        "vgg2_resnet", (224, 224), "vggface2", "pil_bilinear", 2048,
        _vgg2_resnet_params, _resnet_fn),
    # InsightFace ArcFace-r100 112² embedder (insightface_face_embedding.py:
    # 20-63): raw 0-255 RGB in (the model scales internally), L2-normalized
    # output; flip-TTA off by default (reference self.flip=0, :23).
    "insightface_arcface": ModelSpec(
        "insightface_arcface", (112, 112), "none", "cv2_linear", 512,
        _arcface_params, _arcface_fn,
        extractor_kwargs={"l2_normalize_output": True}),
    # full-int8 serving variants (models/int8_infer.py): int8 activations +
    # int8 MXU pointwise matmuls — the TPU-native extension of the
    # reference's 8-bit-quantized serving model (age_gender_identity/
    # README.md:7). Same preprocessing/protocols as their f32 bases.
    "agegender_identity_int8": ModelSpec(
        "agegender_identity_int8", (224, 224), "caffe", "cv2_linear", 1024,
        _agegender_int8_params, _multihead_identity_int8_fn),
    "vgg2_mobilenet_int8": ModelSpec(
        "vgg2_mobilenet_int8", (192, 192), "caffe", "pil_bilinear", 1024,
        _vgg2_mobilenet_int8_params, _mobilenet_int8_fn),
    # keras_vggface VGG16, fc7/relu tap (facerec_test.py:344-349,
    # facial_clustering_test.py:295-300): Keras load_img resizes with PIL
    # NEAREST (its default interpolation), preprocess_input v1 means
    "vggface_vgg16": ModelSpec(
        "vggface_vgg16", (224, 224), "vggface1", "pil_nearest", 4096,
        _vgg16_params, _vgg16_fn),
    # keras_vggface ResNet-50, avg_pool tap (facial_clustering_test.py:
    # 296-300: layers={'resnet50': 'avg_pool'}). Same preprocessing as the
    # vgg16 variant: Keras load_img PIL-NEAREST resize + preprocess_input
    # with its DEFAULT version=1 means (the reference passes no version arg).
    "vggface_resnet50": ModelSpec(
        "vggface_resnet50", (224, 224), "vggface1", "pil_nearest", 2048,
        _vggface_resnet50_params, _resnet_fn),
}


def build_extractor(name: str, batch_size: int = 64, mesh=None,
                    precision=jax.lax.Precision.HIGHEST):
    from ..pipelines.embedder import EmbeddingExtractor

    spec = MODEL_ZOO[name]
    return EmbeddingExtractor(spec.model_fn(precision), spec.build_params(),
                              spec.input_size,
                              normalization=spec.normalization,
                              resize_method=spec.resize_method,
                              batch_size=batch_size, mesh=mesh,
                              **spec.extractor_kwargs)


def graph_extractor(pb_path: str, input_tensor: str, output_tensor: str,
                    input_size, normalization: str = "caffe",
                    resize_method: str = "pil_bilinear", batch_size: int = 64,
                    mesh=None, precision=jax.lax.Precision.HIGHEST,
                    extra_feeds: Optional[Dict[str, object]] = None):
    """Generic frozen-pb embedder: wrap ANY TF frozen graph as an
    EmbeddingExtractor — the general form of the reference's
    ``TensorFlowInference`` model rows (``facerec_test.py:209-218``: FaceNet,
    InsightFace, custom pbs, all selected by (pb, input, output, preprocessing)
    tuples). The graph is compiled to XLA by core/graph_compiler.py.

    extra_feeds: {tensor: value} pinned at compile time — the reference's
    ``learning_phase_tensor``/``additional_input_value`` convention
    (``facerec_test.py:215-216``: FaceNet feeds ``phase_train:0 = False``,
    insightface.pb feeds ``dropout_rate:0 = 0.9``)."""
    from ..core.graph_compiler import compile_pb
    from ..pipelines.embedder import EmbeddingExtractor

    cg = compile_pb(pb_path, [output_tensor], precision=precision,
                    const_feeds=extra_feeds)
    in_name = input_tensor.split(":")[0]

    def model_fn(params, x):
        (out,) = cg.fn(params, {in_name: x})
        return out.reshape(out.shape[0], -1)

    return EmbeddingExtractor(model_fn, cg.params, input_size,
                              normalization=normalization,
                              resize_method=resize_method,
                              batch_size=batch_size, mesh=mesh)
