"""Multi-head age/gender/identity network (MobileNet-V1 backbone).

Native JAX reimplementation of the reference's multi-output CNN
(``age_gender_identity/age_gender_train.py:170-185``: frozen VGGFace2 MobileNet
base → GAP (``global_pooling``) → Dense-256 relu (``feats``) →
``age_pred`` Dense-100 softmax + ``gender_pred`` Dense-1 sigmoid; served frozen
as ``age_gender_tf2_new-01-0.14-0.92_quantized.pb`` — reference
``facial_analysis.py:83-130``).

One forward pass yields age probabilities, gender probability, and the 1024-d
identity embedding — the reference's core "multi-output" capability, here as a
single jit-compiled XLA program that is batch-polymorphic and mesh-shardable.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graphdef import load_graphdef, extract_constants
from .layers import conv2d, dense, global_avg_pool
from .mobilenet import MOBILENET_V1_BLOCKS, mobilenet_v1_backbone

Params = Dict


class MultiHeadOutput(NamedTuple):
    age_probs: jnp.ndarray       # (N, 100) softmax over integer ages
    gender_prob: jnp.ndarray     # (N,) P(male)
    identity: jnp.ndarray        # (N, 1024) GAP embedding (identity features)
    feats: jnp.ndarray           # (N, 256) shared head representation


def multihead_apply(params: Params, x, *, precision=jax.lax.Precision.HIGHEST,
                    compute_dtype=jnp.float32,
                    bf16_blocks_below: int = 0) -> MultiHeadOutput:
    """Forward pass. x: (N, H, W, 3) preprocessed (BGR, VGGFace2 mean-subtracted —
    see ops/preprocess.py `caffe_vggface`); reference feeds 224x224.

    ``bf16_blocks_below``: mixed-precision serving dial (see
    mobilenet_v1_backbone for the measured speed/fidelity trade-off)."""
    h = mobilenet_v1_backbone(params["backbone"], x, precision=precision,
                              compute_dtype=compute_dtype,
                              bf16_blocks_below=bf16_blocks_below)
    identity = global_avg_pool(h).astype(jnp.float32)  # == global_pooling/Mean
    f = jax.nn.relu(dense(identity, params["feats"]["kernel"], params["feats"]["bias"],
                          precision=precision))
    age_logits = dense(f, params["age"]["kernel"], params["age"]["bias"], precision=precision)
    gender_logit = dense(f, params["gender"]["kernel"], params["gender"]["bias"],
                         precision=precision)
    return MultiHeadOutput(
        age_probs=jax.nn.softmax(age_logits, axis=-1),
        gender_prob=jax.nn.sigmoid(gender_logit)[:, 0],
        identity=identity,
        feats=f,
    )


def expected_age_top_k(age_probs: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """Age estimate = expectation over the top-k softmax bins, renormalized.

    Reproduces the reference's estimator (``facial_analysis.py:119-124``:
    top-2 bins of the 100-way softmax, probability-weighted mean of bin
    indices). Vectorized over the batch; runs on device."""
    probs, idx = jax.lax.top_k(age_probs, k)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return jnp.sum(probs * idx.astype(age_probs.dtype), axis=-1)


def import_multihead_params(pb_path: str) -> Params:
    """Import weights from the (possibly quantized) frozen multi-head pb.

    Returns HOST numpy arrays: importer outputs get closure-captured by
    jitted functions, and device-array trace constants are re-fetched from
    the device during every lowering (catastrophic over a remote device
    link). Callers that pass params as jit arguments ``jax.device_put``
    them once (``pipelines/analyzer.py``).

    Folds graph_transforms artifacts into clean per-layer params:
    - plain convs: BN pre-folded into kernels by graph_transforms; the trailing
      ``Add`` offset becomes the bias.
    - depthwise convs: the per-channel BN ``Mul`` scale is folded into the
      depthwise kernel; the ``Add`` offset becomes the bias.
    """
    consts = extract_constants(load_graphdef(pb_path))

    def find(name: str) -> np.ndarray:
        # weight consts appear as '<name>/read/...' or constant-folded aliases
        if name in consts:
            return consts[name]
        matches = [k for k in consts if k == name or k.startswith(name + "/")]
        if not matches:
            raise KeyError(name)
        return consts[sorted(matches, key=len)[0]]

    backbone: Dict[str, Dict] = {}
    # conv1: folded kernel + offset bias
    backbone["conv1"] = {
        "kernel": np.asarray(find("conv1/kernel")),
        "bias": np.asarray(find("conv1_bn/batchnorm_1/sub")).reshape(-1),
    }
    for i, _ in enumerate(MOBILENET_V1_BLOCKS, start=1):
        dw_kernel = np.asarray(find(f"conv_dw_{i}/depthwise_kernel"), dtype=np.float32)
        dw_scale = np.asarray(find(f"conv_dw_{i}_bn/batchnorm_1/mul"), dtype=np.float32).reshape(-1)
        dw_bias = np.asarray(find(f"conv_dw_{i}_bn/batchnorm_1/sub"), dtype=np.float32).reshape(-1)
        backbone[f"dw{i}"] = {
            "kernel": np.asarray(dw_kernel * dw_scale[None, None, :, None]),
            "bias": np.asarray(dw_bias),
        }
        backbone[f"pw{i}"] = {
            "kernel": np.asarray(find(f"conv_pw_{i}/kernel")),
            "bias": np.asarray(find(f"conv_pw_{i}_bn/batchnorm_1/sub")).reshape(-1),
        }

    def head(name):
        return {
            "kernel": np.asarray(find(f"{name}/kernel")),
            "bias": np.asarray(find(f"{name}/bias")).reshape(-1),
        }

    return {
        "backbone": backbone,
        "feats": head("feats"),
        "age": head("age_pred"),
        "gender": head("gender_pred"),
    }


def is_male(gender_prob: jnp.ndarray, threshold: float = 0.6) -> jnp.ndarray:
    """Gender decision threshold, matching reference ``facial_analysis.py:76-81``."""
    return gender_prob >= threshold
