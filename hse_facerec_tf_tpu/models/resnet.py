"""ResNet-50 (VGGFace2 flavor) face-embedding model.

TPU-native equivalent of the reference's strongest embedder
(``models/vgg2_resnet.pb``, 95 MB, tap ``input:0 → pool5_7x7_s1:0`` with
VGGFace2 mean preprocessing — reference ``facerec_test.py:213``; the weight
blob itself is absent upstream, listed in ``.MISSING_LARGE_BLOBS``).
Architecture follows the keras_vggface ResNet-50: 7×7/2 stem + BN/ReLU +
3×3/2 maxpool, bottleneck stages [3, 4, 6, 3], 7×7 global average pool →
2048-d embedding (optionally an 8631-way VGGFace2 classifier for training).

Pure functions over explicit param pytrees; bf16-capable compute.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (batch_norm, conv2d, dense, global_avg_pool, max_pool,
                     scale_bias)

STAGES = (3, 4, 6, 3)
STAGE_WIDTHS = ((64, 64, 256), (128, 128, 512), (256, 256, 1024), (512, 512, 2048))


def _conv_bn(x, p, *, stride=1, padding="SAME", relu=True, precision):
    """Conv + BN (or the folded {scale, bias} form produced by the frozen-pb
    importer, core/pb_import.py) + optional ReLU."""
    x = conv2d(x, p["kernel"], stride=stride, padding=padding, precision=precision)
    if "bn" in p:
        bn = p["bn"]
        x = batch_norm(x, bn["gamma"], bn["beta"], bn["mean"], bn["var"])
    else:
        x = scale_bias(x, p.get("scale"), p.get("bias"))
    return jax.nn.relu(x) if relu else x


def _bottleneck(x, p, *, stride, precision):
    shortcut = x
    if "proj" in p:
        shortcut = _conv_bn(x, p["proj"], stride=stride, relu=False, precision=precision)
    y = _conv_bn(x, p["conv1"], stride=stride, precision=precision)
    y = _conv_bn(y, p["conv2"], precision=precision)
    y = _conv_bn(y, p["conv3"], relu=False, precision=precision)
    return jax.nn.relu(y + shortcut)


def resnet50_backbone(params: Dict, x, *, precision=jax.lax.Precision.HIGHEST,
                      compute_dtype=jnp.float32):
    """(N, H, W, 3) -> (N, H/32, W/32, 2048).

    Stem padding is the keras_vggface form — ``ZeroPadding2D((3, 3))`` +
    7×7/2 VALID conv — NOT TF SAME (which pads (2, 3) and shifts the crop by
    one pixel); then 3×3/2 VALID max-pool (Keras ``MaxPooling2D`` default)."""
    x = x.astype(compute_dtype)
    cast = lambda p: jax.tree.map(lambda a: a.astype(compute_dtype), p)
    x = _conv_bn(x, cast(params["stem"]), stride=2,
                 padding=((3, 3), (3, 3)), precision=precision)
    x = max_pool(x, 3, 2, "VALID")
    for si, n_blocks in enumerate(STAGES):
        for bi in range(n_blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            x = _bottleneck(x, cast(params[f"stage{si + 1}_block{bi + 1}"]),
                            stride=stride, precision=precision)
    return x


def resnet50_embed(params: Dict, x, *, precision=jax.lax.Precision.HIGHEST,
                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """Face embedding (== the frozen graph's ``pool5_7x7_s1`` tap): (N, 2048)."""
    h = resnet50_backbone(params, x, precision=precision, compute_dtype=compute_dtype)
    return global_avg_pool(h).astype(jnp.float32)


def resnet50_classify(params: Dict, x, *, precision=jax.lax.Precision.HIGHEST,
                      compute_dtype=jnp.float32) -> jnp.ndarray:
    emb = resnet50_embed(params, x, precision=precision, compute_dtype=compute_dtype)
    return dense(emb, params["classifier"]["kernel"], params["classifier"]["bias"],
                 precision=precision)


def init_resnet50_params(rng: jax.Array, n_classes: Optional[int] = None) -> Dict:
    keys = iter(jax.random.split(rng, 128))

    def conv_init(shape):
        fan_in = int(np.prod(shape[:-1]))
        return jax.random.normal(next(keys), shape, jnp.float32) * np.sqrt(2.0 / fan_in)

    def bn_init(ch):
        return {"gamma": jnp.ones((ch,)), "beta": jnp.zeros((ch,)),
                "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}

    def conv_bn(kh, kw, cin, cout):
        return {"kernel": conv_init((kh, kw, cin, cout)), "bn": bn_init(cout)}

    params: Dict = {"stem": conv_bn(7, 7, 3, 64)}
    in_ch = 64
    for si, n_blocks in enumerate(STAGES):
        w1, w2, w3 = STAGE_WIDTHS[si]
        for bi in range(n_blocks):
            p = {
                "conv1": conv_bn(1, 1, in_ch, w1),
                "conv2": conv_bn(3, 3, w1, w2),
                "conv3": conv_bn(1, 1, w2, w3),
            }
            if bi == 0:
                p["proj"] = conv_bn(1, 1, in_ch, w3)
            params[f"stage{si + 1}_block{bi + 1}"] = p
            in_ch = w3
    if n_classes is not None:
        params["classifier"] = {
            "kernel": conv_init((in_ch, n_classes)),
            "bias": jnp.zeros((n_classes,)),
        }
    return params


def _h5_slot(weights: Dict, layer: str, kind: str) -> Optional[np.ndarray]:
    """Find layer weight ``kind`` across Keras weight-name conventions
    (``kernel`` vs old-style ``<base>_W_1``, BN ``moving_mean`` vs
    ``running_mean``); returns None when absent."""
    suffixes = {
        "kernel": ("kernel", "_W_1", "_W"),
        "bias": ("bias", "_b_1", "_b"),
        "gamma": ("gamma",),
        "beta": ("beta",),
        "mean": ("moving_mean", "running_mean"),
        "var": ("moving_variance", "running_std"),
    }[kind]
    prefix = layer + "/"
    for key, v in weights.items():
        if key.startswith(prefix) and key[len(prefix):].endswith(suffixes):
            return np.asarray(v)
    return None


def resnet50_params_from_h5(path: str) -> Dict:
    """keras_vggface (rcmalli) ResNet-50 h5 → resnet.py param pytree (BN
    form). Layer naming per keras_vggface ``RESNET50``: stem
    ``conv1/7x7_s2`` (+ ``/bn``), bottlenecks
    ``conv{s}_{b}_1x1_reduce`` / ``_3x3`` / ``_1x1_increase`` /
    ``_1x1_proj`` for stages s=2..5 (+ ``/bn`` each). The reference taps its
    ``avg_pool`` output as the clustering feature extractor
    (``facial_clustering_test.py:296-300``) — that equals
    ``resnet50_embed``. Conv biases, when present, fold into the BN running
    mean (``BN(x + b)`` ≡ BN with ``mean - b``)."""
    from ..core.h5_import import load_keras_h5

    w = load_keras_h5(path)

    def block(layer: str) -> Dict:
        kernel = _h5_slot(w, layer, "kernel")
        if kernel is None:
            raise KeyError(
                f"resnet50 h5 import: layer {layer!r} has no kernel among "
                f"{sorted(k for k in w if k.startswith(layer))[:4]}...")
        bn_layer = f"{layer}/bn"
        bn = {k: _h5_slot(w, bn_layer, k)
              for k in ("gamma", "beta", "mean", "var")}
        if any(v is None for v in bn.values()):
            raise KeyError(f"resnet50 h5 import: incomplete BN for {bn_layer}")
        bias = _h5_slot(w, layer, "bias")
        if bias is not None:
            bn["mean"] = bn["mean"] - bias
        return {"kernel": jnp.asarray(kernel),
                "bn": {k: jnp.asarray(v) for k, v in bn.items()}}

    params: Dict = {"stem": block("conv1/7x7_s2")}
    for si, n_blocks in enumerate(STAGES):
        for bi in range(n_blocks):
            s, b = si + 2, bi + 1
            p = {
                "conv1": block(f"conv{s}_{b}_1x1_reduce"),
                "conv2": block(f"conv{s}_{b}_3x3"),
                "conv3": block(f"conv{s}_{b}_1x1_increase"),
            }
            if bi == 0:
                p["proj"] = block(f"conv{s}_{b}_1x1_proj")
            params[f"stage{si + 1}_block{bi + 1}"] = p
    return params
