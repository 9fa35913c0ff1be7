"""MobileNetV2 backbone + AgenderNet age/gender heads.

The reference benchmarks the external AgenderNet MobileNetV2 on UTKFace
(``utkface_test.py:240-256``): 96² input, Keras ``mobilenet_v2``
preprocessing (x/127.5 − 1), two softmax heads, decode = gender argmax and
age = probs · [0..100]. Here the backbone is a native functional MobileNetV2
(alpha 1.0) with an importer for the standard Keras layer naming
(``Conv1``/``block_{i}_expand``/…, heads ``gender_prediction``/
``age_prediction``), so the external h5 loads the moment it exists.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, conv2d, dense, global_avg_pool

_P = jax.lax.Precision.DEFAULT

# (expansion t, out channels c, repeats n, first stride s) — MobileNetV2 paper
MOBILENET_V2_BLOCKS = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _bn(x, p):
    return batch_norm(x, p["gamma"], p["beta"], p["mean"], p["var"])


def _dwconv(x, w, stride, precision):
    h, wd, cin, mult = w.shape
    w = jnp.reshape(w, (h, wd, 1, cin * mult))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cin, precision=precision)


def _inverted_residual(x, p, stride, precision):
    h = x
    if "expand" in p:
        h = _relu6(_bn(conv2d(h, p["expand"], stride=1, precision=precision),
                       p["expand_bn"]))
    h = _relu6(_bn(_dwconv(h, p["dw"], stride, precision), p["dw_bn"]))
    h = _bn(conv2d(h, p["project"], stride=1, precision=precision),
            p["project_bn"])
    if stride == 1 and x.shape[-1] == h.shape[-1]:
        h = h + x
    return h


def mobilenet_v2_backbone(params: Dict, x, *, precision=_P,
                          compute_dtype=jnp.float32) -> jnp.ndarray:
    """(N, H, W, 3) preprocessed (x/127.5 − 1) → (N, 1280) pooled features."""
    x = x.astype(compute_dtype)
    cast = lambda p: jax.tree.map(lambda a: a.astype(compute_dtype), p)

    x = _relu6(_bn(conv2d(x, cast(params["conv1"])["kernel"], stride=2,
                          precision=precision), cast(params["conv1"])["bn"]))
    i = 0
    for t, c, n, s in MOBILENET_V2_BLOCKS:
        for r in range(n):
            x = _inverted_residual(x, cast(params[f"block{i}"]),
                                   s if r == 0 else 1, precision)
            i += 1
    last = cast(params["conv_last"])
    x = _relu6(_bn(conv2d(x, last["kernel"], stride=1, precision=precision),
                   last["bn"]))
    return global_avg_pool(x).astype(jnp.float32)


def agendernet_apply(params: Dict, x, *, precision=_P
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 96, 96, 3) RGB 0-255 → (gender_probs (N, 2), age_probs (N, 101)).

    Applies the Keras mobilenet_v2 preprocessing internally (the reference's
    ``model.prep_image``)."""
    x = jnp.asarray(x, jnp.float32) / 127.5 - 1.0
    feat = mobilenet_v2_backbone(params, x, precision=precision)
    gender = jax.nn.softmax(dense(feat, params["gender"]["kernel"],
                                  params["gender"]["bias"], precision=precision))
    age = jax.nn.softmax(dense(feat, params["age"]["kernel"],
                               params["age"]["bias"], precision=precision))
    return gender, age


def decode_agendernet(gender_probs, age_probs):
    """AgenderNet decode (reference :246-252 via ``decode_prediction``):
    gender = argmax (0 = female), age = expectation over [0..100]."""
    gender = jnp.argmax(gender_probs, axis=1)
    ages = age_probs @ jnp.arange(0.0, 101.0)
    return gender, ages


def init_mobilenet_v2_params(rng: jax.Array, alpha: float = 1.0,
                             with_heads: bool = True) -> Dict:
    keys = iter(jax.random.split(rng, 256))

    def conv(shape):
        fan_in = shape[0] * shape[1] * shape[2]
        return jax.random.normal(next(keys), shape, jnp.float32) * np.sqrt(2.0 / fan_in)

    def bn(ch):
        return {"gamma": jnp.ones((ch,)), "beta": jnp.zeros((ch,)),
                "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}

    def c(ch):
        ch = ch * alpha
        return max(8, int(ch + 4) // 8 * 8)  # round to multiple of 8

    first = c(32)
    p: Dict = {"conv1": {"kernel": conv((3, 3, 3, first)), "bn": bn(first)}}
    in_ch = first
    i = 0
    for t, ch, n, s in MOBILENET_V2_BLOCKS:
        out = c(ch)
        for r in range(n):
            blk: Dict = {}
            exp = in_ch * t
            if t != 1:
                blk["expand"] = conv((1, 1, in_ch, exp))
                blk["expand_bn"] = bn(exp)
            blk["dw"] = conv((3, 3, exp, 1))
            blk["dw_bn"] = bn(exp)
            blk["project"] = conv((1, 1, exp, out))
            blk["project_bn"] = bn(out)
            p[f"block{i}"] = blk
            in_ch = out
            i += 1
    last = max(1280, c(1280))
    p["conv_last"] = {"kernel": conv((1, 1, in_ch, last)), "bn": bn(last)}
    if with_heads:
        p["gender"] = {"kernel": jax.random.normal(next(keys), (last, 2)) * 0.01,
                       "bias": jnp.zeros((2,))}
        p["age"] = {"kernel": jax.random.normal(next(keys), (last, 101)) * 0.01,
                    "bias": jnp.zeros((101,))}
    return p


def mobilenet_v2_params_from_h5(path: str) -> Dict:
    """Importer for the standard Keras MobileNetV2 layer naming (``Conv1``,
    ``bn_Conv1``, ``expanded_conv_*`` for block 0, ``block_{i}_*`` after,
    ``Conv_1``/``Conv_1_bn`` last) + AgenderNet heads
    (``gender_prediction``/``age_prediction``)."""
    from ..core.h5_import import load_keras_h5

    w = load_keras_h5(path)

    def bn(layer):
        return {"gamma": jnp.asarray(w[f"{layer}/gamma"]),
                "beta": jnp.asarray(w[f"{layer}/beta"]),
                "mean": jnp.asarray(w[f"{layer}/moving_mean"]),
                "var": jnp.asarray(w[f"{layer}/moving_variance"])}

    p: Dict = {"conv1": {"kernel": jnp.asarray(w["Conv1/kernel"]),
                         "bn": bn("bn_Conv1")}}
    i = 0
    for t, ch, n, s in MOBILENET_V2_BLOCKS:
        for r in range(n):
            pre = "expanded_conv" if i == 0 else f"block_{i}"
            blk: Dict = {}
            if t != 1:
                blk["expand"] = jnp.asarray(w[f"{pre}_expand/kernel"])
                blk["expand_bn"] = bn(f"{pre}_expand_BN")
            blk["dw"] = jnp.asarray(w[f"{pre}_depthwise/depthwise_kernel"])
            blk["dw_bn"] = bn(f"{pre}_depthwise_BN")
            blk["project"] = jnp.asarray(w[f"{pre}_project/kernel"])
            blk["project_bn"] = bn(f"{pre}_project_BN")
            p[f"block{i}"] = blk
            i += 1
    p["conv_last"] = {"kernel": jnp.asarray(w["Conv_1/kernel"]),
                      "bn": bn("Conv_1_bn")}
    for head, layer in (("gender", "gender_prediction"),
                        ("age", "age_prediction")):
        if f"{layer}/kernel" in w:
            p[head] = {"kernel": jnp.asarray(w[f"{layer}/kernel"]),
                       "bias": jnp.asarray(w[f"{layer}/bias"])}
    return p
