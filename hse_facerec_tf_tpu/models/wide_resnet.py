"""WideResNet-16-8 age/gender model.

Native JAX equivalent of the reference's Keras definition
(``age_gender_identity/wide_resnet.py:36-142``): one 3×3 conv, three
pre-activation wide-basic groups ([16, 16k, 32k, 64k] with n=(depth-4)/6=2
blocks, strides 1/2/2), final BN+ReLU, global pooling, and two softmax heads —
gender(2) and age(101). The reference uses it as one of its 9 UTKFace
benchmark backends (``utkface_test.py:290-314``) with 64×64 inputs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, conv2d, dense, global_avg_pool

_P = jax.lax.Precision.DEFAULT


def _bn_relu(x, bn):
    return jax.nn.relu(batch_norm(x, bn["gamma"], bn["beta"], bn["mean"], bn["var"]))


def _wide_basic(x, p, stride, precision):
    """Pre-activation basic block; projection shortcut when widths change."""
    has_proj = "proj" in p
    if has_proj:
        pre = _bn_relu(x, p["bn1"])
        y = conv2d(pre, p["conv1"], stride=stride, precision=precision)
        shortcut = conv2d(x, p["proj"], stride=stride, precision=precision)
    else:
        y = conv2d(_bn_relu(x, p["bn1"]), p["conv1"], stride=stride,
                   precision=precision)
        shortcut = x
    y = conv2d(_bn_relu(y, p["bn2"]), p["conv2"], stride=1, precision=precision)
    return y + shortcut


def wide_resnet_16_8(params: Dict, x, *, precision=_P,
                     compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 64, 64, 3) -> (gender_probs (N, 2), age_probs (N, 101))."""
    x = x.astype(compute_dtype)
    cast = lambda p: jax.tree.map(lambda a: a.astype(compute_dtype), p)

    x = conv2d(x, cast(params["conv1"])["kernel"], stride=1, precision=precision)
    for g, stride in (("g1", 1), ("g2", 2), ("g3", 2)):
        for b in range(2):
            x = _wide_basic(x, cast(params[f"{g}_b{b}"]),
                            stride if b == 0 else 1, precision)
    x = _bn_relu(x, cast(params["bn_final"]))
    flat = global_avg_pool(x).astype(jnp.float32)
    gender = jax.nn.softmax(dense(flat, params["gender"]["kernel"], precision=precision))
    age = jax.nn.softmax(dense(flat, params["age"]["kernel"], precision=precision))
    return gender, age


def init_wide_resnet_params(rng: jax.Array, k: int = 8) -> Dict:
    keys = iter(jax.random.split(rng, 64))

    def conv(kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return jax.random.normal(next(keys), (kh, kw, cin, cout), jnp.float32) \
            * np.sqrt(2.0 / fan_in)

    def bn(ch):
        return {"gamma": jnp.ones((ch,)), "beta": jnp.zeros((ch,)),
                "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}

    widths = [16, 16 * k, 32 * k, 64 * k]
    p: Dict = {"conv1": {"kernel": conv(3, 3, 3, widths[0])}}
    in_ch = widths[0]
    for gi, out_ch in enumerate(widths[1:], start=1):
        for b in range(2):
            blk = {
                "bn1": bn(in_ch),
                "conv1": conv(3, 3, in_ch, out_ch),
                "bn2": bn(out_ch),
                "conv2": conv(3, 3, out_ch, out_ch),
            }
            if in_ch != out_ch:
                blk["proj"] = conv(1, 1, in_ch, out_ch)
            p[f"g{gi}_b{b}"] = blk
            in_ch = out_ch
    p["bn_final"] = bn(in_ch)
    p["gender"] = {"kernel": jax.random.normal(next(keys), (in_ch, 2)) * 0.01}
    p["age"] = {"kernel": jax.random.normal(next(keys), (in_ch, 101)) * 0.01}
    return p
