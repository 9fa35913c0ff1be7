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

from .layers import batch_norm, conv2d, dense

_P = jax.lax.Precision.DEFAULT


def _bn_relu(x, bn):
    return jax.nn.relu(batch_norm(x, bn["gamma"], bn["beta"], bn["mean"], bn["var"]))


def _wide_basic(x, p, stride, precision):
    """Pre-activation basic block; projection shortcut when widths change.

    When projecting, the reference applies BN+ReLU and feeds THAT tensor to
    both the 3×3 path and the 1×1 shortcut (``wide_resnet.py:50-55,86-91``
    reassigns ``net`` before the shortcut conv)."""
    has_proj = "proj" in p
    if has_proj:
        pre = _bn_relu(x, p["bn1"])
        y = conv2d(pre, p["conv1"], stride=stride, precision=precision)
        shortcut = conv2d(pre, p["proj"], stride=stride, precision=precision)
    else:
        y = conv2d(_bn_relu(x, p["bn1"]), p["conv1"], stride=stride,
                   precision=precision)
        shortcut = x
    y = conv2d(_bn_relu(y, p["bn2"]), p["conv2"], stride=1, precision=precision)
    return y + shortcut


def _avg_pool_same(x, k: int):
    """Keras/TF AveragePooling2D(k, strides=1, 'same'): edge windows divide by
    the count of UNPADDED cells (reference head ``wide_resnet.py:133``)."""
    summed = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        window_dimensions=(1, k, k, 1), window_strides=(1, 1, 1, 1),
        padding="SAME")
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, jnp.zeros((), x.dtype), jax.lax.add,
        window_dimensions=(1, k, k, 1), window_strides=(1, 1, 1, 1),
        padding="SAME")
    return summed / counts


def wide_resnet_16_8(params: Dict, x, *, precision=_P,
                     compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 64, 64, 3) -> (gender_probs (N, 2), age_probs (N, 101)).

    Head matches the reference exactly (``wide_resnet.py:133-138``):
    AveragePooling2D(8×8, strides=1, 'same') → Flatten (16·16·512 = 131072 for
    64² inputs) → two bias-free softmax Dense heads, so external reference
    checkpoints load without reshaping."""
    x = x.astype(compute_dtype)
    cast = lambda p: jax.tree.map(lambda a: a.astype(compute_dtype), p)

    x = conv2d(x, cast(params["conv1"])["kernel"], stride=1, precision=precision)
    for g, stride in (("g1", 1), ("g2", 2), ("g3", 2)):
        for b in range(2):
            x = _wide_basic(x, cast(params[f"{g}_b{b}"]),
                            stride if b == 0 else 1, precision)
    x = _bn_relu(x, cast(params["bn_final"]))
    x = _avg_pool_same(x, 8)
    flat = x.reshape(x.shape[0], -1).astype(jnp.float32)  # Keras NHWC Flatten
    gender = jax.nn.softmax(dense(flat, params["gender"]["kernel"], precision=precision))
    age = jax.nn.softmax(dense(flat, params["age"]["kernel"], precision=precision))
    return gender, age


def init_wide_resnet_params(rng: jax.Array, k: int = 8,
                            input_size: int = 64) -> Dict:
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
    spatial = input_size // 4  # strides 1/1/2/2
    flat = spatial * spatial * in_ch  # 131072 for 64² — reference head dim
    p["gender"] = {"kernel": jax.random.normal(next(keys), (flat, 2)) * 0.01}
    p["age"] = {"kernel": jax.random.normal(next(keys), (flat, 101)) * 0.01}
    return p


def wide_resnet_params_from_h5(path: str, k: int = 8) -> Dict:
    """Import the reference's external WRN-16-8 checkpoint
    (``utkface_test.py:294-302``: yu4u age-gender ``weights.28-3.73.hdf5``, a
    Keras h5 with auto-numbered layers) onto this pytree.

    Keras layer creation order fixes the mapping: conv2d_* = stem, then per
    block [conv1, conv2, (proj for each group's first block)];
    batch_normalization_* = per block [bn1, bn2], final BN last;
    dense_1 = gender head, dense_2 = age head (bias-free)."""
    import re

    import jax.numpy as jnp

    from ..core.h5_import import load_keras_h5

    w = load_keras_h5(path)

    def numbered(prefix):
        # Keras-1.x/2.x checkpoints number from "<prefix>_1"; modern Keras
        # names the first instance bare "<prefix>" then "<prefix>_1" — map
        # the bare name to 0 so it sorts first without colliding.
        pat = re.compile(rf"^{prefix}(?:_(\d+))?$")
        found = {}
        for key in w:
            layer = key.split("/")[0]
            m = pat.match(layer)
            if m:
                found[int(m.group(1)) if m.group(1) else 0] = layer
        return [found[i] for i in sorted(found)]

    convs = numbered("conv2d")
    bns = numbered("batch_normalization")
    denses = numbered("dense")
    assert len(convs) == 16 and len(bns) == 13 and len(denses) == 2, (
        len(convs), len(bns), len(denses))

    ci = iter(convs)
    bi = iter(bns)
    kern = lambda layer: jnp.asarray(w[f"{layer}/kernel"])
    bn = lambda layer: {
        "gamma": jnp.asarray(w[f"{layer}/gamma"]),
        "beta": jnp.asarray(w[f"{layer}/beta"]),
        "mean": jnp.asarray(w[f"{layer}/moving_mean"]),
        "var": jnp.asarray(w[f"{layer}/moving_variance"]),
    }

    p: Dict = {"conv1": {"kernel": kern(next(ci))}}
    for gi in (1, 2, 3):
        for b in range(2):
            blk = {"bn1": bn(next(bi)), "conv1": kern(next(ci)),
                   "bn2": bn(next(bi)), "conv2": kern(next(ci))}
            if b == 0:  # every group widens ⇒ first block projects
                blk["proj"] = kern(next(ci))
            p[f"g{gi}_b{b}"] = blk
    p["bn_final"] = bn(next(bi))
    p["gender"] = {"kernel": jnp.asarray(w[f"{denses[0]}/kernel"])}
    p["age"] = {"kernel": jnp.asarray(w[f"{denses[1]}/kernel"])}
    return p
