"""Functional NN building blocks with TF-compatible numerics.

All models in this framework are pure functions ``f(params, x)`` over explicit
parameter pytrees — no module system, no hidden state — so they compose
directly with ``jax.jit`` / ``pjit`` / ``jax.grad`` and shard cleanly over a
device mesh. Numerics (SAME padding, MaxPool -inf padding, PReLU
decomposition) match the TF1 frozen graphs shipped by the reference
(``age_gender_identity/mtcnn.pb``; see reference ``facial_analysis.py:336-351``)
so imported weights reproduce reference activations.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Precision = jax.lax.Precision

# Default to full-f32 accumulations for parity; pipelines can override with
# Precision.DEFAULT (bf16 inputs on the MXU) for the fast path.
_DEFAULT_PRECISION = Precision.HIGHEST


def conv2d(x, kernel, *, stride: int = 1, padding: str = "SAME",
           precision=_DEFAULT_PRECISION, groups: int = 1):
    """NHWC conv with HWIO kernel, TF-compatible SAME padding."""
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )


def depthwise_conv2d(x, kernel, *, stride: int = 1, padding: str = "SAME",
                     precision=_DEFAULT_PRECISION):
    """Depthwise conv; ``kernel`` is (H, W, C, mult) as in TF."""
    h, w, c, m = kernel.shape
    k = jnp.reshape(kernel, (h, w, 1, c * m))
    return conv2d(x, k, stride=stride, padding=padding, precision=precision, groups=c)


def dense(x, kernel, bias=None, *, precision=_DEFAULT_PRECISION):
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32, precision=precision)
    if bias is not None:
        y = y + bias
    return y


def prelu(x, alpha):
    """PReLU with per-channel alpha: relu(x) - alpha * relu(-x).

    Identical decomposition to the frozen MTCNN graph
    (pnet/PReLU*/{Relu,Neg,Mul,Add} nodes)."""
    return jax.nn.relu(x) - alpha * jax.nn.relu(-x)


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    return pad // 2, pad - pad // 2


def max_pool(x, k: int, stride: int, padding: str = "SAME"):
    """TF MaxPool: SAME pads with -inf (never averages padding in)."""
    if padding == "SAME":
        ph = _same_pads(x.shape[1], k, stride)
        pw = _same_pads(x.shape[2], k, stride)
        pads = [(0, 0), ph, pw, (0, 0)]
    else:
        pads = [(0, 0)] * 4
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


def global_avg_pool(x):
    """GAP over spatial dims: (N, H, W, C) -> (N, C).

    Matches Keras GlobalAveragePooling2D / the frozen graphs'
    ``global_pooling/Mean`` node."""
    return jnp.mean(x, axis=(1, 2))


def batch_norm(x, scale, offset, mean, var, *, eps: float = 1e-3):
    """Inference-mode BN (Keras default eps=1e-3)."""
    inv = scale * jax.lax.rsqrt(var + eps)
    return x * inv + (offset - mean * inv)


def scale_bias(x, scale=None, bias=None):
    """Folded-BN affine: used by weights imported from frozen graphs where
    graph_transforms folded BN into (optional) per-channel scale + bias."""
    if scale is not None:
        x = x * scale
    if bias is not None:
        x = x + bias
    return x
