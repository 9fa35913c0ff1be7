"""Inception-ResNet-v1 (FaceNet) with optional age/gender heads.

Native JAX equivalent of the reference's slim definition
(``age_gender_identity/inception_resnet_v1.py``): valid-padded stem to
35×35×256 (:197-223), 5×block35 (scale 0.17) → reduction-A(192,192,256,384) →
10×block17 (scale 0.10) → reduction-B → 5×block8 (scale 0.20) + final
scale-1 block8 without activation (:235-248), global average pool, 128-d
bottleneck (:253-264), and the multi-head variant's age(101)/gender(2) logits
(:158-169). Used by the reference as the FaceNet embedder row of BASELINE.md
(96.6% LFW∩YTF) via an external checkpoint; here the architecture is a
first-class trainable model.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, conv2d, dense, global_avg_pool, max_pool

_P = jax.lax.Precision.DEFAULT


def _conv_bn(x, p, *, stride=1, padding="SAME", relu=True, precision=_P):
    x = conv2d(x, p["kernel"], stride=stride, padding=padding, precision=precision)
    if "bn" in p:
        bn = p["bn"]
        x = batch_norm(x, bn["gamma"], bn["beta"], bn["mean"], bn["var"])
    elif "bias" in p:
        x = x + p["bias"]
    return jax.nn.relu(x) if relu else x


def _block35(x, p, scale, precision, relu=True):
    b0 = _conv_bn(x, p["b0"], precision=precision)
    b1 = _conv_bn(_conv_bn(x, p["b1a"], precision=precision), p["b1b"], precision=precision)
    b2 = _conv_bn(_conv_bn(_conv_bn(x, p["b2a"], precision=precision),
                           p["b2b"], precision=precision), p["b2c"], precision=precision)
    mixed = jnp.concatenate([b0, b1, b2], axis=-1)
    up = _conv_bn(mixed, p["up"], relu=False, precision=precision)
    x = x + scale * up
    return jax.nn.relu(x) if relu else x


def _block17(x, p, scale, precision, relu=True):
    b0 = _conv_bn(x, p["b0"], precision=precision)
    b1 = _conv_bn(_conv_bn(_conv_bn(x, p["b1a"], precision=precision),
                           p["b1b"], precision=precision), p["b1c"], precision=precision)
    mixed = jnp.concatenate([b0, b1], axis=-1)
    up = _conv_bn(mixed, p["up"], relu=False, precision=precision)
    x = x + scale * up
    return jax.nn.relu(x) if relu else x


_block8 = _block17  # same two-branch shape, different kernel dims in params


def inception_resnet_v1(params: Dict, x, *, precision=_P,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    """(N, H, W, 3) -> (N, 128) bottleneck embedding (H=W=160 canonically)."""
    x = x.astype(compute_dtype)
    cast = lambda p: jax.tree.map(lambda a: a.astype(compute_dtype), p)
    p = {k: cast(v) for k, v in params.items()}

    x = _conv_bn(x, p["conv1a"], stride=2, padding="VALID", precision=precision)
    x = _conv_bn(x, p["conv2a"], padding="VALID", precision=precision)
    x = _conv_bn(x, p["conv2b"], precision=precision)
    x = max_pool(x, 3, 2, "VALID")
    x = _conv_bn(x, p["conv3b"], padding="VALID", precision=precision)
    x = _conv_bn(x, p["conv4a"], padding="VALID", precision=precision)
    x = _conv_bn(x, p["conv4b"], stride=2, padding="VALID", precision=precision)

    for i in range(5):
        x = _block35(x, p[f"block35_{i}"], 0.17, precision)
    # reduction A
    ra = p["reduction_a"]
    b0 = _conv_bn(x, ra["b0"], stride=2, padding="VALID", precision=precision)
    b1 = _conv_bn(_conv_bn(_conv_bn(x, ra["b1a"], precision=precision),
                           ra["b1b"], precision=precision),
                  ra["b1c"], stride=2, padding="VALID", precision=precision)
    x = jnp.concatenate([b0, b1, max_pool(x, 3, 2, "VALID")], axis=-1)

    for i in range(10):
        x = _block17(x, p[f"block17_{i}"], 0.10, precision)
    # reduction B
    rb = p["reduction_b"]
    b0 = _conv_bn(_conv_bn(x, rb["b0a"], precision=precision),
                  rb["b0b"], stride=2, padding="VALID", precision=precision)
    b1 = _conv_bn(_conv_bn(x, rb["b1a"], precision=precision),
                  rb["b1b"], stride=2, padding="VALID", precision=precision)
    b2 = _conv_bn(_conv_bn(_conv_bn(x, rb["b2a"], precision=precision),
                           rb["b2b"], precision=precision),
                  rb["b2c"], stride=2, padding="VALID", precision=precision)
    x = jnp.concatenate([b0, b1, b2, max_pool(x, 3, 2, "VALID")], axis=-1)

    for i in range(5):
        x = _block8(x, p[f"block8_{i}"], 0.20, precision)
    x = _block8(x, p["block8_final"], 1.0, precision, relu=False)

    emb = global_avg_pool(x).astype(jnp.float32)
    return dense(emb, p["bottleneck"]["kernel"], p["bottleneck"]["bias"],
                 precision=precision)


def inception_resnet_v1_age_gender(params: Dict, x, *, precision=_P
                                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-head variant: (age_logits (N, 101), gender_logits (N, 2))."""
    emb = inception_resnet_v1(params, x, precision=precision)
    age = dense(emb, params["age"]["kernel"], params["age"]["bias"], precision=precision)
    gender = dense(emb, params["gender"]["kernel"], params["gender"]["bias"],
                   precision=precision)
    return age, gender


def inception_resnet_v1_params_from_npz(path: str) -> Dict:
    """Import a FaceNet/age-gender slim checkpoint from an .npz of slim
    variable names (``InceptionResnetV1/Conv2d_1a_3x3/weights``,
    ``.../BatchNorm/{beta,moving_mean,moving_variance}``, …) — the layout the
    reference restores via ``tf.train.Saver`` before its ckpt→pb conversion
    (``utkface_test.py:41-86,186-225``). Produce the .npz by dumping each
    checkpoint variable under its full name.

    slim specifics reproduced here: BN has no gamma (scale=False ⇒ ones); the
    ``Bottleneck`` fully-connected layer carries its own BatchNorm (the
    normalizer arg_scope covers fully_connected too), folded exactly into the
    dense kernel/bias at import; residual ``up`` convs are normalizer-free
    with biases; head scopes ``logits/age``/``logits/gender`` are plain FCs."""
    with np.load(path) as z:
        w = {k: z[k] for k in z.files}
    R = "InceptionResnetV1"

    def bn(scope):
        beta = jnp.asarray(w[f"{scope}/BatchNorm/beta"])
        return {
            "gamma": jnp.asarray(w.get(f"{scope}/BatchNorm/gamma",
                                       np.ones_like(beta))),
            "beta": beta,
            "mean": jnp.asarray(w[f"{scope}/BatchNorm/moving_mean"]),
            "var": jnp.asarray(w[f"{scope}/BatchNorm/moving_variance"]),
        }

    def cb(scope):
        return {"kernel": jnp.asarray(w[f"{scope}/weights"]), "bn": bn(scope)}

    def up(scope):
        return {"kernel": jnp.asarray(w[f"{scope}/weights"]),
                "bias": jnp.asarray(w[f"{scope}/biases"])}

    p: Dict = {
        "conv1a": cb(f"{R}/Conv2d_1a_3x3"), "conv2a": cb(f"{R}/Conv2d_2a_3x3"),
        "conv2b": cb(f"{R}/Conv2d_2b_3x3"), "conv3b": cb(f"{R}/Conv2d_3b_1x1"),
        "conv4a": cb(f"{R}/Conv2d_4a_3x3"), "conv4b": cb(f"{R}/Conv2d_4b_3x3"),
    }
    for i in range(5):
        s = f"{R}/Repeat/block35_{i + 1}"
        p[f"block35_{i}"] = {
            "b0": cb(f"{s}/Branch_0/Conv2d_1x1"),
            "b1a": cb(f"{s}/Branch_1/Conv2d_0a_1x1"),
            "b1b": cb(f"{s}/Branch_1/Conv2d_0b_3x3"),
            "b2a": cb(f"{s}/Branch_2/Conv2d_0a_1x1"),
            "b2b": cb(f"{s}/Branch_2/Conv2d_0b_3x3"),
            "b2c": cb(f"{s}/Branch_2/Conv2d_0c_3x3"),
            "up": up(f"{s}/Conv2d_1x1"),
        }
    p["reduction_a"] = {
        "b0": cb(f"{R}/Mixed_6a/Branch_0/Conv2d_1a_3x3"),
        "b1a": cb(f"{R}/Mixed_6a/Branch_1/Conv2d_0a_1x1"),
        "b1b": cb(f"{R}/Mixed_6a/Branch_1/Conv2d_0b_3x3"),
        "b1c": cb(f"{R}/Mixed_6a/Branch_1/Conv2d_1a_3x3"),
    }
    for i in range(10):
        s = f"{R}/Repeat_1/block17_{i + 1}"
        p[f"block17_{i}"] = {
            "b0": cb(f"{s}/Branch_0/Conv2d_1x1"),
            "b1a": cb(f"{s}/Branch_1/Conv2d_0a_1x1"),
            "b1b": cb(f"{s}/Branch_1/Conv2d_0b_1x7"),
            "b1c": cb(f"{s}/Branch_1/Conv2d_0c_7x1"),
            "up": up(f"{s}/Conv2d_1x1"),
        }
    p["reduction_b"] = {
        "b0a": cb(f"{R}/Mixed_7a/Branch_0/Conv2d_0a_1x1"),
        "b0b": cb(f"{R}/Mixed_7a/Branch_0/Conv2d_1a_3x3"),
        "b1a": cb(f"{R}/Mixed_7a/Branch_1/Conv2d_0a_1x1"),
        "b1b": cb(f"{R}/Mixed_7a/Branch_1/Conv2d_1a_3x3"),
        "b2a": cb(f"{R}/Mixed_7a/Branch_2/Conv2d_0a_1x1"),
        "b2b": cb(f"{R}/Mixed_7a/Branch_2/Conv2d_0b_3x3"),
        "b2c": cb(f"{R}/Mixed_7a/Branch_2/Conv2d_1a_3x3"),
    }
    for i, scope in list(enumerate(f"{R}/Repeat_2/block8_{j + 1}"
                                   for j in range(5))) + [("final", f"{R}/Block8")]:
        p[f"block8_{i}"] = {
            "b0": cb(f"{scope}/Branch_0/Conv2d_1x1"),
            "b1a": cb(f"{scope}/Branch_1/Conv2d_0a_1x1"),
            "b1b": cb(f"{scope}/Branch_1/Conv2d_0b_1x3"),
            "b1c": cb(f"{scope}/Branch_1/Conv2d_0c_3x1"),
            "up": up(f"{scope}/Conv2d_1x1"),
        }
    # Bottleneck FC + its BatchNorm folded (scale=False, eps=1e-3):
    # y = (xW - m) / sqrt(v+eps) * gamma + beta
    kern = np.asarray(w[f"{R}/Bottleneck/weights"])
    bnb = bn(f"{R}/Bottleneck")
    inv = np.asarray(bnb["gamma"]) / np.sqrt(np.asarray(bnb["var"]) + 1e-3)
    p["bottleneck"] = {
        "kernel": jnp.asarray(kern * inv[None, :]),
        "bias": jnp.asarray(np.asarray(bnb["beta"])
                            - np.asarray(bnb["mean"]) * inv),
    }
    for head, scope in (("age", "logits/age"), ("gender", "logits/gender")):
        if f"{scope}/weights" in w:
            p[head] = {"kernel": jnp.asarray(w[f"{scope}/weights"]),
                       "bias": jnp.asarray(w[f"{scope}/biases"])}
    return p


def init_inception_resnet_v1_params(rng: jax.Array, bottleneck: int = 128,
                                    with_heads: bool = False) -> Dict:
    keys = iter(jax.random.split(rng, 256))

    def cb(kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return {
            "kernel": jax.random.normal(next(keys), (kh, kw, cin, cout), jnp.float32)
                      * np.sqrt(2.0 / fan_in),
            "bn": {"gamma": jnp.ones((cout,)), "beta": jnp.zeros((cout,)),
                   "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))},
        }

    p: Dict = {
        "conv1a": cb(3, 3, 3, 32), "conv2a": cb(3, 3, 32, 32),
        "conv2b": cb(3, 3, 32, 64), "conv3b": cb(1, 1, 64, 80),
        "conv4a": cb(3, 3, 80, 192), "conv4b": cb(3, 3, 192, 256),
    }
    for i in range(5):
        p[f"block35_{i}"] = {
            "b0": cb(1, 1, 256, 32),
            "b1a": cb(1, 1, 256, 32), "b1b": cb(3, 3, 32, 32),
            "b2a": cb(1, 1, 256, 32), "b2b": cb(3, 3, 32, 32), "b2c": cb(3, 3, 32, 32),
            "up": {"kernel": jax.random.normal(next(keys), (1, 1, 96, 256)) * 0.05,
                   "bias": jnp.zeros((256,))},
        }
    p["reduction_a"] = {
        "b0": cb(3, 3, 256, 384),
        "b1a": cb(1, 1, 256, 192), "b1b": cb(3, 3, 192, 192), "b1c": cb(3, 3, 192, 256),
    }
    c17 = 256 + 384 + 256  # 896
    for i in range(10):
        p[f"block17_{i}"] = {
            "b0": cb(1, 1, c17, 128),
            "b1a": cb(1, 1, c17, 128), "b1b": cb(1, 7, 128, 128), "b1c": cb(7, 1, 128, 128),
            "up": {"kernel": jax.random.normal(next(keys), (1, 1, 256, c17)) * 0.05,
                   "bias": jnp.zeros((c17,))},
        }
    p["reduction_b"] = {
        "b0a": cb(1, 1, c17, 256), "b0b": cb(3, 3, 256, 384),
        "b1a": cb(1, 1, c17, 256), "b1b": cb(3, 3, 256, 256),
        "b2a": cb(1, 1, c17, 256), "b2b": cb(3, 3, 256, 256), "b2c": cb(3, 3, 256, 256),
    }
    c8 = c17 + 384 + 256 + 256  # 1792
    for i in list(range(5)) + ["final"]:
        p[f"block8_{i}"] = {
            "b0": cb(1, 1, c8, 192),
            "b1a": cb(1, 1, c8, 192), "b1b": cb(1, 3, 192, 192), "b1c": cb(3, 1, 192, 192),
            "up": {"kernel": jax.random.normal(next(keys), (1, 1, 384, c8)) * 0.05,
                   "bias": jnp.zeros((c8,))},
        }
    p["bottleneck"] = {
        "kernel": jax.random.normal(next(keys), (c8, bottleneck)) * 0.02,
        "bias": jnp.zeros((bottleneck,)),
    }
    if with_heads:
        p["age"] = {"kernel": jax.random.normal(next(keys), (bottleneck, 101)) * 0.01,
                    "bias": jnp.zeros((101,))}
        p["gender"] = {"kernel": jax.random.normal(next(keys), (bottleneck, 2)) * 0.01,
                       "bias": jnp.zeros((2,))}
    return p
