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

from .layers import batch_norm, conv2d, dense, global_avg_pool, max_pool

STAGES = (3, 4, 6, 3)
STAGE_WIDTHS = ((64, 64, 256), (128, 128, 512), (256, 256, 1024), (512, 512, 2048))


def _conv_bn(x, p, *, stride=1, padding="SAME", relu=True, precision):
    x = conv2d(x, p["kernel"], stride=stride, padding=padding, precision=precision)
    bn = p["bn"]
    x = batch_norm(x, bn["gamma"], bn["beta"], bn["mean"], bn["var"])
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
    """(N, H, W, 3) -> (N, H/32, W/32, 2048)."""
    x = x.astype(compute_dtype)
    cast = lambda p: jax.tree.map(lambda a: a.astype(compute_dtype), p)
    x = _conv_bn(x, cast(params["stem"]), stride=2, precision=precision)
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
