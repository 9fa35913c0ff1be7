"""MobileNet-V1 backbone and VGGFace2 face-embedding model.

TPU-native equivalent of the reference's MobileNet-192 embedder
(``models/vgg2_mobilenet.h5/.pb`` — Keras MobileNet alpha=1.0 + GAP, trained on
VGGFace2 9131 classes; architecture per reference ``facerec_keras_train.py:46-57``
and tensor taps ``facerec_test.py:212``: ``input_1:0 → reshape_1/Reshape:0``).

The backbone runs in bf16 on the MXU by default-overridable compute dtype;
params support two forms per block:
  - folded:  {"kernel", "bias"[, "scale"]}       (imported from frozen pbs)
  - bn:      {"kernel", "bn": {gamma,beta,mean,var}}  (training / .h5 import)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (batch_norm, conv2d, dense, depthwise_conv2d,
                     global_avg_pool, relu6)

# (stride, out_channels) for the 13 depthwise-separable blocks, alpha=1.0.
MOBILENET_V1_BLOCKS: List[Tuple[int, int]] = [
    (1, 64), (2, 128), (1, 128), (2, 256), (1, 256), (2, 512),
    (1, 512), (1, 512), (1, 512), (1, 512), (1, 512), (2, 1024), (1, 1024),
]


def _affine_or_bn(x, p, train: bool = False, stats_out: Optional[Dict] = None,
                  layer: str = "", eps: float = 1e-3):
    if "bn" in p:
        bn = p["bn"]
        if train:
            # batch-stats BN: normalize with the batch moments and record them
            # so the caller can update running statistics (Keras semantics).
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
            if stats_out is not None:
                stats_out[layer] = {"mean": mean, "var": var}
            return batch_norm(x, bn["gamma"], bn["beta"], mean, var, eps=eps)
        return batch_norm(x, bn["gamma"], bn["beta"], bn["mean"], bn["var"], eps=eps)
    if "scale" in p:
        x = x * p["scale"]
    if "bias" in p:
        x = x + p["bias"]
    return x


def mobilenet_v1_backbone(params: Dict, x, *, precision=jax.lax.Precision.HIGHEST,
                          compute_dtype=jnp.float32, train: bool = False,
                          stats_out: Optional[Dict] = None,
                          bf16_blocks_below: int = 0, remat: bool = False):
    """(N, H, W, 3) -> (N, H/32, W/32, 1024) feature map.

    With ``train=True`` BN layers use batch moments; pass ``stats_out={}`` to
    collect them (per-layer {"mean","var"}) for running-average updates.

    ``bf16_blocks_below``: mixed-precision serving dial — blocks with index
    < this value (conv1 = 0) run in bf16/MXU-default, the rest in
    ``compute_dtype`` at ``precision``. Measured on v5e (batch 128): the
    all-f32 HIGH path is exact vs HIGHEST at ~12.3k img/s; bf16 anywhere in
    the early blocks roughly doubles those blocks' speed (full bf16 ≈ 24k
    img/s) at an embedding-cosine cost vs true f32 of ~0.977 — use only where
    that tolerance is acceptable (e.g. detection crops, coarse dedup)."""
    def block_cfg(i):
        if i < bf16_blocks_below:
            return jnp.bfloat16, jax.lax.Precision.DEFAULT
        return compute_dtype, precision

    dt, prec = block_cfg(0)
    x = x.astype(dt)

    def cast(k, dt):
        return jax.tree.map(lambda a: a.astype(dt), params[k])

    p = cast("conv1", dt)
    x = conv2d(x, p["kernel"], stride=2, padding="SAME", precision=prec)
    x = relu6(_affine_or_bn(x, p, train, stats_out, "conv1"))
    for i, (stride, _) in enumerate(MOBILENET_V1_BLOCKS, start=1):
        dt, prec = block_cfg(i)
        x = x.astype(dt)
        pdw = cast(f"dw{i}", dt)
        ppw = cast(f"pw{i}", dt)

        def block(x, pdw, ppw, stride=stride, prec=prec, li=i):
            # per-block unit so remat can drop this block's internals during
            # the backward pass (peak memory = block inputs + one block's
            # activations, not the whole network's); BN batch stats are
            # returned, not side-channelled, so no tracers leak the boundary.
            s: Dict = {}
            y = depthwise_conv2d(x, pdw["kernel"], stride=stride, padding="SAME",
                                 precision=prec)
            y = relu6(_affine_or_bn(y, pdw, train, s, f"dw{li}"))
            y = conv2d(y, ppw["kernel"], stride=1, padding="SAME", precision=prec)
            y = relu6(_affine_or_bn(y, ppw, train, s, f"pw{li}"))
            return y, s

        if remat:
            block = jax.checkpoint(block)
        x, s = block(x, pdw, ppw)
        if train and stats_out is not None:
            stats_out.update(s)
    return x


def update_bn_stats(params: Dict, stats: Dict, momentum: float = 0.99) -> Dict:
    """Fold collected batch moments into the running BN statistics."""
    new = dict(params)
    for layer, s in stats.items():
        p = dict(new[layer])
        bn = dict(p["bn"])
        bn["mean"] = momentum * bn["mean"] + (1 - momentum) * s["mean"]
        bn["var"] = momentum * bn["var"] + (1 - momentum) * s["var"]
        p["bn"] = bn
        new[layer] = p
    return new


def mobilenet_embed(params: Dict, x, *, precision=jax.lax.Precision.HIGHEST,
                    compute_dtype=jnp.float32) -> jnp.ndarray:
    """Face embedding: backbone + GAP -> (N, 1024).

    Equivalent to the reference's ``reshape_1/Reshape:0`` tap (GAP then
    Reshape(1,1,1024) — we skip the vestigial reshape)."""
    h = mobilenet_v1_backbone(params, x, precision=precision, compute_dtype=compute_dtype)
    return global_avg_pool(h).astype(jnp.float32)


def mobilenet_classify(params: Dict, x, *, precision=jax.lax.Precision.HIGHEST,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """Training-time logits head: embedding -> (N, n_classes).

    Mirrors reference ``facerec_keras_train.py:46-57``: GAP + Dense softmax
    (L2-regularized Dense handled by the optimizer/loss, not the layer)."""
    emb = mobilenet_embed(params, x, precision=precision, compute_dtype=compute_dtype)
    return dense(emb, params["classifier"]["kernel"], params["classifier"]["bias"],
                 precision=precision)


def init_mobilenet_params(rng: jax.Array, n_classes: Optional[int] = None,
                          width: float = 1.0) -> Dict:
    """He-init MobileNet-V1 params with full BN blocks (training form)."""
    def c(ch):
        return max(8, int(ch * width))

    keys = jax.random.split(rng, 64)
    ki = iter(range(64))

    def conv_init(k, shape, fan_in):
        return jax.random.normal(k, shape, jnp.float32) * np.sqrt(2.0 / fan_in)

    def bn_init(ch):
        return {
            "gamma": jnp.ones((ch,)), "beta": jnp.zeros((ch,)),
            "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,)),
        }

    params: Dict = {}
    in_ch = 3
    ch = c(32)
    params["conv1"] = {
        "kernel": conv_init(keys[next(ki)], (3, 3, in_ch, ch), 9 * in_ch),
        "bn": bn_init(ch),
    }
    in_ch = ch
    for i, (stride, out) in enumerate(MOBILENET_V1_BLOCKS, start=1):
        out = c(out)
        params[f"dw{i}"] = {
            "kernel": conv_init(keys[next(ki)], (3, 3, in_ch, 1), 9),
            "bn": bn_init(in_ch),
        }
        params[f"pw{i}"] = {
            "kernel": conv_init(keys[next(ki)], (1, 1, in_ch, out), in_ch),
            "bn": bn_init(out),
        }
        in_ch = out
    if n_classes is not None:
        params["classifier"] = {
            "kernel": conv_init(keys[next(ki)], (in_ch, n_classes), in_ch),
            "bias": jnp.zeros((n_classes,)),
        }
    return params
