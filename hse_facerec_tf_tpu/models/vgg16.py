"""VGGFace VGG16 embedder (keras_vggface architecture).

The reference uses ``keras_vggface.VGGFace(model='vgg16')`` tapped at
``fc7/relu`` as an alternative face embedder in both the identification and
clustering benchmarks (``facerec_test.py:344-349``,
``facial_clustering_test.py:295-300``): standard VGG16 — five 3×3 conv
blocks (64/128/256/512/512 channels, 2/2/3/3/3 layers) each followed by a
2×2 max-pool, then fc6(4096)+relu and fc7(4096)+relu — trained on VGGFace
(2622 identities; the fc8 softmax head is not used for embeddings).

Pure function over an explicit param pytree; ``vgg16_params_from_h5`` maps
the published ``rcmalli_vggface_tf_vgg16.h5`` weights (an external blob, not
shipped with the reference) onto it.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.preprocess import VGGFACE1_MEANS_BGR  # noqa: F401 (re-export)
from .layers import _DEFAULT_PRECISION, conv2d, dense, max_pool

# (block, n_convs, channels)
VGG16_BLOCKS = ((1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512))


def vgg16_embed(params: Dict, x: jnp.ndarray,
                precision=_DEFAULT_PRECISION) -> jnp.ndarray:
    """(N, 224, 224, 3) preprocessed (BGR, mean-subtracted) -> (N, 4096)
    fc7/relu activations (the reference's embedding tap)."""
    for block, n_convs, _ in VGG16_BLOCKS:
        for i in range(1, n_convs + 1):
            layer = params[f"conv{block}_{i}"]
            x = conv2d(x, layer["kernel"], precision=precision) + layer["bias"]
            x = jax.nn.relu(x)
        x = max_pool(x, 2, 2, padding="VALID")
    # Keras Flatten on NHWC: (7, 7, 512) in (h, w, c) order — matches the
    # published fc6 kernel layout
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(dense(x, params["fc6"]["kernel"], params["fc6"]["bias"],
                          precision=precision))
    x = jax.nn.relu(dense(x, params["fc7"]["kernel"], params["fc7"]["bias"],
                          precision=precision))
    return x


def init_vgg16_params(rng: jax.Array) -> Dict:
    """He-normal random init (for tests / the loud random-init fallback)."""
    params: Dict = {}
    cin = 3
    keys = iter(jax.random.split(rng, 20))
    for block, n_convs, cout in VGG16_BLOCKS:
        for i in range(1, n_convs + 1):
            k = next(keys)
            fan_in = 3 * 3 * cin
            params[f"conv{block}_{i}"] = {
                "kernel": jax.random.normal(k, (3, 3, cin, cout), jnp.float32)
                * np.sqrt(2.0 / fan_in),
                "bias": jnp.zeros((cout,), jnp.float32),
            }
            cin = cout
    flat = 7 * 7 * 512
    for name, (fi, fo) in (("fc6", (flat, 4096)), ("fc7", (4096, 4096))):
        k = next(keys)
        params[name] = {
            "kernel": jax.random.normal(k, (fi, fo), jnp.float32)
            * np.sqrt(2.0 / fi),
            "bias": jnp.zeros((fo,), jnp.float32),
        }
    return params


def vgg16_params_from_h5(path: str) -> Dict:
    """Map a keras_vggface VGG16 h5 (standard Keras layer groups; kernel =
    4-D/2-D array, bias = 1-D) onto the param pytree. fc8 is ignored."""
    from ..core.h5_import import load_keras_h5

    weights = load_keras_h5(path)
    by_layer: Dict[str, Dict[str, np.ndarray]] = {}
    for name, arr in weights.items():
        layer = name.split("/")[0]
        slot = "kernel" if arr.ndim > 1 else "bias"
        by_layer.setdefault(layer, {})[slot] = np.asarray(arr, np.float32)

    params: Dict = {}
    for block, n_convs, cout in VGG16_BLOCKS:
        for i in range(1, n_convs + 1):
            layer = f"conv{block}_{i}"
            if layer not in by_layer:
                raise KeyError(f"{path}: missing VGG16 layer {layer!r}")
            k = by_layer[layer]["kernel"]
            if k.shape[-1] != cout:
                raise ValueError(f"{layer}: kernel shape {k.shape}, want "
                                 f"(3, 3, ?, {cout})")
            params[layer] = {"kernel": jnp.asarray(k),
                             "bias": jnp.asarray(by_layer[layer]["bias"])}
    for name in ("fc6", "fc7"):
        if name not in by_layer:
            raise KeyError(f"{path}: missing VGG16 layer {name!r}")
        params[name] = {"kernel": jnp.asarray(by_layer[name]["kernel"]),
                        "bias": jnp.asarray(by_layer[name]["bias"])}
    return params
