"""BKNet-style multi-task CNN (smile / gender / age) on 48² grayscale.

The reference benchmarks the external BKNetStyle2 model on UTKFace
(``utkface_test.py:153-184``): 48×48×1 input normalized (x − 128)/255, three
heads — smile(2) / gender(2) / age(101) — decoded as argmax (female iff
gender argmax == 0, age = argmax bin).

Native VGG-style functional implementation of that model family: three
double-conv blocks (32/64/128 channels, 3×3 SAME, max-pool 2) and a shared
256-wide FC trunk feeding the three softmax-logit heads. External weights
ship as a TF checkpoint with repo-specific variable names; load them by
dumping to an .npz whose keys match this pytree (documented here rather than
guessing the third-party naming).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d, dense, max_pool

_P = jax.lax.Precision.DEFAULT

BKNET_BLOCKS = (32, 64, 128)


def bknet_apply(params: Dict, x, *, precision=_P
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(N, 48, 48, 1) normalized grayscale → (smile (N,2), gender (N,2),
    age (N,101)) logits."""
    h = jnp.asarray(x, jnp.float32)
    for bi, ch in enumerate(BKNET_BLOCKS, start=1):
        for ci in (1, 2):
            p = params[f"conv{bi}_{ci}"]
            h = jax.nn.relu(conv2d(h, p["kernel"], precision=precision)
                            + p["bias"])
        h = max_pool(h, 2, 2, "VALID")
    h = h.reshape(h.shape[0], -1)
    fc = params["fc"]
    h = jax.nn.relu(dense(h, fc["kernel"], fc["bias"], precision=precision))
    heads = []
    for name in ("smile", "gender", "age"):
        p = params[name]
        heads.append(dense(h, p["kernel"], p["bias"], precision=precision))
    return tuple(heads)


def preprocess_bknet(images_rgb: np.ndarray) -> np.ndarray:
    """RGB uint8 batch → (N, 48, 48, 1) normalized, reference :171-176
    (cv2 grayscale, resize 48², (x − 128)/255)."""
    import cv2

    out = []
    for img in images_rgb:
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        gray = cv2.resize(gray, (48, 48))
        out.append((gray.astype(np.float32) - 128.0) / 255.0)
    return np.asarray(out)[..., None]


def init_bknet_params(rng: jax.Array, input_size: int = 48) -> Dict:
    keys = iter(jax.random.split(rng, 32))

    def conv(cin, cout):
        return {"kernel": jax.random.normal(next(keys), (3, 3, cin, cout),
                                            jnp.float32) * np.sqrt(2.0 / (9 * cin)),
                "bias": jnp.zeros((cout,))}

    def dense_p(din, dout):
        return {"kernel": jax.random.normal(next(keys), (din, dout)) * 0.01,
                "bias": jnp.zeros((dout,))}

    p: Dict = {}
    in_ch = 1
    for bi, ch in enumerate(BKNET_BLOCKS, start=1):
        p[f"conv{bi}_1"] = conv(in_ch, ch)
        p[f"conv{bi}_2"] = conv(ch, ch)
        in_ch = ch
    spatial = input_size // 8          # three 2× pools
    p["fc"] = dense_p(spatial * spatial * in_ch, 256)
    p["smile"] = dense_p(256, 2)
    p["gender"] = dense_p(256, 2)
    p["age"] = dense_p(256, 101)
    return p


def bknet_params_from_npz(path: str) -> Dict:
    """Load a BKNet checkpoint dumped as an .npz with this module's pytree
    key layout (``conv1_1/kernel`` … ``age/bias``)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    p: Dict = {}
    for k, v in flat.items():
        layer, leaf = k.rsplit("/", 1)
        p.setdefault(layer, {})[leaf] = jnp.asarray(v)
    return p
