"""Fused preprocessing: resize + channel-order + normalization.

Reproduces the reference's three normalization schemes
(``facerec_test.py:95-111``, ``facial_analysis.py:103-107,506``) as fused,
jit-compiled device ops. Input images are RGB uint8/float (H, W, 3) as decoded
by the host; channel flip to BGR happens on device where a scheme requires it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .resize import resize

# Mean pixel values (BGR order, matching the Caffe-lineage models).
IMAGENET_MEANS_BGR = (103.939, 116.779, 123.68)     # facerec_test.py:97-100
VGGFACE2_MEANS_BGR = (91.4953, 103.8827, 131.0912)  # facerec_test.py:102-105


def to_bgr(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., ::-1]


def normalize_caffe(x: jnp.ndarray, means_bgr=IMAGENET_MEANS_BGR) -> jnp.ndarray:
    """RGB float input -> BGR, per-channel mean subtraction."""
    return to_bgr(x.astype(jnp.float32)) - jnp.asarray(means_bgr, dtype=jnp.float32)


def normalize_vggface2(x: jnp.ndarray) -> jnp.ndarray:
    return normalize_caffe(x, VGGFACE2_MEANS_BGR)


# keras_vggface.utils.preprocess_input version=1 (VGG16 extractor rows,
# facerec_test.py:344-349, facial_clustering_test.py:295-300)
VGGFACE1_MEANS_BGR = (93.5940, 104.7624, 129.1863)


def normalize_vggface1(x: jnp.ndarray) -> jnp.ndarray:
    return normalize_caffe(x, VGGFACE1_MEANS_BGR)


def normalize_mtcnn(x: jnp.ndarray) -> jnp.ndarray:
    """(x - 127.5) * 0.0078125 — reference ``facial_analysis.py:506,550,580``."""
    return (x.astype(jnp.float32) - 127.5) * 0.0078125


def normalize_tf(x: jnp.ndarray) -> jnp.ndarray:
    """x / 127.5 - 1 — reference ``facerec_test.py:109-111``."""
    return x.astype(jnp.float32) / 127.5 - 1.0


NORMALIZERS = {
    "caffe": normalize_caffe,
    "vggface2": normalize_vggface2,
    "vggface1": normalize_vggface1,
    "mtcnn": normalize_mtcnn,
    "tf": normalize_tf,
    "none": lambda x: x.astype(jnp.float32),
}


def preprocess_batch(images: jnp.ndarray, out_hw: Tuple[int, int],
                     normalization: str = "vggface2",
                     resize_method: str = "cv2_linear") -> jnp.ndarray:
    """Fused resize + normalize for a batch of same-size RGB images.

    images: (N, H, W, 3) uint8 or float RGB. Returns (N, out_h, out_w, 3) f32.
    Under jit, the resize matmuls and the normalization fuse into one XLA
    program; the uint8→f32 cast happens on device to keep host→device
    transfers at 1 byte/pixel."""
    x = resize(images.astype(jnp.float32), out_hw, method=resize_method)
    return NORMALIZERS[normalization](x)
