"""On-device distance / similarity ops for identification and clustering.

Replaces the reference's per-pair Python/scipy distance computations
(``facerec_test.py:157-175`` chi²/KL/EMD; sklearn kNN internals) with batched
MXU matmuls: the full gallery×probe distance matrix is one (or a few) large
contractions, and 1-NN is a fused matmul + argmin on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Precision = jax.lax.Precision


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-10) -> jnp.ndarray:
    """Row-normalize feature vectors (reference ``facerec_test.py:401-405``,
    sklearn ``preprocessing.normalize`` semantics)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def pairwise_sqeuclidean(a: jnp.ndarray, b: jnp.ndarray,
                         precision=Precision.HIGHEST) -> jnp.ndarray:
    """(N, D) × (M, D) -> (N, M) squared-L2 distances via one matmul."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    ab = jnp.dot(a, b.T, preferred_element_type=jnp.float32, precision=precision)
    return jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)


def pairwise_euclidean(a, b, precision=Precision.HIGHEST):
    return jnp.sqrt(pairwise_sqeuclidean(a, b, precision=precision))


def pairwise_cosine(a, b, precision=Precision.HIGHEST):
    """Cosine *distance* (1 - similarity)."""
    an = l2_normalize(a)
    bn = l2_normalize(b)
    sim = jnp.dot(an, bn.T, preferred_element_type=jnp.float32, precision=precision)
    return 1.0 - sim


def chi2_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """χ² distance Σ (x-y)²/(x+y) over histograms; 0 where x+y==0.
    Matches reference ``facerec_test.py:157-160``. Supports batched inputs
    broadcasting over leading dims."""
    s = x + y
    num = (x - y) ** 2
    return jnp.sum(jnp.where(s > 0, num / jnp.where(s > 0, s, 1.0), 0.0), axis=-1)


def pairwise_chi2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return chi2_dist(a[:, None, :], b[None, :, :])


def kl_dist(x: jnp.ndarray, y: jnp.ndarray, eps: float = 0.001) -> jnp.ndarray:
    """Smoothed KL divergence Σ (x+ε)·log((x+ε)/(y+ε)) —
    reference ``facerec_test.py:162-164``."""
    xs = x + eps
    ys = y + eps
    return jnp.sum(xs * jnp.log(xs / ys), axis=-1)


def pairwise_kl(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return kl_dist(a[:, None, :], b[None, :, :])


def emd_1d(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Earth-mover's distance with unit ground metric (|i-j| cost ≡ the
    reference's ones-minus-eye matrix is total-variation; with that cost
    EMD = 0.5 * L1 for equal-mass histograms — reference
    ``facerec_test.py:166-175`` uses cost (1 - I), i.e. any move costs 1,
    so EMD = Σ max(x-y, 0) = L1/2)."""
    return 0.5 * jnp.sum(jnp.abs(x - y), axis=-1)


def pairwise_emd_unit(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return emd_1d(a[:, None, :], b[None, :, :])


def nearest_neighbor(gallery: jnp.ndarray, gallery_labels: jnp.ndarray,
                     probes: jnp.ndarray, metric: str = "euclidean",
                     precision=Precision.HIGHEST):
    """1-NN classification fully on device: distance matmul + argmin + gather.

    Returns (predicted_labels (M,), nn_distances (M,)). This is the TPU
    equivalent of the reference's sklearn KNeighborsClassifier(n_neighbors=1)
    eval path (``facerec_test.py:269-281,416-432``)."""
    if metric == "euclidean":
        d = pairwise_sqeuclidean(probes, gallery, precision=precision)
    elif metric == "cosine":
        d = pairwise_cosine(probes, gallery, precision=precision)
    elif metric == "chi2":
        d = pairwise_chi2(probes, gallery)
    elif metric == "kl":
        d = pairwise_kl(probes, gallery)
    else:
        raise ValueError(metric)
    idx = jnp.argmin(d, axis=-1)
    dmin = jnp.take_along_axis(d, idx[:, None], axis=-1)[:, 0]
    if metric == "euclidean":
        dmin = jnp.sqrt(dmin)
    return gallery_labels[idx], dmin


def top_k_neighbors(gallery: jnp.ndarray, probes: jnp.ndarray, k: int,
                    metric: str = "euclidean", precision=Precision.HIGHEST):
    """k nearest gallery indices + distances per probe (ascending)."""
    if metric == "euclidean":
        d = pairwise_sqeuclidean(probes, gallery, precision=precision)
    elif metric == "cosine":
        d = pairwise_cosine(probes, gallery, precision=precision)
    else:
        raise ValueError(metric)
    neg_d, idx = jax.lax.top_k(-d, k)
    d_k = -neg_d
    if metric == "euclidean":
        d_k = jnp.sqrt(jnp.maximum(d_k, 0.0))
    return idx, d_k
