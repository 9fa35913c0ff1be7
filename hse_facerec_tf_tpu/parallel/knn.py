"""Gallery-sharded distributed 1-NN over a device mesh.

The identification hot path — "for each probe, the nearest gallery
embedding" (reference: a host-side sklearn k-NN over the full gallery,
``facerec_test.py:269-281,430-432``) — scaled past one chip the idiomatic
SPMD way: the GALLERY is sharded over the mesh's 'data' axis (it is the
axis that grows — millions of enrolled identities), probes are replicated,
each device sweeps only its gallery shard with the single-chip kernel
(``ops/pallas/knn.py`` matrix-free sweep on TPU, XLA matmul+argmin
elsewhere), and the per-shard (min, argmin) pairs combine with ONE tiny
all-gather of (P, M) scalars — no distance matrix or embedding ever
crosses ICI.

Combine semantics match the single-device kernel exactly: ties between
shards resolve to the lowest global index (each shard's argmin is already
its lowest local index, shard offsets preserve the order).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def nearest_neighbor_sharded(probes: jnp.ndarray, gallery,
                             mesh: Mesh, axis: str = "data",
                             force_pallas: bool = False, int8: bool = False,
                             n_valid: int = None,
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(M, D) probes × (N, D) gallery -> (min_sq_dist (M,), argmin (M,)).

    ``gallery`` is padded to a multiple of the mesh axis size and split
    along it; padded rows are masked with +inf distance. Global indices
    refer to the unpadded gallery.

    ``int8=True`` quantizes the gallery ONCE with one global scale (so every
    shard ranks in the same scaled domain and tie semantics match the
    single-device int8 kernel), ships int8 shards (4× less per-device HBM),
    and runs the int8 MXU kernel per shard. Padded shard rows are masked via
    the kernel's ``valid_n`` — an int8 pad row cannot be made to always lose
    the way the f32 path's 1e4-magnitude rows do.

    A long-lived caller (the serving ``EnrollmentGallery``) can do the
    quantize+pad+placement once per gallery version and pass
    ``gallery=(q_int8, scale)`` already padded to the axis size together
    with ``n_valid`` (the true row count); per-query work is then just the
    sharded sweep.
    """
    from ..ops.pallas.knn import nearest_neighbor_auto, quantize_embeddings

    n_dev = mesh.shape[axis]
    m, d = probes.shape
    g_scale = None
    if isinstance(gallery, tuple):
        if not int8:
            raise ValueError("a (q, scale) gallery requires int8=True")
        gallery, g_scale = gallery
        if gallery.shape[0] % n_dev:
            raise ValueError(f"pre-quantized gallery rows "
                             f"{gallery.shape[0]} not a multiple of the "
                             f"{n_dev}-device '{axis}' axis")
        n = gallery.shape[0] if n_valid is None else int(n_valid)
        shard = gallery.shape[0] // n_dev
    else:
        if n_valid is not None:
            raise ValueError("n_valid requires a pre-quantized (q, scale) "
                             "gallery")
        n = gallery.shape[0]
        shard = -(-n // n_dev)
        n_pad = shard * n_dev
        if int8:
            gallery, g_scale = quantize_embeddings(gallery)
            if n_pad != n:
                gallery = jnp.concatenate(
                    [gallery, jnp.zeros((n_pad - n, d), jnp.int8)])
        elif n_pad != n:
            # pad rows must LOSE every local argmin (a zero row would win
            # for small-norm probes); 1e4-magnitude rows give ~1e8
            # sq-distances, far above any real embedding pair, and stay
            # exact in f32/bf16
            gallery = jnp.concatenate(
                [gallery, jnp.full((n_pad - n, d), 1e4, gallery.dtype)])

    fn = _sharded_ranker(mesh, axis, shard, int(n), bool(int8),
                         bool(force_pallas))
    if g_scale is None:
        g_scale = jnp.zeros((), jnp.float32)   # unused in the f32 path
    dmin, idx = fn(probes, gallery, g_scale)
    return dmin, idx


@functools.lru_cache(maxsize=64)
def _sharded_ranker(mesh: Mesh, axis: str, shard: int, n: int, int8: bool,
                    force_pallas: bool):
    """Jitted shard_map sweep, cached per (mesh, layout): a fresh closure
    per query would defeat JAX's dispatch cache and pay trace+lower time on
    every call of a long-lived caller (the serving gallery)."""
    from ..ops.pallas.knn import nearest_neighbor_auto

    def local(probes_l, gallery_l, scale_l):
        # gallery_l: this device's (shard, D) slice; probes/scale replicated
        offset = jax.lax.axis_index(axis) * shard
        if int8:
            valid = jnp.clip(n - offset, 0, shard)
            dmin, idx = nearest_neighbor_auto(
                probes_l, (gallery_l, scale_l), force_pallas=force_pallas,
                int8=True, valid_n=valid)
        else:
            dmin, idx = nearest_neighbor_auto(probes_l, gallery_l,
                                              force_pallas=force_pallas)
        gidx = idx + offset
        dmin = jnp.where(gidx < n, dmin, jnp.inf)   # mask padded rows
        # one (n_dev, M) all-gather of scalars — the only collective
        all_min = jax.lax.all_gather(dmin, axis)     # (n_dev, M)
        all_idx = jax.lax.all_gather(gidx, axis)
        best = jnp.argmin(all_min, axis=0)           # ties -> lowest shard
        take = lambda a: jnp.take_along_axis(a, best[None, :], axis=0)[0]
        return take(all_min), take(all_idx)

    # check_vma=False: after the all_gather the combine is computed
    # redundantly on every device, which the replication checker cannot
    # infer statically
    return jax.jit(jax.shard_map(local, mesh=mesh,
                                 in_specs=(P(), P(axis), P()),
                                 out_specs=(P(), P()), check_vma=False))
