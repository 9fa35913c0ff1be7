"""Matrix-free 1-NN Pallas kernel: distance matmul + running argmin in VMEM.

The identification hot path is "for each probe, find the nearest gallery
embedding" (reference: sklearn KNeighborsClassifier over per-pair Python
distances, ``facerec_test.py:269-281,430-432``). The XLA path
(ops/distance.py) materializes the (M, N) distance matrix in HBM and argmins
it; this kernel instead carries a per-probe running (min, argmin) across
gallery tiles in VMEM scratch, so HBM traffic is O(M·D + N·D) instead of
O(M·N) — the formulation that keeps working when the distance matrix itself
would exceed HBM (e.g. 50k probes × 5M gallery = 1 TB matrix).

Measured on v5e-1 (bf16 MXU inputs):
  - in-HBM regime (M=1024, D=1024, N=204800): 11.9 ms vs 10.4 ms for XLA
    matmul+argmin — XLA's hand-tuned pipeline wins while the matrix fits, so
    ``nearest_neighbor_auto`` defaults to XLA there;
  - design point (M=8192, D=512, N=1,048,576 — the (M, N) f32 matrix is
    32 GB, 2× HBM): 60.6 ms vs 126 ms for the probe-chunked XLA
    alternative (``nearest_neighbor_chunked_xla``) — the matrix-free sweep
    wins 2.1× in the regime it exists for (bench.py knn_8kx1M rows).
    Gallery HBM traffic bounds the sweep: (M / TILE_M) full re-reads, so
    TILE_M=1024 (8 sweeps) + pre-cast bf16 operands cut 97 ms → 60.6 ms.
    The iota+where argmin beats jnp.argmin inside the kernel (60.6 vs
    69.1 ms, measured) — keep it.

Grid: (probe_tiles, gallery_tiles), gallery innermost (TPU grids execute
sequentially, so VMEM scratch persists across the gallery sweep).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# TILE_M sets how often the gallery is re-swept from HBM: traffic is
# (M / TILE_M) x gallery bytes, the kernel's dominant cost at the design
# point. 1024 probe rows x 1024-d bf16 operands still fit VMEM comfortably
# alongside the (TILE_M, TILE_N) f32 distance tile.
TILE_M = 1024  # probe rows per tile
TILE_N = 1024  # gallery rows per tile


def _make_kernel():
    def kernel(a_ref, bt_ref, a2_ref, b2_ref, min_ref, idx_ref,
               state_min, state_idx):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        # operands arrive pre-cast (bf16 or f32) — casting BEFORE the kernel
        # halves the HBM gallery traffic, which is what bounds the sweep
        ab = jnp.dot(a_ref[:], bt_ref[:], preferred_element_type=jnp.float32)
        d = a2_ref[:] + b2_ref[:] - 2.0 * ab          # (TILE_M, TILE_N)

        local_min = jnp.min(d, axis=1, keepdims=True)  # (TILE_M, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        is_min = d <= local_min
        local_arg = jnp.min(jnp.where(is_min, cols, jnp.int32(2 ** 30)), axis=1,
                            keepdims=True) + j * TILE_N

        @pl.when(j == 0)
        def _():
            state_min[:] = local_min
            state_idx[:] = local_arg

        @pl.when(j > 0)
        def _():
            better = local_min < state_min[:]
            state_min[:] = jnp.where(better, local_min, state_min[:])
            state_idx[:] = jnp.where(better, local_arg, state_idx[:])

        @pl.when(j == nj - 1)
        def _():
            min_ref[:] = state_min[:]
            idx_ref[:] = state_idx[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("bf16", "interpret"))
def nearest_neighbor_tpu(probes: jnp.ndarray, gallery: jnp.ndarray,
                         bf16: bool = True, interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(M, D) probes × (N, D) gallery -> (min_sq_dist (M,), argmin (M,)).

    Squared-L2 metric. Pads to tile multiples internally; padded gallery rows
    are excluded via +inf norms. ``bf16`` feeds the MXU bf16 operands (same
    numerics as the XLA default-precision path); set False for exact f32.
    """
    m, d = probes.shape
    n, _ = gallery.shape
    mp = -(-m // TILE_M) * TILE_M
    np_ = -(-n // TILE_N) * TILE_N

    a = jnp.zeros((mp, d), jnp.float32).at[:m].set(probes.astype(jnp.float32))
    b = jnp.zeros((np_, d), jnp.float32).at[:n].set(gallery.astype(jnp.float32))
    a2 = jnp.sum(a * a, axis=1, keepdims=True)                       # (mp, 1)
    b2 = jnp.sum(b * b, axis=1)
    b2 = jnp.where(jnp.arange(np_) < n, b2, jnp.inf)[None, :]        # (1, np_)
    bt = b.T                                                          # (d, np_)
    if bf16:
        a = a.astype(jnp.bfloat16)
        bt = bt.astype(jnp.bfloat16)

    grid = (mp // TILE_M, np_ // TILE_N)
    min_d, idx = pl.pallas_call(
        _make_kernel(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_M, 1), jnp.float32),
            pltpu.VMEM((TILE_M, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a, bt, a2, b2)
    return jnp.maximum(min_d[:m, 0], 0.0), idx[:m, 0]


def use_pallas_path(m: int, n: int, backend: str, force: bool = False,
                    hbm_limit_bytes: int = 4 * 1024 ** 3) -> bool:
    """Routing rule for ``nearest_neighbor_auto``: the matrix-free kernel is
    the right path on TPU once the (M, N) f32 distance matrix stops fitting
    comfortably in HBM (the XLA path materializes it); below that, XLA's
    matmul pipeline wins (module docstring numbers)."""
    if backend not in ("tpu", "axon"):
        return False
    return force or 4 * m * n > hbm_limit_bytes


def nearest_neighbor_chunked_xla(probes, gallery, chunk: int = 512,
                                 bf16: bool = True):
    """Probe-chunked XLA alternative for out-of-HBM matrices: lax.map over
    (chunk, N) sub-matrices. Same O(M/chunk · N · D) gallery re-reads as the
    Pallas sweep; used as the honest comparison point in bench.py."""
    from ..distance import pairwise_sqeuclidean

    m, d = probes.shape
    mp = -(-m // chunk) * chunk
    a = jnp.zeros((mp, d), probes.dtype).at[:m].set(probes)
    prec = jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST

    def one(chunk_probes):
        dist = pairwise_sqeuclidean(chunk_probes, gallery, precision=prec)
        idx = jnp.argmin(dist, axis=1)
        return jnp.take_along_axis(dist, idx[:, None], axis=1)[:, 0], idx

    dmin, idx = jax.lax.map(one, a.reshape(mp // chunk, chunk, d))
    return dmin.reshape(mp)[:m], idx.reshape(mp)[:m]


def nearest_neighbor_auto(probes, gallery, force_pallas: bool = False):
    """XLA matmul+argmin by default (fastest while the (M, N) matrix fits in
    HBM); the matrix-free Pallas kernel on TPU when forced or when the matrix
    would be prohibitively large."""
    m, n = probes.shape[0], gallery.shape[0]
    if use_pallas_path(m, n, jax.default_backend(), force_pallas):
        return nearest_neighbor_tpu(probes, gallery)
    from ..distance import pairwise_sqeuclidean

    d = pairwise_sqeuclidean(probes, gallery, precision=jax.lax.Precision.DEFAULT)
    idx = jnp.argmin(d, axis=1)
    return jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0], idx
