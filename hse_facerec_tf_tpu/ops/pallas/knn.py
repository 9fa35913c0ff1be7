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
    32 GB, 2× HBM): 57.1 ms vs 126 ms for the probe-chunked XLA
    alternative (``nearest_neighbor_chunked_xla``) — the matrix-free sweep
    wins 2.2× in the regime it exists for (bench.py knn_8kx1M rows).
    The iota+where argmin beats jnp.argmin inside the kernel (60.6 vs
    69.1 ms, measured) — keep it.

Where the 57 ms sit on the roof (r3 ablation, all measured): the kernel is
**MXU-bound, at 78% of true speed-of-light**. v5e peak is 197 TFLOP/s bf16
(394 is the int8 number), so the 2·M·N·D = 8.8 TFLOP of distances floor at
~45 ms; gallery HBM traffic is only ~5 ms at TILE_M=2048 (4 sweeps ×
1.07 GB / 819 GB/s). Per-tile cost decomposition at (2048, 1024):
matmul + one fused min-reduce = 59.0 ms; the full argmin adds just +0.7 ms
(59.7); splitting each tile into two independent dot→argmin chains lets the
scheduler overlap VPU of half 1 with MXU of half 2 → 57.1 ms (the shipped
form, ``_SPLITS = 2``).

Measured dead ends (do not retry without new Mosaic evidence):
  - TILE_M ∈ {4096, 8192}, TILE_N = 2048, and ≥4-way splits all FAIL to
    compile (Mosaic rejects the larger per-tile elementwise temporaries);
    TILE_M=2048/TILE_N=1024 is the largest admitted config and is only 2%
    faster than 1024² — traffic was never the binding constraint.
  - Software pipelining via ab-scratch ping-pong (matmul of tile j alongside
    drain of tile j-1 under alternating ``pl.when``): 105 ms — Mosaic does
    not overlap the units across conditional regions, and the extra VMEM
    round-trip of the (TILE_M, TILE_N) scores tile costs ~2 full passes.
  - Deferring the per-row ``a2`` add out of the kernel: 65.8 ms (the fused
    ``a2+b2-2ab`` epilogue is FREE next to the dot; breaking it hurts).

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

# TILE_M sets how often the gallery is re-swept from HBM (traffic =
# ceil(M / TILE_M) × gallery bytes); 2048×1024 is the largest tile Mosaic
# admits and the measured best. _SPLITS independent dot→argmin chains per
# tile let the scheduler overlap one chain's VPU argmin with the next
# chain's MXU matmul (57.1 vs 59.6 ms; see module docstring).
TILE_M = 2048  # probe rows per tile
TILE_N = 1024  # gallery rows per tile
_SPLITS = 2    # independent dot→argmin chains per tile


def _make_kernel(tile_n: int, splits: int):
    h = tile_n // splits

    def kernel(a_ref, bt_ref, a2_ref, b2_ref, min_ref, idx_ref,
               state_min, state_idx):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        a = a_ref[:]

        # operands arrive pre-cast (bf16 or f32) — casting BEFORE the kernel
        # halves the HBM gallery traffic. The `splits` half-tiles form
        # independent MXU→VPU chains the scheduler can overlap.
        abs_ = [jnp.dot(a, bt_ref[:, k * h:(k + 1) * h],
                        preferred_element_type=jnp.float32)
                for k in range(splits)]

        local_min = local_arg = None
        for k, ab in enumerate(abs_):
            d = a2_ref[:] + b2_ref[:, k * h:(k + 1) * h] - 2.0 * ab
            lm = jnp.min(d, axis=1, keepdims=True)     # (tile_m, 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            la = jnp.min(jnp.where(d <= lm, cols, jnp.int32(2 ** 30)),
                         axis=1, keepdims=True) + j * tile_n + k * h
            if local_min is None:
                local_min, local_arg = lm, la
            else:
                take = lm < local_min
                local_min = jnp.where(take, lm, local_min)
                local_arg = jnp.where(take, la, local_arg)

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


@functools.partial(jax.jit,
                   static_argnames=("bf16", "interpret", "tile_m", "tile_n",
                                    "splits"))
def nearest_neighbor_tpu(probes: jnp.ndarray, gallery: jnp.ndarray,
                         bf16: bool = True, interpret: bool = False,
                         tile_m: int = TILE_M, tile_n: int = TILE_N,
                         splits: int = _SPLITS,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(M, D) probes × (N, D) gallery -> (min_sq_dist (M,), argmin (M,)).

    Squared-L2 metric. Pads to tile multiples internally; padded gallery rows
    are excluded via +inf norms. ``bf16`` feeds the MXU bf16 operands (same
    numerics as the XLA default-precision path); set False for exact f32.
    ``tile_m`` caps probe rows per gallery sweep (gallery HBM traffic =
    ceil(M / tile_m) × gallery bytes); the defaults are the measured best.
    """
    m, d = probes.shape
    n, _ = gallery.shape
    TILE_M, TILE_N = tile_m, tile_n
    if TILE_N % splits or (TILE_N // splits) % 128:
        splits = 1   # half-tiles must stay lane-aligned
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
        _make_kernel(TILE_N, splits),
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
