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

int8 variant (r3, measured at the same design point): quantized-gallery
sweep (``nearest_neighbor_tpu_int8q``) runs **34.1 ms vs 56.3 ms bf16**
(1.65×) — the int8 MXU peak (394 TFLOP/s, dot+min-only floor measured at
26.1 ms) is real, but with the dot half as long the fused epilogue becomes
exposed VPU time, so the int8 kernel drops the per-row a2 add (41.0 →
34.1 ms; argmin-invariant, restored outside). Epilogue ablation: pure
int32 domain (no int→f32 convert, integer min) is SLOWER (38.7 ms — f32
min beats int32 min on the VPU: dot+min floors 26.1 f32 vs 27.8 int);
pre-halving b2 to save the 2× multiply is a wash (34.5); splits 1/4 =
36.0/38.5. The remaining ~8 ms over the 26.1 ms floor was the second
epilogue pass (iota/where index selection) — r4 deletes it by PACKING the
column index into the low 10 mantissa bits of the (offset-shifted,
non-negative) f32 ranking value so ONE f32 min returns value and argmin
together (``_make_kernel_packed``, default ``pack_idx=True``): **28.6 ms
vs 34.5 two-pass** at the design point, 91% of the 26.1 ms floor. The
cost is a one-sided ≤2^-13-relative blur on the ranking value (~0.1% of
near-tie argmins move, all within the int8 quantization noise itself;
top-1-vs-f32 agreement is unchanged — see tests), and the REPORTED
distance carries the same masked bits (``pack_idx=False`` keeps the
bit-exact two-pass form).

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


def _make_kernel(tile_n: int, splits: int, int8: bool = False):
    h = tile_n // splits

    def kernel(a_ref, bt_ref, a2_ref, b2_ref, min_ref, idx_ref,
               state_min, state_idx):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        a = a_ref[:]

        # operands arrive pre-cast (bf16, f32, or int8) — casting BEFORE the
        # kernel halves/quarters the HBM gallery traffic. The `splits`
        # half-tiles form independent MXU→VPU chains the scheduler can
        # overlap. int8 dots accumulate exactly in int32 on the MXU (v5e int8
        # peak is 2× bf16); the quantization scales fold into b2 OUTSIDE the
        # kernel, and the per-row a2 term — which cannot change any argmin —
        # is DROPPED here and re-added outside: with the matmul half as long,
        # every elementwise op in the fused epilogue is exposed VPU time
        # (keeping a2 in: 41.0 ms, dropping it: 34.1 ms, measured r3; in the
        # bf16 kernel the same add is hidden under the 2× longer dot).
        if int8:
            abs_ = [jnp.dot(a, bt_ref[:, k * h:(k + 1) * h],
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32)
                    for k in range(splits)]
        else:
            abs_ = [jnp.dot(a, bt_ref[:, k * h:(k + 1) * h],
                            preferred_element_type=jnp.float32)
                    for k in range(splits)]

        local_min = local_arg = None
        for k, ab in enumerate(abs_):
            if int8:
                d = b2_ref[:, k * h:(k + 1) * h] - ab
            else:
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

    min_d, idx = _pallas_nn_call(a, bt, a2, b2, TILE_M, TILE_N, splits,
                                 int8=False, interpret=interpret)
    return jnp.maximum(min_d[:m, 0], 0.0), idx[:m, 0]


def _pallas_nn_call(a, bt, a2, b2, tile_m, tile_n, splits, int8, interpret,
                    packed=False):
    """Shared pallas_call plumbing for the f32/bf16 and int8 kernels.
    ``a`` is (MP, D) pre-padded, ``bt`` (D, NP), ``a2`` (MP, 1), ``b2``
    (1, NP) with +inf on padded gallery rows (``packed=True`` instead takes
    the offset-shifted b2 with a large-FINITE pad sentinel — inf bit
    patterns would turn into NaNs when the index is ORed in)."""
    if packed:
        assert int8 and tile_n <= 1024, "packed epilogue carries 10 index bits"
    mp, d = a.shape
    np_ = bt.shape[1]
    grid = (mp // tile_m, np_ // tile_n)
    return pl.pallas_call(
        _make_kernel_packed(tile_n, splits) if packed
        else _make_kernel(tile_n, splits, int8=int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a, bt, a2, b2)


def _make_kernel_packed(tile_n: int, splits: int):
    """int8 kernel with an index-PACKED single-pass epilogue.

    The plain int8 kernel's residual over the dot+min floor is the second
    reduction pass (iota/where index selection) — exposed VPU time once the
    int8 dot is half as long as bf16's. Here the ranking value is arranged
    non-negative (the caller folds ``OFFSET >= max qa·qb`` into the b2
    operand, Cauchy–Schwarz over the precomputed row norms), so its f32 bit
    pattern is order-isomorphic to its value; the kernel masks the low 10
    mantissa bits and ORs in the within-tile column index, and a SINGLE f32
    ``min`` then yields value and argmin together (f32 min measured faster
    than int32 min on this VPU — the r3 all-int32 ablation). Ties at equal
    masked value resolve to the lowest index for free. Cost: ranking is on
    the value quantized to 2^-13 of its own exponent — ~30× below the int8
    quantization noise itself on the distances (verified in tests).
    """
    h = tile_n // splits

    def kernel(a_ref, bt_ref, a2_ref, b2p_ref, min_ref, idx_ref,
               state_min, state_idx):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        a = a_ref[:]

        packed = None
        for k in range(splits):
            ab = jnp.dot(a, bt_ref[:, k * h:(k + 1) * h],
                         preferred_element_type=jnp.int32).astype(jnp.float32)
            d = b2p_ref[:, k * h:(k + 1) * h] - ab     # >= 0 by construction
            ki = jax.lax.bitcast_convert_type(d, jnp.int32)
            cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + k * h
            key = jax.lax.bitcast_convert_type((ki & -1024) | cols,
                                               jnp.float32)
            lm = jnp.min(key, axis=1, keepdims=True)   # one pass: value+index
            packed = lm if packed is None else jnp.minimum(packed, lm)

        # unpack on the (tile_m, 1) result — negligible next to the tile
        pbits = jax.lax.bitcast_convert_type(packed, jnp.int32)
        local_min = jax.lax.bitcast_convert_type(pbits & -1024, jnp.float32)
        local_arg = (pbits & 1023) + j * tile_n

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


def quantize_embeddings(x: jnp.ndarray):
    """Symmetric global int8 quantization for gallery/probe embeddings:
    ``q = round(x / s)`` with ``s = max|x| / 127`` (FAISS-SQ8-style; the
    reference ships its serving model 8-bit quantized the same spirit —
    ``age_gender_identity/README.md:7``). One global scale (not per-row) so
    the dequantized dot factors as ``sa·sb·(qa·qb)`` and the scales fold out
    of the kernel entirely. For L2-normalized embeddings entries are small
    and comparably distributed, so a global scale loses almost nothing.

    Returns ``(q int8, scale f32 scalar)``; jittable.
    """
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-30)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_m", "tile_n", "splits",
                                    "pack_idx"))
def nearest_neighbor_tpu_int8q(probes: jnp.ndarray, q_gallery: jnp.ndarray,
                               g_scale: jnp.ndarray,
                               interpret: bool = False,
                               tile_m: int = TILE_M, tile_n: int = TILE_N,
                               splits: int = _SPLITS,
                               valid_n=None, pack_idx: bool = True,
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 variant of ``nearest_neighbor_tpu`` against a PRE-quantized
    gallery (``quantize_embeddings`` at enrollment: 4× less gallery HBM than
    f32, 2× less than bf16 — and no per-query quantization pass). Probes are
    quantized here. The ranking math is EXACT squared-L2 between the
    dequantized vectors — the int32 MXU dot is exact, and the scales fold
    into the precomputed norm terms: with ``s = 2·sa·sb``,

        d(â, b̂) = s · (|â|²/s + |b̂|²/s − qa·qb)

    The kernel ranks on ``e = |b̂|²/s − qa·qb`` only (the per-row |â|² term
    cannot move an argmin and is re-added outside — with the int8 dot half
    as long as bf16's, every epilogue op is exposed VPU time; see
    ``_make_kernel``), and the true squared-L2 is recovered by one add and
    one scalar multiply on the (M,) result. v5e int8 MXU peak is 394 TFLOP/s
    (2× bf16). Only (tile_m=2048, tile_n=1024, splits=2) compiles on v5e
    Mosaic — splits∈{1,4} measured slower anyway (36.0/38.5 vs 34.1 ms) and
    wider/taller tiles are rejected (r3).

    ``valid_n`` (optional, traced): treat only the first ``valid_n`` gallery
    rows as real — rows beyond it get +inf distance. Used by the sharded
    path, whose zero-padded shard rows would otherwise be legitimate-looking
    dequantized vectors (int8 has no 1e4-magnitude always-loses pad row).

    ``pack_idx=True`` (default) uses the single-pass index-packed epilogue
    (28.6 vs 34.5 ms at the 8k×1M×512 design point, r4 measured — see
    ``_make_kernel_packed``): the argmin rides in the low 10 mantissa bits,
    so the reported distance is one-sidedly blurred by ≤2^-13 of
    (d + offset) and near-tie argmins within that blur may move (both far
    below the int8 quantization noise). ``pack_idx=False`` keeps the exact
    two-pass epilogue.
    """
    m, d = probes.shape
    n, _ = q_gallery.shape
    if tile_n % splits or (tile_n // splits) % 128:
        splits = 1
    mp = -(-m // tile_m) * tile_m
    np_ = -(-n // tile_n) * tile_n

    qa, sa = quantize_embeddings(probes)
    sb = g_scale
    qa = jnp.zeros((mp, d), jnp.int8).at[:m].set(qa)
    qb = jnp.zeros((np_, d), jnp.int8).at[:n].set(q_gallery)

    s = 2.0 * sa * sb
    qa_f = qa.astype(jnp.float32)
    qb_f = qb.astype(jnp.float32)
    # |â|²/s = sa²·Σqa² / (2·sa·sb) = Σqa² · sa/(2·sb); exact int sums
    a2raw = jnp.sum(qa_f * qa_f, axis=1, keepdims=True)
    b2raw = jnp.sum(qb_f * qb_f, axis=1)
    a2 = a2raw * (sa / (2.0 * sb))
    b2 = b2raw * (sb / (2.0 * sa))
    lim = n if valid_n is None else jnp.minimum(valid_n, n)

    if pack_idx:
        offset, b2p = _packed_b2(a2raw, b2raw, b2,
                                 jnp.arange(np_) < lim)
        min_e, idx = _pallas_nn_call(qa, qb.T, a2, b2p, tile_m, tile_n,
                                     splits, int8=True, interpret=interpret,
                                     packed=True)
        dmin = (min_e[:m, 0] - offset + a2[:m, 0]) * s
        return jnp.maximum(dmin, 0.0), idx[:m, 0]

    b2 = jnp.where(jnp.arange(np_) < lim, b2, jnp.inf)[None, :]
    # a2 rides along unused by the int8 kernel (same pallas_call plumbing);
    # its contribution is restored on the (M,) result below
    min_e, idx = _pallas_nn_call(qa, qb.T, a2, b2, tile_m, tile_n, splits,
                                 int8=True, interpret=interpret)
    dmin = (min_e[:m, 0] + a2[:m, 0]) * s
    return jnp.maximum(dmin, 0.0), idx[:m, 0]


def _packed_b2(a2raw, b2raw, b2_scaled, valid_mask):
    """Offset-shifted b2 operand for the packed-epilogue kernel.

    The kernel ranks on ``d = (b2 + OFFSET) − qa·qb`` and needs d ≥ 0 for
    the f32-bits/int ordering isomorphism. Cauchy–Schwarz over the already-
    computed raw row norms gives a tight dynamic bound:
    ``max qa·qb ≤ sqrt(max Σqa²)·sqrt(max Σqb²)``. Padded / invalid gallery
    rows get a large FINITE sentinel (inf would turn NaN once index bits are
    ORed into the mantissa): pad rows have qb = 0 so their d equals the
    sentinel exactly, and ``3·OFFSET + max b2 + 1`` exceeds every real
    ``d ≤ b2 + 2·OFFSET``. Returns ``(offset, b2p (1, NP))``."""
    offset = (jnp.sqrt(jnp.max(a2raw)) * jnp.sqrt(jnp.max(
        jnp.where(valid_mask, b2raw, 0.0))) * 1.01 + 1.0)
    sentinel = 3.0 * offset + jnp.max(jnp.where(valid_mask, b2_scaled, 0.0)) + 1.0
    b2p = jnp.where(valid_mask, b2_scaled + offset, sentinel)[None, :]
    return offset, b2p


def nearest_neighbor_tpu_int8(probes: jnp.ndarray, gallery: jnp.ndarray,
                              **kw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience form: quantize the f32 gallery here, then run
    ``nearest_neighbor_tpu_int8q``."""
    qb, sb = quantize_embeddings(gallery)
    return nearest_neighbor_tpu_int8q(probes, qb, sb, **kw)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def pack_quantized_gallery(q_gallery: jnp.ndarray, g_scale: jnp.ndarray,
                           tile_n: int = TILE_N):
    """One-time enrollment packing for repeated int8 queries:
    tile-pad + transpose the int8 gallery and precompute raw Σq² (with +inf
    on pad rows), so ``nearest_neighbor_tpu_int8p`` does ZERO gallery-side
    HBM passes per query (the unpacked path re-pads, re-transposes and
    re-reduces ~2 GB of traffic every call — ~3.5 ms at the 1M design
    point, measured r3). Returns ``(qt (D, NP) int8, b2i (1, NP) f32,
    scale)``."""
    n, d = q_gallery.shape
    np_ = -(-n // tile_n) * tile_n
    qb = jnp.zeros((np_, d), jnp.int8).at[:n].set(q_gallery)
    qb_f = qb.astype(jnp.float32)
    b2i = jnp.sum(qb_f * qb_f, axis=1)
    b2i = jnp.where(jnp.arange(np_) < n, b2i, jnp.inf)[None, :]
    return qb.T, b2i, g_scale


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile_m", "tile_n", "splits",
                                    "pack_idx"))
def nearest_neighbor_tpu_int8p(probes: jnp.ndarray, qt: jnp.ndarray,
                               b2i: jnp.ndarray, g_scale: jnp.ndarray,
                               interpret: bool = False,
                               tile_m: int = TILE_M, tile_n: int = TILE_N,
                               splits: int = _SPLITS, pack_idx: bool = True,
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``nearest_neighbor_tpu_int8q`` against a ``pack_quantized_gallery``
    result: per query only the probes are quantized/padded and the raw Σq²
    norms rescaled into the probe's scaled domain ((1, NP) — trivial).
    Same numerics, same ties."""
    m, d = probes.shape
    np_ = qt.shape[1]
    if np_ % tile_n:
        raise ValueError(f"gallery packed for a different tile_n: {np_} "
                         f"columns vs tile_n={tile_n}")
    if tile_n % splits or (tile_n // splits) % 128:
        splits = 1
    mp = -(-m // tile_m) * tile_m

    qa, sa = quantize_embeddings(probes)
    sb = g_scale
    qa = jnp.zeros((mp, d), jnp.int8).at[:m].set(qa)
    s = 2.0 * sa * sb
    qa_f = qa.astype(jnp.float32)
    a2raw = jnp.sum(qa_f * qa_f, axis=1, keepdims=True)
    a2 = a2raw * (sa / (2.0 * sb))
    b2 = b2i * (sb / (2.0 * sa))     # +inf pad rows stay +inf

    if pack_idx:
        valid = jnp.isfinite(b2i[0])   # pack_quantized_gallery marks pads +inf
        offset, b2p = _packed_b2(a2raw, jnp.where(valid, b2i[0], 0.0),
                                 jnp.where(valid, b2[0], 0.0), valid)
        min_e, idx = _pallas_nn_call(qa, qt, a2, b2p, tile_m, tile_n,
                                     splits, int8=True, interpret=interpret,
                                     packed=True)
        dmin = (min_e[:m, 0] - offset + a2[:m, 0]) * s
        return jnp.maximum(dmin, 0.0), idx[:m, 0]

    min_e, idx = _pallas_nn_call(qa, qt, a2, b2, tile_m, tile_n, splits,
                                 int8=True, interpret=interpret)
    dmin = (min_e[:m, 0] + a2[:m, 0]) * s
    return jnp.maximum(dmin, 0.0), idx[:m, 0]


@jax.jit
def nearest_neighbor_int8_xla(probes: jnp.ndarray, q_gallery: jnp.ndarray,
                              g_scale: jnp.ndarray, valid_n=None,
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The int8 kernel's EXACT math as a plain XLA program (int8 dot with
    int32 accumulation, same scaled-domain epilogue and lowest-index
    argmin) — the off-TPU twin of ``nearest_neighbor_tpu_int8q`` used on CPU
    backends and as the parity oracle in tests. Materializes the (M, N)
    matrix, so it keeps the XLA path's in-HBM constraint."""
    qa, sa = quantize_embeddings(probes)
    sb = g_scale
    s = 2.0 * sa * sb
    qa_f = qa.astype(jnp.float32)
    qb_f = q_gallery.astype(jnp.float32)
    a2 = jnp.sum(qa_f * qa_f, axis=1) * (sa / (2.0 * sb))
    b2 = jnp.sum(qb_f * qb_f, axis=1) * (sb / (2.0 * sa))
    if valid_n is not None:
        b2 = jnp.where(jnp.arange(b2.shape[0]) < valid_n, b2, jnp.inf)
    ab = jax.lax.dot_general(qa, q_gallery.T, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32
                             ).astype(jnp.float32)
    e = b2[None, :] - ab            # same ranking expression as the kernel
    idx = jnp.argmin(e, axis=1)
    emin = jnp.take_along_axis(e, idx[:, None], axis=1)[:, 0]
    return jnp.maximum((emin + a2) * s, 0.0), idx


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


def nearest_neighbor_auto(probes, gallery, force_pallas: bool = False,
                          int8: bool = False, valid_n=None):
    """XLA matmul+argmin by default (fastest while the (M, N) matrix fits in
    HBM); the matrix-free Pallas kernel on TPU when forced or when the matrix
    would be prohibitively large. ``int8=True`` quantizes both operands
    (``quantize_embeddings``) and runs the int8 MXU kernel on TPU (2× the
    bf16 peak) or its exact XLA twin elsewhere; ``gallery`` may then be
    either f32 or a pre-quantized ``(q_int8, scale)`` pair."""
    if int8:
        if isinstance(gallery, tuple):
            qb, sb = gallery
        else:
            qb, sb = quantize_embeddings(gallery)
        m, n = probes.shape[0], qb.shape[0]
        if use_pallas_path(m, n, jax.default_backend(), force_pallas):
            return nearest_neighbor_tpu_int8q(probes, qb, sb, valid_n=valid_n)
        return nearest_neighbor_int8_xla(probes, qb, sb, valid_n=valid_n)
    if valid_n is not None:
        raise ValueError("valid_n is only supported with int8=True; the f32 "
                         "paths mask padding via always-losing pad rows")
    m, n = probes.shape[0], gallery.shape[0]
    if use_pallas_path(m, n, jax.default_backend(), force_pallas):
        return nearest_neighbor_tpu(probes, gallery)
    from ..distance import pairwise_sqeuclidean

    d = pairwise_sqeuclidean(probes, gallery, precision=jax.lax.Precision.DEFAULT)
    idx = jnp.argmin(d, axis=1)
    return jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0], idx
