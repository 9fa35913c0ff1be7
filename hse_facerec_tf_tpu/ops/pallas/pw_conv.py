"""Pallas int8 pointwise-conv kernel: the MobileNet serving matmul done as
an explicitly tiled int8 MXU dot with a fused requant epilogue.

Why this exists: the full-int8 serving path (``models/int8_infer.py``, the
TPU-native extension of the reference's 8-bit quantized serving model,
``age_gender_identity/README.md:7``) is HBM-bound, but XLA's int8
*convolution* emitter sustains only 270-540 GB/s on the big-activation
pointwise convs where its bf16 emitter reaches 460-680 (r3 fusion profiles —
the int8 path sat at 50% of HBM peak while bf16 reached 70%). A 1x1 conv is
exactly a matmul, and Mosaic int8 matmuls are proven strong here (the 1-NN
kernel, ``ops/pallas/knn.py``, runs at 91% of its floor) — so this kernel
reformulates each pointwise conv as a tiled (M, K)x(K, N) int8 dot and fuses
the whole f32 epilogue (per-channel scale, bias, ReLU6, requantize-to-int8)
into the same VMEM pass.

Small-channel packing: early blocks have C in {32, 64} — as a matmul operand
that is a (M, 32) int8 tile, wasting 96 of 128 lanes AND forcing a sub-128
minor dimension. Because NHWC is channel-minor and contiguous, the SAME bytes
reinterpret as (M/p, p*C) with p = 128/C — p consecutive pixels per row, a
free reshape on both the input and the output. The weight lifts to a
block-diagonal (p*C, p*Cout) int8 matrix (zeros off the diagonal blocks;
p times the MXU FLOPs, which are ~60x below the int8 MXU roof on these
HBM-bound layers — lane occupancy and alignment are what matter). Scale and
bias tile p times along the output. This is the same
"formulate-for-the-MXU" move as the resize hat-matrices (``ops/resize.py``)
and the warp selection matmul (``ops/pallas/warp.py``).

**Measured r4 verdict: the kernel is a LOSER — default OFF** (v5e-1,
batch 256, chained wall clock; kept as the pinned, tested negative result):
  - Standalone on pre-packed 2-D operands it only TIES the XLA conv form:
    pw1 (112^2x32→64) 0.86 ms vs XLA 0.85; pw3 (56^2x128→128) 0.73 vs
    0.93 — best case ~360 GB/s of ideal traffic, same plateau as XLA
    (tile_m swept 1024→8192, ``dimension_semantics=parallel`` tried: all
    within ±10%).
  - Integrated in the backbone it is 5x SLOWER end-to-end (11.0k vs 54.6k
    img/s): the NHWC→(M/p, 128) reshape is NOT free on device — XLA int8
    physical layouts are tiled, so each boundary inserts a relayout copy
    that costs a full extra pass at int8 stream rates.
  - The underlying cap is the PLATFORM's int8 dataflow, not the conv
    emitter: a pure elementwise read+write loop sustains 859 GB/s in f32
    but only ~400 GB/s on (M,128)/NHWC-c32 int8 and 704 GB/s on NHWC-c128
    int8 (measured probe). The 270-540 GB/s int8 conv fusions are already
    near that envelope; no pointwise-matmul reformulation can beat it.
  Beating 55.6k img/s int8 serving would need the dw conv fused into the
  same VMEM-resident kernel chain (no NHWC boundary at all) — the r3
  Pallas dw+pw fusion attempt lost 1.6x to XLA in bf16, so that path needs
  new Mosaic evidence before retrying.

Numerics: exact vs the XLA conv form up to ~1-in-500k single-quantum
requant flips at fma round boundaries (int32 accumulation is exact in both;
the f32 epilogue is the same expression) — pinned in
``tests/test_pw_conv.py`` against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Requant scale: block activations are post-ReLU6, fixed scale 6/127
# (models/int8_infer.py ACT_SCALE). Kept local to avoid a circular import.
_INV_ACT_SCALE = 127.0 / 6.0


def _pick_tile_m(k_packed: int) -> int:
    """A-tile rows sized so the f32 accumulator tile stays ~<=1 MB VMEM
    (budget ~16 MB with double-buffered A/out blocks)."""
    if k_packed <= 256:
        return 1024
    if k_packed <= 512:
        return 512
    return 256


def _make_kernel(requant: bool):
    def kernel(a_ref, w_ref, sc_ref, bi_ref, out_ref):
        acc = jnp.dot(a_ref[:], w_ref[:], preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sc_ref[:] + bi_ref[:]
        y = jnp.clip(y, 0.0, 6.0)                     # ReLU6
        if requant:
            out_ref[:] = jnp.round(y * _INV_ACT_SCALE).astype(jnp.int8)
        else:
            out_ref[:] = y
    return kernel


@functools.partial(jax.jit, static_argnames=("requant", "interpret"))
def _pw_matmul_int8(a2, w_packed, scale_p, bias_p, requant: bool,
                    interpret: bool):
    """(M2, KP) int8 x (KP, NP) int8 -> (M2, NP) int8/f32 with the fused
    scale/bias/ReLU6/requant epilogue. Pads M2 up to the tile size."""
    m2, kp = a2.shape
    np_out = w_packed.shape[1]
    tile_m = _pick_tile_m(kp)
    mp = -(-m2 // tile_m) * tile_m
    if mp != m2:
        a2 = jnp.zeros((mp, kp), jnp.int8).at[:m2].set(a2)

    out_dtype = jnp.int8 if requant else jnp.float32
    out = pl.pallas_call(
        _make_kernel(requant),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, np_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, np_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_out), out_dtype),
        interpret=interpret,
    )(a2, w_packed, scale_p, bias_p)
    return out[:m2]


def pack_pw_weights(q_kernel: np.ndarray, scale: np.ndarray,
                    bias: np.ndarray):
    """Host-side one-time packing of a pointwise layer for the kernel.

    q_kernel (C, Cout) int8, scale/bias (Cout,) f32  ->
    (w_packed (p*C, p*Cout) int8 block-diagonal, scale_p (1, p*Cout),
    bias_p (1, p*Cout), p) with p = 128//C for C < 128 else 1.

    Returns ``None`` when the layer cannot form lane-aligned int8 tiles
    (C or p*Cout not reaching a multiple of 128 — sub-width MobileNets);
    callers fall back to the XLA conv form for that layer.
    """
    c, cout = q_kernel.shape
    p = max(1, 128 // c) if c < 128 else 1
    if (c * p) % 128 or (p * cout) % 128:
        return None
    w = np.zeros((p * c, p * cout), dtype=np.int8)
    for b in range(p):
        w[b * c:(b + 1) * c, b * cout:(b + 1) * cout] = q_kernel
    scale_p = np.tile(np.asarray(scale, np.float32), p)[None, :]
    bias_p = np.tile(np.asarray(bias, np.float32), p)[None, :]
    return w, scale_p, bias_p, p


def pw_conv_int8_pallas(a_int8, w_packed, scale_p, bias_p, p: int,
                        requant: bool = True, interpret: bool = None):
    """Pointwise conv on an int8 NHWC activation via the packed int8 matmul.

    ``a_int8`` (N, H, W, C) int8; ``w_packed``/``scale_p``/``bias_p``/``p``
    from ``pack_pw_weights``. Returns (N, H, W, Cout) int8 (``requant=True``,
    mid-network blocks) or f32 (final block — the GAP tap stays full
    precision, ``models/int8_infer.py``). The (N*H*W, C) -> (N*H*W/p, p*C)
    packing is a pure reshape of channel-minor contiguous bytes; H*W is
    always a multiple of p for the 224^2 MobileNet pyramid (112^2, 56^2, ...).
    """
    if interpret is None:     # Mosaic needs a real TPU; interpret elsewhere
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, h, w, c = a_int8.shape
    kp, np_out = w_packed.shape
    cout = np_out // p
    m = n * h * w
    assert m % p == 0, f"M={m} not divisible by pack factor p={p}"
    a2 = a_int8.reshape(m // p, p * c)
    out = _pw_matmul_int8(a2, w_packed, scale_p, bias_p, requant=requant,
                          interpret=interpret)
    return out.reshape(n, h, w, cout)
