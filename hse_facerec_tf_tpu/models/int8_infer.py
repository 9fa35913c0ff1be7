"""Full-int8 MobileNet serving path riding the v5e int8 MXU.

The reference serves its flagship multi-head model 8-bit quantized
(``age_gender_identity/age_gender_tf2_new-01-0.14-0.92_quantized.pb`` —
weight-only MIN_FIRST quantization, dequantized to f32 at load; reference
``age_gender_identity/README.md:7``). This module extends that serving idea
the TPU-native way — like the int8 1-NN gallery (``ops/pallas/knn.py``) — to
the whole backbone: INT8 ACTIVATIONS, not just weights, so the pointwise
convolutions (≈95% of MobileNet-V1 FLOPs) run as int8×int8→int32 matmuls on
the int8 MXU (2× the bf16 peak) and every inter-layer activation tensor costs
half the HBM traffic of bf16. The paths it accelerates are HBM-bound
(BENCH ``extra.roofline``), so the traffic halving is the headline lever.

Quantization scheme (post-training, no calibration needed):
- Every MobileNet-V1 block activation is post-ReLU6, hence exactly bounded to
  [0, 6]: activations quantize symmetrically with the FIXED scale 6/127
  (zero-point 0, values in [0, 127]). No calibration set, no per-layer
  statistics — the bound is architectural.
- Weights quantize per-output-channel symmetric int8 (scale = max|w|/127),
  after folding BN/affine params into the kernel (inference form).
- Pointwise conv: (N·H·W, Cin) int8 · (Cin, Cout) int8 → int32 exact dot
  (max |acc| ≤ 1024·127² < 2³¹), then a fused f32 epilogue:
  ``y = acc · (s_act · s_w[c]) + bias``, ReLU6, requantize.
- Depthwise conv + conv1 (<5% of FLOPs, VPU work): bf16 compute with f32
  accumulation; the activation scale folds into the (tiny) kernel so the
  int8 input feeds the conv directly after a fused convert.
- The final block output stays f32 (no requant) so the GAP identity tap
  (``global_pooling/Mean``) and the heads keep full precision.

Fidelity is pinned in ``tests/test_int8_infer.py`` against the f32 path on
the SHIPPED reference weights (embedding cosine, age/gender decisions) and
bit-exactly against an independent numpy integer-math golden.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .layers import relu6
from .mobilenet import MOBILENET_V1_BLOCKS
from .multihead import MultiHeadOutput
from ..ops.pallas.pw_conv import pack_pw_weights, pw_conv_int8_pallas

# Fixed activation quantization: post-ReLU6 tensors live in [0, 6].
ACT_SCALE = 6.0 / 127.0


def _fold_inference_affine(p: Dict, depthwise: bool) -> Dict:
    """Collapse any param form ({kernel,bn} / {kernel,scale,bias} /
    {kernel,bias}) to inference ``{kernel, bias}`` with the channel affine
    folded into the kernel (same algebra as the frozen-graph importers,
    ``core/h5_import.py``)."""
    kernel = np.asarray(p["kernel"], dtype=np.float32)
    if "bn" in p:
        bn = p["bn"]
        inv = np.asarray(bn["gamma"], np.float32) / np.sqrt(
            np.asarray(bn["var"], np.float32) + 1e-3)
        bias = np.asarray(bn["beta"], np.float32) - np.asarray(
            bn["mean"], np.float32) * inv
    else:
        inv = np.asarray(p.get("scale", 1.0), np.float32)
        bias = np.asarray(p.get("bias", 0.0), np.float32)
        if np.ndim(inv) == 0 and float(np.max(inv)) == 1.0:
            inv = None
    if inv is not None:
        if np.ndim(inv) == 0:
            kernel = kernel * float(inv)
        elif depthwise:
            # (H, W, C, 1): affine is per input channel C
            kernel = kernel * inv.reshape(1, 1, -1, 1)
        else:
            # (H, W, I, O): affine is per output channel O
            kernel = kernel * inv.reshape(1, 1, 1, -1)
    return {"kernel": kernel, "bias": np.broadcast_to(
        np.asarray(bias, np.float32), (kernel.shape[2] if depthwise else
                                       kernel.shape[3],)).copy()}


def quantize_backbone_int8(params: Dict, bf16_blocks_below: int = 0) -> Dict:
    """MobileNet-V1 param pytree (any form) → int8 serving params.

    Host-side numpy (importers must return host arrays — see
    ``import_multihead_params``); per block:
    - ``pw{i}``: {"q": (Cin, Cout) int8, "scale": (Cout,) f32 = s_w·s_act,
      "bias": (Cout,) f32}
    - ``dw{i}``: {"kernel": (3,3,C,1) f32 with s_act pre-folded, "bias"}
    - ``conv1``: f32 kernel/bias (first layer; input is not ReLU6-bounded).

    ``bf16_blocks_below``: hybrid-dtype serving dial — blocks with index
    < the cut keep folded f32 kernels and run the bf16 conv path (XLA's
    int8 conv emitter sustains only 270-540 GB/s on the early
    big-activation blocks where bf16's reaches 460-680, r3 fusion
    profile); blocks at/after the cut quantize as above and ride the int8
    MXU. Activations stay bf16 before the cut and int8 after (one requant
    at the boundary).

    Measured r4 (v5e-1, batch 256×224², chain-10 full multihead): the
    emitter inefficiency never beats the 2× traffic saving — ALL-int8 is
    fastest and every bf16 prefix loses monotonically:
    cut=0: 46.1k img/s, cut=1: 41.9k, cut=2: 43.1k, cut=3: 41.3k,
    cut=4: 40.0k, cut=6: 39.3k, cut=8: 39.6k. The int8 emitter cap is
    emitter-wide, not early-block-local; serve all-int8 (the dial stays
    for future backends)."""
    out: Dict = {}
    c1 = _fold_inference_affine(params["conv1"], depthwise=False)
    out["conv1"] = c1
    for i, _ in enumerate(MOBILENET_V1_BLOCKS, start=1):
        dw = _fold_inference_affine(params[f"dw{i}"], depthwise=True)
        pw = _fold_inference_affine(params[f"pw{i}"], depthwise=False)
        if i <= bf16_blocks_below:
            out[f"dw{i}"] = dw          # bf16 path: no ACT_SCALE folding
            out[f"pw{i}"] = pw
            continue
        # int8 input decodes as q·s_act: fold s_act into the depthwise kernel
        out[f"dw{i}"] = {"kernel": dw["kernel"] * ACT_SCALE,
                         "bias": dw["bias"]}
        k = pw["kernel"][0, 0]                      # (Cin, Cout)
        s_w = np.maximum(np.abs(k).max(axis=0), 1e-12) / 127.0
        q = np.clip(np.round(k / s_w[None, :]), -127, 127).astype(np.int8)
        scale = (s_w * ACT_SCALE).astype(np.float32)
        # also pack for the Pallas matmul form (ops/pallas/pw_conv.py) —
        # one-time host-side; the pack factor p is recovered from the
        # shapes at apply time (ints in the pytree would get traced).
        # None (lane-unalignable sub-width layer) → XLA conv fallback.
        out[f"pw{i}"] = {"q": q, "scale": scale, "bias": pw["bias"]}
        packed = pack_pw_weights(q, scale, pw["bias"])
        if packed is not None:
            wp, sp, bp, _ = packed
            out[f"pw{i}"].update(wp=wp, scale_p=sp, bias_p=bp)
    return out


def _requant(y):
    """f32 post-ReLU6 activation → int8 in [0, 127] at the fixed scale."""
    return jnp.round(y * (1.0 / ACT_SCALE)).astype(jnp.int8)


def _dw_conv_int8(a_int8, kernel, bias, stride: int):
    """Depthwise conv on an int8 activation: bf16 taps, f32 accumulation.

    The activation scale is pre-folded into ``kernel`` so the int8 input
    converts straight to bf16 counts (≤127, exactly representable).

    The convert WIDENS THROUGH int32 first: a single int8→float convert
    fused as a conv operand miscompiles to all-zeros on the v5e backend
    (verified r3: ``int8→bf16 conv`` and ``int8→f32 conv`` both return 0;
    ``int8→int32→bf16 conv`` is exact)."""
    h, w, c, m = kernel.shape
    k = jnp.reshape(kernel.astype(jnp.bfloat16), (h, w, 1, c * m))
    y = jax.lax.conv_general_dilated(
        a_int8.astype(jnp.int32).astype(jnp.bfloat16), k,
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    )
    return relu6(y + bias)


def _pw_conv_int8(a_int8, q_kernel, scale, bias):
    """Pointwise conv as an exact int8×int8→int32 conv + f32 epilogue.

    Kept in CONV form, not a reshaped (N·H·W, Cin) dot: XLA's conv emitter
    tiles the int8 operands natively, while the reshaped giant-M dot gets
    split into a dynamic-slice loop writing chunks at ~36 GB/s (measured
    r3: the dot form ran the whole backbone 5.7× slower than bf16, 48% of
    device time in dynamic-update-slice fusions)."""
    acc = jax.lax.conv_general_dilated(
        a_int8, q_kernel[None, None, :, :],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale + bias
    return relu6(y)


def _dw_conv_bf16(a, kernel, bias, stride: int):
    """Depthwise conv on a bf16/f32 activation (hybrid prefix blocks)."""
    h, w, c, m = kernel.shape
    k = jnp.reshape(kernel.astype(jnp.bfloat16), (h, w, 1, c * m))
    y = jax.lax.conv_general_dilated(
        a.astype(jnp.bfloat16), k,
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32)
    return relu6(y + bias)


def _pw_conv_bf16(a, kernel, bias):
    """Pointwise conv on a bf16/f32 activation (hybrid prefix blocks)."""
    y = jax.lax.conv_general_dilated(
        a.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return relu6(y + bias)


def _use_pallas_pw(pallas_pw) -> bool:
    """None → False: the Pallas matmul form is a MEASURED LOSER on v5e
    (ops/pallas/pw_conv.py — ties XLA per layer, 5× slower integrated via
    reshape relayouts; the int8 cap is the platform's int8 dataflow, not
    the conv emitter). Kept opt-in for future backends/experiments."""
    return bool(pallas_pw)


def mobilenet_backbone_int8(qparams: Dict, x, pallas_pw=None) -> jnp.ndarray:
    """(N, H, W, 3) f32 preprocessed → (N, H/32, W/32, 1024) f32 features.

    conv1 runs bf16 (input is mean-subtracted, unbounded); block
    activations flow bf16 through any hybrid prefix (params quantized with
    ``bf16_blocks_below`` > 0, detected per block by the presence of a
    float kernel) and int8 after it; the final block output skips
    requantization so the GAP tap stays full-precision.

    ``pallas_pw`` (default off): run the pointwise convs as Pallas int8 MXU
    matmuls with the requant fused into the kernel epilogue
    (``ops/pallas/pw_conv.py``). MEASURED LOSER on v5e — ties XLA per
    layer, 5× slower integrated (reshape relayouts); see the kernel's
    docstring for the full ablation. Opt-in only."""
    use_pallas = _use_pallas_pw(pallas_pw)
    c1 = qparams["conv1"]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), c1["kernel"].astype(jnp.bfloat16),
        window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = relu6(y + c1["bias"])
    a = None            # int8 activation once past the hybrid prefix
    last = len(MOBILENET_V1_BLOCKS)
    for i, (stride, _) in enumerate(MOBILENET_V1_BLOCKS, start=1):
        dw, pw = qparams[f"dw{i}"], qparams[f"pw{i}"]
        if "q" not in pw:                       # bf16 prefix block
            y = _dw_conv_bf16(y, dw["kernel"], dw["bias"], stride)
            y = _pw_conv_bf16(y, pw["kernel"], pw["bias"])
            continue
        if a is None:                           # bf16 -> int8 boundary
            a = _requant(y)
        y = _dw_conv_int8(a, dw["kernel"], dw["bias"], stride)
        a = _requant(y)
        p = (pw["wp"].shape[0] // pw["q"].shape[0]) if "wp" in pw else 0
        if (use_pallas and p
                and (a.shape[0] * a.shape[1] * a.shape[2]) % p == 0):
            if i < last:                        # requant fused in-kernel
                a = pw_conv_int8_pallas(a, pw["wp"], pw["scale_p"],
                                        pw["bias_p"], p, requant=True)
            else:                               # f32 tap for the GAP head
                y = pw_conv_int8_pallas(a, pw["wp"], pw["scale_p"],
                                        pw["bias_p"], p, requant=False)
            continue
        y = _pw_conv_int8(a, pw["q"], pw["scale"], pw["bias"])
        a = _requant(y) if i < last else None
    return y


def quantize_multihead_int8(params: Dict, bf16_blocks_below: int = 0) -> Dict:
    """Multi-head param pytree → int8 serving pytree (heads stay f32)."""
    return {
        "backbone": quantize_backbone_int8(params["backbone"],
                                           bf16_blocks_below),
        "feats": jax.tree.map(np.asarray, params["feats"]),
        "age": jax.tree.map(np.asarray, params["age"]),
        "gender": jax.tree.map(np.asarray, params["gender"]),
    }


def multihead_apply_int8(qparams: Dict, x, pallas_pw=None) -> MultiHeadOutput:
    """int8 forward with the same output contract as ``multihead_apply``.

    x: (N, H, W, 3) preprocessed f32 (BGR, VGGFace2 mean-subtracted)."""
    from .layers import dense, global_avg_pool

    h = mobilenet_backbone_int8(qparams["backbone"], x, pallas_pw=pallas_pw)
    identity = global_avg_pool(h).astype(jnp.float32)
    f = jax.nn.relu(dense(identity, qparams["feats"]["kernel"],
                          qparams["feats"]["bias"]))
    age_logits = dense(f, qparams["age"]["kernel"], qparams["age"]["bias"])
    gender_logit = dense(f, qparams["gender"]["kernel"],
                         qparams["gender"]["bias"])
    return MultiHeadOutput(
        age_probs=jax.nn.softmax(age_logits, axis=-1),
        gender_prob=jax.nn.sigmoid(gender_logit)[:, 0],
        identity=identity,
        feats=f,
    )


def mobilenet_embed_int8(qparams: Dict, x, pallas_pw=None) -> jnp.ndarray:
    """Face embedding on the int8 backbone: GAP → (N, 1024) f32."""
    from .layers import global_avg_pool

    return global_avg_pool(mobilenet_backbone_int8(
        qparams, x, pallas_pw=pallas_pw)).astype(jnp.float32)
