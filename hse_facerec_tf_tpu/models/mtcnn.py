"""Native JAX MTCNN: P-Net / R-Net / O-Net.

TPU-first reimplementation of the three-stage cascade whose frozen weights the
reference ships in ``age_gender_identity/mtcnn.pb`` (tensor taps in reference
``facial_analysis.py:336-351``; architecture verified from the GraphDef —
SURVEY.md §2.2). All three nets are pure functions over explicit param pytrees
imported from the pb, fully batched, jit/vmap/pjit-compatible.

Network shapes (from the shipped weights):
  P-Net: conv 3x3x10 VALID → PReLU → maxpool 2/2 SAME → conv 3x3x16 VALID →
         PReLU → conv 3x3x32 VALID → PReLU → heads: cls conv1x1x2 (softmax),
         reg conv1x1x4. Fully convolutional, any input size.
  R-Net: input 24²; convs 28/48/64, pools (3,2,SAME)/(3,2,VALID), FC 128 →
         PReLU → heads cls 2 / reg 4.
  O-Net: input 48²; convs 32/64/64/128, pools (3,2,SAME)/(3,2,VALID)/(2,2,SAME),
         FC 256 → PReLU → heads cls 2 / reg 4 / landmarks 10.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graphdef import load_graphdef, extract_constants
from .layers import conv2d, dense, prelu, max_pool

Params = Dict[str, Dict[str, jnp.ndarray]]


def _conv_block(x, p, *, padding="VALID", stride=1, precision):
    x = conv2d(x, p["kernel"], stride=stride, padding=padding, precision=precision)
    return x + p["bias"]


def _im2col_conv_valid(x, p, *, precision):
    """3x3 VALID conv as 9 shifted slices stacked on channels + one dot.

    Raises MXU input-lane occupancy for P-Net's tiny channel counts
    (3→27, 10→90, 16→144 of 128 lanes vs ≤16 in conv form). Measured r4 on
    the 640×480 pyramid at HIGH precision, batch 8: wins 20% on the
    largest level (1.69 → 1.36 ms at 144×192) but LOSES below ~20k px/level
    (103×137: 1.01 → 1.04; 73×97: 0.71 → 0.80) — the slice concat costs a
    fixed extra pass that small levels can't amortize. The detector picks
    per level by area (PNET_IM2COL_MIN_PIXELS). Numerics: same dot order,
    ≤2e-5 of the conv form at HIGH."""
    kernel, bias = p["kernel"], p["bias"]
    n, h, w, c = x.shape
    kh, kw, ci, co = kernel.shape
    cols = [x[:, dy:h - (kh - 1) + dy, dx:w - (kw - 1) + dx, :]
            for dy in range(kh) for dx in range(kw)]
    xc = jnp.concatenate(cols, axis=-1)          # (N, h-2, w-2, kh·kw·C)
    k = jnp.reshape(kernel, (kh * kw * ci, co))
    y = jax.lax.dot_general(xc, k, (((3,), (0,)), ((), ())),
                            precision=precision)
    return y + bias


# level area (pixels) above which pnet(..., im2col=True) wins — r4 measured
PNET_IM2COL_MIN_PIXELS = 20000
# VMAPPED (batch) cascade threshold: the batch amortizes the slice-concat
# pass, and the integrated batch-8 profile shows the conv-form 137x103
# level's first conv stuck in a 21 GB/s layout-copy fusion
# (convolution_add_fusion.22, 5.6% of device busy). r5 measured at 640x480
# batch 8: lowering the cutoff to cover that level (14.1k px) lifts
# batch-8 detect 1,575 -> 1,597 img/s and removes the fusion from the
# profile, while the SINGLE-image program regresses 1.226 -> 1.283 ms with
# the same cutoff — so only detect_batch_fn builds with this value.
PNET_IM2COL_MIN_PIXELS_BATCHED = 12000


def pnet(params: Params, x, *, precision=jax.lax.Precision.HIGHEST,
         im2col: bool = False):
    """P-Net forward. x: (N, H, W, 3) normalized (x-127.5)/128, transposed
    convention (see pipelines/detector.py). Returns (reg (N,h,w,4), prob (N,h,w,2)).

    ``im2col``: run the three 3x3 VALID convs as shifted-slice im2col dots
    (see _im2col_conv_valid) — faster for large inputs, slower for small."""
    conv = ((lambda v, p: _im2col_conv_valid(v, p, precision=precision))
            if im2col else
            (lambda v, p: _conv_block(v, p, precision=precision)))
    x = conv(x, params["conv1"])
    x = prelu(x, params["prelu1"]["alpha"])
    x = max_pool(x, 2, 2, "SAME")
    x = conv(x, params["conv2"])
    x = prelu(x, params["prelu2"]["alpha"])
    x = conv(x, params["conv3"])
    x = prelu(x, params["prelu3"]["alpha"])
    cls = _conv_block(x, params["cls"], padding="SAME", precision=precision)
    reg = _conv_block(x, params["reg"], padding="SAME", precision=precision)
    return reg, jax.nn.softmax(cls, axis=-1)


def rnet(params: Params, x, *, precision=jax.lax.Precision.HIGHEST,
         im2col: bool = False):
    """R-Net forward. x: (N, 24, 24, 3). Returns (reg (N,4), prob (N,2)).

    ``im2col``: run the VALID convs as shifted-slice dots (the P-Net trick).
    UNMEASURED for R-Net: no benchmark exists (only the P-Net stage-1 form
    has a recorded win, BENCH r4); kept as an option pinned exact by
    tests/test_models.py, not as a verified speedup."""
    conv = ((lambda v, p: _im2col_conv_valid(v, p, precision=precision))
            if im2col else
            (lambda v, p: _conv_block(v, p, precision=precision)))
    x = conv(x, params["conv1"])
    x = prelu(x, params["prelu1"]["alpha"])
    x = max_pool(x, 3, 2, "SAME")
    x = conv(x, params["conv2"])
    x = prelu(x, params["prelu2"]["alpha"])
    x = max_pool(x, 3, 2, "VALID")
    x = conv(x, params["conv3"])
    x = prelu(x, params["prelu3"]["alpha"])
    x = jnp.reshape(x, (x.shape[0], -1))
    x = dense(x, params["fc"]["kernel"], params["fc"]["bias"], precision=precision)
    x = prelu(x, params["prelu4"]["alpha"])
    cls = dense(x, params["cls"]["kernel"], params["cls"]["bias"], precision=precision)
    reg = dense(x, params["reg"]["kernel"], params["reg"]["bias"], precision=precision)
    return reg, jax.nn.softmax(cls, axis=-1)


def onet(params: Params, x, *, precision=jax.lax.Precision.HIGHEST,
         im2col: bool = False):
    """O-Net forward. x: (N, 48, 48, 3). Returns (reg (N,4), landmarks (N,10), prob (N,2)).

    ``im2col``: shifted-slice dot form for the VALID convs (see rnet —
    same caveat: unmeasured for O-Net, parity-pinned only)."""
    conv = ((lambda v, p: _im2col_conv_valid(v, p, precision=precision))
            if im2col else
            (lambda v, p: _conv_block(v, p, precision=precision)))
    x = conv(x, params["conv1"])
    x = prelu(x, params["prelu1"]["alpha"])
    x = max_pool(x, 3, 2, "SAME")
    x = conv(x, params["conv2"])
    x = prelu(x, params["prelu2"]["alpha"])
    x = max_pool(x, 3, 2, "VALID")
    x = conv(x, params["conv3"])
    x = prelu(x, params["prelu3"]["alpha"])
    x = max_pool(x, 2, 2, "SAME")
    x = conv(x, params["conv4"])
    x = prelu(x, params["prelu4"]["alpha"])
    x = jnp.reshape(x, (x.shape[0], -1))
    x = dense(x, params["fc"]["kernel"], params["fc"]["bias"], precision=precision)
    x = prelu(x, params["prelu5"]["alpha"])
    cls = dense(x, params["cls"]["kernel"], params["cls"]["bias"], precision=precision)
    reg = dense(x, params["reg"]["kernel"], params["reg"]["bias"], precision=precision)
    lmk = dense(x, params["lmk"]["kernel"], params["lmk"]["bias"], precision=precision)
    return reg, lmk, jax.nn.softmax(cls, axis=-1)


def import_mtcnn_params(pb_path: str) -> Dict[str, Params]:
    """Load {pnet, rnet, onet} param pytrees from the frozen mtcnn.pb.

    Returns HOST (numpy) arrays deliberately: the detector closes over these
    as trace-time constants, and lowering a program whose captured constants
    are device arrays re-FETCHES each one from the device (``ir_constant`` →
    ``Array._value``) — over the ~7 MB/s tunnel that made every
    analyze-batch process pay seconds of per-constant round trips and
    intermittently hang for minutes (r3, caught via faulthandler). Host
    constants embed directly into the lowered module."""
    consts = extract_constants(load_graphdef(pb_path))

    def cb(prefix, name):  # conv/fc block
        return {
            "kernel": np.asarray(consts[f"{prefix}/{name}/weights"]),
            "bias": np.asarray(consts[f"{prefix}/{name}/biases"]),
        }

    def al(prefix, name):  # prelu alpha
        return {"alpha": np.asarray(consts[f"{prefix}/{name}/alpha"])}

    p = {
        "conv1": cb("pnet", "conv1"), "prelu1": al("pnet", "PReLU1"),
        "conv2": cb("pnet", "conv2"), "prelu2": al("pnet", "PReLU2"),
        "conv3": cb("pnet", "conv3"), "prelu3": al("pnet", "PReLU3"),
        "cls": cb("pnet", "conv4-1"), "reg": cb("pnet", "conv4-2"),
    }
    r = {
        "conv1": cb("rnet", "conv1"), "prelu1": al("rnet", "prelu1"),
        "conv2": cb("rnet", "conv2"), "prelu2": al("rnet", "prelu2"),
        "conv3": cb("rnet", "conv3"), "prelu3": al("rnet", "prelu3"),
        "fc": cb("rnet", "conv4"), "prelu4": al("rnet", "prelu4"),
        "cls": cb("rnet", "conv5-1"), "reg": cb("rnet", "conv5-2"),
    }
    o = {
        "conv1": cb("onet", "conv1"), "prelu1": al("onet", "prelu1"),
        "conv2": cb("onet", "conv2"), "prelu2": al("onet", "prelu2"),
        "conv3": cb("onet", "conv3"), "prelu3": al("onet", "prelu3"),
        "conv4": cb("onet", "conv4"), "prelu4": al("onet", "prelu4"),
        "fc": cb("onet", "conv5"), "prelu5": al("onet", "prelu5"),
        "cls": cb("onet", "conv6-1"), "reg": cb("onet", "conv6-2"),
        "lmk": cb("onet", "conv6-3"),
    }
    return {"pnet": p, "rnet": r, "onet": o}
