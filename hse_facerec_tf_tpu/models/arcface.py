"""ArcFace IResNet backbones (r34/r50/r100) + InsightFace gender-age decode.

Completes the reference's two MXNet InsightFace adapters as native TPU models:

- ``insightface_face_embedding.py:20-63``: 112×112 ArcFace embedder
  (``model-r100-ii``), tapping ``fc1_output``, flip-TTA sum, L2-normalized
  output. Here the backbone is the IResNet ("improved residual", BN-first
  units with PReLU) family those checkpoints use, written as pure functions
  over a param pytree, jit/pjit-friendly (static shapes, no Python control
  flow on data).
- ``age_gender_identity/insightface.py:110-132``: the gender-age model is the
  same backbone with a 202-wide ``fc1``; ``decode_gender_age`` reproduces its
  output decode exactly (gender = argmax of out[:, 0:2]; age = Σ over 100
  binary argmax pairs of out[:, 2:202]).

Weight import: MXNet checkpoints can't be read here (no mxnet), so
``iresnet_params_from_npz`` consumes the standard flat MXNet param naming
(``stage{s}_unit{u}_bn1_gamma``, ``conv0_weight``, ``pre_fc1_weight``, …) from
an ``.npz`` (e.g. produced by dumping ``{**arg_params, **aux_params}`` with
``.asnumpy()``), converting OIHW conv kernels to HWIO and the NCHW-flattened
``pre_fc1`` matrix to our NHWC flatten order.

Inputs are RGB uint8/float 0–255 at 112×112; the deployed InsightFace graphs
scale internally, reproduced here as (x - 127.5) / 127.5.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# stage unit counts per depth (insightface fresnet configs)
IRESNET_UNITS = {
    34: (3, 4, 6, 3),
    50: (3, 4, 14, 3),
    100: (3, 13, 30, 3),
}
IRESNET_FILTERS = (64, 64, 128, 256, 512)
BN_EPS = 2e-5  # mxnet BatchNorm default eps used by insightface


def _bn(x, p, eps=BN_EPS):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * (p["gamma"] * inv) + p["beta"]


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, x * alpha)


def _conv(x, w, stride=1, precision=jax.lax.Precision.HIGHEST,
          compute_dtype=jnp.float32):
    # mxnet pads 3×3 convs symmetrically (pad=1) even at stride 2 — NOT TF
    # 'SAME' (which pads (0,1) there); explicit pads keep checkpoint parity.
    pad = (1, 1) if w.shape[0] == 3 else (0, 0)
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision).astype(jnp.float32)


def _unit(x, p, stride, precision, compute_dtype):
    """IResNet unit_v3: bn1 → conv1(3×3 s1) → bn2 → prelu → conv2(3×3 s) →
    bn3, plus shortcut (identity, or conv1sc+sc BN when shape changes)."""
    h = _bn(x, p["bn1"])
    h = _conv(h, p["conv1"], 1, precision, compute_dtype)
    h = _bn(h, p["bn2"])
    h = _prelu(h, p["relu1_alpha"])
    h = _conv(h, p["conv2"], stride, precision, compute_dtype)
    h = _bn(h, p["bn3"])
    if "conv1sc" in p:
        sc = _conv(x, p["conv1sc"], stride, precision, compute_dtype)
        sc = _bn(sc, p["sc"])
    else:
        sc = x
    return h + sc


def iresnet_units(params: Dict) -> Tuple[int, ...]:
    """Per-stage unit counts recovered from the (jit-static) param dict keys,
    so the pytree carries no non-array metadata."""
    counts = []
    for s in range(1, 5):
        u = 0
        while f"stage{s}_unit{u + 1}" in params:
            u += 1
        counts.append(u)
    return tuple(counts)


def iresnet_embed(params: Dict, x, *, precision=jax.lax.Precision.HIGHEST,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """(N, 112, 112, 3) RGB 0-255 → (N, emb_dim) fc1 output (pre-normalize).

    Mirrors the reference tap ``fc1_output`` (insightface_face_embedding.py:33)
    including the final fc1 BatchNorm1d."""
    x = (jnp.asarray(x, jnp.float32) - 127.5) / 127.5
    h = _conv(x, params["conv0"], 1, precision, compute_dtype)
    h = _bn(h, params["bn0"])
    h = _prelu(h, params["relu0_alpha"])
    for s, n_units in enumerate(iresnet_units(params), start=1):
        for u in range(1, n_units + 1):
            p = params[f"stage{s}_unit{u}"]
            h = _unit(h, p, 2 if u == 1 else 1, precision, compute_dtype)
    h = _bn(h, params["bn1"])
    # NHWC flatten; pre_fc1 kernel is stored in matching (H*W*C, emb) order
    h = h.reshape(h.shape[0], -1)
    h = jnp.dot(h, params["pre_fc1"]["kernel"],
                preferred_element_type=jnp.float32,
                precision=precision) + params["pre_fc1"]["bias"]
    return _bn(h, params["fc1"])


def decode_gender_age(out: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InsightFace gender-age head decode (reference
    ``age_gender_identity/insightface.py:110-132``): for (N, 202) fc1 output,
    gender = argmax over out[:, 0:2]; age = Σ over the 100 two-way argmaxes of
    out[:, 2:202] reshaped (N, 100, 2)."""
    out = jnp.asarray(out)
    gender = jnp.argmax(out[:, 0:2], axis=1)
    pairs = out[:, 2:202].reshape(out.shape[0], 100, 2)
    age = jnp.sum(jnp.argmax(pairs, axis=2), axis=1)
    return gender, age


def letterbox_112(img: np.ndarray, size: int = 112) -> np.ndarray:
    """Square letterbox with black border on the LEFT (w<h) or TOP (w>=h),
    then cv2-INTER_CUBIC resize — exact semantics of the reference's
    ``resize_image`` (``age_gender_identity/insightface.py:77-90``)."""
    from ..ops.resize import resize

    h, w = img.shape[:2]
    if w < h:
        pad = ((0, 0), (h - w, 0), (0, 0))
    else:
        pad = ((w - h, 0), (0, 0), (0, 0))
    sq = np.pad(np.asarray(img), pad)
    return np.asarray(resize(jnp.asarray(sq, jnp.float32), (size, size),
                             "cv2_cubic"))


def init_iresnet_params(rng: jax.Array, depth: int = 100,
                        emb_dim: int = 512,
                        input_size: int = 112) -> Dict:
    """He-init IResNet params (shapes identical to an imported checkpoint)."""
    units = IRESNET_UNITS[depth]
    f = IRESNET_FILTERS
    keys = iter(jax.random.split(rng, 4 + sum(units) * 3 + 2))

    def conv(shape):
        fan_in = shape[0] * shape[1] * shape[2]
        return jax.random.normal(next(keys), shape, jnp.float32) * np.sqrt(2.0 / fan_in)

    def bn(ch):
        return {"gamma": jnp.ones((ch,)), "beta": jnp.zeros((ch,)),
                "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}

    params: Dict = {
        "conv0": conv((3, 3, 3, f[0])),
        "bn0": bn(f[0]),
        "relu0_alpha": jnp.full((f[0],), 0.25),
    }
    in_ch = f[0]
    for s, n_units in enumerate(units, start=1):
        out_ch = f[s]
        for u in range(1, n_units + 1):
            p = {
                "bn1": bn(in_ch),
                "conv1": conv((3, 3, in_ch, out_ch)),
                "bn2": bn(out_ch),
                "relu1_alpha": jnp.full((out_ch,), 0.25),
                "conv2": conv((3, 3, out_ch, out_ch)),
                "bn3": bn(out_ch),
            }
            if u == 1:
                p["conv1sc"] = conv((1, 1, in_ch, out_ch))
                p["sc"] = bn(out_ch)
            params[f"stage{s}_unit{u}"] = p
            in_ch = out_ch
    params["bn1"] = bn(in_ch)
    spatial = input_size // 16  # stride 2 per stage
    flat = spatial * spatial * in_ch
    params["pre_fc1"] = {
        "kernel": jax.random.normal(next(keys), (flat, emb_dim), jnp.float32)
        * np.sqrt(1.0 / flat),
        "bias": jnp.zeros((emb_dim,)),
    }
    params["fc1"] = bn(emb_dim)
    return params


def _npz_bn(w: Dict[str, np.ndarray], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "gamma": jnp.asarray(w[f"{prefix}_gamma"]),
        "beta": jnp.asarray(w[f"{prefix}_beta"]),
        "mean": jnp.asarray(w[f"{prefix}_moving_mean"]),
        "var": jnp.asarray(w[f"{prefix}_moving_var"]),
    }


def _npz_conv(w: Dict[str, np.ndarray], name: str) -> jnp.ndarray:
    # mxnet OIHW -> HWIO
    return jnp.asarray(np.transpose(w[name], (2, 3, 1, 0)))


def iresnet_params_from_npz(path: str, depth: Optional[int] = None,
                            input_size: int = 112) -> Dict:
    """Import an ArcFace/gender-age checkpoint from an .npz of flat MXNet
    param names (see module docstring). Detects depth from the unit count if
    not given; handles the NCHW→NHWC fc1 flatten permutation."""
    with np.load(path) as z:
        w = {k: z[k] for k in z.files}
    # per-stage unit counts straight from the param names (stage 4 alone
    # cannot distinguish depths — r34/r50/r100 all have 3 units there)
    found_units = []
    for s in range(1, 5):
        u = 0
        while f"stage{s}_unit{u + 1}_bn1_gamma" in w:
            u += 1
        found_units.append(u)
    units = tuple(found_units)
    if depth is not None and IRESNET_UNITS[depth] != units:
        raise ValueError(
            f"checkpoint has units {units}, not IResNet-{depth} "
            f"{IRESNET_UNITS[depth]}")
    if any(u == 0 for u in units):
        raise ValueError(f"incomplete checkpoint: stage unit counts {units}")
    params: Dict = {
        "conv0": _npz_conv(w, "conv0_weight"),
        "bn0": _npz_bn(w, "bn0"),
        "relu0_alpha": jnp.asarray(w["relu0_gamma"]),
    }
    for s, n_units in enumerate(units, start=1):
        for u in range(1, n_units + 1):
            pre = f"stage{s}_unit{u}"
            p = {
                "bn1": _npz_bn(w, f"{pre}_bn1"),
                "conv1": _npz_conv(w, f"{pre}_conv1_weight"),
                "bn2": _npz_bn(w, f"{pre}_bn2"),
                "relu1_alpha": jnp.asarray(w[f"{pre}_relu1_gamma"]),
                "conv2": _npz_conv(w, f"{pre}_conv2_weight"),
                "bn3": _npz_bn(w, f"{pre}_bn3"),
            }
            if f"{pre}_conv1sc_weight" in w:
                p["conv1sc"] = _npz_conv(w, f"{pre}_conv1sc_weight")
                p["sc"] = _npz_bn(w, f"{pre}_sc")
            params[pre] = p
    params["bn1"] = _npz_bn(w, "bn1")
    # pre_fc1: mxnet (emb, C*H*W) over NCHW flatten -> (H*W*C, emb) NHWC flatten
    emb, flat = w["pre_fc1_weight"].shape
    ch = IRESNET_FILTERS[-1]
    spatial = input_size // 16
    assert flat == ch * spatial * spatial, (flat, ch, spatial)
    k = w["pre_fc1_weight"].reshape(emb, ch, spatial, spatial)
    k = np.transpose(k, (2, 3, 1, 0)).reshape(spatial * spatial * ch, emb)
    params["pre_fc1"] = {
        "kernel": jnp.asarray(k),
        "bias": jnp.asarray(w.get("pre_fc1_bias", np.zeros(emb, np.float32))),
    }
    params["fc1"] = _npz_bn(w, "fc1")
    return params
