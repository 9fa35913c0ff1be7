"""SSR-Net: soft-stagewise regression network for age (and gender).

The reference benchmarks the external SSR-Net demo models on UTKFace
(``utkface_test.py:258-288``): 64² input min-max normalized to 0-255, an age
model and a "general" gender model (same trunk, V=1 output range), decode =
raw regression output, female iff gender < 0.5.

Native functional implementation of the published SSR_net(64, [3,3,3], 1, 1)
architecture (Yang et al., IJCAI'18 demo code): two VALID-padded conv trunks
(ReLU/avg-pool stream and tanh/max-pool stream), per-stage 1×1-conv taps off
layers 4/3/2 multiplied across streams, and the soft stagewise regression
merge

  age = V · Σ_k  (Σ_i (i + λℓ·localᵏᵢ) predᵏᵢ) / Π_{j≤k} sⱼ(1 + λd·Δⱼ)

with V=101 for age, V=1 for gender.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import batch_norm, dense

_P = jax.lax.Precision.DEFAULT

STAGE_NUM = (3, 3, 3)


def _conv_valid(x, w, b=None, precision=_P):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return out + b if b is not None else out


def _pool(x, k, kind):
    if kind == "avg":
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID")


def _trunk(params: Dict, x, prefix: str, act, pool_kind: str, precision):
    """4 × (conv3x3 VALID → BN → act), pooled after the first three —
    returns the (layer2, layer3, layer4) taps the stages consume."""
    taps = []
    h = x
    for li in range(1, 5):
        p = params[f"{prefix}{li}"]
        h = _conv_valid(h, p["kernel"], p.get("bias"), precision)
        h = act(batch_norm(h, p["bn"]["gamma"], p["bn"]["beta"],
                           p["bn"]["mean"], p["bn"]["var"]))
        if li < 4:
            h = _pool(h, 2, pool_kind)
        taps.append(h)
    return taps[1], taps[2], taps[3]   # layer2, layer3, layer4


def _stage(params: Dict, k: int, s_tap, x_tap, pool: int, precision):
    """One SSR stage: 1×1 conv (relu) on each stream tap [+ extra pooling],
    flatten, cross-stream multiply → Δ; dropout-dense mixes multiplied →
    shared feature → (pred, local)."""
    p = params[f"stage{k}"]

    def branch(tap, name, pool_kind):
        h = jax.nn.relu(_conv_valid(tap, p[f"{name}_conv"]["kernel"],
                                    p[f"{name}_conv"]["bias"], precision))
        if pool > 1:
            h = _pool(h, pool, pool_kind)
        return h.reshape(h.shape[0], -1)

    s_flat = branch(s_tap, "s", "max")
    x_flat = branch(x_tap, "x", "avg")
    delta = jnp.tanh(dense(s_flat * x_flat, p["delta"]["kernel"],
                           p["delta"]["bias"], precision=precision))[:, 0]

    s_mix = jax.nn.relu(dense(s_flat, p["s_mix"]["kernel"],
                              p["s_mix"]["bias"], precision=precision))
    x_mix = jax.nn.relu(dense(x_flat, p["x_mix"]["kernel"],
                              p["x_mix"]["bias"], precision=precision))
    feat = jax.nn.relu(dense(s_mix * x_mix, p["feat"]["kernel"],
                             p["feat"]["bias"], precision=precision))
    pred = jax.nn.relu(dense(feat, p["pred"]["kernel"], p["pred"]["bias"],
                             precision=precision))
    local = jnp.tanh(dense(feat, p["local"]["kernel"], p["local"]["bias"],
                           precision=precision))
    return pred, delta, local


def ssr_merge(preds, deltas, locals_, stage_num=STAGE_NUM,
              lambda_local: float = 1.0, lambda_d: float = 1.0,
              V: float = 101.0):
    """The soft stagewise regression merge (demo code ``merge_age``)."""
    total = 0.0
    divisor = 1.0
    for k, s_k in enumerate(stage_num):
        # tanh can round to exactly ±1 in f32, zeroing the divisor; clamp
        # epsilon-inside the asymptote (≤1e-6 relative effect on real models)
        delta = jnp.clip(deltas[k], -1.0 + 1e-6, 1.0 - 1e-6)
        divisor = divisor * (s_k * (1.0 + lambda_d * delta))
        i = jnp.arange(s_k, dtype=jnp.float32)
        contrib = jnp.sum((i[None, :] + lambda_local * locals_[k]) * preds[k],
                          axis=1)
        total = total + contrib / divisor
    return total * V


def ssrnet_apply(params: Dict, x, *, V: float = 101.0,
                 lambda_local: float = 1.0, lambda_d: float = 1.0,
                 precision=_P) -> jnp.ndarray:
    """(N, 64, 64, 3) float 0-255 → (N,) regression output (age, or 0-1 for
    the general/gender variant with V=1)."""
    x = jnp.asarray(x, jnp.float32)
    x2, x3, x4 = _trunk(params, x, "x", jax.nn.relu, "avg", precision)
    s2, s3, s4 = _trunk(params, x, "s", jnp.tanh, "max", precision)
    preds, deltas, locals_ = [], [], []
    for k, (s_tap, x_tap, pool) in enumerate(
            [(s4, x4, 1), (s3, x3, 2), (s2, x2, 4)], start=1):
        pred, delta, local = _stage(params, k, s_tap, x_tap, pool, precision)
        preds.append(pred)
        deltas.append(delta)
        locals_.append(local)
    return ssr_merge(preds, deltas, locals_, STAGE_NUM, lambda_local,
                     lambda_d, V)


def init_ssrnet_params(rng: jax.Array, input_size: int = 64) -> Dict:
    keys = iter(jax.random.split(rng, 128))

    def conv(kh, kw, cin, cout):
        fan_in = kh * kw * cin
        return {"kernel": jax.random.normal(next(keys), (kh, kw, cin, cout),
                                            jnp.float32) * np.sqrt(2.0 / fan_in),
                "bias": jnp.zeros((cout,))}

    def bn(ch):
        return {"gamma": jnp.ones((ch,)), "beta": jnp.zeros((ch,)),
                "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}

    def dense_p(din, dout):
        return {"kernel": jax.random.normal(next(keys), (din, dout)) * 0.05,
                "bias": jnp.zeros((dout,))}

    p: Dict = {}
    in_ch = 3
    for li in range(1, 5):
        c = conv(3, 3, in_ch, 32)
        c["bn"] = bn(32)
        p[f"x{li}"] = c
        in_ch = 32
    in_ch = 3
    for li in range(1, 5):
        c = conv(3, 3, in_ch, 16)
        c["bn"] = bn(16)
        p[f"s{li}"] = c
        in_ch = 16
    # tap spatial sizes for 64² input: layer4 4², layer3 6²→pool2→3²,
    # layer2 14²→pool4→3²
    flat_dims = {1: 4 * 4 * 10, 2: 3 * 3 * 10, 3: 3 * 3 * 10}
    for k, s_k in enumerate(STAGE_NUM, start=1):
        flat = flat_dims[k]
        p[f"stage{k}"] = {
            "s_conv": conv(1, 1, 16, 10),
            "x_conv": conv(1, 1, 32, 10),
            "delta": dense_p(flat, 1),
            "s_mix": dense_p(flat, s_k),
            "x_mix": dense_p(flat, s_k),
            "feat": dense_p(s_k, 2 * s_k),
            "pred": dense_p(2 * s_k, s_k),
            "local": dense_p(2 * s_k, s_k),
        }
    return p
