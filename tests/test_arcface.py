"""ArcFace IResNet + InsightFace gender-age adapter parity tests.

Goldens are independent of the code under test: a torch NCHW implementation
consuming the raw MXNet-layout arrays (OIHW kernels, NCHW-flattened fc1)
validates both the architecture and the importer's layout permutations;
cv2 validates the letterbox; numpy validates the gender-age decode
(reference ``age_gender_identity/insightface.py:110-132``).
"""

import numpy as np
import pytest

from hse_facerec_tf_tpu.models.arcface import (IRESNET_UNITS, decode_gender_age,
                                               init_iresnet_params,
                                               iresnet_embed,
                                               iresnet_params_from_npz,
                                               letterbox_112)

BN_EPS = 2e-5


def _random_mxnet_weights(rng, depth=34, emb=64, units=None):
    units = units or IRESNET_UNITS[depth]
    filters = (64, 64, 128, 256, 512)
    w = {}

    def bn(prefix, ch):
        w[f"{prefix}_gamma"] = rng.rand(ch).astype(np.float32) + 0.5
        w[f"{prefix}_beta"] = rng.randn(ch).astype(np.float32) * 0.1
        w[f"{prefix}_moving_mean"] = rng.randn(ch).astype(np.float32) * 0.1
        w[f"{prefix}_moving_var"] = rng.rand(ch).astype(np.float32) + 0.5

    def conv(name, cout, cin, k):
        w[name] = rng.randn(cout, cin, k, k).astype(np.float32) * np.sqrt(
            2.0 / (k * k * cin))

    conv("conv0_weight", filters[0], 3, 3)
    bn("bn0", filters[0])
    w["relu0_gamma"] = rng.rand(filters[0]).astype(np.float32) * 0.5
    in_ch = filters[0]
    for s, n_units in enumerate(units, start=1):
        out_ch = filters[s]
        for u in range(1, n_units + 1):
            pre = f"stage{s}_unit{u}"
            bn(f"{pre}_bn1", in_ch)
            conv(f"{pre}_conv1_weight", out_ch, in_ch, 3)
            bn(f"{pre}_bn2", out_ch)
            w[f"{pre}_relu1_gamma"] = rng.rand(out_ch).astype(np.float32) * 0.5
            conv(f"{pre}_conv2_weight", out_ch, out_ch, 3)
            bn(f"{pre}_bn3", out_ch)
            if u == 1:
                conv(f"{pre}_conv1sc_weight", out_ch, in_ch, 1)
                bn(f"{pre}_sc", out_ch)
            in_ch = out_ch
    bn("bn1", in_ch)
    flat = in_ch * 7 * 7
    w["pre_fc1_weight"] = rng.randn(emb, flat).astype(np.float32) * np.sqrt(1.0 / flat)
    w["pre_fc1_bias"] = rng.randn(emb).astype(np.float32) * 0.1
    bn("fc1", emb)
    return w, units


def _torch_iresnet(w, units, x_rgb):
    """Independent NCHW double-precision forward from raw mxnet arrays."""
    import torch
    import torch.nn.functional as F

    t = lambda a: torch.from_numpy(np.asarray(a)).double()

    def bn2d(x, p):
        g, b, m, v = (t(w[p + s]) for s in
                      ("_gamma", "_beta", "_moving_mean", "_moving_var"))
        shape = (1, -1, 1, 1)
        return (x - m.view(shape)) * (g / torch.sqrt(v + BN_EPS)).view(shape) \
            + b.view(shape)

    def prelu(x, alpha):
        a = t(alpha).view(1, -1, 1, 1)
        return torch.where(x >= 0, x, x * a)

    x = t(np.transpose(x_rgb, (0, 3, 1, 2)))
    x = (x - 127.5) / 127.5
    h = F.conv2d(x, t(w["conv0_weight"]), stride=1, padding=1)
    h = prelu(bn2d(h, "bn0"), w["relu0_gamma"])
    for s, n_units in enumerate(units, start=1):
        for u in range(1, n_units + 1):
            pre = f"stage{s}_unit{u}"
            stride = 2 if u == 1 else 1
            hh = bn2d(h, pre + "_bn1")
            hh = F.conv2d(hh, t(w[pre + "_conv1_weight"]), stride=1, padding=1)
            hh = prelu(bn2d(hh, pre + "_bn2"), w[pre + "_relu1_gamma"])
            hh = F.conv2d(hh, t(w[pre + "_conv2_weight"]), stride=stride, padding=1)
            hh = bn2d(hh, pre + "_bn3")
            if pre + "_conv1sc_weight" in w:
                sc = F.conv2d(h, t(w[pre + "_conv1sc_weight"]), stride=stride)
                sc = bn2d(sc, pre + "_sc")
            else:
                sc = h
            h = hh + sc
    h = bn2d(h, "bn1")
    flat = h.reshape(h.shape[0], -1)          # NCHW flatten, as mxnet does
    out = flat @ t(w["pre_fc1_weight"]).T + t(w["pre_fc1_bias"])
    g, b, m, v = (t(w["fc1" + s]) for s in
                  ("_gamma", "_beta", "_moving_mean", "_moving_var"))
    return ((out - m) * (g / torch.sqrt(v + BN_EPS)) + b).numpy()


def test_iresnet_matches_torch_golden(rng, tmp_path):
    w, units = _random_mxnet_weights(rng, depth=34, emb=64)
    npz = tmp_path / "arcface_r34.npz"
    np.savez(npz, **w)

    from hse_facerec_tf_tpu.models.arcface import iresnet_units

    params = iresnet_params_from_npz(str(npz))
    assert iresnet_units(params) == units

    x = (rng.rand(2, 112, 112, 3) * 255).astype(np.float32)
    got = np.asarray(iresnet_embed(params, x))
    want = _torch_iresnet(w, units, x)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_iresnet_init_import_same_shapes(rng, tmp_path):
    w, _ = _random_mxnet_weights(rng, depth=34, emb=64)
    npz = tmp_path / "a.npz"
    np.savez(npz, **w)
    imported = iresnet_params_from_npz(str(npz))
    import jax

    inited = init_iresnet_params(jax.random.PRNGKey(0), depth=34, emb_dim=64)
    for key, val in imported.items():
        a = jax.tree.map(lambda x: x.shape, val)
        b = jax.tree.map(lambda x: x.shape, inited[key])
        assert a == b, key


def test_decode_gender_age_matches_reference_formula(rng):
    out = rng.randn(5, 202).astype(np.float32)
    gender, age = decode_gender_age(out)
    want_gender = np.argmax(out[:, 0:2], axis=1)
    want_age = np.argmax(out[:, 2:202].reshape(5, 100, 2), axis=2).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(gender), want_gender)
    np.testing.assert_array_equal(np.asarray(age), want_age)


@pytest.mark.parametrize("hw", [(80, 100), (100, 80), (112, 112)])
def test_letterbox_matches_cv2(rng, hw):
    import cv2

    img = (rng.rand(*hw, 3) * 255).astype(np.float32)
    got = letterbox_112(img)
    h, w = hw
    if w < h:
        sq = cv2.copyMakeBorder(img, 0, 0, h - w, 0, cv2.BORDER_CONSTANT, value=[0, 0, 0])
    else:
        sq = cv2.copyMakeBorder(img, w - h, 0, 0, 0, cv2.BORDER_CONSTANT, value=[0, 0, 0])
    want = cv2.resize(sq, (112, 112), interpolation=cv2.INTER_CUBIC)
    assert np.abs(got - want).max() <= 1.0


def test_iresnet_import_recovers_units_from_names(rng, tmp_path):
    """Depth detection must come from per-stage name scans (r34/r50/r100 all
    share 3 units in stage 4 — stage-4-only detection mis-imported r50)."""
    w, units = _random_mxnet_weights(rng, units=(2, 3, 4, 2), emb=32)
    npz = tmp_path / "custom.npz"
    np.savez(npz, **w)
    from hse_facerec_tf_tpu.models.arcface import iresnet_units

    params = iresnet_params_from_npz(str(npz))
    assert iresnet_units(params) == (2, 3, 4, 2)
    out = iresnet_embed(params, rng.rand(1, 112, 112, 3).astype(np.float32) * 255)
    assert out.shape == (1, 32) and np.all(np.isfinite(np.asarray(out)))

    with pytest.raises(ValueError, match="not IResNet-34"):
        iresnet_params_from_npz(str(npz), depth=34)
