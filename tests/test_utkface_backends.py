"""UTKFace benchmark backends beyond 'ours' (reference 9-way switch,
``utkface_test.py:22-314``): native archs, importers, and decode semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mobilenet_v2_shapes_and_h5_roundtrip(rng, tmp_path):
    import h5py

    from hse_facerec_tf_tpu.models.mobilenet_v2 import (
        MOBILENET_V2_BLOCKS, agendernet_apply, init_mobilenet_v2_params,
        mobilenet_v2_params_from_h5)

    params = init_mobilenet_v2_params(jax.random.PRNGKey(0))
    x = rng.rand(2, 96, 96, 3).astype(np.float32) * 255
    gender, age = agendernet_apply(params, x)
    assert gender.shape == (2, 2) and age.shape == (2, 101)
    np.testing.assert_allclose(np.asarray(gender).sum(-1), 1.0, rtol=1e-5)

    # write the standard Keras MobileNetV2 layer naming and re-import
    path = tmp_path / "mn2.h5"
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")

        def put(layer, weights):
            lg = root.create_group(layer).create_group(layer)
            for wname, arr in weights.items():
                lg.create_dataset(wname, data=np.asarray(arr))

        def put_bn(layer, bn):
            put(layer, {"gamma": bn["gamma"], "beta": bn["beta"],
                        "moving_mean": bn["mean"], "moving_variance": bn["var"]})

        put("Conv1", {"kernel": params["conv1"]["kernel"]})
        put_bn("bn_Conv1", params["conv1"]["bn"])
        i = 0
        for t, c, n, s in MOBILENET_V2_BLOCKS:
            for r in range(n):
                pre = "expanded_conv" if i == 0 else f"block_{i}"
                blk = params[f"block{i}"]
                if "expand" in blk:
                    put(f"{pre}_expand", {"kernel": blk["expand"]})
                    put_bn(f"{pre}_expand_BN", blk["expand_bn"])
                put(f"{pre}_depthwise", {"depthwise_kernel": blk["dw"]})
                put_bn(f"{pre}_depthwise_BN", blk["dw_bn"])
                put(f"{pre}_project", {"kernel": blk["project"]})
                put_bn(f"{pre}_project_BN", blk["project_bn"])
                i += 1
        put("Conv_1", {"kernel": params["conv_last"]["kernel"]})
        put_bn("Conv_1_bn", params["conv_last"]["bn"])
        put("gender_prediction", params["gender"])
        put("age_prediction", params["age"])

    imported = mobilenet_v2_params_from_h5(str(path))
    g1, a1 = agendernet_apply(imported, x)
    np.testing.assert_allclose(np.asarray(gender), np.asarray(g1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(age), np.asarray(a1), atol=1e-6)


def test_ssrnet_merge_matches_reference_formula(rng):
    """ssr_merge vs a literal numpy transcription of the demo merge_age loop."""
    from hse_facerec_tf_tpu.models.ssrnet import STAGE_NUM, ssr_merge

    n = 5
    preds = [rng.rand(n, s).astype(np.float32) for s in STAGE_NUM]
    deltas = [rng.randn(n).astype(np.float32) * 0.3 for _ in STAGE_NUM]
    locals_ = [rng.randn(n, s).astype(np.float32) * 0.3 for s in STAGE_NUM]

    lam_l = lam_d = 1.0
    V = 101.0
    s1, s2, s3 = STAGE_NUM
    a = np.zeros(n)
    for i in range(s1):
        a += (i + lam_l * locals_[0][:, i]) * preds[0][:, i]
    a /= s1 * (1 + lam_d * deltas[0])
    b = np.zeros(n)
    for j in range(s2):
        b += (j + lam_l * locals_[1][:, j]) * preds[1][:, j]
    b /= (s1 * (1 + lam_d * deltas[0])) * (s2 * (1 + lam_d * deltas[1]))
    c = np.zeros(n)
    for k in range(s3):
        c += (k + lam_l * locals_[2][:, k]) * preds[2][:, k]
    c /= (s1 * (1 + lam_d * deltas[0])) * (s2 * (1 + lam_d * deltas[1])) \
        * (s3 * (1 + lam_d * deltas[2]))
    want = (a + b + c) * V

    got = np.asarray(ssr_merge([jnp.asarray(p) for p in preds],
                               [jnp.asarray(d) for d in deltas],
                               [jnp.asarray(l) for l in locals_]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ssrnet_forward_shapes(rng):
    from hse_facerec_tf_tpu.models.ssrnet import init_ssrnet_params, ssrnet_apply

    params = init_ssrnet_params(jax.random.PRNGKey(1))
    x = rng.rand(3, 64, 64, 3).astype(np.float32) * 255
    age = ssrnet_apply(params, x, V=101.0)
    assert age.shape == (3,)
    assert np.all(np.isfinite(np.asarray(age)))
    gender = ssrnet_apply(params, x, V=1.0)
    assert gender.shape == (3,)


def test_bknet_forward_and_decode(rng):
    from hse_facerec_tf_tpu.eval.utkface import bknet_predict_fn
    from hse_facerec_tf_tpu.models.bknet import (bknet_apply, init_bknet_params,
                                                 bknet_params_from_npz,
                                                 preprocess_bknet)

    params = init_bknet_params(jax.random.PRNGKey(2))
    imgs = (rng.rand(2, 100, 80, 3) * 255).astype(np.uint8)
    x = preprocess_bknet(imgs)
    assert x.shape == (2, 48, 48, 1)
    assert x.min() >= -0.51 and x.max() <= 0.51
    smile, gender, age = bknet_apply(params, x)
    assert smile.shape == (2, 2) and gender.shape == (2, 2) and age.shape == (2, 101)

    predict = bknet_predict_fn(params)
    ages, p_male = predict(imgs)
    np.testing.assert_array_equal(np.asarray(ages),
                                  np.argmax(np.asarray(age), axis=1))
    np.testing.assert_array_equal(np.asarray(p_male),
                                  np.argmax(np.asarray(gender), axis=1))


def test_bknet_npz_roundtrip(rng, tmp_path):
    from hse_facerec_tf_tpu.models.bknet import (bknet_apply, bknet_params_from_npz,
                                                 init_bknet_params)

    params = init_bknet_params(jax.random.PRNGKey(3))
    flat = {}
    for layer, leaves in params.items():
        for leaf, arr in leaves.items():
            flat[f"{layer}/{leaf}"] = np.asarray(arr)
    npz = tmp_path / "bknet.npz"
    np.savez(npz, **flat)
    imported = bknet_params_from_npz(str(npz))
    x = rng.rand(1, 48, 48, 1).astype(np.float32)
    for a, b in zip(bknet_apply(params, x), bknet_apply(imported, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_converted_pb_backend(rng, tmp_path):
    """Synthesized age_net/gender_net pbs through the graph compiler; decode
    pinned against a numpy golden (Adience midpoints, prob[0] male rule)."""
    import cv2

    from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder
    from hse_facerec_tf_tpu.eval.utkface import (ADIENCE_BUCKETS,
                                                 converted_pb_predict_fn)

    def small_pb(path, n_out, hw, rng):
        b = GraphBuilder()
        x = b.placeholder("input", [-1, hw, hw, 3])
        pooled = b.mean("pool", x, [1, 2])
        w = rng.randn(3, n_out).astype(np.float32)
        logits = b.matmul("logits", pooled, b.const("w", w))
        b.simple("Softmax", "prob", [logits])
        with open(path, "wb") as f:
            f.write(b.serialize())
        return w

    age_pb = str(tmp_path / "age_net.pb")
    gender_pb = str(tmp_path / "gender_net.pb")
    w_age = small_pb(age_pb, 8, 227, rng)
    w_gender = small_pb(gender_pb, 2, 227, rng)

    predict = converted_pb_predict_fn(age_pb, gender_pb)
    imgs = (rng.rand(2, 200, 200, 3) * 255).astype(np.uint8)
    ages, p_male = predict(imgs)

    for i in range(2):
        x = cv2.resize(imgs[i].astype(np.float32), (256, 256)) - 127.0
        x = cv2.resize(x, (227, 227))[..., ::-1]
        mean_px = x.mean(axis=(0, 1))
        age_logits = mean_px @ w_age
        e = np.exp(age_logits - age_logits.max())
        bucket = int(np.argmax(e / e.sum()))
        want_age = sum(ADIENCE_BUCKETS[bucket]) / 2
        assert ages[i] == pytest.approx(want_age, abs=1e-4)
        g = mean_px @ w_gender
        eg = np.exp(g - g.max())
        want_male = 1.0 if (eg / eg.sum())[0] >= 0.5 else 0.0
        assert p_male[i] == want_male


def test_csv_split_and_coral_clamp(tmp_path, rng):
    """CSV split reader (utkface_test.py:316-330) + CORAL prediction clamp
    (:356-360): predicted ages outside 21-60 clamp before scoring."""
    import cv2

    from hse_facerec_tf_tpu.eval.utkface import (evaluate_age_gender,
                                                 read_csv_split)

    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    names = ["30_0_0_1.jpg", "40_1_0_2.jpg", "50_0_0_3.jpg"]
    for n in names:
        cv2.imwrite(str(tmp_path / n), img)
    (tmp_path / "utk_test.csv").write_text(
        "index,file\n0,30_0_0_1.jpg\n1,40_1_0_2.jpg\n2,missing.jpg\n")
    got = read_csv_split(str(tmp_path))
    assert got == ["30_0_0_1.jpg", "40_1_0_2.jpg"]   # missing file dropped

    # predictor always says age 80, male: with the CORAL range, the clamp to
    # 60 makes |60-50|>5 but MAE uses the clamped value
    predict = lambda batch: (np.full(len(batch), 80.0), np.ones(len(batch)))
    res = evaluate_age_gender(predict,
                              [str(tmp_path / n) for n in names],
                              age_range=(21, 60))
    assert res["n"] == 3
    assert res["age_mae"] == pytest.approx((30 + 20 + 10) / 3)


def test_ssrnet_h5_import_roundtrip(rng, tmp_path):
    """Write random SSR-Net params in the published demo's Keras layout
    (auto-named trunk/stage layers in construction order + the named
    delta/pred/local heads) and re-import: forwards must match exactly."""
    import h5py

    from hse_facerec_tf_tpu.models.ssrnet import (STAGE_NUM,
                                                  init_ssrnet_params,
                                                  ssrnet_apply,
                                                  ssrnet_params_from_h5)

    params = init_ssrnet_params(jax.random.PRNGKey(3))
    path = str(tmp_path / "ssrnet_3_3_3_64_1.0_1.0.h5")

    layer_names = []
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")

        def put(name, weights):   # weights: [(suffix, array), ...]
            g = root.create_group(name)
            wnames = []
            for suffix, arr in weights:
                wname = f"{name}/{suffix}:0"
                g.create_dataset(wname, data=np.asarray(arr, np.float32))
                wnames.append(wname.encode())
            g.attrs["weight_names"] = wnames
            layer_names.append(name.encode())

        ci = bi = di = 0

        def put_conv(p):
            nonlocal ci
            ci += 1
            put(f"conv2d_{ci}", [("kernel", p["kernel"]), ("bias", p["bias"])])

        def put_bn(p):
            nonlocal bi
            bi += 1
            put(f"batch_normalization_{bi}",
                [("gamma", p["gamma"]), ("beta", p["beta"]),
                 ("moving_mean", p["mean"]), ("moving_variance", p["var"])])

        def put_dense(p, name=None):
            nonlocal di
            if name is None:
                di += 1
                name = f"dense_{di}"
            put(name, [("kernel", p["kernel"]), ("bias", p["bias"])])

        for prefix in ("x", "s"):                      # both trunks
            for li in range(1, 5):
                put_conv(params[f"{prefix}{li}"])
                put_bn(params[f"{prefix}{li}"]["bn"])
        for k, _ in enumerate(STAGE_NUM, start=1):     # stage blocks in order
            st = params[f"stage{k}"]
            put_conv(st["s_conv"])
            put_conv(st["x_conv"])
            put_dense(st["s_mix"])
            put_dense(st["x_mix"])
            put_dense(st["delta"], name=f"delta_s{k}")
            put_dense(st["feat"])
            put_dense(st["pred"], name=f"pred_age_stage{k}")
            put_dense(st["local"], name=f"local_delta_stage{k}")
        root.attrs["layer_names"] = layer_names

    imported = ssrnet_params_from_h5(path)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 255
    want = np.asarray(ssrnet_apply(params, x, V=101.0))
    got = np.asarray(ssrnet_apply(imported, x, V=101.0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ssrnet_h5_import_rejects_wrong_arch(tmp_path):
    import h5py

    from hse_facerec_tf_tpu.models.ssrnet import ssrnet_params_from_h5

    path = str(tmp_path / "bad.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("conv2d_1")
        g.create_dataset("conv2d_1/kernel:0", data=np.zeros((3, 3, 3, 48), np.float32))
        g.attrs["weight_names"] = [b"conv2d_1/kernel:0"]
    with pytest.raises((KeyError, ValueError)):
        ssrnet_params_from_h5(path)


def test_converted_logits_pb_backend(rng, tmp_path):
    """rude-carnie tap convention (utkface_test.py:89-109): Placeholder ->
    logits, direct 227 resize, no mean, no channel flip; numpy golden."""
    import cv2

    from hse_facerec_tf_tpu.core.graphdef_export import GraphBuilder
    from hse_facerec_tf_tpu.eval.utkface import (ADIENCE_BUCKETS,
                                                 converted_logits_predict_fn)

    def small_pb(path, n_out, hw, rng):
        b = GraphBuilder()
        x = b.placeholder("Placeholder", [-1, hw, hw, 3])
        pooled = b.mean("pool", x, [1, 2])
        w = rng.randn(3, n_out).astype(np.float32)
        raw = b.matmul("raw", pooled, b.const("w", w))
        b.simple("Softmax", "logits", [raw])
        with open(path, "wb") as f:
            f.write(b.serialize())
        return w

    age_pb = str(tmp_path / "age_net.pb")
    gender_pb = str(tmp_path / "gender_net.pb")
    w_age = small_pb(age_pb, 8, 227, rng)
    w_gender = small_pb(gender_pb, 2, 227, rng)

    predict = converted_logits_predict_fn(age_pb, gender_pb)
    imgs = (rng.rand(2, 200, 180, 3) * 255).astype(np.uint8)
    ages, p_male = predict(imgs)

    for i in range(2):
        x = cv2.resize(imgs[i].astype(np.float32), (227, 227))  # RGB, no mean
        mean_px = x.mean(axis=(0, 1))
        age_logits = mean_px @ w_age
        bucket = int(np.argmax(age_logits))
        want_age = sum(ADIENCE_BUCKETS[bucket]) / 2
        assert ages[i] == pytest.approx(want_age, abs=1e-3)
        g = mean_px @ w_gender
        eg = np.exp(g - g.max())
        want_male = 1.0 if (eg / eg.sum())[0] >= 0.5 else 0.0
        assert p_male[i] == want_male
