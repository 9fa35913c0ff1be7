"""VGGFace VGG16 embedder parity tests.

Goldens independent of the code under test: a torch NCHW float64 VGG16
validates the architecture; PIL validates the pil_nearest resize (Keras
``load_img`` default interpolation); the preprocess formula is pinned to the
keras_vggface v1 constants (reference ``facerec_test.py:344-349``).
"""

import numpy as np
import pytest

from hse_facerec_tf_tpu.models.vgg16 import (VGG16_BLOCKS, init_vgg16_params,
                                             vgg16_embed,
                                             vgg16_params_from_h5)


def _torch_vgg16_fc7(params, x_nhwc):
    """Independent torch float64 forward from the same param pytree."""
    import torch
    import torch.nn.functional as F

    t = lambda a: torch.from_numpy(np.asarray(a)).double()
    x = t(x_nhwc).permute(0, 3, 1, 2)
    for block, n_convs, _ in VGG16_BLOCKS:
        for i in range(1, n_convs + 1):
            layer = params[f"conv{block}_{i}"]
            k = t(layer["kernel"]).permute(3, 2, 0, 1)   # HWIO -> OIHW
            x = F.relu(F.conv2d(x, k, t(layer["bias"]), padding=1))
        x = F.max_pool2d(x, 2, 2)
    # Keras Flatten order is (h, w, c): permute back to NHWC before reshape
    x = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
    x = F.relu(x @ t(params["fc6"]["kernel"]) + t(params["fc6"]["bias"]))
    x = F.relu(x @ t(params["fc7"]["kernel"]) + t(params["fc7"]["bias"]))
    return x.numpy()


@pytest.fixture(scope="module")
def vgg16_params():
    import jax

    return init_vgg16_params(jax.random.PRNGKey(7))


def test_vgg16_matches_torch_golden(vgg16_params, rng):
    import jax

    x = rng.rand(1, 224, 224, 3).astype(np.float32) * 2 - 1
    got = np.asarray(jax.jit(vgg16_embed)(vgg16_params, x))
    want = _torch_vgg16_fc7(vgg16_params, x)
    assert got.shape == (1, 4096)
    assert np.any(want > 0), "degenerate golden (all-dead relu)"
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
    a, b = got.reshape(-1).astype(np.float64), want.reshape(-1)
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999999


def test_vgg16_h5_import_roundtrip(vgg16_params, tmp_path):
    """Write the params in the published keras_vggface h5 layout
    ('<layer>/<layer>_W_1:0' / '_b_1:0' names) and re-import."""
    import h5py
    import jax

    path = str(tmp_path / "vggface_vgg16.h5")
    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights")
        layers = [f"conv{b}_{i}" for b, n, _ in VGG16_BLOCKS
                  for i in range(1, n + 1)] + ["fc6", "fc7"]
        for layer in layers:
            g = root.create_group(layer)
            g.create_dataset(f"{layer}_W_1:0",
                             data=np.asarray(vgg16_params[layer]["kernel"]))
            g.create_dataset(f"{layer}_b_1:0",
                             data=np.asarray(vgg16_params[layer]["bias"]))
        # fc8 classification head exists in the published file; must be ignored
        g = root.create_group("fc8")
        g.create_dataset("fc8_W_1:0", data=np.zeros((4096, 8), np.float32))
        g.create_dataset("fc8_b_1:0", data=np.zeros((8,), np.float32))

    imported = vgg16_params_from_h5(path)
    for layer, slots in vgg16_params.items():
        for slot, arr in slots.items():
            np.testing.assert_array_equal(np.asarray(imported[layer][slot]),
                                          np.asarray(arr))


def test_vgg16_h5_import_rejects_wrong_arch(tmp_path):
    import h5py

    path = str(tmp_path / "bad.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("conv1_1")
        g.create_dataset("kernel:0", data=np.zeros((3, 3, 3, 7), np.float32))
        g.create_dataset("bias:0", data=np.zeros((7,), np.float32))
    with pytest.raises((KeyError, ValueError)):
        vgg16_params_from_h5(path)


def test_pil_nearest_matches_pil():
    from PIL import Image

    from hse_facerec_tf_tpu.ops.resize import resize

    rng = np.random.RandomState(3)
    img = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
    for size in ((224, 224), (17, 31), (100, 140)):
        want = np.asarray(Image.fromarray(img).resize(
            (size[1], size[0]), Image.NEAREST))
        got = np.asarray(resize(img.astype(np.float32), size, "pil_nearest"))
        np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_vggface1_normalizer():
    from hse_facerec_tf_tpu.ops.preprocess import normalize_vggface1

    rng = np.random.RandomState(4)
    x = rng.rand(2, 4, 4, 3).astype(np.float32) * 255
    got = np.asarray(normalize_vggface1(x))
    # keras_vggface.utils.preprocess_input version=1: RGB->BGR then means
    want = x[..., ::-1].copy()
    want[..., 0] -= 93.5940
    want[..., 1] -= 104.7624
    want[..., 2] -= 129.1863
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vgg16_zoo_extractor_end_to_end(tmp_path, rng):
    """Zoo entry runs (random-init warning path) and reports provenance."""
    import warnings

    from hse_facerec_tf_tpu.models.zoo import build_extractor, weights_origin

    assert weights_origin("vggface_vgg16") in ("imported", "random")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        ex = build_extractor("vggface_vgg16", batch_size=2)
    imgs = (rng.rand(3, 64, 48, 3) * 255).astype(np.uint8)
    feats = ex.extract_batch(imgs)
    assert feats.shape == (3, 4096)
    assert np.isfinite(feats).all()
