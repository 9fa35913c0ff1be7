"""Training loops, augmentation, checkpoints, h5 import/export, ResNet-50."""

import os

import jax
import numpy as np
import pytest

from hse_facerec_tf_tpu.config import TrainConfig
from hse_facerec_tf_tpu.core.h5_import import (load_keras_h5,
                                               mobilenet_params_from_h5,
                                               save_mobilenet_h5)
from hse_facerec_tf_tpu.models.mobilenet import (init_mobilenet_params,
                                                 mobilenet_embed)
from hse_facerec_tf_tpu.train.age_gender import AgeGenderTrainer
from hse_facerec_tf_tpu.train.augment import AugmentConfig, augment_batch
from hse_facerec_tf_tpu.train.checkpoints import (BestCheckpoint, load_pytree,
                                                  save_pytree)
from hse_facerec_tf_tpu.train.face_id import FaceIdTrainer


def _toy_face_data(rng, n_classes=4, per_class=8, size=64):
    """Distinguishable per-class patterns."""
    images, labels = [], []
    for c in range(n_classes):
        base = rng.rand(size, size, 3).astype(np.float32)
        for _ in range(per_class):
            img = base + 0.05 * rng.randn(size, size, 3).astype(np.float32)
            images.append(np.clip(img, 0, 1) * 2 - 1)
            labels.append(c)
    return np.stack(images), np.asarray(labels)


def test_augment_batch_shapes_and_variation(rng):
    imgs = rng.rand(4, 32, 32, 3).astype(np.float32)
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), imgs))
    assert out.shape == imgs.shape
    assert not np.allclose(out, imgs)  # something moved
    out2 = np.asarray(augment_batch(jax.random.PRNGKey(1), imgs))
    assert not np.allclose(out, out2)  # different key, different warp
    # no augmentation config produces identity
    ident = AugmentConfig(rotation_deg=0, shear=0, zoom=0, shift=0,
                          horizontal_flip=False)
    out3 = np.asarray(augment_batch(jax.random.PRNGKey(0), imgs, ident))
    np.testing.assert_allclose(out3, imgs, atol=1e-5)


def test_augment_two_pass_matches_direct_warp(rng):
    """The MXU two-pass (Catmull-Smith) warp must agree with a direct
    single-pass bilinear inverse-affine warp (host numpy) up to the
    sub-pixel smoothing the decomposition introduces — tight on smooth
    images (real photos), which is what augmentation sees."""
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from hse_facerec_tf_tpu.train.augment import _sample_affine, _warp_one

    img = gaussian_filter(rng.rand(48, 56, 3).astype(np.float32), (2, 2, 0))

    def warp_ref(img, mat, fill=0.0):
        h, w, _ = img.shape
        gx, gy = np.meshgrid(np.arange(w), np.arange(h))
        sx = mat[0, 0] * gx + mat[0, 1] * gy + mat[0, 2]
        sy = mat[1, 0] * gx + mat[1, 1] * gy + mat[1, 2]
        x0, y0 = np.floor(sx), np.floor(sy)
        wx, wy = sx - x0, sy - y0
        valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)

        def at(yi, xi):
            return img[np.clip(yi, 0, h - 1).astype(int),
                       np.clip(xi, 0, w - 1).astype(int)]

        out = (at(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
               + at(y0, x0 + 1) * (wx * (1 - wy))[..., None]
               + at(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
               + at(y0 + 1, x0 + 1) * (wx * wy)[..., None])
        return np.where(valid[..., None], out, fill)

    for s in range(5):
        mat = np.asarray(_sample_affine(jax.random.PRNGKey(s), AugmentConfig(),
                                        48, 56))
        got = np.asarray(_warp_one(jnp.asarray(img), jnp.asarray(mat), 0.0))
        np.testing.assert_allclose(got, warp_ref(img, mat), atol=0.02)


def test_pallas_warp_matches_einsum_two_pass(rng):
    """The TPU augment kernel (ops/pallas/warp.py, ladder + selection
    matmul) must reproduce the einsum two-pass warp — same factorization,
    same clip-to-edge + fill semantics — to within bf16 rounding of the
    image operand (the einsum path rounds its hat WEIGHTS to bf16, the
    kernel rounds the selected image values: same error class). Interpret
    mode; flips, shears, and out-of-range fills all exercised."""
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.ops.pallas.warp import warp_batch_pallas
    from hse_facerec_tf_tpu.train.augment import _sample_affine, _warp_one

    h = w = 64
    n = 8
    imgs = jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    cfg = AugmentConfig(shift=0.2)        # bigger shifts -> more fill area
    mats = jax.vmap(lambda k: _sample_affine(k, cfg, h, w))(keys)
    flips = np.asarray(mats)[:, 0, 0] < 0
    assert flips.any() and (~flips).any()   # both branches exercised

    got = np.asarray(warp_batch_pallas(imgs, mats, cfg.fill_value,
                                       interpret=True))
    want = np.asarray(jax.vmap(
        lambda im, m: _warp_one(im, m, cfg.fill_value))(imgs, mats))
    assert np.abs(got - want).max() < 0.02


def test_face_id_training_learns(rng):
    images, labels = _toy_face_data(rng)
    cfg = TrainConfig(batch_size=8, learning_rate=3e-3)
    # fast BN momentum so running stats converge within this tiny run
    trainer = FaceIdTrainer(n_classes=4, cfg=cfg, augment=None, bn_momentum=0.7)
    first_loss = None
    for epoch in range(15):
        perm = rng.permutation(len(images))
        for i in range(0, len(images), 8):
            idx = perm[i:i + 8]
            m = trainer.train_batch(images[idx], labels[idx])
            if first_loss is None:
                first_loss = m["loss"]
    assert m["loss"] < first_loss
    acc = trainer.eval_accuracy(images, labels)
    assert acc > 0.8
    emb = trainer.embed(images[:2])
    assert emb.shape == (2, 1024)


def test_age_gender_alternating_training(rng):
    n = 16
    imgs = rng.rand(n, 64, 64, 3).astype(np.float32) * 2 - 1
    ages = rng.randint(0, 100, n)
    genders = (rng.rand(n) > 0.5).astype(np.float32)

    def age_iter():
        while True:
            idx = rng.randint(0, n, 8)
            yield imgs[idx], ages[idx]

    def gender_iter():
        while True:
            idx = rng.randint(0, n, 8)
            yield imgs[idx], genders[idx]

    trainer = AgeGenderTrainer(seed=0)
    frozen_before = jax.tree.map(np.asarray, trainer.params["backbone"]["conv1"]["kernel"])
    m = trainer.train_alternating(age_iter(), gender_iter(), steps=4)
    assert "age_loss" in m and "gender_loss" in m
    # phase 1: backbone frozen (only BN running stats may drift)
    np.testing.assert_allclose(
        np.asarray(trainer.params["backbone"]["conv1"]["kernel"]), frozen_before)
    trainer.unfreeze()
    m = trainer.train_alternating(age_iter(), gender_iter(), steps=4)
    assert not np.allclose(np.asarray(trainer.params["backbone"]["conv1"]["kernel"]),
                           frozen_before)
    stats = trainer.evaluate(imgs, ages, genders)
    assert 0.0 <= stats["gender_acc"] <= 1.0


def test_age_gender_per_task_optimizer_isolation(rng):
    """An age step must not move the gender head (and vice versa): the
    reference compiles age_model and gender_model separately
    (``age_gender_train.py:243-245``), so each task owns its own Adam slots.
    A shared Adam state would drift the idle head through stale momentum
    even at zero gradient."""
    imgs = rng.rand(8, 64, 64, 3).astype(np.float32) * 2 - 1
    ages = rng.randint(0, 100, 8)
    genders = (rng.rand(8) > 0.5).astype(np.float32)
    trainer = AgeGenderTrainer(seed=0)
    trainer.unfreeze()  # unfrozen phase: backbone moves, other head must not

    def heads(p):
        return jax.tree.map(np.asarray, {"age": p["age"], "gender": p["gender"]})

    # seed both Adam states with real momentum first
    m = trainer.train_alternating(iter(lambda: (imgs, ages), None),
                                  iter(lambda: (imgs, genders), None), steps=2)
    before = heads(trainer.params)
    # one age-only step: gender head must be bit-identical after
    trainer.params, trainer.age_opt_state, _ = trainer._age_step(
        trainer.params, trainer.age_opt_state, jax.random.PRNGKey(7),
        jax.numpy.asarray(imgs), jax.numpy.asarray(ages))
    after = heads(trainer.params)
    np.testing.assert_array_equal(after["gender"]["kernel"], before["gender"]["kernel"])
    np.testing.assert_array_equal(after["gender"]["bias"], before["gender"]["bias"])
    assert not np.allclose(after["age"]["kernel"], before["age"]["kernel"])
    # and one gender-only step leaves the age head untouched
    before = after
    trainer.params, trainer.gender_opt_state, _ = trainer._gender_step(
        trainer.params, trainer.gender_opt_state, jax.random.PRNGKey(8),
        jax.numpy.asarray(imgs), jax.numpy.asarray(genders))
    after = heads(trainer.params)
    np.testing.assert_array_equal(after["age"]["kernel"], before["age"]["kernel"])
    assert not np.allclose(after["gender"]["kernel"], before["gender"]["kernel"])
    assert np.isfinite(m["age_loss"]) and np.isfinite(m["gender_loss"])


def test_age_gender_steps_augment_like_reference(rng):
    """Both reference training loops feed generator-AUGMENTED batches
    (``age_gender_train.py:127-133`` builds train_datagen with the same
    shear/rot/zoom/shift/hflip policy as ``facerec_keras_train.py:164-168``);
    the alternating steps must therefore warp their batch when an
    AugmentConfig is passed: same params+key+batch give a different loss
    than the un-augmented step, and the augmented step stays deterministic
    in the key."""
    from hse_facerec_tf_tpu.train.age_gender import (init_head_params,
                                                     make_optimizer,
                                                     make_steps)
    from hse_facerec_tf_tpu.models.mobilenet import init_mobilenet_params
    from hse_facerec_tf_tpu.train.augment import AugmentConfig

    kb, kh = jax.random.split(jax.random.PRNGKey(0))
    backbone = {k: v for k, v in init_mobilenet_params(kb).items()
                if k != "classifier"}
    params = {"backbone": backbone, **init_head_params(kh)}
    opt = make_optimizer(1e-3, freeze_backbone=False, task="age")
    imgs = jax.numpy.asarray(rng.rand(8, 64, 64, 3).astype(np.float32) * 2 - 1)
    ages = jax.numpy.asarray(rng.randint(0, 100, 8))
    key = jax.random.PRNGKey(3)

    plain_step, _ = make_steps(opt, opt, jit=False)
    aug_step, _ = make_steps(opt, opt, jit=False, augment=AugmentConfig())
    _, _, m_plain = jax.jit(plain_step)(params, opt.init(params), key, imgs, ages)
    _, _, m_aug = jax.jit(aug_step)(params, opt.init(params), key, imgs, ages)
    _, _, m_aug2 = jax.jit(aug_step)(params, opt.init(params), key, imgs, ages)
    assert np.isfinite(m_aug["age_loss"])
    assert not np.isclose(float(m_plain["age_loss"]), float(m_aug["age_loss"]))
    np.testing.assert_allclose(float(m_aug["age_loss"]),
                               float(m_aug2["age_loss"]), rtol=1e-6)


def test_checkpoint_save_best_early_stop(tmp_path):
    ck = BestCheckpoint(str(tmp_path), mode="max", patience=2)
    params = {"a": np.arange(3.0), "b": {"c": np.ones((2, 2))}}
    assert ck.update(0.5, params, epoch=0)
    assert ck.update(0.7, params, epoch=1)
    assert ck.update(0.6, params, epoch=2)      # worse: patience 1/2
    assert not ck.update(0.6, params, epoch=3)  # worse: stop
    best = ck.load_best()
    np.testing.assert_allclose(best["a"], params["a"])
    np.testing.assert_allclose(best["b"]["c"], params["b"]["c"])
    assert "0.7000" in os.path.basename(ck.best_path)


def test_pytree_roundtrip(tmp_path):
    tree = {"x": np.random.rand(4), "nested": {"y": np.int32(3), "z": np.random.rand(2, 2)}}
    p = str(tmp_path / "t")
    save_pytree(tree, p)
    back = load_pytree(p)
    np.testing.assert_allclose(back["x"], tree["x"])
    np.testing.assert_allclose(back["nested"]["z"], tree["nested"]["z"])


def test_h5_roundtrip(tmp_path, rng):
    params = init_mobilenet_params(jax.random.PRNGKey(3), n_classes=11)
    path = str(tmp_path / "model.h5")
    save_mobilenet_h5(params, path)
    flat = load_keras_h5(path)
    assert "conv1/kernel" in flat
    assert "conv_dw_3/depthwise_kernel" in flat
    back = mobilenet_params_from_h5(path, n_classes=11)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    a = np.asarray(mobilenet_embed(params, x))
    b = np.asarray(mobilenet_embed(back, x))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_resnet50_shapes(rng):
    from hse_facerec_tf_tpu.models.resnet import (init_resnet50_params,
                                                  resnet50_classify,
                                                  resnet50_embed)

    params = init_resnet50_params(jax.random.PRNGKey(0), n_classes=7)
    x = rng.rand(2, 96, 96, 3).astype(np.float32)
    emb = resnet50_embed(params, x, precision=jax.lax.Precision.DEFAULT)
    assert emb.shape == (2, 2048)
    logits = resnet50_classify(params, x, precision=jax.lax.Precision.DEFAULT)
    assert logits.shape == (2, 7)


def test_directory_dataset(tmp_path, rng):
    import cv2

    from hse_facerec_tf_tpu.train.data import (DirectoryDataset,
                                               LabeledDirDataset,
                                               age_label_from_dirname,
                                               gender_label_from_dirname)

    for c in ("alice", "bob"):
        (tmp_path / c).mkdir()
        for j in range(5):
            img = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(tmp_path / c / f"{j}.jpg"), img)

    ds = DirectoryDataset(str(tmp_path), image_size=(24, 24))
    assert len(ds) == 10 and ds.n_classes == 2
    batches = list(ds.batches(4, epochs=1, seed=1))
    assert len(batches) == 2  # 10 // 4 with drop_remainder
    imgs, labels = batches[0]
    assert imgs.shape == (4, 24, 24, 3) and imgs.dtype == np.float32
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0  # 'tf' normalization
    assert set(np.unique(np.concatenate([b[1] for b in batches]))) <= {0, 1}


def test_directory_dataset_corrupt_file_keeps_batch_shape(tmp_path, rng):
    """A corrupt image must not shrink the batch: the jitted train step is
    traced for a fixed (batch_size, H, W, 3) shape, and under a mesh a
    non-divisible batch is a hard sharding error."""
    import cv2

    from hse_facerec_tf_tpu.train.data import DirectoryDataset

    (tmp_path / "c").mkdir()
    for j in range(7):
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "c" / f"{j}.jpg"), img)
    (tmp_path / "c" / "bad.jpg").write_bytes(b"not a jpeg")

    ds = DirectoryDataset(str(tmp_path), image_size=(16, 16))
    assert len(ds) == 8
    batches = list(ds.batches(4, epochs=1, seed=0))
    assert len(batches) == 2
    for imgs, labels in batches:
        assert imgs.shape == (4, 16, 16, 3)
        assert labels.shape == (4,)


def test_directory_dataset_abandoned_iterator_stops_producer(tmp_path, rng):
    """Breaking out of the batch loop must terminate the decode thread —
    q.put blocking forever on a full queue would leak a thread plus its
    prefetched float32 batches per abandoned iterator."""
    import threading
    import time

    import cv2

    from hse_facerec_tf_tpu.train.data import DirectoryDataset

    (tmp_path / "c").mkdir()
    for j in range(64):
        img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "c" / f"{j}.jpg"), img)

    ds = DirectoryDataset(str(tmp_path), image_size=(8, 8))
    before = threading.active_count()
    it = ds.batches(4, prefetch=1)  # endless epochs; tiny queue
    next(it)
    it.close()  # generator finally -> stop.set()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_labeled_dir_dataset(tmp_path, rng):
    import cv2

    from hse_facerec_tf_tpu.train.data import (LabeledDirDataset,
                                               age_label_from_dirname)

    for age_dir in ("25", "60", "notanage"):
        (tmp_path / age_dir).mkdir()
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / age_dir / "a.jpg"), img)

    ds = LabeledDirDataset(str(tmp_path), age_label_from_dirname,
                           image_size=(16, 16))
    assert len(ds.paths) == 2
    assert set(ds.labels.tolist()) == {25, 60}


def test_remat_train_step_matches(rng):
    """Remat step computes identical loss/grads to the plain step."""
    from hse_facerec_tf_tpu.train.face_id import make_optimizer, make_train_step

    cfg = TrainConfig(batch_size=4)
    params = init_mobilenet_params(jax.random.PRNGKey(0), n_classes=3)
    opt = make_optimizer(cfg)
    imgs = rng.rand(4, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 3, 4)
    key = jax.random.PRNGKey(1)
    outs = []
    for remat in (False, True):
        step = jax.jit(make_train_step(cfg, opt, augment=None, remat=remat))
        p2, _, m = step(params, opt.init(params), key,
                        np.asarray(imgs), np.asarray(labels))
        outs.append((m["loss"], np.asarray(p2["conv1"]["kernel"])))
    assert abs(float(outs[0][0]) - float(outs[1][0])) < 1e-5
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)
