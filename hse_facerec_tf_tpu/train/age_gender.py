"""Multi-task age + gender head training over a face-embedding backbone.

The reference trains its multi-output net in an unusual *alternating-batch*
loop because the age labels (IMDB-wiki year dirs) and gender labels live in
different directory trees (``age_gender_train.py:139-159,194-232``): each
optimization step consumes either an age batch (100-way softmax head) or a
gender batch (sigmoid head), both updating the shared trunk. A two-phase
schedule freezes the backbone first (3 epochs @1e-3) then fine-tunes
everything (30 epochs @1e-4) (:240-269).

This module reproduces that training scheme TPU-first: two jitted donated
steps (age / gender) over one shared param pytree, backbone freezing via a
masked optimizer, dropout on device, bf16 backbone compute.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..models.layers import dense, global_avg_pool
from ..models.mobilenet import (init_mobilenet_params, mobilenet_v1_backbone,
                                update_bn_stats)
from .augment import AugmentConfig, augment_batch

N_AGE_BINS = 100
FEATS_DIM = 256


def init_head_params(rng: jax.Array, backbone_dim: int = 1024) -> Dict:
    k1, k2, k3 = jax.random.split(rng, 3)

    def glorot(key, shape):
        limit = np.sqrt(6.0 / (shape[0] + shape[1]))
        return jax.random.uniform(key, shape, jnp.float32, -limit, limit)

    return {
        "feats": {"kernel": glorot(k1, (backbone_dim, FEATS_DIM)),
                  "bias": jnp.zeros((FEATS_DIM,))},
        "age": {"kernel": glorot(k2, (FEATS_DIM, N_AGE_BINS)),
                "bias": jnp.zeros((N_AGE_BINS,))},
        "gender": {"kernel": glorot(k3, (FEATS_DIM, 1)),
                   "bias": jnp.zeros((1,))},
    }


def forward(params: Dict, images, *, train: bool = False, dropout_key=None,
            dropout_rate: float = 0.5, precision=jax.lax.Precision.DEFAULT,
            backbone_train: bool = None, compute_dtype=jnp.bfloat16):
    """Shared trunk -> (age_logits, gender_logit, bn_stats).

    ``backbone_train`` decouples the trunk's BN mode from head training: in
    the frozen phase the backbone must run inference-mode BN with untouched
    running statistics (the reference's trainable=False Keras base), while
    dropout on the heads still follows ``train``."""
    if backbone_train is None:
        backbone_train = train
    stats: Dict = {}
    h = mobilenet_v1_backbone(params["backbone"], images, precision=precision,
                              compute_dtype=compute_dtype, train=backbone_train,
                              stats_out=stats if backbone_train else None)
    emb = global_avg_pool(h).astype(jnp.float32)
    if train and dropout_key is not None:
        k1, k2 = jax.random.split(dropout_key)
        keep = 1.0 - dropout_rate
        emb = emb * jax.random.bernoulli(k1, keep, emb.shape) / keep
    f = jax.nn.relu(dense(emb, params["feats"]["kernel"], params["feats"]["bias"],
                          precision=precision))
    if train and dropout_key is not None:
        f = f * jax.random.bernoulli(k2, 1.0 - dropout_rate, f.shape) / (1.0 - dropout_rate)
    age_logits = dense(f, params["age"]["kernel"], params["age"]["bias"],
                       precision=precision)
    gender_logit = dense(f, params["gender"]["kernel"], params["gender"]["bias"],
                         precision=precision)[:, 0]
    return age_logits, gender_logit, stats


L2_REG = 4e-5           # kernel_regularizer=l2(4e-5) (:178-181)
ADAM_DECAY = 1e-6       # Adam(lr, decay=1e-6) (:243,262)


def make_optimizer(lr: float, freeze_backbone: bool,
                   task: Optional[str] = None) -> optax.GradientTransformation:
    """Per-task Adam with the reference's legacy-Keras lr decay
    ``lr/(1 + 1e-6·t)``.

    ``task``: 'age' or 'gender' — the OTHER head is excluded from updates.
    The reference compiles age_model and gender_model separately
    (:243-245), so each task owns its own Adam slots and never moves the
    other task's head; a shared Adam state would drift the idle head
    through stale momentum even at zero gradient."""
    adam = optax.adam(lambda t: lr / (1.0 + ADAM_DECAY * t))
    other = {"age": "gender", "gender": "age"}.get(task)
    if not freeze_backbone and other is None:
        return adam

    def label_tree(params):
        # zero out backbone updates during the frozen phase (:240-247)
        return {k: ("frozen" if (freeze_backbone and k == "backbone")
                    or k == other else "train") for k in params}

    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, label_tree)


def _l2_penalty(params: Dict, heads) -> jnp.ndarray:
    """Keras ``l2(4e-5)`` adds ``4e-5·Σw²`` per regularized kernel to the
    LOSS; each reference task model contains ``feats`` plus its own head
    Dense (:178-181), never the other task's."""
    return L2_REG * sum(jnp.sum(jnp.square(params[h]["kernel"]))
                        for h in heads)


def make_steps(age_optimizer: optax.GradientTransformation,
               gender_optimizer: Optional[optax.GradientTransformation] = None,
               bn_momentum: float = 0.99,
               freeze_backbone: bool = False, jit: bool = True,
               compute_dtype=jnp.bfloat16,
               augment: Optional["AugmentConfig"] = None):
    """Two donated jitted steps sharing the param pytree, each with its OWN
    optimizer/state (the reference's separately-compiled age_model /
    gender_model, :243-245). ``jit=False`` returns the raw functions for
    callers that apply their own jit with mesh shardings —
    parallel/train_step.py. Step signature:
    ``step(params, own_opt_state, key, images, labels)``.

    With ``freeze_backbone`` the trunk runs inference-mode BN and its running
    statistics stay untouched (the reference's frozen Keras base — a frozen
    TF2 layer does not update BN moments).

    ``augment`` applies the reference's ImageDataGenerator policy on device
    before the forward — BOTH its training loops feed generator-augmented
    batches through the same ``train_datagen`` (shear .3 / rot 10 / zoom .2 /
    shift .1 / hflip, ``age_gender_train.py:127-133``), so the alternating
    age/gender steps augment exactly like the face-id step. None (default)
    keeps the raw batch."""
    if gender_optimizer is None:
        gender_optimizer = age_optimizer
    backbone_train = not freeze_backbone

    def maybe_augment(key, images):
        if augment is None:
            return key, images
        akey, key = jax.random.split(key)
        return key, augment_batch(akey, images, augment)

    def maybe_update(params, stats):
        if freeze_backbone:
            return params
        return {**params, "backbone": update_bn_stats(params["backbone"], stats,
                                                      bn_momentum)}

    def age_step(params, opt_state, key, images, ages):
        key, images = maybe_augment(key, images)

        def loss(p):
            age_logits, _, stats = forward(p, images, train=True, dropout_key=key,
                                           backbone_train=backbone_train,
                                           compute_dtype=compute_dtype)
            ce = optax.softmax_cross_entropy_with_integer_labels(age_logits, ages).mean()
            ce = ce + _l2_penalty(p, ("feats", "age"))
            acc = jnp.mean(jnp.argmax(age_logits, -1) == ages)
            return ce, (stats, acc)

        (l, (stats, acc)), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = age_optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = maybe_update(params, stats)
        return params, opt_state, {"age_loss": l, "age_acc": acc}

    def gender_step(params, opt_state, key, images, genders):
        key, images = maybe_augment(key, images)

        def loss(p):
            _, gender_logit, stats = forward(p, images, train=True, dropout_key=key,
                                             backbone_train=backbone_train,
                                             compute_dtype=compute_dtype)
            bce = optax.sigmoid_binary_cross_entropy(gender_logit,
                                                     genders.astype(jnp.float32)).mean()
            bce = bce + _l2_penalty(p, ("feats", "gender"))
            acc = jnp.mean((gender_logit > 0) == (genders > 0.5))
            return bce, (stats, acc)

        (l, (stats, acc)), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = gender_optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = maybe_update(params, stats)
        return params, opt_state, {"gender_loss": l, "gender_acc": acc}

    if not jit:
        return age_step, gender_step
    return (jax.jit(age_step, donate_argnums=(0, 1)),
            jax.jit(gender_step, donate_argnums=(0, 1)))


class AgeGenderTrainer:
    def __init__(self, backbone_params: Optional[Dict] = None, seed: int = 0,
                 cfg: Optional[TrainConfig] = None,
                 augment: Optional[AugmentConfig] = AugmentConfig()):
        self.cfg = cfg or TrainConfig()
        self.augment = augment
        key = jax.random.PRNGKey(seed)
        kb, kh = jax.random.split(key)
        if backbone_params is None:
            backbone_params = init_mobilenet_params(kb)
        backbone_params = {k: v for k, v in backbone_params.items()
                           if k != "classifier"}
        self.params = {"backbone": backbone_params, **init_head_params(kh)}
        self.key = jax.random.PRNGKey(seed + 2)
        self._eval_fwd = jax.jit(lambda p, x: forward(p, x)[:2])
        self._configure(self.cfg.learning_rate, freeze_backbone=True)

    def _configure(self, lr: float, freeze_backbone: bool):
        # one optimizer/state per task — the reference's separately
        # compiled age_model/gender_model (:243-245)
        self.age_optimizer = make_optimizer(lr, freeze_backbone, task="age")
        self.gender_optimizer = make_optimizer(lr, freeze_backbone,
                                               task="gender")
        self.age_opt_state = self.age_optimizer.init(self.params)
        self.gender_opt_state = self.gender_optimizer.init(self.params)
        self._age_step, self._gender_step = make_steps(
            self.age_optimizer, self.gender_optimizer,
            freeze_backbone=freeze_backbone, augment=self.augment)

    def unfreeze(self, lr: Optional[float] = None):
        """Phase 2: fine-tune the whole network (:249-269)."""
        self._configure(lr or self.cfg.finetune_learning_rate, freeze_backbone=False)

    def train_alternating(self, age_batches: Iterator, gender_batches: Iterator,
                          steps: int) -> Dict[str, float]:
        """Interleave age and gender batches 1:1 (:194-232)."""
        metrics: Dict = {}
        for s in range(steps):
            self.key, sub = jax.random.split(self.key)
            if s % 2 == 0:
                images, ages = next(age_batches)
                self.params, self.age_opt_state, m = self._age_step(
                    self.params, self.age_opt_state, sub,
                    jnp.asarray(images, jnp.float32), jnp.asarray(ages))
            else:
                images, genders = next(gender_batches)
                self.params, self.gender_opt_state, m = self._gender_step(
                    self.params, self.gender_opt_state, sub,
                    jnp.asarray(images, jnp.float32), jnp.asarray(genders))
            metrics = {**metrics, **m}
        # device values accumulate asynchronously; ONE fetch at the end —
        # per-step float() conversions would block a round trip per metric
        return {k: float(v) for k, v in jax.device_get(metrics).items()}

    def evaluate(self, images: np.ndarray, ages: np.ndarray, genders: np.ndarray,
                 batch_size: int = 64) -> Dict[str, float]:
        age_ok = gender_ok = 0
        for i in range(0, len(images), batch_size):
            al, gl = jax.device_get(self._eval_fwd(
                self.params, jnp.asarray(images[i:i + batch_size], jnp.float32)))
            age_ok += int((np.argmax(al, -1) == ages[i:i + batch_size]).sum())
            gender_ok += int(((gl > 0) == (genders[i:i + batch_size] > 0.5)).sum())
        n = len(images)
        return {"age_acc": age_ok / n, "gender_acc": gender_ok / n}
