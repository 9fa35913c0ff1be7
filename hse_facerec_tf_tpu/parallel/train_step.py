"""Multi-chip sharded training step (data parallel × tensor parallel).

The framework's models are small (13-95 MB, SURVEY.md §2.3), so the honest
distributed design is batch data parallelism; the one tensor dimension worth
sharding is the identity classifier (VGGFace2 trains 9131-way softmax over a
1024/2048-d embedding — ``facerec_keras_train.py:46-57``), whose logits matmul
and softmax shard cleanly over a 'model' axis. GSPMD inserts the collectives
(psum for the softmax normalizer, all-gathers at boundaries) from the sharding
annotations — no hand-written communication.

Mesh layout: ('data', 'model'); batch → 'data', classifier kernel columns →
'model', everything else replicated.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..models.mobilenet import init_mobilenet_params
from ..train.face_id import make_optimizer, make_train_step


def face_id_param_shardings(mesh: Mesh, params: Dict):
    """Sharding pytree: classifier kernel (D, C) → P(None, 'model'),
    classifier bias (C,) → P('model'), all backbone weights replicated."""
    repl = NamedSharding(mesh, P())

    def assign(path_params, is_classifier):
        if not is_classifier:
            return jax.tree.map(lambda _: repl, path_params)
        return {
            "kernel": NamedSharding(mesh, P(None, "model")),
            "bias": NamedSharding(mesh, P("model")),
        }

    return {k: assign(v, k == "classifier") for k, v in params.items()}


def make_sharded_face_id_trainer(mesh: Mesh, n_classes: int,
                                 cfg: TrainConfig = None, seed: int = 0,
                                 remat: bool = False,
                                 compute_dtype=None):
    """Returns (params, opt_state, step_fn) with dp×tp shardings applied.

    step_fn(params, opt_state, key, images, labels) -> (params, opt_state,
    metrics); images are sharded over 'data', the classifier over 'model'.
    ``compute_dtype`` overrides the backbone activation dtype (default bf16;
    the dryrun passes f32 for deterministic sharded-vs-single assertions).
    """
    import jax.numpy as _jnp

    cfg = cfg or TrainConfig()
    params = init_mobilenet_params(jax.random.PRNGKey(seed), n_classes=n_classes)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer, augment=None, remat=remat,
                           compute_dtype=compute_dtype or _jnp.bfloat16)

    p_shard = face_id_param_shardings(mesh, params)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    # Optimizer-state shardings STRUCTURALLY: any opt-state subtree shaped
    # exactly like the param pytree (adam mu/nu) gets the param shardings;
    # every other leaf (counts, schedule scalars) is replicated. The r3
    # shape-matching heuristic ("any (·, n_classes) / (n_classes,) leaf is
    # the classifier's moment") also caught the 64-channel BN params'
    # moments at n_classes=64 and silently sharded them over 'model' —
    # benign-but-unintended layout the r4 value-asserting dryrun surfaced.
    p_struct = jax.tree.structure(params)

    def opt_shardings(state):
        def is_param_tree(node):
            try:
                return jax.tree.structure(node) == p_struct
            except Exception:
                return False

        return jax.tree.map(
            lambda node: p_shard if is_param_tree(node) else repl,
            state, is_leaf=is_param_tree)

    o_shard = opt_shardings(opt_state)
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, o_shard)

    step_fn = jax.jit(
        step,
        in_shardings=(p_shard, o_shard, repl, data, data),
        out_shardings=(p_shard, o_shard, repl),
        donate_argnums=(0, 1),
    )
    return params, opt_state, step_fn


def make_sharded_age_gender_trainer(mesh: Mesh, lr: float = 1e-3,
                                    freeze_backbone: bool = False,
                                    seed: int = 0, width: float = 1.0,
                                    compute_dtype=None, augment="default"):
    """Mesh-sharded alternating multi-task age/gender steps (the reference's
    ``train_age_gender`` loop, ``age_gender_train.py:194-232``, as SPMD).

    The heads are tiny (1024→256→100/1), so the honest layout is pure batch
    data parallelism over the WHOLE mesh (both axes), params replicated —
    GSPMD turns the gradient reductions into psums over ICI. Each task owns
    its own Adam state (the reference's separately-compiled age_model /
    gender_model, ``age_gender_train.py:243-245``). ``augment`` defaults to
    the reference's generator policy (``age_gender_train.py:127-133``), the
    same default as the single-device ``AgeGenderTrainer`` — pass None for
    bare batches. GSPMD keeps the augmented step value-identical to a
    single-device run with the same key. Returns
    (params, age_opt_state, gender_opt_state, age_step, gender_step,
    batch_sharding)."""
    from ..models.mobilenet import init_mobilenet_params
    from ..train.age_gender import (init_head_params, make_optimizer as
                                    make_ag_optimizer, make_steps)
    from ..train.augment import AugmentConfig

    if augment == "default":
        augment = AugmentConfig()
    kb, kh = jax.random.split(jax.random.PRNGKey(seed))
    params = {"backbone": init_mobilenet_params(kb, width=width),
              **init_head_params(kh, backbone_dim=max(8, int(1024 * width)))}
    age_opt = make_ag_optimizer(lr, freeze_backbone, task="age")
    gender_opt = make_ag_optimizer(lr, freeze_backbone, task="gender")
    age_opt_state = age_opt.init(params)
    gender_opt_state = gender_opt.init(params)
    age_step, gender_step = make_steps(age_opt, gender_opt,
                                       freeze_backbone=freeze_backbone,
                                       jit=False, augment=augment,
                                       compute_dtype=compute_dtype or jnp.bfloat16)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(tuple(mesh.axis_names)))  # DP over all axes
    params = jax.device_put(params, repl)
    age_opt_state = jax.device_put(age_opt_state, repl)
    gender_opt_state = jax.device_put(gender_opt_state, repl)

    def jit_step(step):
        return jax.jit(step,
                       in_shardings=(repl, repl, repl, data, data),
                       out_shardings=(repl, repl, repl),
                       donate_argnums=(0, 1))

    return (params, age_opt_state, gender_opt_state,
            jit_step(age_step), jit_step(gender_step), data)


def run_one_sharded_age_gender_pair(mesh: Mesh, batch: int = None,
                                    image_size: int = 32, seed: int = 0,
                                    compute_dtype=None):
    """One alternating (age, gender) sharded step pair on tiny shapes —
    driver dry run + tests."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    batch = batch or 2 * n_dev
    params, age_os, gender_os, age_step, gender_step, _ = \
        make_sharded_age_gender_trainer(mesh, width=0.25, seed=seed,
                                        compute_dtype=compute_dtype)
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(batch, image_size, image_size, 3)
                         .astype(np.float32) * 2 - 1)
    ages = jnp.asarray(rng.randint(0, 100, batch))
    genders = jnp.asarray(rng.randint(0, 2, batch))
    key = jax.random.PRNGKey(seed)
    params, age_os, m1 = age_step(params, age_os, key, images, ages)
    params, gender_os, m2 = gender_step(params, gender_os, key, images, genders)
    jax.block_until_ready(m2["gender_loss"])
    return {**{k: float(v) for k, v in m1.items()},
            **{k: float(v) for k, v in m2.items()}}


def run_one_sharded_step(mesh: Mesh, n_classes: int = 64, batch: int = None,
                         image_size: int = 32, seed: int = 0,
                         compute_dtype=None):
    """Initialize + execute exactly one sharded train step on tiny shapes.
    Used by the driver's multi-chip dry run and by tests."""
    dp = mesh.shape["data"]
    batch = batch or max(2 * dp, dp)
    params, opt_state, step_fn = make_sharded_face_id_trainer(
        mesh, n_classes, compute_dtype=compute_dtype)
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(batch, image_size, image_size, 3)
                         .astype(np.float32) * 2 - 1)
    labels = jnp.asarray(rng.randint(0, n_classes, batch))
    key = jax.random.PRNGKey(seed)
    params, opt_state, metrics = step_fn(params, opt_state, key, images, labels)
    jax.block_until_ready(metrics["loss"])
    return {k: float(v) for k, v in metrics.items()}
