"""Multi-metric benchmark for the framework's four hot paths.

Headline metric (top-level keys, driver contract): fused multi-head embedding
throughput, batch 1024, f32-HIGH. The ``extra`` dict carries the rest of the
perf story:

  - embed_bf16_ips          — same path, bf16 compute on the MXU
  - embed_int8_ips          — full-int8 serving path (int8 activations +
                              int8 MXU pointwise matmuls) + its f32 cosine
  - detect_ms_per_image     — full MTCNN cascade @640x480, single image
  - detect_batch_ips        — vmapped cascade, batch 8 @640x480
  - analyze_ms_per_image    — fused detect+crop+3-heads program @640x480
  - analyze_batch8_ips      — vmapped fused analyze, batch 8 (album scan)
  - train_face_id_ips       — fused face-ID train step, batch 256, 9131-way
  - roofline                — per-path FLOPs / bytes, achieved TFLOP/s and
                              GB/s vs v5e peaks in TWO accountings: *_model
                              (whole-program XLA cost analysis over wall
                              throughput) and *_busy (trace bytes over
                              device-busy time); ``bound`` derives from the
                              busy fraction when a profile exists. Both are
                              cost-MODEL bytes, not DMA counters — see
                              BYTES_MODEL_NOTE.

All device timings chain CHAIN iterations inside one jit program (the
host<->device tunnel costs ~32 ms per round trip; production pipelines stream
batches without per-batch host syncs). Chaining styles, measured (r3):

  - the embed path Python-UNROLLS the chain with ``x = x + 1e-6`` between
    iterations (defeats CSE). A ``lax.fori_loop`` with the perturbed input as
    a loop CARRY costs ~4% (the carry materializes a full-size buffer every
    iteration) and the loop form costs another ~4% (XLA pipelines independent
    unrolled forwards but not loop iterations) — this explains the r01→r02
    13,530→12,484 regression, which the unroll recovers.
  - the detection/analyze/kNN paths keep fori_loop (an unrolled chain-40
    cascade takes many minutes to compile) but hold the input LOOP-INVARIANT
    and perturb with the loop index, which fuses into the first op instead of
    re-materializing the input.

vs_baseline compares against the reference's execution model: batch-1 f32
inference (one ``sess.run`` per image, no batching — ``facerec_test.py:
390-394``, ``facial_analysis.py:108-109``) measured on the host CPU, cached
in .bench_cpu_baseline.json. BASELINE.md's north-star is >10x images/sec/chip
over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
CPU_BASELINE_CACHE = os.path.join(ROOT, ".bench_cpu_baseline.json")
BATCH = 1024
WARMUP = 2
ITERS = 4

# TPU v5e (v5 lite) single-chip peaks: 197 TFLOP/s bf16 MXU (394 is the
# int8 figure — r02's roofline used it by mistake, halving every reported
# MXU fraction), 819 GB/s HBM.
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def build_forward(precision, compute_dtype, bf16_blocks_below=0):
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.models.multihead import (import_multihead_params,
                                                     multihead_apply)
    from hse_facerec_tf_tpu.models.zoo import AGEGENDER_PB
    from hse_facerec_tf_tpu.ops.preprocess import IMAGENET_MEANS_BGR

    params = import_multihead_params(AGEGENDER_PB)
    means = jnp.asarray(IMAGENET_MEANS_BGR, dtype=jnp.float32)

    def forward(images):
        x = images.astype(jnp.float32)[..., ::-1] - means
        out = multihead_apply(params, x, precision=precision,
                              compute_dtype=compute_dtype,
                              bf16_blocks_below=bf16_blocks_below)
        return out.identity

    return forward, params


def measure_cpu_baseline():
    """Batch-1 f32 throughput on host CPU (reference execution model)."""
    if os.path.exists(CPU_BASELINE_CACHE):
        with open(CPU_BASELINE_CACHE) as f:
            return json.load(f)["images_per_sec"]
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    forward, _ = build_forward(jax.lax.Precision.HIGHEST, jnp.float32)
    fn = jax.jit(forward, device=cpu)
    x = jnp.asarray(np.random.rand(1, 224, 224, 3).astype(np.float32) * 255,
                    device=cpu)
    fn(x).block_until_ready()
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        fn(x).block_until_ready()
    ips = n / (time.perf_counter() - t0)
    with open(CPU_BASELINE_CACHE, "w") as f:
        json.dump({"images_per_sec": ips}, f)
    return ips


def _time_chained(many, x, chain, per_call, warmup=WARMUP, iters=ITERS):
    """Execute the chained jit program; return units/sec where one chained
    call covers ``per_call`` units (images).

    All ``iters`` calls are dispatched asynchronously and ONE result is
    fetched at the end: the device executes the queue back-to-back, so the
    wall time is iters×program + a single tunnel round trip, instead of
    paying the ~32 ms host-fetch RTT once per iteration (which shaved ~20%
    off every short-program throughput number in r02 — the r3 profiler
    traces showed the device timeline itself is gapless)."""
    for _ in range(warmup):
        np.asarray(many(x))
    t0 = time.perf_counter()
    outs = [many(x) for _ in range(iters)]   # async dispatch, in-order queue
    np.asarray(outs[-1])                      # single drain + fetch
    elapsed = time.perf_counter() - t0
    return per_call * iters / elapsed


def _chain_unrolled(step, chain):
    """Python-unrolled chain: fastest form (XLA pipelines the independent
    iterations); compile cost is fine for small-graph steps like the embed
    forward. ``x = x + 1e-6`` between iterations defeats CSE."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(x):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(chain):
            acc = acc + step(x)
            x = x + 1e-6
        return acc

    return many


def _chain_fori(step, chain):
    """Chain ``chain`` sequential iterations of ``step(eps, x) -> scalar``
    inside one jit via lax.fori_loop — same RTT amortization as Python
    unrolling with a compiled program that stays small (a chain-40 unrolled
    cascade takes many minutes to compile over the tunnel). The input is
    loop-INVARIANT; the index-derived ``eps`` perturbation defeats loop
    hoisting and fuses into the first op (a carried ``x + eps`` would
    re-materialize the full input buffer every iteration — measured ~4%)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(x):
        def body(i, acc):
            return acc + step(i.astype(jnp.float32) * 1e-6, x)
        return jax.lax.fori_loop(0, chain, body, jnp.zeros((), jnp.float32))

    return many


def _cost_analysis(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


# Both byte figures below are XLA COST-MODEL estimates, not DMA counters
# (r5 finding, VERDICT-4 #2): ``bytes_accessed`` charges every fusion
# operand/output at full size, including re-reads that physically come from
# VMEM — single detect fusions measure 1,020 "GB/s" against the 819 GB/s
# physical HBM roof. So busy-GB/s is an at-the-roof INDICATOR (≥~90% ≈
# traffic-bound; can read >100%), never a physical bandwidth measurement.
BYTES_MODEL_NOTE = (
    "bytes are XLA cost-model bytes_accessed (operands+outputs at full "
    "size, VMEM-resident re-reads included), not DMA counters; per-fusion "
    "GB/s can exceed the physical 819 GB/s peak (detect fusion.1443 "
    "measures 1,020), so pct_hbm_peak_* >= ~90 means traffic-bound at the "
    "roof, not a utilization percentage")


def _roofline_entry(flops_per_unit, bytes_per_unit, units_per_sec,
                    prof=None):
    """Achieved rates vs v5e peaks, from two byte accountings:

    - ``*_model``: whole-program XLA cost analysis over measured WALL
      throughput (scan/while bodies counted per their static structure —
      callers of scanned programs must divide by ONE body execution, see
      bench_train).
    - ``*_busy``: the fusion profile's trace bytes over device-BUSY time —
      the per-executed-fusion accounting (present when a profile was
      captured).

    ``bound`` derives from the BUSY traffic fraction when available
    (VERDICT-4 #2: the model/wall number under-counted scanned steps and
    mislabeled the roofed train step "vpu/other"), else from the model.
    "vpu/other" means neither the MXU-FLOPs nor the HBM-bytes fraction is
    substantial: time goes to work this model can't see (elementwise VPU
    ops, transposes/reductions)."""
    tflops = flops_per_unit * units_per_sec / 1e12
    gbs = bytes_per_unit * units_per_sec / 1e9
    mxu_frac = tflops / V5E_PEAK_BF16_TFLOPS
    hbm_frac = gbs / V5E_PEAK_HBM_GBS
    entry = {
        "flops_per_image": round(flops_per_unit / 1e9, 2),       # GFLOP
        "bytes_per_image_model": round(bytes_per_unit / 1e6, 2),  # MB
        "achieved_tflops": round(tflops, 2),
        "achieved_hbm_gbs_model": round(gbs, 1),
        "pct_mxu_peak_bf16": round(100 * mxu_frac, 1),
        "pct_hbm_peak_model": round(100 * hbm_frac, 1),
    }
    if prof is not None and prof.get("busy_ms"):
        busy_gbs = prof["hbm_gbs_busy"]
        entry["achieved_hbm_gbs_busy"] = busy_gbs
        entry["pct_hbm_peak_busy"] = round(100 * busy_gbs / V5E_PEAK_HBM_GBS, 1)
        hbm_frac = busy_gbs / V5E_PEAK_HBM_GBS
    bound = "hbm" if hbm_frac >= mxu_frac else "mxu"
    if max(mxu_frac, hbm_frac) < 0.25:
        bound = "vpu/other"
    entry["bound"] = bound
    return entry


def profile_fusions(many, x, label, top: int = 8):
    """Per-fusion device-time table for one chained call (VERDICT-2 #2:
    decompose the bandwidth story per fusion instead of asserting it) —
    thin wrapper over the profiling subsystem's
    ``utils.profiling.fusion_profile``."""
    from hse_facerec_tf_tpu.utils.profiling import fusion_profile

    prof = fusion_profile(lambda: np.asarray(many(x)), top=top)
    if prof is not None:
        prof["path"] = label
    return prof


def bench_embed(precision, compute_dtype, chain=10):
    import jax
    import jax.numpy as jnp

    forward, _ = build_forward(precision, compute_dtype)
    many = _chain_unrolled(lambda x: forward(x)[0, 0].astype(jnp.float32), chain)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 224, 224, 3).astype(np.float32) * 255)
    ips = _time_chained(many, x, chain, BATCH * chain)
    flops, bytes_ = _cost_analysis(jax.jit(forward).lower(x).compile())
    prof = profile_fusions(many, x, f"embed_{compute_dtype.__name__}")
    roofline = _roofline_entry(flops / BATCH, bytes_ / BATCH, ips, prof)
    if prof is not None and prof["busy_ms"]:
        # device-busy rate: what the chip itself sustains, excluding the
        # host-side dispatch/fetch overhead still in the wall number
        prof["busy_ms_per_forward"] = round(prof["busy_ms"] / chain, 2)
        prof["device_ips_busy"] = round(BATCH * chain / (prof["busy_ms"] / 1e3), 1)
        roofline["fusion_profile"] = prof
    return ips, forward, x, roofline


def bench_embed_int8(chain=10):
    """Full-int8 serving path (models/int8_infer.py): int8 activations +
    int8 MXU pointwise matmuls. Returns (ips, roofline, cosine_vs_f32)."""
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.models.int8_infer import (multihead_apply_int8,
                                                      quantize_multihead_int8)
    from hse_facerec_tf_tpu.models.multihead import import_multihead_params
    from hse_facerec_tf_tpu.models.zoo import AGEGENDER_PB
    from hse_facerec_tf_tpu.ops.preprocess import IMAGENET_MEANS_BGR

    params = import_multihead_params(AGEGENDER_PB)
    qparams = quantize_multihead_int8(params)
    means = jnp.asarray(IMAGENET_MEANS_BGR, dtype=jnp.float32)

    def forward(images):
        x = images.astype(jnp.float32)[..., ::-1] - means
        return multihead_apply_int8(qparams, x).identity

    many = _chain_unrolled(lambda x: forward(x)[0, 0].astype(jnp.float32), chain)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 224, 224, 3).astype(np.float32) * 255)
    ips = _time_chained(many, x, chain, BATCH * chain)
    flops, bytes_ = _cost_analysis(jax.jit(forward).lower(x).compile())
    prof = profile_fusions(many, x, "embed_int8")
    roofline = _roofline_entry(flops / BATCH, bytes_ / BATCH, ips, prof)
    # int8 MXU peak is 2x the bf16 figure: report the int8 fraction too
    roofline["pct_mxu_peak_int8"] = round(roofline["pct_mxu_peak_bf16"] / 2.0, 1)
    if prof is not None and prof["busy_ms"]:
        prof["busy_ms_per_forward"] = round(prof["busy_ms"] / chain, 2)
        prof["device_ips_busy"] = round(BATCH * chain / (prof["busy_ms"] / 1e3), 1)
        roofline["fusion_profile"] = prof

    # fidelity vs the f32-HIGHEST parity path on the same inputs
    f32_forward, _ = build_forward(jax.lax.Precision.HIGHEST, jnp.float32)
    a = np.asarray(jax.jit(forward)(x)[:8], dtype=np.float64)
    b = np.asarray(jax.jit(f32_forward)(x)[:8], dtype=np.float64)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) *
                               np.linalg.norm(b, axis=-1))
    return ips, roofline, float(cos.min())


def bench_detection(chain=40):
    """Full MTCNN cascade @640x480: single-image ms and batch-8 images/sec."""
    import cv2
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.models.zoo import MTCNN_PB
    from hse_facerec_tf_tpu.pipelines.detector import MTCNNDetector
    from hse_facerec_tf_tpu.utils.image_io import imread_rgb

    fixture = os.path.join(os.path.dirname(MTCNN_PB), "test_image.jpg")
    img = cv2.resize(imread_rgb(fixture), (640, 480))
    det = MTCNNDetector.from_pb(MTCNN_PB, minsize=40)

    one = det.detect_fn(480, 640)

    def step_single(eps, x):
        boxes, scores, _, valid, _ = one(x + eps)
        return jnp.sum(scores * valid)

    many_single = _chain_fori(step_single, chain)
    x = jnp.asarray(img.astype(np.float32))
    single_ips = _time_chained(many_single, x, chain, chain)

    nb = 8
    batch_fn = det.detect_batch_fn(480, 640)

    def step_batch(eps, xb):
        boxes, scores, _, valid, _ = batch_fn(xb + eps)
        return jnp.sum(scores * valid)

    many_batch = _chain_fori(step_batch, chain)
    xb = jnp.asarray(np.tile(img.astype(np.float32)[None], (nb, 1, 1, 1)))
    batch_ips = _time_chained(many_batch, xb, chain, nb * chain)

    flops, bytes_ = _cost_analysis(jax.jit(lambda a: batch_fn(a)).lower(xb).compile())
    # detect is the furthest-from-roof major path:
    # decompose it per fusion like the embed paths
    prof = profile_fusions(many_batch, xb, "detect_batch8")
    roofline = _roofline_entry(flops / nb, bytes_ / nb, batch_ips, prof)
    if prof is not None and prof["busy_ms"]:
        prof["busy_ms_per_forward"] = round(prof["busy_ms"] / chain, 2)
        prof["device_ips_busy"] = round(nb * chain / (prof["busy_ms"] / 1e3), 1)
        roofline["fusion_profile"] = prof
    return 1000.0 / single_ips, batch_ips, img, roofline


def bench_analyze(img, chain=40):
    """Fused detect+crop+3-heads program @640x480: single-image ms (the
    analyze CLI path) and the vmapped batch-8 images/sec (the album-scan
    path, AlbumOrganizer.scan_album batching)."""
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.models.zoo import AGEGENDER_PB, MTCNN_PB
    from hse_facerec_tf_tpu.pipelines.analyzer import FacialAnalyzer

    analyzer = FacialAnalyzer.from_reference_models(MTCNN_PB, AGEGENDER_PB,
                                                    minsize=40)
    fn = analyzer._analyze_fn(480, 640)
    params = analyzer.mh_params

    def step(eps, x):
        out = fn(params, x + eps)
        return jnp.sum(out[5]) + jnp.sum(out[6])   # ages + genders
    many = _chain_fori(step, chain)
    x = jnp.asarray(img.astype(np.float32))
    ips = _time_chained(many, x, chain, chain)

    flops, bytes_ = _cost_analysis(
        jax.jit(lambda a: fn(params, a)).lower(x).compile())
    roofline = _roofline_entry(flops, bytes_, ips)

    nb = 8
    # the single-device batch path: vmapped detect + cross-lane-compacted
    # crop/head pass (what analyze_batch runs)
    bfn = jax.jit(analyzer._build_batch_compact_fn(480, 640, max(16, 2 * nb)))

    def step_batch(eps, xb):
        out = bfn(params, xb + eps)
        return jnp.sum(out[5]) + jnp.sum(out[6])
    many_b = _chain_fori(step_batch, chain)
    xb = jnp.asarray(np.tile(img.astype(np.float32)[None], (nb, 1, 1, 1)))
    batch_ips = _time_chained(many_b, xb, chain, nb * chain)
    return 1000.0 / ips, batch_ips, roofline


def bench_train(chain=8, batch=256, size=224, n_classes=9131):
    """Face-ID training throughput: the full fused train step (augment +
    bf16 forward + backward + Adam + BN-stat update) at the reference's
    class count (VGGFace2, 9131 — ``facerec_test.py:325-334``) and image
    size. Steps chain via lax.scan inside one jit (state-carried), so the
    tunnel RTT amortizes exactly as in a real epoch loop."""
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.config import TrainConfig
    from hse_facerec_tf_tpu.models.mobilenet import init_mobilenet_params
    from hse_facerec_tf_tpu.train.augment import AugmentConfig
    from hse_facerec_tf_tpu.train.face_id import make_optimizer, make_train_step

    cfg = TrainConfig()
    optimizer = make_optimizer(cfg)
    step = make_train_step(cfg, optimizer, AugmentConfig())
    params = init_mobilenet_params(jax.random.PRNGKey(1), n_classes=n_classes)
    opt_state = optimizer.init(params)

    @jax.jit
    def many(params, opt_state, keys, images, labels):
        def body(carry, key):
            p, o = carry
            p, o, m = step(p, o, key, images, labels)
            return (p, o), m["loss"]
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), keys)
        return losses[-1]

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, n_classes, batch))
    keys = jax.random.split(jax.random.PRNGKey(0), chain)
    loss = np.asarray(many(params, opt_state, keys, images, labels))
    assert np.isfinite(loss), f"train bench diverged: loss={loss}"
    t0 = time.perf_counter()
    iters = 3
    outs = [many(params, opt_state, keys, images, labels)
            for _ in range(iters)]           # async dispatch, single drain
    np.asarray(outs[-1])
    ips = batch * chain * iters / (time.perf_counter() - t0)
    flops, bytes_ = _cost_analysis(
        many.lower(params, opt_state, keys, images, labels).compile())
    # XLA cost analysis counts the lax.scan BODY ONCE regardless of trip
    # count (verified r5: the chain-8 program reported exactly 1/8 of the
    # step's flops), so the lowered cost IS one step's cost — divide by
    # batch only. r4's /(batch*chain) under-counted 8x and mislabeled the
    # roofed step "vpu/other" (VERDICT-4 #2).
    prof = profile_fusions(
        lambda x: many(params, opt_state, keys, x, labels), images, "train",
        top=6)
    roofline = _roofline_entry(flops / batch, bytes_ / batch, ips, prof)
    if prof is not None and prof["busy_ms"]:
        # r3 finding: ~40% of the step is the augmentation warp — the
        # Catmull-Smith per-line matmuls materialize dense (N,224,224,224)
        # bf16 hat-weight tensors (~5.8 GB/pass) that bound the step on
        # weight-tensor HBM traffic; the 4-tap gather alternative measured
        # 18x slower (train/augment.py docstring), so this is the fastest
        # known form
        prof["ms_per_step"] = round(prof["busy_ms"] / chain, 2)
        roofline["fusion_profile"] = prof
    return ips, roofline


def bench_train_age_gender(chain=8, batch=256, size=224):
    """Alternating multi-task age/gender training throughput — the
    reference's OTHER training loop (``age_gender_train.py:194-232``
    interleaves age and gender batches over one shared param pytree).
    One 'pair' = one age step + one gender step, chained via lax.scan."""
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.train.age_gender import (init_head_params,
                                                     make_optimizer,
                                                     make_steps)
    from hse_facerec_tf_tpu.models.mobilenet import init_mobilenet_params

    kb, kh = jax.random.split(jax.random.PRNGKey(3))
    backbone = init_mobilenet_params(kb)
    backbone.pop("classifier", None)
    params = {"backbone": backbone, **init_head_params(kh)}
    age_opt = make_optimizer(1e-4, freeze_backbone=False, task="age")
    gender_opt = make_optimizer(1e-4, freeze_backbone=False, task="gender")
    age_os = age_opt.init(params)
    gender_os = gender_opt.init(params)
    # augmented steps (r4): the reference trains BOTH loops on
    # generator-augmented batches (age_gender_train.py:127-133); with the
    # Pallas warp the policy costs ~2.7 ms/batch so the bench now measures
    # the reference's actual workload (r3's number was un-augmented)
    from hse_facerec_tf_tpu.train.augment import AugmentConfig
    age_step, gender_step = make_steps(age_opt, gender_opt, jit=False,
                                       augment=AugmentConfig())

    @jax.jit
    def many(params, age_os, gender_os, keys, images, ages, genders):
        def body(carry, key):
            p, oa, og = carry
            ka, kg = jax.random.split(key)
            p, oa, m1 = age_step(p, oa, ka, images, ages)
            p, og, m2 = gender_step(p, og, kg, images, genders)
            return (p, oa, og), m1["age_loss"] + m2["gender_loss"]
        (params, age_os, gender_os), losses = jax.lax.scan(
            body, (params, age_os, gender_os), keys)
        return losses[-1]

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    ages = jnp.asarray(rng.randint(0, 100, batch))
    genders = jnp.asarray(rng.randint(0, 2, batch))
    keys = jax.random.split(jax.random.PRNGKey(0), chain)
    loss = np.asarray(many(params, age_os, gender_os, keys, images, ages, genders))
    assert np.isfinite(loss), f"age/gender train bench diverged: loss={loss}"
    t0 = time.perf_counter()
    iters = 2
    outs = [many(params, age_os, gender_os, keys, images, ages, genders)
            for _ in range(iters)]
    np.asarray(outs[-1])
    # images/sec counting each image once per age+gender PAIR of steps
    ips = batch * chain * iters / (time.perf_counter() - t0)
    flops, bytes_ = _cost_analysis(
        many.lower(params, age_os, gender_os, keys, images, ages,
                   genders).compile())
    # scan body (one age+gender PAIR) counted once by the cost model — see
    # bench_train; divide by batch only
    prof = profile_fusions(
        lambda x: many(params, age_os, gender_os, keys, x, ages, genders),
        images, "train_age_gender", top=6)
    roofline = _roofline_entry(flops / batch, bytes_ / batch, ips, prof)
    if prof is not None and prof["busy_ms"]:
        prof["ms_per_pair"] = round(prof["busy_ms"] / chain, 2)
        roofline["fusion_profile"] = prof
    return ips, roofline


def _make_synthetic_album(album_dir: str, n_photos: int = 64,
                          video_frames: int = 40):
    """Synthesize the reference's product input (``process_photos.py:
    238-298``): a photo album of mixed camera resolutions built from the
    shipped real-photo fixture (faces at several scales + pure-noise no-face
    photos) plus one short video clip. Returns (n_photos, n_videos)."""
    import cv2

    from hse_facerec_tf_tpu.models.zoo import AGEGENDER_PB
    from hse_facerec_tf_tpu.utils.image_io import imread_rgb

    fixture = os.path.join(os.path.dirname(AGEGENDER_PB), "test_image.jpg")
    base = imread_rgb(fixture)
    rng = np.random.RandomState(0)
    sizes = [(1024, 768), (800, 600), (640, 480)]   # (w, h) mixed "cameras"
    for i in range(n_photos):
        w, h = sizes[i % len(sizes)]
        if i % 4 == 3:     # a quarter of the album has no faces (noise)
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
        else:
            img = cv2.resize(base, (w, h))
            jitter = rng.randint(-12, 13, img.shape, np.int16)
            img = np.clip(img.astype(np.int16) + jitter, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(album_dir, f"photo_{i:03d}.jpg"),
                    img[:, :, ::-1])
    frame = cv2.resize(base, (640, 480))[:, :, ::-1]
    vw = cv2.VideoWriter(os.path.join(album_dir, "clip.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (640, 480))
    for i in range(video_frames):
        vw.write(np.roll(frame, i * 2, axis=1))
    vw.release()
    return n_photos, 1


def bench_album():
    """End-to-end album organize throughput — the reference's product loop
    (``process_photos.py:219-370``): decode (DCT-bounded) → batched analyze
    → cluster → Dempster-Shafer gender → cluster/public outputs, measured in
    photos/sec over a 64-photo synthetic album + one video clip. This is the
    number a user of the reference's organizer experiences, host work
    included — the component benches above exclude decode/IO."""
    import shutil
    import tempfile

    from hse_facerec_tf_tpu.config import AlbumConfig
    from hse_facerec_tf_tpu.models import zoo
    from hse_facerec_tf_tpu.pipelines.album import AlbumOrganizer
    from hse_facerec_tf_tpu.pipelines.analyzer import FacialAnalyzer

    album_dir = tempfile.mkdtemp(prefix="bench_album_")
    try:
        n_photos, n_videos = _make_synthetic_album(album_dir)
        analyzer = FacialAnalyzer.from_reference_models(
            zoo.MTCNN_PB, zoo.AGEGENDER_PB)
        cfg = AlbumConfig(min_days_difference=0)
        organizer = AlbumOrganizer(analyzer, cfg, analyze_batch=8,
                                   downscale=(640, 480))
        # warm the shape buckets AND the output writers (matplotlib's
        # first import alone is ~2 s — steady-state albums don't pay it),
        # then time a COLD-cache scan: use_cache=False so decode+analyze
        # all rerun
        organizer.process_album(album_dir, use_cache=False, write_outputs=True)
        organizer.timer.reset()     # drop warm-run samples from the split
        t0 = time.perf_counter()
        result = organizer.process_album(album_dir, use_cache=False,
                                         write_outputs=True)
        elapsed = time.perf_counter() - t0
        return {
            "album_photos_per_sec": round(n_photos / elapsed, 1),
            "album_total_s": round(elapsed, 2),
            "album_n_photos": n_photos,
            "album_n_videos": n_videos,
            "album_n_faces": result["n_faces"],
            "album_n_clusters": len(result["clusters"]),
            # wall-phase + per-stage split (VERDICT-4 #3): which host cost
            # dominates the 99%-host-bound product loop
            "album_timings": result.get("timings", {}),
        }
    finally:
        shutil.rmtree(album_dir, ignore_errors=True)


def bench_serve(n_clients: int = 12, requests_per_client: int = 16):
    """Serving-layer latency/throughput under concurrency: spin the real
    HTTP server (embed worker + cross-request batching, serve.py) on a local
    port and hammer /embed from ``n_clients`` threads. Reports p50/p95
    request latency and coalesced throughput — the production pattern the
    reference's per-image ``sess.run`` loop (``facerec_test.py:390-394``)
    cannot express."""
    import http.client
    import io
    import threading

    from hse_facerec_tf_tpu.serve import build_server

    from PIL import Image

    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8)).save(
        buf, format="JPEG")
    payload = buf.getvalue()

    server = build_server(port=0, with_analyzer=False, prewarm=True)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def one_request():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            t0 = time.perf_counter()
            conn.request("POST", "/embed", body=payload,
                         headers={"Content-Type": "image/jpeg"})
            resp = conn.getresponse()
            body = resp.read()
            conn.close()
            assert resp.status == 200, body[:200]
            return time.perf_counter() - t0

        one_request()   # warm the compile outside the timed region

        lat = []
        lock = threading.Lock()

        def client():
            for _ in range(requests_per_client):
                dt = one_request()
                with lock:
                    lat.append(dt)

        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        elapsed = time.perf_counter() - t0
        a = np.asarray(lat) * 1e3

        # worker-side decomposition from GET /stats (VERDICT-4 #5): where a
        # request's latency goes — coalesce queue wait vs batch assembly
        # window vs device process (upload+compute+fetch)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        conn.close()
        decomp = {}
        for k in ("embed_worker.queue_wait", "embed_worker.assemble",
                  "embed_worker.process"):
            if k in stats:
                decomp[k.split(".", 1)[1]] = {
                    "p50_ms": round(stats[k]["p50_ms"], 1),
                    "p95_ms": round(stats[k]["p95_ms"], 1),
                    "count": stats[k]["count"]}
        return {
            "serve_p50_ms": round(float(np.percentile(a, 50)), 1),
            "serve_p95_ms": round(float(np.percentile(a, 95)), 1),
            "serve_coalesced_ips": round(len(lat) / elapsed, 1),
            "serve_clients": n_clients,
            "serve_decomposition": decomp,
        }
    finally:
        server.shutdown()
        server.server_close()


def bench_pb_extractor(chain=10, batch=64):
    # batch 64 (the extractor default), not 256: the generic compiled-pb
    # program at HIGHEST is large and the batch-256 variant blew past a
    # 10-minute compile budget over the tunnel
    """The generic compiled-pb path's device cost — any user-supplied frozen
    graph (the reference's FaceNet/insightface rows, ``facerec_test.py:
    209-218``) runs through ``zoo.graph_extractor`` → core/graph_compiler;
    this benches the shipped quantized age/gender pb through that generic
    path at both precisions so the knob's cost is a known quantity (HIGHEST
    = bit-close parity, HIGH = TPU-native ~equal numerics at bf16_3x speed;
    the native-import path for the same net is the headline metric).

    Apples-to-apples (VERDICT-4 #1, RESOLVED r5): the NATIVE import of the
    same net runs alongside at the same batch/precision AND the same
    fori-loop chain form (``native_high_b64_ips`` + ``native_high_b64_
    device_ips_busy``). Measured on-device: the two programs are EQUAL —
    pb 46.22 ms busy vs native 46.58 ms for the chain-10 batch-64 program
    (device ~13.8k img/s both). r4's "1.5x gap" was a batch confound
    (pb@64 vs the batch-1024 native headline; batch 64 under-fills the
    chip for BOTH paths). Two form caveats the comparison surfaced:
      - the PYTHON-UNROLLED chain at batch 64 is a measured LOSER for this
        net (+40% device busy, 65.2 ms): XLA compiles the stride-2
        depthwise convs of the 10x-unrolled graph into a 48 GB/s form
        (fusion.1243/1663: 14x14x256 and 7x7x512 dw at 20.5%/10.3% busy)
        that the fori body does not hit. The unrolled form's +8% win
        (bench docstring above) is batch-1024-specific — don't generalize
        it down-batch.
      - wall-clock ips at iters<=2 swing ~15% from RTT accounting; the
        busy-ms figures are the comparable numbers."""
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.models.zoo import AGEGENDER_PB, graph_extractor

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32) * 255)
    out = {}
    prof_pb = None
    for label, precision in (("highest", jax.lax.Precision.HIGHEST),
                             ("high", jax.lax.Precision.HIGH)):
        ex = graph_extractor(AGEGENDER_PB, "input_1:0", "global_pooling/Mean:0",
                             (224, 224), normalization="caffe",
                             precision=precision)
        fwd = ex.model_fn
        # params must be jit ARGUMENTS: EmbeddingExtractor device_puts them,
        # and a jitted closure over DEVICE arrays re-fetches every captured
        # leaf through the ~7 MB/s tunnel at lowering (the CLAUDE.md
        # trace-constant hang)
        params = ex.params

        @jax.jit
        def many(params, x, fwd=fwd):
            def body(i, acc):
                return acc + fwd(params, x + i.astype(jnp.float32)
                                 * 1e-6)[0, 0]
            return jax.lax.fori_loop(0, chain, body,
                                     jnp.zeros((), jnp.float32))

        ips = _time_chained(lambda v: many(params, v), x, chain,
                            batch * chain, warmup=1, iters=4)
        out[f"pb_extractor_{label}_ips"] = round(ips, 1)
        if label == "high":
            prof_pb = profile_fusions(lambda v: np.asarray(many(params, v)),
                                      x, "pb_extractor_high")
            if prof_pb is not None and prof_pb["busy_ms"]:
                prof_pb["busy_ms_per_forward"] = round(
                    prof_pb["busy_ms"] / chain, 2)
                prof_pb["device_ips_busy"] = round(
                    batch * chain / (prof_pb["busy_ms"] / 1e3), 1)

    # the native import of the SAME net at the SAME batch/precision and the
    # SAME fori chain form (the unrolled form miscompiles at this batch —
    # see docstring)
    fwd_n, _ = build_forward(jax.lax.Precision.HIGH, jnp.float32)

    @jax.jit
    def many_n(v):
        def body(i, acc):
            return acc + fwd_n(v + i.astype(jnp.float32) * 1e-6)[0, 0]
        return jax.lax.fori_loop(0, chain, body, jnp.zeros((), jnp.float32))

    out["native_high_b64_ips"] = round(
        _time_chained(many_n, x, chain, batch * chain, warmup=1, iters=4), 1)
    prof_n = profile_fusions(lambda v: np.asarray(many_n(v)), x,
                             "native_high_b64", top=4)
    if prof_n is not None and prof_n["busy_ms"]:
        out["native_high_b64_device_ips_busy"] = round(
            batch * chain / (prof_n["busy_ms"] / 1e3), 1)
    return out, prof_pb


def bench_knn(chain=6):
    """Matrix-free Pallas 1-NN at its design point — 8192 probes × 1M × 512-d
    gallery, where the XLA path's (M, N) f32 matrix (32 GB) exceeds HBM —
    vs the probe-chunked XLA alternative. Data generated on device (the
    gallery alone is 2 GB; no host transfer)."""
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.ops.pallas.knn import (
        nearest_neighbor_chunked_xla, nearest_neighbor_tpu)

    M, D, N = 8192, 512, 1_048_576
    kp, kg = jax.random.split(jax.random.PRNGKey(0))
    probes = jax.random.normal(kp, (M, D), jnp.float32)
    gallery = jax.random.normal(kg, (N, D), jnp.float32)

    def chained(nn_fn):
        # gallery must be a jit ARGUMENT: closing over it captures the 2 GB
        # array as a lowered constant (blows up compilation)
        @jax.jit
        def many(p, g):
            def body(i, acc):
                dmin, idx = nn_fn(p + i.astype(jnp.float32) * 1e-6, g)
                return acc + dmin[0] + idx[0].astype(jnp.float32)

            return jax.lax.fori_loop(0, chain, body, jnp.zeros((), jnp.float32))

        calls_per_sec = _time_chained(lambda x: many(x, gallery), probes,
                                      chain, chain, warmup=1, iters=2)
        return 1000.0 / calls_per_sec   # ms per full 8192-probe query

    pallas_ms = chained(lambda p, g: nearest_neighbor_tpu(p, g))
    xla_ms = chained(lambda p, g: nearest_neighbor_chunked_xla(p, g, chunk=512))

    # int8 quantized-gallery sweep (pack once at "enrollment", outside the
    # timed region — the serving pattern for a static gallery)
    from hse_facerec_tf_tpu.ops.pallas.knn import (
        nearest_neighbor_tpu_int8p, pack_quantized_gallery,
        quantize_embeddings)

    qb, sb = quantize_embeddings(gallery)
    qt, b2i, sc = pack_quantized_gallery(qb, sb)
    qt.block_until_ready()

    @jax.jit
    def many_int8(p, qt, b2i, sc):
        def body(i, acc):
            dm, ix = nearest_neighbor_tpu_int8p(
                p + i.astype(jnp.float32) * 1e-6, qt, b2i, sc)
            return acc + dm[0] + ix[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, chain, body, jnp.zeros((), jnp.float32))

    calls_per_sec_i8 = _time_chained(
        lambda x: many_int8(x, qt, b2i, sc), probes, chain, chain,
        warmup=1, iters=2)
    int8_ms = 1000.0 / calls_per_sec_i8

    # XLA cost analysis can't see inside the Pallas custom call, so the knn
    # roofline is analytic: 2·M·N·D MXU FLOPs; HBM traffic = bf16 gallery
    # re-read once per probe-tile sweep + operands/outputs (ops/pallas/knn.py
    # docstring has the measured decomposition: the kernel is MXU-bound).
    from hse_facerec_tf_tpu.ops.pallas.knn import TILE_M

    flops = 2.0 * M * N * D
    bytes_ = (-(-M // TILE_M)) * N * D * 2 + M * D * 2 + M * 8
    calls_per_sec = 1000.0 / pallas_ms
    roofline = _roofline_entry(flops, bytes_, calls_per_sec)
    # int8 entry: same MXU op count against the 2× int8 peak; gallery
    # re-reads are int8 (1 byte/elem)
    bytes_i8 = (-(-M // TILE_M)) * N * D + M * D * 4 + M * 8
    roofline_i8 = _roofline_entry(flops, bytes_i8, calls_per_sec_i8)
    roofline_i8["mxu_peak_int8_tflops"] = 2 * V5E_PEAK_BF16_TFLOPS
    roofline_i8["pct_mxu_peak_int8"] = round(
        roofline_i8.pop("pct_mxu_peak_bf16") / 2.0, 1)
    return pallas_ms, xla_ms, int8_ms, roofline, roofline_i8


def main():
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()

    dev = jax.devices()[0]
    # Precision.HIGH f32: exact embedding agreement with the HIGHEST path at
    # well below bf16 throughput (both are HBM-bound; bf16 halves the bytes).
    ips, forward, x, roof_f32 = bench_embed(jax.lax.Precision.HIGH, jnp.float32)
    bf16_ips, _, _, roof_bf16 = bench_embed(jax.lax.Precision.DEFAULT, jnp.bfloat16)
    int8_ips, roof_int8, int8_cos = bench_embed_int8()

    # correctness guard: fast path must stay bit-close to the parity path
    fn = jax.jit(forward)
    fn32 = jax.jit(build_forward(jax.lax.Precision.HIGHEST, jnp.float32)[0])
    a = np.asarray(fn(x)[:4], dtype=np.float64)
    b = np.asarray(fn32(x)[:4], dtype=np.float64)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, f"fast-path embedding drift: cosine {cos.min()}"

    detect_ms, detect_batch_ips, img640, roof_detect = bench_detection()
    analyze_ms, analyze_batch_ips, roof_analyze = bench_analyze(img640)
    knn_pallas_ms, knn_xla_ms, knn_int8_ms, roof_knn, roof_knn_i8 = bench_knn()
    train_ips, roof_train = bench_train()
    ag_train_ips, roof_ag_train = bench_train_age_gender()
    album = bench_album()
    serve = bench_serve()
    pb_ex, pb_prof = bench_pb_extractor()

    try:
        cpu_ips = measure_cpu_baseline()
    except Exception:
        cpu_ips = None

    result = {
        "metric": "multihead_embed_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": f"images/sec (batch {BATCH}, f32-HIGH, {dev.device_kind})",
        "vs_baseline": round(ips / cpu_ips, 2) if cpu_ips else None,
        "extra": {
            "embed_bf16_ips": round(bf16_ips, 1),
            "embed_int8_ips": round(int8_ips, 1),
            "embed_int8_cosine_vs_f32": round(int8_cos, 5),
            "detect_ms_per_image_640x480": round(detect_ms, 2),
            "detect_batch8_ips_640x480": round(detect_batch_ips, 1),
            "analyze_ms_per_image_640x480": round(analyze_ms, 2),
            "analyze_batch8_ips_640x480": round(analyze_batch_ips, 1),
            "train_face_id_ips_bs256": round(train_ips, 1),
            "train_age_gender_pairs_ips_bs256": round(ag_train_ips, 1),
            "knn_8kx1M_pallas_ms": round(knn_pallas_ms, 1),
            "knn_8kx1M_chunked_xla_ms": round(knn_xla_ms, 1),
            "knn_8kx1M_int8_ms": round(knn_int8_ms, 1),
            **album,
            **serve,
            **pb_ex,
            "roofline": {
                "peaks": {"mxu_bf16_tflops": V5E_PEAK_BF16_TFLOPS,
                          "hbm_gbs": V5E_PEAK_HBM_GBS,
                          "bytes_model_note": BYTES_MODEL_NOTE},
                "embed_f32": roof_f32,
                "embed_bf16": roof_bf16,
                "embed_int8": roof_int8,
                "detect_batch8": roof_detect,
                "analyze": roof_analyze,
                "train_bs256": roof_train,
                "train_age_gender_bs256": roof_ag_train,
                "knn_8kx1M": roof_knn,
                "knn_8kx1M_int8": roof_knn_i8,
                **({"pb_extractor_high": {"fusion_profile": pb_prof}}
                   if pb_prof else {}),
            },
        },
    }
    print(json.dumps(result))
    # The driver records only the last ~2 KB of stdout; the r3 extras grew
    # past that and truncated the headline out of BENCH_r03.json. Persist the
    # full artifact to disk and REPEAT a compact headline line last so the
    # tail capture stays self-contained.
    with open(os.path.join(ROOT, "bench_out.json"), "w") as f:
        json.dump(result, f, indent=1)
    compact = {k: v for k, v in result.items() if k != "extra"}
    compact["extra"] = {k: v for k, v in result["extra"].items()
                        if not isinstance(v, dict)}
    compact["full_artifact"] = "bench_out.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
