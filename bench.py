"""Headline benchmark: face-embedding throughput (images/sec/chip).

Measures the flagship path — the multi-head age/gender/identity MobileNet over
the shipped reference weights — as one fused jit program (preprocess +
backbone + heads), batch 128, bf16 compute on the MXU.

vs_baseline compares against the reference's execution model: batch-1 f32
inference (the reference runs one ``sess.run`` per image with no batching —
``facerec_test.py:390-394``, ``facial_analysis.py:108-109``) measured on the
host CPU, cached in .bench_cpu_baseline.json. BASELINE.md's north-star is
>10x images/sec/chip over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
CPU_BASELINE_CACHE = os.path.join(ROOT, ".bench_cpu_baseline.json")
BATCH = 512
WARMUP = 2
ITERS = 4


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


def main():
    import jax
    import jax.numpy as jnp

    from hse_facerec_tf_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()

    dev = jax.devices()[0]
    # Precision.HIGH f32: exact embedding agreement with the HIGHEST path at
    # ~8% below bf16 throughput (the model is HBM-bound, not MXU-bound).
    forward, _ = build_forward(jax.lax.Precision.HIGH, jnp.float32)

    # Chain CHAIN iterations inside one jit program: the host<->device tunnel
    # costs ~32 ms per round trip here, which would otherwise dominate; a
    # production pipeline streams batches without per-batch host syncs.
    CHAIN = 10

    @jax.jit
    def many(x):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            acc = acc + forward(x)[0, 0]
            x = x + 1e-6  # defeat CSE between iterations
        return acc

    fn = jax.jit(forward)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 224, 224, 3).astype(np.float32) * 255)

    for _ in range(WARMUP):
        np.asarray(many(x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(many(x))
    elapsed = time.perf_counter() - t0
    ips = BATCH * CHAIN * ITERS / elapsed

    # correctness guard: fast path must stay bit-close to the parity path
    fn32 = jax.jit(build_forward(jax.lax.Precision.HIGHEST, jnp.float32)[0])
    a = np.asarray(fn(x)[:4], dtype=np.float64)
    b = np.asarray(fn32(x)[:4], dtype=np.float64)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert cos.min() > 0.999, f"fast-path embedding drift: cosine {cos.min()}"

    try:
        cpu_ips = measure_cpu_baseline()
    except Exception:
        cpu_ips = None

    print(json.dumps({
        "metric": "multihead_embed_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": f"images/sec (batch {BATCH}, f32-HIGH, {dev.device_kind})",
        "vs_baseline": round(ips / cpu_ips, 2) if cpu_ips else None,
    }))


if __name__ == "__main__":
    main()
