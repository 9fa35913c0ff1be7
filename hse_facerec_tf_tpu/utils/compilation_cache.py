"""Persistent XLA compilation cache.

Pipeline programs here are large (the fused detector compiles 1-9 minutes per
image-shape bucket over the TPU tunnel). Enabling JAX's persistent cache
makes compiles survive process restarts, so the CLI / server / bench pay the
cost once per shape ever, not once per run. Called by every entrypoint;
respects an explicit JAX_COMPILATION_CACHE_DIR if the user set one.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/facerec_tpu/xla")
_enabled = False


def enable(cache_dir: str | None = None) -> str:
    global _enabled
    import jax

    path = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or DEFAULT_DIR)
    if not _enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program regardless of size/compile time
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _enabled = True
    return path
