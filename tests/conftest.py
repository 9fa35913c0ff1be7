"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on CPU via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 implication (d));
real-TPU execution is exercised by ``bench.py`` and the driver's graft entry.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# jax may already be imported by a pytest plugin (its config snapshots env at
# import), so force the platform through the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")
MTCNN_PB = REFERENCE / "age_gender_identity" / "mtcnn.pb"
AGEGENDER_PB = REFERENCE / "age_gender_identity" / "age_gender_tf2_new-01-0.14-0.92_quantized.pb"
TEST_IMAGE = REFERENCE / "age_gender_identity" / "test_image.jpg"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(12345)


def pytest_collection_modifyitems(config, items):
    # Deterministic ordering for cache-friendly compile reuse.
    items.sort(key=lambda it: it.nodeid)
