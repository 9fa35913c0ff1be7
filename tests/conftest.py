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


@pytest.fixture()
def rng():
    # fresh per test: results don't depend on which other tests ran before
    return np.random.RandomState(12345)


@pytest.fixture(scope="session")
def fixture_img_640():
    """The shipped demo photo downscaled like the reference demos
    (≤640×480, facial_analysis.py:653-655)."""
    import cv2

    img = cv2.cvtColor(cv2.imread(str(TEST_IMAGE)), cv2.COLOR_BGR2RGB)
    h, w = img.shape[:2]
    scale = min(640 / w, 480 / h, 1.0)
    return cv2.resize(img, (int(w * scale), int(h * scale)))


def pytest_collection_modifyitems(config, items):
    # Deterministic ordering for cache-friendly compile reuse.
    items.sort(key=lambda it: it.nodeid)
