"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (mirrors how the reference gates its Python suite on the
CPU ExecMode backend, reference: conftest.py:6-21, pytest.ini)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms='axon,cpu' at
# interpreter start, silently overriding JAX_PLATFORMS — undo it so the test
# suite runs on the local CPU backend (8 virtual devices for sharding tests).
jax.config.update(
    "jax_platforms", os.environ.get("GPUDRIVE_TPU_TEST_PLATFORM", "cpu")
)

import gpudrive_lab_tpu  # noqa: E402

gpudrive_lab_tpu.enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SCENE = "/root/reference/tests/pytest_data/test.json"
EXAMPLE_SCENES_DIR = "/root/reference/data/processed/examples"
SYNTHETIC_SCENE = os.path.join(
    os.path.dirname(__file__), "data", "tfrecord_synthetic_0.json"
)


@pytest.fixture(scope="session")
def reference_scene_path():
    """The reference's pytest scene when mounted; otherwise the
    self-contained synthetic fixture (same schema, tests/data)."""
    if os.path.exists(REFERENCE_SCENE):
        return REFERENCE_SCENE
    return SYNTHETIC_SCENE


@pytest.fixture(scope="session")
def example_scene_paths():
    if os.path.isdir(EXAMPLE_SCENES_DIR):
        return sorted(
            os.path.join(EXAMPLE_SCENES_DIR, f)
            for f in os.listdir(EXAMPLE_SCENES_DIR)
            if f.endswith(".json")
        )
    return [SYNTHETIC_SCENE] * 4


def to_np(tree):
    """Device pytree -> numpy (host logic must stay in numpy here: the first
    eager jnp reduction in this environment costs ~100s)."""
    import jax

    return jax.tree.map(np.asarray, tree)
