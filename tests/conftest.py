"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (import side effects), hence the
env mutation at module import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when a TPU is attached
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize hook registers the TPU backend and pins
# jax_platforms=axon before conftest runs; override it back to CPU.
jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def default_cfg():
    from multimodal_organ_segmentation_tpu.utils.config import default_config

    return default_config()
