"""Test configuration: run everything on CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a simulated mesh
(--xla_force_host_platform_device_count), per SURVEY.md §4; real-TPU paths are
exercised by bench.py and the driver's compile checks instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may force jax_platforms="axon,cpu" (real-TPU
# tunnel); tests must run on the virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def bundled_scan_paths():
    paths = [
        os.path.join(REFERENCE_DATA, "scans", "000000.bin"),
        os.path.join(REFERENCE_DATA, "scans", "000001.bin"),
    ]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("bundled reference scans not available")
    return paths


@pytest.fixture(scope="session")
def golden_depth():
    path = os.path.join(REFERENCE_DATA, "preprocess_data_demo", "depth", "000000.npy")
    if not os.path.exists(path):
        pytest.skip("golden depth image not available")
    return np.load(path)


@pytest.fixture(scope="session")
def golden_normal():
    path = os.path.join(REFERENCE_DATA, "preprocess_data_demo", "normal", "000000.npy")
    if not os.path.exists(path):
        pytest.skip("golden normal image not available")
    return np.load(path)


@pytest.fixture(scope="session")
def golden_intensity():
    path = os.path.join(
        REFERENCE_DATA, "preprocess_data_demo", "intensity", "000000.npy"
    )
    if not os.path.exists(path):
        pytest.skip("golden intensity image not available")
    return np.load(path)


@pytest.fixture(scope="session")
def small_model_cfg():
    """A narrow but structurally-complete model config (input width 360 ->
    leg width 90) to keep CPU tests fast."""
    from overlapnet_tpu.core.config import ModelConfig

    return ModelConfig(input_width=360)
