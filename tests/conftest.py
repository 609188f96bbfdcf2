"""Test harness: run on CPU with 8 virtual devices so sharding logic is
exercised without a TPU pod (SURVEY §4 — the TPU analog of the reference's
parallel-equivalence test)."""

import os

# Force CPU with 8 virtual devices: the session presets a TPU platform via a
# sitecustomize hook (which overrides JAX_PLATFORMS after env inspection), but
# the test suite needs virtual host devices for the sharding tests. XLA_FLAGS
# must be set before the CPU client initializes; jax.config wins over the
# sitecustomize platform pin.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sift_like():
    """Small synthetic siftsmall-shaped dataset with exact groundtruth."""
    from vaq_tpu.data import make_sift_like

    base, queries, gt = make_sift_like(n=4000, n_queries=64, d=128, seed=42)
    return base, queries, gt


@pytest.fixture(scope="session")
def tiny_data():
    rng = np.random.default_rng(7)
    base = rng.standard_normal((512, 32)).astype(np.float32)
    queries = rng.standard_normal((16, 32)).astype(np.float32)
    return base, queries
