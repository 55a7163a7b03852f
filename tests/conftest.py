"""Test harness config: run on a virtual 8-device CPU mesh.

SURVEY.md §4: multi-device behavior is tested on CPU via
``--xla_force_host_platform_device_count=8`` (the JAX-idiomatic fake-cluster
trick). Forcing CPU also keeps tests reproducible and leaves the single real
TPU chip free for benchmarks.
"""

import os

# XLA_FLAGS must be in the environment before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize imports jax at interpreter startup, so env vars are captured
# before conftest runs — override via jax.config instead. Parity tests compare
# fp32 numerics against torch, so MXU-style bf16 matmul defaults are disabled.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
