"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised deterministically without TPU hardware (an improvement
over the reference, which has zero distributed tests — SURVEY.md §4).

Note: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (remote TPU tunnel), so plain env-var assignment is too
late — we must override through jax.config before any backend initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
