"""Test configuration: run on a virtual 8-device CPU mesh with f64 enabled.

Correctness tests follow the reference's strategy (SURVEY.md §4): numerical
property checks (orthonormality, residual norms, eigenvector angles) against
scipy ground truth, at f64 on CPU; multi-device sharding is exercised on a
virtual CPU mesh via ``--xla_force_host_platform_device_count`` standing in
for a TPU pod slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; the
# config update is authoritative (must run before backend initialization).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Long single-process runs accumulate compiled executables until the
    XLA CPU compiler aborts (OOM); drop caches between test modules."""
    yield
    jax.clear_caches()
