"""Test configuration: force CPU with 8 virtual devices (distributed tests
run on a simulated mesh, SURVEY §4) and enable x64 so convergence parity with
the fp64 serial reference is exact."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU concurrency-scheduler miscompile guard (also set by the package
# import, but conftest runs first — see lssp_tpu/__init__.py for the note)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_cpu_enable_concurrency_optimized_scheduler=false").strip()

import jax

# the harness pins JAX_PLATFORMS=axon via the ambient environment and
# overrides the env var at import time — the config update below is the only
# reliable way to force the CPU backend for tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
