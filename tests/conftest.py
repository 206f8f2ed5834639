"""Test harness: run everything on CPU with 8 virtual devices so mesh/sharding tests work
without TPU hardware (SURVEY.md §4 'Distributed without a cluster')."""

import os

# Force CPU regardless of the ambient environment — the shell exports JAX_PLATFORMS=axon
# (the TPU tunnel), and concurrent test processes must never contend for the one chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient sitecustomize (PYTHONPATH=/root/.axon_site) imports jax at interpreter
# startup, freezing JAX_PLATFORMS before this file runs — env vars alone are too late.
# The config update works post-import as long as no backend has been created yet.
jax.config.update("jax_platforms", "cpu")

# fp32 math must actually be fp32 for parity tests (JAX's default matmul precision may
# use bf16 passes); the production TPU path sets precision per-op where it matters.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
