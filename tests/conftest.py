"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` so ``jax.sharding.Mesh`` logic is
exercised for real (collectives included) on host CPU. Numeric oracles run in
float64 (enabled below), which the TPU path then has to match in float32
within documented tolerances.

NOTE: on machines where a TPU plugin is pre-registered via sitecustomize
(before pytest imports this file), env vars alone cannot redirect the
platform — we must force it through ``jax.config`` before any backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Default: CPU mesh + float64 oracles. Set QCT_TEST_TPU=1 to run the suite
# against the real TPU instead (float64 unavailable there; only the
# device-gated tests are meaningful in that mode).
if not os.environ.get("QCT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of XLA CPU programs in one process;
    around the ~100th compilation the LLVM JIT segfaults inside
    backend_compile_and_load (jaxlib 0.9.0; reproducible at
    test_warm_start when the whole suite runs, while every subset and the
    file alone pass). Releasing executables module-by-module keeps the
    live-code footprint bounded; cross-module recompiles are cheap because
    modules rarely share jitted signatures.
    """
    yield
    jax.clear_caches()
