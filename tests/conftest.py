"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
validated on `xla_force_host_platform_device_count=8` CPU devices exactly as
the driver's `dryrun_multichip` does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/tpu: tests run on CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize registers the TPU backend before conftest runs, so
# the env var alone is not enough — force the platform through jax.config.
jax.config.update("jax_platforms", "cpu")
# the persistent compile cache is for the TPU path; CPU AOT artifacts are
# machine-feature sensitive and must not be reused across hosts
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after every test module: a single long
    pytest process accumulates hundreds of XLA CPU executables across the
    slow e2e suite, which eventually segfaults the compiler (observed in
    jax 0.8 backend_compile_and_load after ~30 heavy tests). Per-module
    recompiles cost seconds; a crashed lane costs the whole run."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
