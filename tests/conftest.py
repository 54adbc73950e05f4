"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md section 4e).

Multi-chip logic is tested single-process the standard JAX way:
JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8.  Pallas kernels
run in interpreter mode on CPU (selected automatically by the renderers).
Set GVRT_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os
import sys

if not os.environ.get("GVRT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The container's sitecustomize force-registers the TPU platform and
    # overrides JAX_PLATFORMS; config.update wins over both.
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite compiles hundreds of distinct-shape XLA CPU programs;
    with everything cached in-process, host RSS grows until an XLA compile
    thread segfaults late in the run (observed twice in test_tiled at
    ~90% through `backend_compile_and_load`).  Per-module cache clearing
    keeps the peak bounded; per-test would thrash shared fixtures.
    """
    yield
    import jax
    jax.clear_caches()
