"""Test configuration: run on a virtual 8-device CPU mesh.

Numerical parity tests need float64 (1e-13 tolerances) which the TPU
backend does not provide, and sharding tests need multiple devices, so the
suite runs on the host platform with 8 virtual devices — the standard way
to test JAX sharding without a pod.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# numerics sanitizer (the race-detector analogue for this framework):
# TNT_DEBUG_NANS=1 makes every kernel fail loudly on NaN production
if os.environ.get("TNT_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles thousands of distinct XLA programs in one
    process; with all of them kept alive the XLA:CPU compiler segfaulted
    twice (2026-08-18) at ~265 tests in — in *different* tests but at the
    same cumulative position, i.e. a per-process accumulation limit, not
    a test bug.  Executables rarely cross module boundaries, so clearing
    per module costs little recompilation and keeps the live-executable
    count bounded.
    """
    yield
    jax.clear_caches()
